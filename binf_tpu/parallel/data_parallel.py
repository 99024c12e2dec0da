"""Within-model parallelism: shard the DATA axis of a log-likelihood.

SURVEY.md section 2.3's "within-model parallelism (TP/SP analogue)": for
large forward models the log-likelihood is a sum over data items, so it
partitions cleanly -- each device evaluates its shard of the
(data, mock-data) pair and one ``psum`` over ICI produces the scalar.
This composes with chain parallelism: a 2-D ``('chain', 'data')`` mesh
shards chains one way and each chain's restraint/data set the other.

Two entry points:

* :func:`sharded_sum` -- the low-level primitive: lift any per-datum
  function into a shard_map with a psum reduction;
* :class:`DataShardedLikelihood` -- a Density wrapper: same free variables
  as the wrapped likelihood, log_prob evaluated with its error-model data
  sharded over the given mesh axis.  Gradients flow through shard_map.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from binf_tpu.core.density import Density, ValueDict, VariableSpec
from binf_tpu.core.modules import pytree_dataclass, static_field

Array = jax.Array

__all__ = ["sharded_sum", "DataShardedLikelihood", "shard_data"]


def shard_data(tree: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Place arrays with their leading axis sharded over ``axis``."""

    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def sharded_sum(
    per_shard_fn: Callable[[Any, Any], Array],
    mesh: Mesh,
    axis: str = "data",
):
    """Lift ``per_shard_fn(params, local_data) -> scalar`` into a function
    of (params, sharded_data) returning the global sum (one psum)."""

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=P(),
    )
    def inner(params, local_data):
        return jax.lax.psum(per_shard_fn(params, local_data), axis)

    return inner


@pytree_dataclass
class DataShardedLikelihood(Density):
    """Evaluate a Likelihood with its observed-data axis sharded.

    The forward model is evaluated per shard on the shard's slice of any
    data-axis inputs (declared via ``fwm_data_fields``, e.g. the Vandermonde
    rows for a polynomial model), the error model on the data shard, and the
    partial log-probs are ``psum``-reduced.

    Requirements: the wrapped likelihood's forward model output and error
    model data share the same leading (data) axis, and the error-model
    log-prob is additive over that axis (true for all iid error models).
    """

    base: Density  # a Likelihood
    fixed: ValueDict
    mesh: Mesh = static_field(default=None)
    axis: str = static_field(default="data")
    fwm_data_fields: tuple[str, ...] = static_field(default=())
    name: str = static_field(default="sharded_likelihood")
    temper: float | Array = 1.0

    @classmethod
    def create(cls, base, mesh: Mesh, axis: str = "data",
               fwm_data_fields: tuple[str, ...] = ()):
        return cls(
            base=base, fixed={}, mesh=mesh, axis=axis,
            fwm_data_fields=tuple(fwm_data_fields),
            name=f"sharded_{base.name}",
        )

    @property
    def variable_specs(self) -> tuple[VariableSpec, ...]:
        return self.base.variable_specs

    def _log_prob(self, values: ValueDict) -> Array:
        base = self.base
        fwm = base.forward_model
        em = base.error_model

        # split data-axis leaves (forward-model design slices + observed data)
        fwm_data = {f: getattr(fwm, f) for f in self.fwm_data_fields}
        data_tree = {"__y__": em.data, **fwm_data}

        fwm_vals, em_vals = base._split_values(values)

        def per_shard(params, local):
            fwm_local_vals, em_local_vals = params
            local_fwm = fwm
            for f in self.fwm_data_fields:
                local_fwm = _replace_field(local_fwm, f, local[f])
            mock = local_fwm._evaluate(fwm_local_vals)
            local_em = _replace_field(em, "data", local["__y__"])
            from binf_tpu.core.density import MOCK_DATA

            return local_em._log_prob(
                {**local_em.fixed, **em_local_vals, MOCK_DATA: mock}
            )

        fn = sharded_sum(per_shard, self.mesh, self.axis)
        return self.temper * fn((fwm_vals, em_vals), data_tree)


def _replace_field(obj, field_name, value):
    import dataclasses

    return dataclasses.replace(obj, **{field_name: value})
