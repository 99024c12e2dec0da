"""Forward models: parameters -> idealized ("mock") data.

TPU-native re-conception of the reference's ``AbstractForwardModel``
(``binf/model/forwardmodels.py:10-66``).  Differences by design:

* a forward model is a pure pytree callable ``values -> mock_data``;
* Jacobians come from JAX autodiff (``jax.jacfwd``) instead of hand-written
  ``_evaluate_jacobi_matrix`` methods (reference ``:23-33``) -- models with
  cheap analytic Jacobians can override :meth:`jacobian`, and likelihood
  gradients flow through ``jax.grad`` regardless;
* data/design matrices are stored as traced pytree leaves so the same
  compiled kernel serves any dataset of the same shape.

Built-ins cover the reference example (polynomial regression,
``binf/example/likelihood.py:11-37``) plus the families needed for the
broader capability set: general linear models, nonlinear parametric curves,
and chromatin-style pairwise-distance restraint models (the author's actual
scientific use case, reference ``README.rst:9``).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from binf_tpu.core.density import ValueDict, VariableSpec, as_value_dict
from binf_tpu.core.modules import pytree_dataclass, static_field
from binf_tpu.ops.math import vandermonde

Array = jax.Array

__all__ = [
    "ForwardModel",
    "LinearForwardModel",
    "PolynomialForwardModel",
    "ParametricCurveModel",
    "PairwiseDistanceModel",
]


class ForwardModel:
    """Base forward model: named parameters -> mock data (pure function)."""

    @property
    def variable_specs(self) -> tuple[VariableSpec, ...]:  # pragma: no cover
        raise NotImplementedError

    @property
    def variables(self) -> tuple[str, ...]:
        return tuple(sorted(s.name for s in self.variable_specs))

    @property
    def differentiable_variables(self) -> tuple[str, ...]:
        return tuple(sorted(s.name for s in self.variable_specs if s.differentiable))

    def _evaluate(self, values: ValueDict) -> Array:  # pragma: no cover
        raise NotImplementedError

    def __call__(self, values=None, **kw) -> Array:
        vals = as_value_dict(values, **kw)
        given, expect = set(vals), set(self.variables)
        if given != expect:
            raise ValueError(
                f"{type(self).__name__} expects variables {sorted(expect)}, "
                f"got {sorted(given)}"
            )
        return self._evaluate(vals)

    def jacobian(self, values=None, **kw) -> ValueDict:
        """d(mock_data)/d(variable) for each differentiable variable.

        Autodiff replacement for the reference's hand-written
        ``jacobi_matrix`` (``binf/model/forwardmodels.py:23-33``).  Returns
        {name: array of shape mock_shape + var_shape}.
        """
        vals = as_value_dict(values, **kw)
        diff = [v for v in self.differentiable_variables if v in vals]
        rest = {k: v for k, v in vals.items() if k not in diff}

        def f(dv: ValueDict) -> Array:
            return self._evaluate({**rest, **dv})

        return jax.jacfwd(f)({k: vals[k] for k in diff})


@pytree_dataclass
class LinearForwardModel(ForwardModel):
    """mock = X @ theta for a fixed design matrix X -- one MXU matmul.

    Generalizes the reference's polynomial model: any basis expansion
    (polynomial, spline, Fourier) is a design matrix.
    """

    design: Array
    name: str = static_field(default="linear")
    variable: str = static_field(default="theta")

    @property
    def variable_specs(self) -> tuple[VariableSpec, ...]:
        return (
            VariableSpec(
                self.variable, shape=(self.design.shape[-1],), differentiable=True
            ),
        )

    def _evaluate(self, values: ValueDict) -> Array:
        theta = values[self.variable]
        return self.design @ theta


@pytree_dataclass
class PolynomialForwardModel(ForwardModel):
    """Polynomial regression forward model: mock_i = sum_j c_j x_i**j.

    Equivalent of the reference example's ``ForwardModel``
    (``binf/example/likelihood.py:11-37``), evaluated as a Vandermonde
    matmul so batched chains ride the MXU.  The Vandermonde matrix doubles
    as the analytic Jacobian (reference ``:28-30``).
    """

    vandermonde: Array  # (n_points, n_coefficients)
    name: str = static_field(default="polynomial")
    variable: str = static_field(default="coefficients")

    @classmethod
    def create(cls, xses: Array, n_coefficients: int, variable: str = "coefficients"):
        V = vandermonde(jnp.asarray(xses, jnp.float32), n_coefficients)
        return cls(vandermonde=V, variable=variable)

    @property
    def variable_specs(self) -> tuple[VariableSpec, ...]:
        return (
            VariableSpec(
                self.variable,
                shape=(self.vandermonde.shape[-1],),
                differentiable=True,
            ),
        )

    def _evaluate(self, values: ValueDict) -> Array:
        return self.vandermonde @ values[self.variable]

    def jacobian(self, values=None, **kw) -> ValueDict:
        # Analytic: d mock / d c = V (constant).  (Reference Jacobian is V^T,
        # ``binf/example/likelihood.py:28-30``; we use the d(out)/d(in) layout.)
        return {self.variable: self.vandermonde}


@pytree_dataclass
class ParametricCurveModel(ForwardModel):
    """Arbitrary nonlinear curve mock_i = f(x_i; theta) for a traceable f.

    ``fn(x, values) -> mock`` must be a jit-traceable function (module-level,
    hashable -- it is static pytree metadata).
    """

    x: Array
    fn: Callable[[Array, ValueDict], Array] = static_field()
    specs: tuple[VariableSpec, ...] = static_field()
    name: str = static_field(default="curve")

    @property
    def variable_specs(self) -> tuple[VariableSpec, ...]:
        return self.specs

    def _evaluate(self, values: ValueDict) -> Array:
        return self.fn(self.x, values)


@pytree_dataclass
class PairwiseDistanceModel(ForwardModel):
    """Chromatin-style distance restraints: structure -> pairwise distances.

    The reference's scientific application (chromatin structure
    determination, reference ``README.rst:9``) evaluates distances between
    selected bead pairs of a 3D structure.  mock_k = || X[i_k] - X[j_k] ||.

    ``pairs`` is a static (K, 2) index array; the gather + norm is fused by
    XLA, and the full O(N^2) blockwise variant lives in
    ``binf_tpu.ops.pallas.pairwise`` for dense restraint fields.
    """

    n_beads: int = static_field()
    pairs_i: Array = None  # (K,) int32
    pairs_j: Array = None  # (K,) int32
    name: str = static_field(default="distances")
    variable: str = static_field(default="structure")

    @classmethod
    def create(cls, n_beads: int, pairs: Array, variable: str = "structure"):
        pairs = jnp.asarray(pairs, jnp.int32)
        return cls(
            n_beads=n_beads,
            pairs_i=pairs[:, 0],
            pairs_j=pairs[:, 1],
            variable=variable,
        )

    @property
    def variable_specs(self) -> tuple[VariableSpec, ...]:
        return (
            VariableSpec(self.variable, shape=(self.n_beads, 3), differentiable=True),
        )

    def _evaluate(self, values: ValueDict) -> Array:
        X = values[self.variable]
        d = X[self.pairs_i] - X[self.pairs_j]
        # sqrt of clipped sumsq: keeps the gradient finite at coincident beads
        return jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-1), 1e-12))
