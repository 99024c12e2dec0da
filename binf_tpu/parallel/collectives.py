"""Explicit collectives for sharded-particle SMC and cross-chain statistics.

The GSPMD path (plain jnp on sharded arrays) already works for everything in
this framework -- XLA inserts collectives from sharding annotations.  This
module provides the *explicitly scheduled* shard_map versions for the
communication-sensitive pieces (SURVEY.md section 2.3 "distributed
systematic resampling"):

* weights are gathered as raw floats (4 bytes/particle -- trivial on ICI)
  so ancestor INDICES are computed locally per shard with zero particle
  movement in the index phase;
* particle movement then happens once, via a single gather keyed by the
  ancestor indices (`take_along_chain`), which XLA lowers to the minimal
  cross-shard traffic;
* cross-chain pooled statistics (`pmean_over_chains`) for adaptation and
  diagnostics.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from jax import shard_map

Array = jax.Array

__all__ = [
    "distributed_systematic_indices",
    "pmean_over_chains",
    "take_along_chain",
]


def distributed_systematic_indices(
    key: Array, log_weights: Array, mesh: Mesh, axis: str = "chain"
) -> Array:
    """Systematic-resampling ancestor indices for a sharded weight vector.

    Semantically identical to ``binf_tpu.smc.resampling.systematic_resample``
    but scheduled explicitly: each device all-gathers only the (N,) weights,
    computes the global CDF, and searches the positions for ITS output
    slots -- index computation is fully parallel with one small collective.
    """
    n = log_weights.shape[0]
    axes = tuple(mesh.axis_names)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axes if len(axes) > 1 else axis)),
        out_specs=P(axes if len(axes) > 1 else axis),
    )
    def _inner(key, lw_local):
        # gather the full weight vector (scalars only; particles never move)
        lw_full = lw_local
        for ax in reversed(axes):
            lw_full = jax.lax.all_gather(lw_full, ax, tiled=True)
        m = lw_local.shape[0]
        # flat device index across all mesh axes
        dev = jnp.zeros((), jnp.int32)
        for ax in axes:
            dev = dev * jax.lax.axis_size(ax) + jax.lax.axis_index(ax)

        w = jax.nn.softmax(lw_full)
        cum = jnp.cumsum(w)
        u = jax.random.uniform(key, ())  # same key everywhere -> same offset
        slots = dev * m + jnp.arange(m)
        positions = (slots.astype(jnp.float32) + u) / n
        return jnp.searchsorted(cum, positions, side="left").astype(jnp.int32)

    return _inner(key, log_weights)


def take_along_chain(particles: Any, indices: Array) -> Any:
    """Gather particles by global ancestor index along the (possibly sharded)
    leading axis; XLA emits the minimal cross-shard exchange."""
    return jax.tree.map(lambda x: jnp.take(x, indices, axis=0), particles)


def pmean_over_chains(tree: Any, mesh: Mesh, axis: str = "chain") -> Any:
    """Mean over the sharded chain axis with an explicit psum -- for pooled
    adaptation statistics when operating inside shard_map regions."""
    axes = tuple(mesh.axis_names)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=P(axes if len(axes) > 1 else axis),
        out_specs=P(),
    )
    def _inner(x_local):
        s = jnp.sum(x_local, axis=0)
        for ax in axes:
            s = jax.lax.psum(s, ax)
        return s

    n = jax.tree.leaves(tree)[0].shape[0]
    return jax.tree.map(lambda x: _inner(x) / n, tree)
