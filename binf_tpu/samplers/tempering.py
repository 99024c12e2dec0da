"""Parallel tempering (replica exchange).

The reference only has *hooks* for replica exchange -- ``last_draw_stats``
docstrings reference an RE consumer living in the author's downstream
project (``binf/samplers/hmc.py:171-178``) and ``_update_subsampler_states``
"e.g. after a replica exchange swap" (``binf/samplers/gibbs.py:115-118``) --
but no implementation.  This module supplies one, vectorized:

* K temperatures run simultaneously (vmap over the temperature axis, with
  per-temperature kernels built from a traced beta);
* deterministic even-odd adjacent swap sweeps (alternating by step parity),
  accepted with probability min(1, exp((beta_i - beta_j)(logp_j - logp_i)));
* after swaps, per-temperature kernel states are re-initialized so any
  cached log-density/gradient stays exact for arbitrary inner kernels --
  the functional analogue of the reference's state-push hook;
* the whole PT step is itself a :class:`SamplerKernel`, so it vmaps over a
  chain axis and shards over a mesh like any other kernel (K * C replicas).

Info reports per-pair swap acceptance -- the vectorized successor of the
stats protocol the reference's RE consumer relied on.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from binf_tpu.ops.math import safe_exp
from binf_tpu.samplers.base import LogDensityFn, Position, SamplerKernel

Array = jax.Array

__all__ = ["PTState", "PTInfo", "parallel_tempering", "geometric_betas"]


class PTState(NamedTuple):
    positions: Position  # leaves have leading K axis
    logps: Array  # (K,) raw (beta=1) log densities
    step_parity: Array  # alternates even/odd swap sweeps


class PTInfo(NamedTuple):
    swap_accepted: Array  # (K-1,) adjacent-pair swap outcomes this sweep
    swap_prob: Array  # (K-1,)
    inner_info: Any  # stacked inner-kernel infos, leading K axis


def geometric_betas(k: int, beta_min: float = 0.05) -> Array:
    """Geometric temperature ladder from 1 down to beta_min (K values)."""
    return jnp.geomspace(1.0, beta_min, k)


def parallel_tempering(
    logdensity_fn: LogDensityFn,
    betas: Array,
    make_kernel: Callable[[Array], SamplerKernel] | None = None,
    step_size: float = 0.5,
) -> SamplerKernel:
    """Build a PT kernel over temperature ladder ``betas`` (betas[0] is the
    target, conventionally 1.0).

    ``make_kernel(beta)`` builds the within-temperature kernel for a traced
    beta (default: Gaussian random-walk Metropolis with ``step_size / sqrt(beta)``
    -- hotter replicas take larger steps).  The chain drawn from
    ``state.positions`` at index 0 targets the un-tempered density.
    """
    betas = jnp.asarray(betas)
    K = betas.shape[0]

    if make_kernel is None:
        from binf_tpu.samplers.rwm import rwm

        def make_kernel(beta):
            return rwm(
                lambda pos: beta * logdensity_fn(pos),
                step_size / jnp.sqrt(beta),
                proposal="normal",
            )

    def init_at(position: Position, beta: Array):
        return make_kernel(beta).init(position)

    def step_at(key: Array, state: Any, beta: Array):
        return make_kernel(beta).step(key, state)

    def init(positions: Position) -> PTState:
        logps = jax.vmap(lambda pos: logdensity_fn(pos))(positions)
        return PTState(positions, logps, jnp.zeros((), jnp.int32))

    def step(key: Array, state: PTState) -> tuple[PTState, PTInfo]:
        key_inner, key_swap = jax.random.split(key)

        # -- within-temperature moves (vmapped over the ladder)
        inner_states = jax.vmap(init_at)(state.positions, betas)
        keys = jax.random.split(key_inner, K)
        inner_states, inner_info = jax.vmap(step_at)(keys, inner_states, betas)
        positions = inner_states.position
        logps = jax.vmap(lambda pos: logdensity_fn(pos))(positions)

        # -- even-odd adjacent swaps
        # pair p = (p_start + 2t, p_start + 2t + 1); alternate p_start 0/1
        p_start = state.step_parity % 2
        idx = jnp.arange(K)
        # for each replica k, its partner under this sweep:
        partner = jnp.where((idx - p_start) % 2 == 0, idx + 1, idx - 1)
        partner = jnp.clip(partner, 0, K - 1)
        valid = partner != idx

        delta = (betas - betas[partner]) * (logps[partner] - logps)
        p_swap = jnp.minimum(1.0, safe_exp(delta))
        # one uniform per unordered pair: use the lower index's draw
        lo = jnp.minimum(idx, partner)
        u = jax.random.uniform(key_swap, (K,))
        accept = (u[lo] < p_swap) & valid

        take_from = jnp.where(accept, partner, idx)
        positions = jax.tree.map(lambda x: x[take_from], positions)
        logps = logps[take_from]

        # adjacent-pair stats (K-1 entries: pair i = (i, i+1))
        pair_idx = jnp.arange(K - 1)
        active = (pair_idx - p_start) % 2 == 0
        pair_prob = jnp.where(active, p_swap[pair_idx], 0.0)
        pair_acc = jnp.where(active, accept[pair_idx], False)

        new_state = PTState(positions, logps, state.step_parity + 1)
        return new_state, PTInfo(pair_acc, pair_prob, inner_info)

    return SamplerKernel(init=init, step=step)
