"""Random-walk Metropolis kernel.

Functional, vectorizable analogue of the reference's ``RWMCSampler``
(``binf/example/samplers.py:54-92``): uniform(-step, step) perturbation of
every leaf, Metropolis accept ``u < exp(-(E_new - E_old))``.  A Gaussian
proposal variant is included; per-leaf step sizes supported via a pytree
``step_size``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from binf_tpu.ops.math import safe_exp
from binf_tpu.ops.tree import (
    tree_normal_like,
    tree_uniform_like,
    tree_where,
)
from binf_tpu.samplers.base import LogDensityFn, Position, SamplerKernel

Array = jax.Array

__all__ = ["RWMState", "RWMInfo", "rwm"]


class RWMState(NamedTuple):
    position: Position
    logdensity: Array


class RWMInfo(NamedTuple):
    """Per-step stats (the reference's RWMCSampleStats analogue,
    ``binf/example/samplers.py:4``)."""

    accepted: Array  # bool
    acceptance_prob: Array
    proposal_logdensity: Array


def rwm(
    logdensity_fn: LogDensityFn,
    step_size,
    proposal: str = "uniform",
) -> SamplerKernel:
    """Build a random-walk Metropolis kernel.

    ``step_size`` is a scalar or a pytree matching the position (per-leaf
    scales).  ``proposal``: 'uniform' (reference semantics) or 'normal'.
    """
    if proposal not in ("uniform", "normal"):
        raise ValueError(f"unknown proposal {proposal!r}")

    def init(position: Position) -> RWMState:
        return RWMState(position, logdensity_fn(position))

    def step(key: Array, state: RWMState) -> tuple[RWMState, RWMInfo]:
        key_prop, key_accept = jax.random.split(key)
        if proposal == "uniform":
            noise = tree_uniform_like(key_prop, state.position, -1.0, 1.0)
        else:
            noise = tree_normal_like(key_prop, state.position)
        if isinstance(step_size, (int, float)) or hasattr(step_size, "shape"):
            scaled = jax.tree.map(lambda n: step_size * n, noise)
        else:
            scaled = jax.tree.map(lambda s, n: s * n, step_size, noise)
        proposal_pos = jax.tree.map(jnp.add, state.position, scaled)
        proposal_ld = logdensity_fn(proposal_pos)

        log_ratio = proposal_ld - state.logdensity
        p_accept = jnp.minimum(1.0, safe_exp(log_ratio))
        u = jax.random.uniform(key_accept, ())
        accepted = u < p_accept

        new_pos = tree_where(accepted, proposal_pos, state.position)
        new_ld = jnp.where(accepted, proposal_ld, state.logdensity)
        return RWMState(new_pos, new_ld), RWMInfo(accepted, p_accept, proposal_ld)

    return SamplerKernel(init=init, step=step)
