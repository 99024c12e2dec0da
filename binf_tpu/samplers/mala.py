"""Metropolis-adjusted Langevin algorithm (MALA).

Not present in the reference (its gradient-based sampler is HMC only); MALA
completes the standard kernel menu -- it is the L=1 gradient proposal with
an asymmetric-proposal correction, often the best samples/FLOP for cheap
posteriors at scale.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from binf_tpu.ops.math import safe_exp
from binf_tpu.ops.tree import tree_axpy, tree_dot, tree_normal_like, tree_sub, tree_where
from binf_tpu.samplers.base import LogDensityFn, Position, SamplerKernel

Array = jax.Array

__all__ = ["MALAState", "MALAInfo", "mala"]


class MALAState(NamedTuple):
    position: Position
    logdensity: Array
    logdensity_grad: Position


class MALAInfo(NamedTuple):
    accepted: Array
    acceptance_prob: Array


def mala(logdensity_fn: LogDensityFn, step_size: float | Array = 0.1) -> SamplerKernel:
    value_and_grad_fn = jax.value_and_grad(logdensity_fn)

    def init(position: Position) -> MALAState:
        ld, g = value_and_grad_fn(position)
        return MALAState(position, ld, g)

    def transition_logdensity(to_pos, from_pos, from_grad, eps):
        """log q(to | from) for the Langevin proposal N(from + eps^2/2 grad, eps^2 I)."""
        mean = tree_axpy(0.5 * eps**2, from_grad, from_pos)
        diff = tree_sub(to_pos, mean)
        return -tree_dot(diff, diff) / (2.0 * eps**2)

    def step(key: Array, state: MALAState) -> tuple[MALAState, MALAInfo]:
        key_prop, key_accept = jax.random.split(key)
        eps = jnp.asarray(step_size)

        noise = tree_normal_like(key_prop, state.position)
        proposal = tree_axpy(0.5 * eps**2, state.logdensity_grad, state.position)
        proposal = tree_axpy(eps, noise, proposal)

        prop_ld, prop_grad = value_and_grad_fn(proposal)

        log_ratio = (
            prop_ld
            - state.logdensity
            + transition_logdensity(state.position, proposal, prop_grad, eps)
            - transition_logdensity(proposal, state.position, state.logdensity_grad, eps)
        )
        p_accept = jnp.minimum(1.0, safe_exp(log_ratio))
        accepted = jax.random.uniform(key_accept, ()) < p_accept

        new_state = MALAState(
            tree_where(accepted, proposal, state.position),
            jnp.where(accepted, prop_ld, state.logdensity),
            tree_where(accepted, prop_grad, state.logdensity_grad),
        )
        return new_state, MALAInfo(accepted, p_accept)

    return SamplerKernel(init=init, step=step)
