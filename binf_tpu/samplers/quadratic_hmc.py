"""HMC specialized to quadratic potentials, driven by the fused Pallas
leapfrog kernel.

For targets with log p(q) = -0.5 q^T A q + b^T q + const (linear-Gaussian
conditionals: regression coefficient blocks, GP latents, Kalman-style
states), the whole trajectory integrates inside one TPU kernel
(``binf_tpu.ops.pallas.leapfrog``).  Unlike the generic kernel this one is
natively BATCHED: ``step`` acts on a (C, D) chain block directly (do NOT
vmap it) so the kernel sees the full chain tile.

Exactness note: for a quadratic potential the MH test is still performed
(leapfrog is not exact), so the kernel is a drop-in correctness-preserving
speedup.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from binf_tpu.ops.math import safe_exp
from binf_tpu.ops.pallas.leapfrog import (
    quadratic_leapfrog,
    quadratic_leapfrog_reference,
)
from binf_tpu.samplers.base import SamplerKernel

Array = jax.Array

__all__ = ["QuadraticHMCState", "quadratic_hmc"]


class QuadraticHMCState(NamedTuple):
    position: Array  # (C, D)
    potential: Array  # (C,)


class QuadraticHMCInfo(NamedTuple):
    accepted: Array  # (C,)
    acceptance_prob: Array  # (C,)


def quadratic_hmc(
    A: Array,
    b: Array,
    step_size: float | Array = 0.1,
    num_integration_steps: int = 10,
    inv_mass: Array | None = None,
    use_pallas: bool | None = None,
    block_chains: int = 256,
    interpret: bool = False,
    jitter: float = 0.2,
) -> SamplerKernel:
    """Batched HMC kernel for log p(q) = -(0.5 q^T A q - b^T q).

    ``jitter``: per-step uniform step-size perturbation (eps * U[1-j, 1+j]),
    shared across the chain batch -- breaks the trajectory-length resonances
    a quadratic target's eigenmodes otherwise lock into.
    """
    D = b.shape[0]
    im = jnp.ones((D,), jnp.float32) if inv_mass is None else inv_mass

    def potential(q: Array) -> Array:  # (C, D) -> (C,)
        Aq = q @ A
        return 0.5 * jnp.sum(q * Aq, axis=-1) - q @ b

    def integrate(q, p, eps):
        # Default routing is the XLA scan: measured on TPU v5e the Pallas
        # kernel LOSES at the recorded shape (1.86 vs 1.61 ms at C=8192,
        # D=128, L=32) -- XLA compiles this pure-matmul-chain scan at the
        # roofline, with nothing left for VMEM residency to save.  The
        # kernel remains available by explicit opt-in (use_pallas=True),
        # exercised bitwise-vs-XLA in interpret mode by tests.
        pallas_ok = bool(use_pallas)
        if pallas_ok:
            return quadratic_leapfrog(
                q, p, A, b, eps, num_integration_steps,
                inv_mass=im, block_chains=block_chains, interpret=interpret,
            )
        return quadratic_leapfrog_reference(
            q, p, A, b, eps, num_integration_steps, inv_mass=im
        )

    def init(position: Array) -> QuadraticHMCState:
        return QuadraticHMCState(position, potential(position))

    def step(key: Array, state: QuadraticHMCState):
        C = state.position.shape[0]
        key_mom, key_accept, key_eps = jax.random.split(key, 3)
        p0 = jax.random.normal(key_mom, state.position.shape) / jnp.sqrt(im)[None, :]

        ke0 = 0.5 * jnp.sum(p0 * p0 * im[None, :], axis=-1)
        e_before = state.potential + ke0

        eps = jnp.asarray(step_size)
        if jitter > 0:
            eps = eps * (1.0 + jitter * (2.0 * jax.random.uniform(key_eps, ()) - 1.0))
        q, p = integrate(state.position, p0, eps)
        U = potential(q)
        ke = 0.5 * jnp.sum(p * p * im[None, :], axis=-1)
        e_after = U + ke

        delta = e_after - e_before
        delta = jnp.where(jnp.isnan(delta), jnp.inf, delta)
        p_accept = jnp.minimum(1.0, safe_exp(-delta))
        u = jax.random.uniform(key_accept, (C,))
        accepted = u < p_accept

        new_q = jnp.where(accepted[:, None], q, state.position)
        new_U = jnp.where(accepted, U, state.potential)
        return QuadraticHMCState(new_q, new_U), QuadraticHMCInfo(accepted, p_accept)

    return SamplerKernel(init=init, step=step)
