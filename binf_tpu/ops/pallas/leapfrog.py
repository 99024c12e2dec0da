"""Fused Pallas leapfrog for quadratic potentials (Gaussian-like targets).

SURVEY.md section 7 stage 10: the reference's hot loop is leapfrog
integration in interpreted numpy (``binf/samplers/hmc.py:92-125``); here the
ENTIRE L-step trajectory for a tile of chains runs inside one TPU kernel
with positions/momenta resident in VMEM -- no HBM round-trips between
integration steps, and the gradient of a quadratic potential

    U(q) = 0.5 q^T A q - b^T q        (grad U = A q - b)

is a single MXU matmul per step.  This covers every linear-Gaussian
conditional in the framework (polynomial/linear-regression coefficient
blocks, Gaussian process latents, ...), which is exactly where raw
integrator throughput matters.

The public entry :func:`quadratic_leapfrog` falls back to a lax.scan
implementation off-TPU (and under ``interpret=True`` for tests).

RETIRED FROM DEFAULT ROUTING (round 3): measured head-to-head on TPU v5e
the kernel loses to the XLA scan at its recorded shape (1.86 ms vs
1.61 ms, C=8192 D=128 L=32) and a D/L sweep found no crossover -- a
quadratic potential's trajectory is a pure matmul chain, which XLA
already schedules at the roofline with q/p kept in registers/VMEM by
fusion; there is no HBM round-trip for residency to eliminate.
``samplers.quadratic_hmc`` therefore routes to
:func:`quadratic_leapfrog_reference` by default; the kernel stays for
explicit opt-in and as the reference Pallas idiom for whole-trajectory
fusion (the pattern the WINNING whole-run kernels in ``fused_hmc.py`` /
``fused_potential.py`` extend to entire runs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

__all__ = ["quadratic_leapfrog", "quadratic_leapfrog_reference"]


def quadratic_leapfrog_reference(
    q: Array, p: Array, A: Array, b: Array, step_size, num_steps: int,
    inv_mass: Array | None = None,
) -> tuple[Array, Array]:
    """lax.scan reference implementation: (C, D) chains, same math."""
    eps = jnp.asarray(step_size, q.dtype)
    im = jnp.ones(q.shape[-1], q.dtype) if inv_mass is None else inv_mass

    def grad_U(q):
        return q @ A - b[None, :]

    p = p - 0.5 * eps * grad_U(q)

    def body(carry, _):
        q, p = carry
        q = q + eps * (p * im[None, :])
        p = p - eps * grad_U(q)
        return (q, p), None

    (q, p), _ = jax.lax.scan(body, (q, p), None, length=num_steps)
    p = p + 0.5 * eps * grad_U(q)
    return q, p


def _leapfrog_kernel(
    eps_ref, q_ref, p_ref, A_ref, b_ref, im_ref, q_out, p_out, *, num_steps: int
):
    """One chain tile: integrate num_steps in VMEM.

    Refs: eps (1,1) SMEM; q/p (BC, D); A (D, D); b (1, D); im (1, D).
    """
    eps = eps_ref[0, 0]
    q = q_ref[:]
    p = p_ref[:]
    A = A_ref[:]
    b = b_ref[:]
    im = im_ref[:]

    def grad_U(q):
        return (
            jnp.dot(q, A, preferred_element_type=jnp.float32) - b
        )

    # initial half kick
    p = p - 0.5 * eps * grad_U(q)

    def body(_, qp):
        q, p = qp
        q = q + eps * (p * im)
        p = p - eps * grad_U(q)
        return (q, p)

    q, p = jax.lax.fori_loop(0, num_steps, body, (q, p))
    # correct trailing full kick to half
    p = p + 0.5 * eps * grad_U(q)

    q_out[:] = q
    p_out[:] = p


@functools.partial(
    jax.jit, static_argnames=("num_steps", "block_chains", "interpret")
)
def quadratic_leapfrog(
    q: Array,
    p: Array,
    A: Array,
    b: Array,
    step_size,
    num_steps: int,
    inv_mass: Array | None = None,
    block_chains: int = 256,
    interpret: bool = False,
) -> tuple[Array, Array]:
    """Fused leapfrog for grad U(q) = q A - b over a (C, D) chain batch.

    C is padded to a multiple of ``block_chains`` internally; D should be a
    multiple of 128 for peak MXU utilization (smaller D works, Mosaic pads).
    """
    C, D = q.shape
    if inv_mass is None:
        inv_mass = jnp.ones((D,), q.dtype)

    pad = (-C) % block_chains
    if pad:
        q = jnp.concatenate([q, jnp.zeros((pad, D), q.dtype)], axis=0)
        p = jnp.concatenate([p, jnp.zeros((pad, D), p.dtype)], axis=0)
    n_tiles = q.shape[0] // block_chains

    eps_arr = jnp.full((1, 1), step_size, q.dtype)
    b2 = b.reshape(1, D).astype(q.dtype)
    im2 = inv_mass.reshape(1, D).astype(q.dtype)

    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((block_chains, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_chains, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_chains, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_chains, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
    )
    q_new, p_new = pl.pallas_call(
        functools.partial(_leapfrog_kernel, num_steps=num_steps),
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(p.shape, p.dtype),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * q.shape[0] * D * D * (num_steps + 2),
            bytes_accessed=4 * (2 * q.shape[0] * D * 2 + D * D),
            transcendentals=0,
        ),
    )(eps_arr, q, p, A, b2, im2)
    if pad:
        q_new, p_new = q_new[:C], p_new[:C]
    return q_new, p_new
