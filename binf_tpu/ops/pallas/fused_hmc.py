"""Whole-run fused HMC for Bayesian linear regression with unknown noise.

The profiling story (see benchmarks/): on the reference polynomial posterior
the XLA HMC path is LATENCY-bound -- each vmapped HMC sweep costs ~60-90 us
of tiny-kernel overhead regardless of FLOPs.  This kernel removes that
entirely: the FULL sampling run (hundreds of steps x thousands of chains)
executes inside one ``pallas_call`` -- state lives in VMEM scratch that
persists across the sequential TPU grid, momenta/acceptance randomness comes
from the on-core PRNG, and draws stream out block-by-block to HBM.

Model family (the reference's polynomial example and any basis-regression):

    y ~ N(V c, 1/lambda),  c_k ~ N(0, prior_var_k),  lambda ~ Gamma(a, b)

sampled in unconstrained space q = (c, t = log lambda):

    -log p(q) = e^t/2 ||Vc-y||^2 - (n/2 + a) t + b e^t + sum c^2/(2 prior_var)

Layout: states are (8, BC) tiles -- coordinates in sublanes (rows 0..d-1 = c,
row d = t), chains in lanes -- so every elementwise op is lane-parallel and
the two matmuls per gradient are (n,8)@(8,BC) and (8,n)@(n,BC).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

__all__ = ["fused_linreg_hmc_run", "linreg_unconstrained_logdensity"]



def linreg_unconstrained_logdensity(V, y, prior_var, gamma_shape, gamma_rate,
                                    prior_mean=None):
    """Reference XLA implementation of the same unconstrained log density
    (for warmup adaptation and cross-checking the kernel)."""
    n = y.shape[0]
    if prior_mean is None:
        prior_mean = jnp.zeros(V.shape[1])

    def logdensity(pos):
        c, t = pos["coefficients"], pos["precision"]
        lam = jnp.exp(t)
        r = V @ c - y
        return (
            -0.5 * lam * jnp.sum(r * r)
            + (0.5 * n + gamma_shape) * t
            - gamma_rate * lam
            - 0.5 * jnp.sum((c - prior_mean) ** 2 / prior_var)
        )

    return logdensity


from binf_tpu.ops.pallas.prng import _normal, _uniform  # noqa: E402,F401 -- shared in-kernel PRNG (one stream definition for all fused kernels)


def _kernel(
    seed_ref,  # (1,1) SMEM int32
    eps_ref,  # (1,1) SMEM f32
    q0_ref,  # (8, BC) VMEM: initial states for this chain tile
    vpad_ref,  # (n_pad, 8) VMEM: design matrix, col d.. zero, rows >= n zero
    y_ref,  # (n_pad, 1) VMEM
    ipv_ref,  # (8, 1) VMEM: 1/prior_var rows 0..d-1, 0 elsewhere
    pm_ref,  # (8, 1) VMEM: coefficient prior means (rows >= d zero)
    im_ref,  # (8, 1) VMEM: inverse mass diag (rows > d zero)
    mom_ref,  # (SB, 8, BC) VMEM: host momentum noise (host mode; (1,8,BC) dummy on tpu)
    unif_ref,  # (SB, 1, BC) VMEM: host accept uniforms (host mode)
    out_ref,  # (SB, 8, BC) VMEM -> HBM draws for this (tile, step block)
    acc_ref,  # (1, 1) SMEM: accepted-step counter (accumulated)
    q_scr,  # (8, BC) VMEM scratch, persists across step blocks
    *,
    steps_per_block: int,
    num_leapfrog: int,
    d: int,
    n_data: float,
    gamma_shape: float,
    gamma_rate: float,
    host_noise: bool,
):
    i = pl.program_id(0)  # chain tile
    j = pl.program_id(1)  # step block
    eps = eps_ref[0, 0]

    @pl.when(j == 0)
    def _():
        q_scr[:] = q0_ref[:]

    @pl.when((i == 0) & (j == 0))
    def _():
        acc_ref[0, 0] = jnp.zeros((), jnp.float32)

    if not host_noise:
        # Mosaic accepts at most 2 seed values: fold (tile, step-block) into one
        pltpu.prng_seed(seed_ref[0, 0], i * pl.num_programs(1) + j)

    Vp = vpad_ref[:]  # (n_pad, 8)
    yv = y_ref[:]  # (n_pad, 1)
    ipv = ipv_ref[:]  # (8, 1)
    pm = pm_ref[:]  # (8, 1)
    im = im_ref[:]  # (8, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    is_t_row = (row == d).astype(jnp.float32)  # (8,1)
    active = (row <= d).astype(jnp.float32)

    half_n_plus_a = 0.5 * n_data + gamma_shape

    def t_of(q):  # (1, BC)
        return jnp.sum(q * is_t_row, axis=0, keepdims=True)

    def potential_and_grad(q):
        resid = jnp.dot(Vp, q, preferred_element_type=jnp.float32) - yv  # (n_pad, BC)
        sumsq = jnp.sum(resid * resid, axis=0, keepdims=True)  # (1, BC)
        t = t_of(q)
        lam = jnp.exp(t)  # (1, BC)
        qc = q - pm
        U = (
            0.5 * lam * sumsq
            - half_n_plus_a * t
            + gamma_rate * lam
            + 0.5 * jnp.sum(qc * qc * ipv, axis=0, keepdims=True)
        )  # (1, BC)
        grad_c = lam * jnp.dot(
            Vp.T, resid, preferred_element_type=jnp.float32
        ) + qc * ipv  # (8, BC); t-row is zero so far
        du_dt = 0.5 * lam * sumsq - half_n_plus_a + gamma_rate * lam  # (1, BC)
        grad = grad_c * (1.0 - is_t_row) + is_t_row * du_dt
        return U, grad * active

    def hmc_step(_, carry):
        q = q_scr[:]
        if host_noise:
            z = mom_ref[carry]
        else:
            z = _normal(q.shape)
        p = z / jnp.sqrt(jnp.maximum(im, 1e-20)) * active  # (8, BC)

        U0, g = potential_and_grad(q)
        E0 = U0 + 0.5 * jnp.sum(p * p * im, axis=0, keepdims=True)

        # leapfrog: half kick, L x (drift, kick), retract half.  The carry
        # holds (q, p, U, grad) so a trajectory costs exactly
        # num_leapfrog + 1 potential evaluations (round 5: the earlier form
        # re-evaluated the endpoint twice -- L+3 evals, ~10% of sampling
        # wall at L=10)
        p = p - 0.5 * eps * g

        def leap(_, carry4):
            q, p, _, _ = carry4
            q = q + eps * p * im
            u_, g = potential_and_grad(q)
            p = p - eps * g
            return (q, p, u_, g)

        q_new, p, U1, g_end = jax.lax.fori_loop(
            0, num_leapfrog, leap, (q, p, U0, g)
        )
        p = p + 0.5 * eps * g_end
        E1 = U1 + 0.5 * jnp.sum(p * p * im, axis=0, keepdims=True)

        if host_noise:
            u = unif_ref[carry]
        else:
            u = _uniform(E0.shape)
        log_u = jnp.log(jnp.maximum(u, 1e-30))
        accept = log_u < (E0 - E1)  # (1, BC)
        q = jnp.where(accept, q_new, q)
        q_scr[:] = q
        out_ref[carry] = q
        acc_ref[0, 0] += jnp.mean(accept.astype(jnp.float32))
        return carry + 1

    jax.lax.fori_loop(0, steps_per_block, hmc_step, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_steps", "num_leapfrog", "d", "block_chains", "steps_per_block",
        "interpret", "gamma_shape", "gamma_rate", "host_noise",
    ),
)
def fused_linreg_hmc_run(
    q0: Array,  # (C, d+1): columns 0..d-1 coefficients, col d = log precision
    seed,
    V: Array,  # (n, d)
    y: Array,  # (n,)
    prior_var: Array,  # (d,)
    gamma_shape: float,
    gamma_rate: float,
    step_size,
    *,
    prior_mean: Array | None = None,
    inverse_mass: Array,  # (d+1,)
    num_steps: int,
    num_leapfrog: int = 10,
    d: int = 4,
    block_chains: int = 512,
    steps_per_block: int = 50,
    interpret: bool = False,
    host_noise: bool = False,
):
    """Run ``num_steps`` fused HMC sweeps; returns (draws, accept_rate).

    draws: (num_steps, C, d+1) in unconstrained space.

    ``host_noise=True`` pregenerates momentum/accept randomness with
    jax.random (keyed by ``seed``) and streams it into the kernel -- needed
    on CPU (the interpreter does not simulate the TPU PRNG) and for
    cross-platform determinism checks; on TPU the default uses the on-core
    PRNG and never touches HBM for noise.
    """
    C = q0.shape[0]
    n = y.shape[0]
    assert C % block_chains == 0 and num_steps % steps_per_block == 0
    n_pad = ((n + 7) // 8) * 8

    # pack inputs into lane-friendly layouts
    q0_t = jnp.zeros((8, C), jnp.float32).at[: d + 1, :].set(q0.T)
    vpad = jnp.zeros((n_pad, 8), jnp.float32).at[:n, :d].set(V)
    ypad = jnp.zeros((n_pad, 1), jnp.float32).at[:n, 0].set(y)
    ipv = jnp.zeros((8, 1), jnp.float32).at[:d, 0].set(1.0 / prior_var)
    if prior_mean is None:
        prior_mean = jnp.zeros((d,), jnp.float32)
    pm = jnp.zeros((8, 1), jnp.float32).at[:d, 0].set(prior_mean)
    im = jnp.zeros((8, 1), jnp.float32).at[: d + 1, 0].set(inverse_mass)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    eps_arr = jnp.asarray(step_size, jnp.float32).reshape(1, 1)

    if host_noise:
        kn = jax.random.key(jnp.asarray(seed, jnp.uint32))
        k1, k2 = jax.random.split(kn)
        mom = jax.random.normal(k1, (num_steps, 8, C), jnp.float32)
        unif = jax.random.uniform(k2, (num_steps, 1, C), jnp.float32)
    else:
        mom = jnp.zeros((steps_per_block, 8, C), jnp.float32)
        unif = jnp.zeros((steps_per_block, 1, C), jnp.float32)

    n_tiles = C // block_chains
    n_blocks = num_steps // steps_per_block

    kernel = functools.partial(
        _kernel,
        steps_per_block=steps_per_block,
        num_leapfrog=num_leapfrog,
        d=d,
        n_data=float(n),
        gamma_shape=float(gamma_shape),
        gamma_rate=float(gamma_rate),
        host_noise=host_noise,
    )
    if host_noise:
        noise_index = lambda i, j: (j, 0, i)
    else:
        noise_index = lambda i, j: (0, 0, i)

    draws, acc = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((num_steps, 8, C), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        grid_spec=pl.GridSpec(
            grid=(n_tiles, n_blocks),
            in_specs=[
                pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((8, block_chains), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_pad, 8), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_pad, 1), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((steps_per_block, 8, block_chains), noise_index,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((steps_per_block, 1, block_chains), noise_index,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec(
                    (steps_per_block, 8, block_chains),
                    lambda i, j: (j, 0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            ],
            scratch_shapes=[pltpu.VMEM((8, block_chains), jnp.float32)],
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
        compiler_params=None if interpret else pltpu.CompilerParams(
            # wide chain tiles (4096-16384 lanes) spill the 16MB default
            # scoped-VMEM budget; the chip has 128MB (see fused_potential)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n_pad * 8 * C * num_steps * (num_leapfrog + 3),
            bytes_accessed=4 * num_steps * 8 * C,
            transcendentals=4 * 8 * C * num_steps,
        ),
    )(seed_arr, eps_arr, q0_t, vpad, ypad, ipv, pm, im, mom, unif)

    accept_rate = acc[0, 0] / (num_steps * n_tiles)
    # (T, 8, C) -> (T, C, d+1)
    return jnp.transpose(draws[:, : d + 1, :], (0, 2, 1)), accept_rate
