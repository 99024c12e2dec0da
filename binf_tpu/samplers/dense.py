"""Dense-metric HMC: full-covariance mass matrix, adapted Stan-style.

The diagonal metric (``samplers.adaptation.window_adaptation``) cannot
precondition CORRELATED posteriors -- e.g. the reference's polynomial
workload, whose Vandermonde design couples the coefficients
(``binf/example/likelihood.py:28-30``; the reference itself has no metric
at all, ``binf/samplers/hmc.py:146`` samples identity momenta).  This
module supplies the dense counterpart, designed MXU-first:

* positions are flattened to one ``(D,)`` vector per chain (sorted-name
  pack order, same convention as the fused kernels), so every metric
  operation is a dense matrix product;
* momentum sampling ``p = W z`` and velocity ``v = M^{-1} p`` are (D, D)
  matmuls (W is precomputed from the Cholesky factor of the metric --
  no per-step triangular solves, which lower poorly on TPU);
* warmup reuses the Stan window schedule + pooled dual averaging from
  ``samplers.adaptation`` and accumulates the full covariance with a
  batched Chan/Welford update whose inner product ``(Q-mu)^T (Q-mu)`` is
  itself an MXU matmul over the chain batch.

API mirrors the diagonal path: :func:`dense_hmc` builds a
``SamplerKernel`` over position DICTS (interoperable with
``parallel.runner.run_chains``); :func:`dense_window_adaptation` returns
``(step_size, inverse_mass_matrix, warmed positions)``.
"""

from __future__ import annotations

import math
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from binf_tpu.ops.math import safe_exp
from binf_tpu.samplers.adaptation import (
    dual_averaging_init,
    dual_averaging_step_size,
    dual_averaging_update,
    _stan_window_schedule,
)
from binf_tpu.samplers.base import LogDensityFn, SamplerKernel
from binf_tpu.samplers.hmc import DIVERGENCE_THRESHOLD, HMCInfo

Array = jax.Array

__all__ = [
    "flatten_spec",
    "DenseHMCState",
    "dense_hmc",
    "DenseAdaptationResult",
    "dense_window_adaptation",
]


def flatten_spec(template: dict):
    """(pack, unpack) closures for a position dict template.

    Sorted-name order, matching the fused kernels' pack convention
    (``ops.pallas.fused_potential.pack_template``).  ``pack`` maps a
    position dict (with or without leading batch axes) to ``(..., D)``;
    ``unpack`` inverts it.
    """
    names = sorted(template)
    shapes = [tuple(jnp.shape(template[n])) for n in names]
    sizes = [math.prod(s) if s else 1 for s in shapes]  # static python ints

    def pack(position: dict) -> Array:
        cols = []
        for n, s, size in zip(names, shapes, sizes):
            x = jnp.asarray(position[n])
            lead = x.shape[: x.ndim - len(s)]
            cols.append(x.reshape(lead + (size,)))
        return jnp.concatenate(cols, axis=-1)

    def unpack(q: Array) -> dict:
        out = {}
        off = 0
        for n, s, size in zip(names, shapes, sizes):
            out[n] = q[..., off : off + size].reshape(q.shape[:-1] + s)
            off += size
        return out

    return pack, unpack, sum(sizes)


def _metric_ops(inverse_mass_matrix: Array):
    """Precompute the momentum-sampling matrix W with W W^T = M (= the
    inverse of ``inverse_mass_matrix``).  With Minv = C C^T (C lower
    Cholesky), M = C^{-T} C^{-1}, so W = C^{-T}: p = W z has covariance M.
    Returned as a dense matrix so sampling is one matmul."""
    C = jnp.linalg.cholesky(inverse_mass_matrix)
    eye = jnp.eye(inverse_mass_matrix.shape[0], dtype=inverse_mass_matrix.dtype)
    W = jax.scipy.linalg.solve_triangular(C.T, eye, lower=False)
    return W


class DenseHMCState(NamedTuple):
    position: dict  # interop with run_chains collectors
    logdensity: Array
    logdensity_grad: Array  # flat (D,)


def dense_hmc(
    logdensity_fn: LogDensityFn,
    template: dict,
    step_size: float | Array = 0.1,
    num_integration_steps: int = 10,
    inverse_mass_matrix: Array | None = None,
    divergence_threshold: float = DIVERGENCE_THRESHOLD,
) -> SamplerKernel:
    """HMC kernel with a dense (D, D) inverse mass matrix.

    ``logdensity_fn`` takes a position DICT; ``template`` (an UNBATCHED
    position dict, e.g. ``jax.tree.map(lambda x: x[0], positions)``)
    fixes the flattening order.  ``inverse_mass_matrix=None`` means
    identity (useful to seed adaptation)."""
    pack, unpack, dim = flatten_spec(template)
    minv = jnp.eye(dim) if inverse_mass_matrix is None else (
        jnp.asarray(inverse_mass_matrix)
    )
    W = _metric_ops(minv)

    def flat_value_and_grad(q):
        return jax.value_and_grad(lambda qv: logdensity_fn(unpack(qv)))(q)

    def init(position: dict) -> DenseHMCState:
        q = pack(position)
        ld, g = flat_value_and_grad(q)
        return DenseHMCState(position, ld, g)

    def step(key: Array, state: DenseHMCState):
        q = pack(state.position)
        k_mom, k_acc = jax.random.split(key)
        z = jax.random.normal(k_mom, (dim,), q.dtype)
        p0 = W @ z  # N(0, M)

        eps = jnp.asarray(step_size, q.dtype)
        kinetic = lambda p: 0.5 * p @ (minv @ p)

        # velocity-Verlet in flat space; velocity = Minv p is a matvec
        g = state.logdensity_grad
        p = p0 + 0.5 * eps * g

        def body(carry, _):
            q, p, _, _ = carry
            q = q + eps * (minv @ p)
            ld, g = flat_value_and_grad(q)
            p = p + eps * g
            return (q, p, ld, g), None

        (qn, pn, ld, gn), _ = jax.lax.scan(
            body, (q, p, state.logdensity, g), None,
            length=num_integration_steps,
        )
        pn = pn - 0.5 * eps * gn

        energy_before = -state.logdensity + kinetic(p0)
        energy_after = -ld + kinetic(pn)
        delta = energy_after - energy_before
        delta = jnp.where(jnp.isnan(delta), jnp.inf, delta)
        is_divergent = jnp.abs(delta) > divergence_threshold

        p_accept = jnp.minimum(1.0, safe_exp(-delta))
        # divergent transitions are rejected outright (see the adaptation's
        # note on f32 cancellation producing spuriously-good energies)
        p_accept = jnp.where(is_divergent, 0.0, p_accept)
        accepted = jax.random.uniform(k_acc, ()) < p_accept

        q_new = jnp.where(accepted, qn, q)
        new_state = DenseHMCState(
            unpack(q_new),
            jnp.where(accepted, ld, state.logdensity),
            jnp.where(accepted, gn, state.logdensity_grad),
        )
        info = HMCInfo(accepted, p_accept, delta, is_divergent, ld)
        return new_state, info

    return SamplerKernel(init=init, step=step)


# -- dense warmup -----------------------------------------------------------


class DenseAdaptationResult(NamedTuple):
    step_size: Array
    inverse_mass_matrix: Array  # (D, D) regularized covariance estimate
    final_positions: dict  # chain-batched warmed positions
    accept_rate: Array


def _batch_cov_update(n, mean, m2, Q):
    """Chan combine of a full (C, D) batch into a dense Welford state.

    The batch scatter matrix is one (D, C) @ (C, D) MXU matmul."""
    c = jnp.float32(Q.shape[0])
    b_mean = jnp.mean(Q, axis=0)
    dev = Q - b_mean[None, :]
    b_m2 = dev.T @ dev
    delta = b_mean - mean
    tot = n + c
    mean_new = mean + delta * (c / tot)
    m2_new = m2 + b_m2 + jnp.outer(delta, delta) * (n * c / tot)
    return tot, mean_new, m2_new


def _harvest_cov(n, m2, shrink_to=1e-3):
    """Regularized covariance (Stan-style shrinkage toward a small
    diagonal), plus a PD jitter."""
    d = m2.shape[0]
    cov = m2 / jnp.maximum(n - 1.0, 1.0)
    w = n / (n + 5.0)
    reg = w * cov + (1.0 - w) * shrink_to * jnp.eye(d)
    return reg + 1e-8 * jnp.eye(d)


def dense_window_adaptation(
    logdensity_fn: LogDensityFn,
    initial_positions: dict,
    key: Array,
    num_steps: int = 500,
    num_integration_steps: int = 10,
    initial_step_size: float = 0.1,
    target_accept: float = 0.8,
) -> DenseAdaptationResult:
    """Stan-window warmup estimating a FULL covariance metric.

    Same schedule and pooled dual averaging as the diagonal
    ``window_adaptation``; the mass accumulator is the dense scatter
    matrix over (chains x slow-window steps) samples, harvested (with
    shrinkage) at each window boundary, where dual averaging restarts so
    the final buffer re-adapts the step size under the final metric.
    """
    template = jax.tree.map(lambda x: x[0], initial_positions)
    pack, unpack, d = flatten_spec(template)
    Q0 = pack(initial_positions)  # (C, D)
    n_chains = Q0.shape[0]
    slow_mask, reset_mask = _stan_window_schedule(num_steps)

    def flat_value_and_grad(q):
        return jax.value_and_grad(lambda qv: logdensity_fn(unpack(qv)))(q)

    ld0, g0 = jax.vmap(flat_value_and_grad)(Q0)

    def body(carry, inputs):
        Q, ld, g, da, wf_n, wf_mean, wf_m2, minv, W = carry
        k, is_slow, is_reset = inputs

        eps = jnp.exp(da.log_step)
        k_mom, k_acc = jax.random.split(k)
        Z = jax.random.normal(k_mom, Q.shape, Q.dtype)
        P0 = Z @ W.T  # (C, D) momenta with covariance M per chain

        kinetic = lambda P: 0.5 * jnp.sum((P @ minv) * P, axis=1)

        Pk = P0 + 0.5 * eps * g

        def leap(carry2, _):
            Qc, Pc, _, _ = carry2
            Qc = Qc + eps * (Pc @ minv)
            ldc, gc = jax.vmap(flat_value_and_grad)(Qc)
            Pc = Pc + eps * gc
            return (Qc, Pc, ldc, gc), None

        # unrolled: a scan here nests inside the outer warmup scan, and XLA
        # schedules scan-in-scan poorly (same pathology as the statespace
        # family) -- unrolling lets the leapfrog fuse into the step body
        (Qn, Pn, ldn, gn), _ = jax.lax.scan(
            leap, (Q, Pk, ld, g), None, length=num_integration_steps,
            unroll=True,
        )
        Pn = Pn - 0.5 * eps * gn

        delta = (-ldn + kinetic(Pn)) - (-ld + kinetic(P0))
        # divergence guard (Stan semantics): reject NaN and |dH| > threshold.
        # Without the magnitude check, f32 overflow in a model's density at
        # garbage positions can CANCEL into a huge spuriously-good value
        # (observed: q ~ 1e19 accepted with delta ~ -9e37 during an eps
        # spike after a dual-averaging restart), poisoning the covariance.
        bad = jnp.isnan(delta) | (jnp.abs(delta) > DIVERGENCE_THRESHOLD)
        delta = jnp.where(bad, jnp.inf, delta)
        p_accept = jnp.minimum(1.0, safe_exp(-delta))
        p_accept = jnp.where(bad, 0.0, p_accept)
        accepted = jax.random.uniform(k_acc, (n_chains,)) < p_accept

        Q = jnp.where(accepted[:, None], Qn, Q)
        ld = jnp.where(accepted, ldn, ld)
        g = jnp.where(accepted[:, None], gn, g)

        da = dual_averaging_update(da, jnp.mean(p_accept), target=target_accept)

        # dense scatter accumulation in slow windows
        n_u, mean_u, m2_u = _batch_cov_update(wf_n, wf_mean, wf_m2, Q)
        wf_n = jnp.where(is_slow, n_u, wf_n)
        wf_mean = jnp.where(is_slow, mean_u, wf_mean)
        wf_m2 = jnp.where(is_slow, m2_u, wf_m2)

        # boundary: harvest the metric, refresh W, reset accumulator + DA.
        # Under lax.cond so the O(D^3) Cholesky + triangular solve run only
        # on the handful of window-boundary steps, not every scan step.
        def _refresh_metric():
            harvested = _harvest_cov(wf_n, wf_m2)
            return harvested, _metric_ops(harvested)

        minv, W = jax.lax.cond(is_reset, _refresh_metric, lambda: (minv, W))
        wf_n = jnp.where(is_reset, 0.0, wf_n)
        wf_mean = jnp.where(is_reset, jnp.zeros(d), wf_mean)
        wf_m2 = jnp.where(is_reset, jnp.zeros((d, d)), wf_m2)
        da = jax.tree.map(
            lambda fresh, cur: jnp.where(is_reset, fresh, cur),
            dual_averaging_init(jnp.exp(da.log_step)),
            da,
        )
        return (Q, ld, g, da, wf_n, wf_mean, wf_m2, minv, W), jnp.mean(p_accept)

    da0 = dual_averaging_init(jnp.asarray(initial_step_size, jnp.float32))
    carry0 = (
        Q0, ld0, g0, da0,
        jnp.zeros(()), jnp.zeros(d), jnp.zeros((d, d)),
        jnp.eye(d), jnp.eye(d),
    )
    keys = jax.random.split(key, num_steps)
    (Q, ld, g, da, _, _, _, minv, W), accs = jax.lax.scan(
        body, carry0, (keys, slow_mask, reset_mask)
    )
    step_size = dual_averaging_step_size(da, final=True)
    return DenseAdaptationResult(
        step_size=step_size,
        inverse_mass_matrix=minv,
        final_positions=unpack(Q),
        accept_rate=jnp.mean(accs[-50:]),
    )
