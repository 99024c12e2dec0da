"""ChEES-HMC: cross-chain adaptive trajectory length.

Implements the ChEES criterion (Change in the Estimator of the Expected
Square; Hoffman, Radul & Sountsov 2021 -- the adaptation scheme PAPERS.md's
arXiv:2504.02627 builds on): trajectory length T is tuned by gradient ascent
on

    ChEES(T) = E[ ( ||q' - mu'||^2 - ||q - mu||^2 )^2 ] / 4,

whose per-chain surrogate gradient uses only quantities the transition
already computes (proposal, final momentum).  This is THE trajectory
adaptation designed for many-chain hardware: the expectation is a mean over
the (sharded) chain axis -- an ICI collective -- and all chains share one
(eps, T), so there is no per-chain control flow.

Components:

* :func:`leapfrog_dynamic` -- leapfrog with a TRACED number of steps
  (``lax.fori_loop``), so jittered trajectory lengths need no recompile;
* :func:`chees_adaptation` -- warmup driver over a chain batch: dual
  averaging on the step size (target 0.651 as in the paper), Adam ascent on
  log T with halton-jittered trajectories, batched Welford mass estimation;
* :func:`chees_hmc` -- post-warmup kernel with frozen (eps, T, metric) and
  halton jitter carried in the state.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from binf_tpu.ops.math import safe_exp
from binf_tpu.ops.tree import tree_axpy, tree_where
from binf_tpu.samplers.base import LogDensityFn, Position, SamplerKernel
from binf_tpu.samplers.adaptation import (
    dual_averaging_init,
    dual_averaging_step_size,
    dual_averaging_update,
    welford_batch_update,
)
from binf_tpu.ops.math import welford_init, welford_variance
from binf_tpu.samplers.hmc import (kinetic_energy, metric_velocity,
                                   sample_momentum)

Array = jax.Array

__all__ = ["leapfrog_dynamic", "chees_adaptation", "chees_hmc", "ChEESResult"]


def halton_sequence(n: int, base: int = 2) -> np.ndarray:
    """Van der Corput / Halton sequence in (0, 1) (host-side, static)."""
    out = np.zeros(n)
    for i in range(n):
        f, r, x = 1.0, 0.0, i + 1
        while x > 0:
            f /= base
            r += f * (x % base)
            x //= base
        out[i] = r
    return out


def leapfrog_dynamic(
    value_and_grad_fn, position, momentum, grad, step_size, num_steps, inverse_mass
):
    """Leapfrog with a traced step count; returns (q, p, ld, grad)."""

    velocity = lambda p: metric_velocity(p, inverse_mass)

    momentum = tree_axpy(0.5 * step_size, grad, momentum)

    def body(i, carry):
        q, p, _, g = carry
        q = tree_axpy(step_size, velocity(p), q)
        ld, g = value_and_grad_fn(q)
        p = tree_axpy(step_size, g, p)
        return (q, p, ld, g)

    q, p, ld, g = lax.fori_loop(
        0, num_steps, body, (position, momentum, jnp.zeros(()), grad)
    )
    p = tree_axpy(-0.5 * step_size, g, p)
    return q, p, ld, g


class _HMCOut(NamedTuple):
    position: Position
    logdensity: Array
    grad: Position
    proposal: Position
    final_velocity: Position
    accept_prob: Array
    accepted: Array


def _dynamic_hmc_step(value_and_grad_fn, inverse_mass):
    """One HMC transition with traced (eps, L); returns rich output for the
    ChEES gradient."""

    velocity = lambda p: metric_velocity(p, inverse_mass)

    def step(key, position, logdensity, grad, eps, n_steps):
        key_mom, key_acc = jax.random.split(key)
        p0 = sample_momentum(key_mom, position, inverse_mass)
        e0 = -logdensity + kinetic_energy(p0, inverse_mass)
        q, p, ld, g = leapfrog_dynamic(
            value_and_grad_fn, position, p0, grad, eps, n_steps, inverse_mass
        )
        e1 = -ld + kinetic_energy(p, inverse_mass)
        delta = jnp.where(jnp.isnan(e1 - e0), jnp.inf, e1 - e0)
        p_acc = jnp.minimum(1.0, safe_exp(-delta))
        accepted = jax.random.uniform(key_acc, ()) < p_acc
        new_q = tree_where(accepted, q, position)
        new_ld = jnp.where(accepted, ld, logdensity)
        new_g = tree_where(accepted, g, grad)
        return _HMCOut(new_q, new_ld, new_g, q, velocity(p), p_acc, accepted)

    return step


class ChEESResult(NamedTuple):
    step_size: Array
    trajectory_length: Array
    inverse_mass: Any
    final_positions: Position  # chain batch
    mean_accept: Array


def chees_adaptation(
    logdensity_fn: LogDensityFn,
    initial_positions: Position,  # chain batch
    key: Array,
    num_steps: int = 500,
    initial_step_size: float = 0.1,
    initial_trajectory_length: float | None = None,
    target_accept: float = 0.651,
    learning_rate: float = 0.025,
    max_leapfrog: int = 1000,
    adapt_mass: bool = True,
) -> ChEESResult:
    """Run ChEES warmup over a chain batch; all adaptation statistics are
    cross-chain means (collectives under a sharded chain axis)."""
    value_and_grad_fn = jax.value_and_grad(logdensity_fn)
    n_chains = jax.tree.leaves(initial_positions)[0].shape[0]
    halton = jnp.asarray(halton_sequence(num_steps), jnp.float32)

    if initial_trajectory_length is None:
        initial_trajectory_length = 10.0 * initial_step_size

    position_template = jax.tree.map(lambda x: x[0], initial_positions)

    ld0, g0 = jax.vmap(value_and_grad_fn)(initial_positions)

    # Adam state for log T
    adam0 = (jnp.zeros(()), jnp.zeros(()))

    def body(carry, inputs):
        (positions, lds, grads, da, log_T, adam, wf, inverse_mass, t) = carry
        k, h = inputs

        eps = jnp.exp(da.log_step)
        T = jnp.exp(log_T)
        L = jnp.clip(
            jnp.ceil(h * 2.0 * T / eps).astype(jnp.int32), 1, max_leapfrog
        )

        step = _dynamic_hmc_step(value_and_grad_fn, inverse_mass)
        keys = jax.random.split(k, n_chains)
        out = jax.vmap(lambda kk, q, ld, g: step(kk, q, ld, g, eps, L))(
            keys, positions, lds, grads
        )

        # -- dual averaging on pooled acceptance
        mean_acc = jnp.mean(out.accept_prob)
        da = dual_averaging_update(da, mean_acc, target=target_accept)

        # -- ChEES surrogate gradient (cross-chain means)
        mu_old = jax.tree.map(lambda x: jnp.mean(x, axis=0), positions)
        mu_new = jax.tree.map(lambda x: jnp.mean(x, axis=0), out.proposal)
        qc_old = jax.tree.map(lambda x, m: x - m[None], positions, mu_old)
        qc_new = jax.tree.map(lambda x, m: x - m[None], out.proposal, mu_new)

        def batch_dot(a, b):  # per-chain <a, b> over all non-chain axes
            leaves = jax.tree.leaves(
                jax.tree.map(
                    lambda x, y: jnp.sum((x * y).reshape(n_chains, -1), axis=1),
                    a, b,
                )
            )
            return sum(leaves)

        sq_old = batch_dot(qc_old, qc_old)
        sq_new = batch_dot(qc_new, qc_new)
        dots = batch_dot(qc_new, out.final_velocity)

        per_chain = out.accept_prob * (sq_new - sq_old) * dots * h
        # divergent proposals give inf * 0 = nan -- drop them from the mean
        per_chain = jnp.where(jnp.isfinite(per_chain), per_chain, 0.0)
        g_T = jnp.sum(per_chain) / jnp.maximum(jnp.sum(out.accept_prob), 1e-6)
        # normalize scale so the learning rate is problem-independent
        g_T = g_T / (jnp.abs(g_T) + 1e-10) * jnp.tanh(jnp.abs(g_T))
        g_T = jnp.where(jnp.isfinite(g_T), g_T, 0.0)

        # Adam ascent on log T
        m, v = adam
        m = 0.9 * m + 0.1 * g_T
        v = 0.999 * v + 0.001 * g_T**2
        mhat = m / (1.0 - 0.9 ** (t + 1.0))
        vhat = v / (1.0 - 0.999 ** (t + 1.0))
        log_T = log_T + learning_rate * mhat / (jnp.sqrt(vhat) + 1e-8)
        # keep T within [eps, max_leapfrog * eps]
        log_T = jnp.clip(
            log_T, jnp.log(eps), jnp.log(eps * max_leapfrog)
        )

        # -- mass adaptation
        wf = welford_batch_update(wf, out.position)

        return (
            (out.position, out.logdensity, out.grad, da, log_T, (m, v), wf,
             inverse_mass, t + 1.0),
            mean_acc,
        )

    da0 = dual_averaging_init(initial_step_size)
    wf0 = welford_init(position_template)
    im0 = None

    # Phase 1: first half with identity metric
    n1 = num_steps // 2
    keys = jax.random.split(key, num_steps)
    carry = (
        initial_positions, ld0, g0, da0,
        jnp.log(jnp.asarray(initial_trajectory_length)), adam0, wf0, im0,
        jnp.zeros(()),
    )
    carry, _ = lax.scan(body, carry, (keys[:n1], halton[:n1]))

    # Phase 2: freeze harvested metric, re-init moments, continue
    (positions, lds, grads, da, log_T, adam, wf, _, t) = carry
    if adapt_mass:
        inverse_mass = welford_variance(wf)
    else:
        inverse_mass = None
    carry = (
        positions, lds, grads,
        dual_averaging_init(jnp.exp(da.log_step)),
        log_T, adam, welford_init(position_template), inverse_mass, t,
    )
    carry, accs = lax.scan(body, carry, (keys[n1:], halton[n1:]))
    (positions, lds, grads, da, log_T, adam, wf, inverse_mass, t) = carry

    return ChEESResult(
        step_size=dual_averaging_step_size(da, final=True),
        trajectory_length=jnp.exp(log_T),
        inverse_mass=inverse_mass,
        final_positions=positions,
        mean_accept=jnp.mean(accs[-50:]),
    )


class ChEESHMCState(NamedTuple):
    position: Position
    logdensity: Array
    logdensity_grad: Position
    counter: Array


class ChEESHMCInfo(NamedTuple):
    accepted: Array
    acceptance_prob: Array
    num_integration_steps: Array


def chees_hmc(
    logdensity_fn: LogDensityFn,
    step_size: float | Array,
    trajectory_length: float | Array,
    inverse_mass: Any = None,
    max_leapfrog: int = 1000,
    halton_length: int = 256,
) -> SamplerKernel:
    """Frozen-parameter ChEES-HMC kernel: halton-jittered trajectory of mean
    length ``trajectory_length`` (uniform in (0, 2T))."""
    value_and_grad_fn = jax.value_and_grad(logdensity_fn)
    halton = jnp.asarray(halton_sequence(halton_length), jnp.float32)
    step_fn = _dynamic_hmc_step(value_and_grad_fn, inverse_mass)

    def init(position: Position) -> ChEESHMCState:
        ld, g = value_and_grad_fn(position)
        return ChEESHMCState(position, ld, g, jnp.zeros((), jnp.int32))

    def step(key: Array, state: ChEESHMCState):
        eps = jnp.asarray(step_size)
        T = jnp.asarray(trajectory_length)
        h = halton[state.counter % halton_length]
        L = jnp.clip(jnp.ceil(h * 2.0 * T / eps).astype(jnp.int32), 1, max_leapfrog)
        out = step_fn(key, state.position, state.logdensity,
                      state.logdensity_grad, eps, L)
        new_state = ChEESHMCState(
            out.position, out.logdensity, out.grad, state.counter + 1
        )
        return new_state, ChEESHMCInfo(out.accepted, out.accept_prob, L)

    return SamplerKernel(init=init, step=step)
