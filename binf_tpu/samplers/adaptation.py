"""Warmup adaptation: dual-averaging step size + diagonal mass matrix.

Replaces the reference's naive multiplicative rule (x1.05 on accept / x0.95
on reject until ``timestep_adaption_limit``, ``binf/samplers/hmc.py:183-191``)
with the standard machinery (Hoffman & Gelman 2011, Stan warmup windows),
vectorized across chains:

* **Dual averaging** drives the CROSS-CHAIN MEAN acceptance probability to
  the target -- when the chain axis is sharded over a mesh, that mean is an
  ICI ``psum`` inserted by XLA (SURVEY.md section 2.3 "cross-chain adaptation").
* **Mass matrix**: per-step batched Welford update pooling every chain's
  position (Chan et al. parallel combine), so the estimate uses
  chains x steps samples.
* Adaptation state is an explicit pytree carried through ``lax.scan``;
  freezing after warmup is exact (the kernel is rebuilt with static
  adapted values), preserving detailed balance post-warmup.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from binf_tpu.ops.math import WelfordState, welford_init, welford_variance

Array = jax.Array

__all__ = [
    "DualAveragingState",
    "dual_averaging_init",
    "dual_averaging_update",
    "dual_averaging_step_size",
    "welford_batch_update",
    "WindowAdaptationResult",
    "window_adaptation",
    "find_reasonable_step_size",
]


# -- dual averaging ---------------------------------------------------------


class DualAveragingState(NamedTuple):
    log_step: Array
    log_step_avg: Array
    gradient_avg: Array
    count: Array
    mu: Array


def dual_averaging_init(initial_step_size: float | Array) -> DualAveragingState:
    """Initialize dual averaging.  ``initial_step_size`` may be a scalar
    (one pooled step size) or a ``(n_chains,)`` array (independent per-chain
    step sizes, cf. arXiv:2503.17405 section on per-chain adaptation); every
    state leaf takes its shape so the state pytree is scan-stable."""
    log_eps = jnp.log(jnp.asarray(initial_step_size, jnp.float32))
    zeros = jnp.zeros_like(log_eps)
    return DualAveragingState(
        log_step=log_eps,
        log_step_avg=zeros,
        gradient_avg=zeros,
        count=zeros,
        mu=jnp.log(10.0) + log_eps,
    )


def dual_averaging_update(
    state: DualAveragingState,
    acceptance_prob: Array,
    target: float = 0.8,
    t0: float = 10.0,
    gamma: float = 0.05,
    kappa: float = 0.75,
) -> DualAveragingState:
    """One Nesterov dual-averaging step on H = target - accept_prob."""
    count = state.count + 1.0
    w = 1.0 / (count + t0)
    grad_avg = (1.0 - w) * state.gradient_avg + w * (target - acceptance_prob)
    log_step = state.mu - jnp.sqrt(count) / gamma * grad_avg
    eta = count ** (-kappa)
    log_step_avg = eta * log_step + (1.0 - eta) * state.log_step_avg
    return DualAveragingState(log_step, log_step_avg, grad_avg, count, state.mu)


def dual_averaging_step_size(state: DualAveragingState, final: bool = False) -> Array:
    return jnp.exp(state.log_step_avg if final else state.log_step)


# -- batched Welford (cross-chain pooling) ----------------------------------


def welford_batch_update(state: WelfordState, batch) -> WelfordState:
    """Fold a CHAIN BATCH of positions (leading axis = chains) into the
    running moments via Chan's parallel-combine formula.

    Under a sharded chain axis the per-leaf means/M2s below become XLA
    collectives -- this is the "mass-matrix estimation via psum" path of
    SURVEY.md section 2.3.
    """
    n_b = jax.tree.leaves(batch)[0].shape[0]
    n_b = jnp.asarray(n_b, jnp.float32)
    n_a = state.count
    n = n_a + n_b

    batch_mean = jax.tree.map(lambda x: jnp.mean(x, axis=0), batch)
    batch_m2 = jax.tree.map(
        lambda x, m: jnp.sum((x - m) ** 2, axis=0), batch, batch_mean
    )
    delta = jax.tree.map(lambda bm, m: bm - m, batch_mean, state.mean)
    mean = jax.tree.map(lambda m, d: m + d * (n_b / n), state.mean, delta)
    m2 = jax.tree.map(
        lambda a, b, d: a + b + d * d * (n_a * n_b / n),
        state.m2,
        batch_m2,
        delta,
    )
    return WelfordState(count=n, mean=mean, m2=m2)


# -- reasonable initial step size -------------------------------------------


def find_reasonable_step_size(
    kernel_builder: Callable[[Array], Any],
    key: Array,
    state: Any,
    initial_step_size: float = 1.0,
    target_accept: float = 0.8,
    max_doublings: int = 20,
) -> Array:
    """Double/halve the step size until the acceptance probability crosses
    0.5 (Hoffman & Gelman 2011, Algorithm 4), with a fixed trial budget so
    the search is jit-compatible."""

    def try_eps(eps):
        kern = kernel_builder(eps)
        _, info = kern.step(key, state)
        return info.acceptance_prob

    eps0 = jnp.asarray(initial_step_size, jnp.float32)
    p0 = try_eps(eps0)
    direction = jnp.where(p0 > 0.5, 1.0, -1.0)

    def cond(carry):
        eps, p, i = carry
        crossed = jnp.where(direction > 0, p <= 0.5, p >= 0.5)
        return (~crossed) & (i < max_doublings)

    def body(carry):
        eps, _, i = carry
        eps = eps * jnp.where(direction > 0, 2.0, 0.5)
        return eps, try_eps(eps), i + 1

    eps, _, _ = jax.lax.while_loop(cond, body, (eps0, p0, jnp.zeros((), jnp.int32)))
    return eps


# -- window adaptation ------------------------------------------------------


class WindowAdaptationResult(NamedTuple):
    step_size: Array
    inverse_mass: Any
    final_states: Any  # chain batch of kernel states at end of warmup
    da_state: DualAveragingState


def _stan_boundaries(num_steps: int, initial_buffer=75, final_buffer=50, first_window=25):
    """Stan warmup partition: ``(initial_buffer, final_buffer, boundaries)``.

    ``boundaries`` are the steps where the mass estimate is harvested into
    the metric, the Welford accumulator is reset, and dual averaging is
    restarted at the current step size.  Expanding windows (25, 50, 100, ...)
    with the LAST window extended so its boundary lands exactly at
    ``num_steps - final_buffer`` -- the final buffer then re-adapts the step
    size under the final metric (Stan semantics; without this the returned
    step size would be dual-averaged under a stale metric)."""
    if num_steps < initial_buffer + final_buffer + first_window:
        initial_buffer = max(1, int(0.15 * num_steps))
        final_buffer = max(1, int(0.1 * num_steps))
    slow_end = num_steps - final_buffer
    boundaries = []
    pos, w = initial_buffer, first_window
    while pos < slow_end:
        end = pos + w
        if end + 2 * w > slow_end:  # too little room for the next window
            end = slow_end
        boundaries.append(min(end, slow_end))
        pos, w = end, w * 2
    return initial_buffer, final_buffer, tuple(boundaries)


def _stan_window_schedule(num_steps: int, initial_buffer=75, final_buffer=50, first_window=25):
    """Boolean masks per step: (inside a slow/mass window, window boundary)."""
    initial_buffer, final_buffer, boundaries = _stan_boundaries(
        num_steps, initial_buffer, final_buffer, first_window
    )
    slow = jnp.zeros(num_steps, dtype=bool)
    slow = slow.at[initial_buffer : num_steps - final_buffer].set(True)
    reset = jnp.zeros(num_steps, dtype=bool)
    for b in boundaries:
        if b < num_steps:
            reset = reset.at[b].set(True)
    return slow, reset


def window_adaptation(
    kernel_builder: Callable[[Array, Any], Any],
    initial_states: Any,
    key: Array,
    num_steps: int = 500,
    initial_step_size: float | None = 0.1,
    target_accept: float = 0.8,
    position_template: Any = None,
    per_chain: bool = False,
) -> WindowAdaptationResult:
    """Stan-style warmup over a CHAIN BATCH of states.

    ``kernel_builder(step_size, inverse_mass)`` must return a
    :class:`SamplerKernel` whose step info exposes ``acceptance_prob``;
    ``initial_states`` is a vmapped batch of kernel states (leading chain
    axis).  Runs one scan; per step:

      1. vmap the kernel step over chains,
      2. pool mean acceptance across chains -> dual-averaging update,
      3. fold all chain positions into the Welford mass estimator during
         slow windows.

    ``per_chain=True`` switches step-size adaptation from one pooled value
    to an INDEPENDENT dual-averaging state per chain driven by that chain's
    own acceptance probability (arXiv:2503.17405): ``step_size`` in the
    result is then a ``(n_chains,)`` array and the kernel step is vmapped
    over it.  The mass matrix stays cross-chain pooled either way (pooling
    positions is strictly more data; per-chain metrics would decouple the
    chains' stationary preconditioner for no benefit).

    ``initial_step_size=None`` seeds dual averaging with
    :func:`find_reasonable_step_size` (Hoffman & Gelman 2011 Algorithm 4,
    as Stan does): the doubling/halving search runs on chain 0's state
    before the windows start.

    Returns frozen ``(step_size, inverse_mass)`` and the warmed-up states.
    """
    if position_template is None:
        position_template = jax.tree.map(lambda x: x[0], initial_states.position)

    n_chains = jax.tree.leaves(initial_states.position)[0].shape[0]
    slow_mask, reset_mask = _stan_window_schedule(num_steps)

    if initial_step_size is None:
        key, k_find = jax.random.split(key)
        state0 = jax.tree.map(lambda x: x[0], initial_states)
        initial_step_size = find_reasonable_step_size(
            lambda eps: kernel_builder(eps, None), k_find, state0,
            target_accept=target_accept,
        )

    def make_step(step_size, inverse_mass):
        return kernel_builder(step_size, inverse_mass).step

    def body(carry, inputs):
        states, da, wf, inverse_mass = carry
        k, is_slow, is_reset = inputs
        keys = jax.random.split(k, n_chains)

        eps = jnp.exp(da.log_step)
        if per_chain:
            # step size enters as a vmapped argument: chain c integrates
            # with its own eps[c]
            step = lambda kk, s, e: make_step(e, inverse_mass)(kk, s)
            states, infos = jax.vmap(step)(keys, states, eps)
            accept_stat = infos.acceptance_prob  # (n_chains,)
        else:
            step = make_step(eps, inverse_mass)
            states, infos = jax.vmap(step)(keys, states)
            # cross-chain pooled acceptance -> one global step size
            accept_stat = jnp.mean(infos.acceptance_prob)
        da = dual_averaging_update(da, accept_stat, target=target_accept)

        # mass-matrix accumulation in slow windows
        wf_updated = welford_batch_update(wf, states.position)
        wf = jax.tree.map(
            lambda new, old: jnp.where(is_slow, new, old), wf_updated, wf
        )

        # at window boundaries: harvest variance into the metric, reset
        harvested = welford_variance(wf)
        inverse_mass = jax.tree.map(
            lambda h, old: jnp.where(is_reset, h, old), harvested, inverse_mass
        )
        fresh = welford_init(position_template)
        wf = jax.tree.map(lambda f, old: jnp.where(is_reset, f, old), fresh, wf)
        # restart dual averaging at each boundary with the current step size
        da = jax.tree.map(
            lambda fresh_da, cur: jnp.where(is_reset, fresh_da, cur),
            dual_averaging_init(jnp.exp(da.log_step)),
            da,
        )
        return (states, da, wf, inverse_mass), jnp.mean(infos.acceptance_prob)

    eps0 = jnp.asarray(initial_step_size, jnp.float32)
    if per_chain and eps0.ndim == 0:
        eps0 = jnp.full((n_chains,), eps0)
    da0 = dual_averaging_init(eps0)
    wf0 = welford_init(position_template)
    im0 = jax.tree.map(jnp.ones_like, position_template)

    keys = jax.random.split(key, num_steps)
    (states, da, wf, inverse_mass), _ = jax.lax.scan(
        body, (initial_states, da0, wf0, im0), (keys, slow_mask, reset_mask)
    )
    # The last window boundary sits exactly at num_steps - final_buffer
    # (_stan_boundaries), so the metric was harvested in-scan and the final
    # buffer re-adapted the step size under it -- no after-loop harvest.
    step_size = dual_averaging_step_size(da, final=True)
    return WindowAdaptationResult(step_size, inverse_mass, states, da)
