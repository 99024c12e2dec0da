"""Hamiltonian Monte Carlo with a scan-compiled leapfrog integrator.

TPU-native redesign of the reference's ``HMCSampler``
(``binf/samplers/hmc.py:12-191``):

* leapfrog (half-kick, L-1 x (drift + kick), drift, half-kick; reference
  ``:92-125``) runs as one ``lax.scan`` with a fused velocity-Verlet body
  (kick+drift per iteration, final half-kick correction) -- 1 gradient
  evaluation per step, all on-device;
* works on arbitrary position pytrees with a diagonal (pytree) or dense
  inverse mass matrix -- the reference supports a single named variable only
  (``hmc.py:20-24``);
* divergence detection (|dH| > threshold) replaces silent overflow;
* the naive x1.05 / x0.95 step-size adaptation (reference ``:183-191``) is
  superseded by dual averaging in ``binf_tpu.samplers.adaptation``.

The fused single-kernel leapfrog for quadratic potentials lives in
``binf_tpu.ops.pallas.leapfrog``; this module is the general-model path.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from binf_tpu.ops.math import safe_exp
from binf_tpu.ops.tree import tree_axpy, tree_dot, tree_normal_like, tree_where
from binf_tpu.samplers.base import LogDensityFn, Position, SamplerKernel

Array = jax.Array

__all__ = [
    "HMCState", "HMCInfo", "hmc", "leapfrog", "sample_momentum",
    "kinetic_energy", "metric_velocity", "DenseMetric",
]

DIVERGENCE_THRESHOLD = 1000.0


class HMCState(NamedTuple):
    position: Position
    logdensity: Array
    logdensity_grad: Position


class HMCInfo(NamedTuple):
    """Vectorized analogue of ``HMCSampleStats(accepted, stepsize)``
    (reference ``binf/samplers/hmc.py:12``), plus divergence tracking."""

    accepted: Array
    acceptance_prob: Array
    energy_error: Array
    is_divergent: Array
    proposal_logdensity: Array


class DenseMetric:
    """Full (D, D) inverse mass matrix over a position-dict template.

    Wraps the matrix with the pack/unpack closures that map position
    pytrees to the flat sorted-name order (``samplers.dense.flatten_spec``),
    so the SAME ``inverse_mass`` argument of :func:`hmc`,
    :func:`~binf_tpu.samplers.nuts.nuts`, and
    :func:`~binf_tpu.samplers.chees.chees_hmc` accepts either a diagonal
    pytree or a dense metric.  All metric operations are (D, D) matmuls
    (MXU): momentum sampling ``p = W z`` with ``W W^T = M``, velocity
    ``M^{-1} p``, and the quadratic kinetic form.  Build the matrix with
    ``samplers.dense.dense_window_adaptation``.
    """

    def __init__(self, matrix: Array, template: Position):
        from binf_tpu.samplers.dense import _metric_ops, flatten_spec

        self.pack, self.unpack, self.dim = flatten_spec(template)
        self.matrix = jnp.asarray(matrix, jnp.float32)
        self.sampling_factor = _metric_ops(self.matrix)  # W: W W^T = M

    def velocity(self, momentum: Position) -> Position:
        return self.unpack(self.matrix @ self.pack(momentum))

    def kinetic(self, momentum: Position) -> Array:
        p = self.pack(momentum)
        return 0.5 * p @ (self.matrix @ p)

    def sample(self, key: Array) -> Position:
        z = jax.random.normal(key, (self.dim,), jnp.float32)
        return self.unpack(self.sampling_factor @ z)


def sample_momentum(key: Array, position: Position, inverse_mass: Any) -> Position:
    """p ~ N(0, M) with M given by its inverse (pytree diagonal, or a
    :class:`DenseMetric`)."""
    if isinstance(inverse_mass, DenseMetric):
        return inverse_mass.sample(key)
    eps = tree_normal_like(key, position)
    if inverse_mass is None:
        return eps
    return jax.tree.map(lambda e, mi: e / jnp.sqrt(mi), eps, inverse_mass)


def kinetic_energy(momentum: Position, inverse_mass: Any) -> Array:
    """0.5 p^T M^{-1} p (diagonal pytree or :class:`DenseMetric`)."""
    if isinstance(inverse_mass, DenseMetric):
        return inverse_mass.kinetic(momentum)
    if inverse_mass is None:
        return 0.5 * tree_dot(momentum, momentum)
    weighted = jax.tree.map(lambda p, mi: p * mi, momentum, inverse_mass)
    return 0.5 * tree_dot(momentum, weighted)


def metric_velocity(momentum: Position, inverse_mass: Any) -> Position:
    """dq/dt = M^{-1} p (diagonal pytree or :class:`DenseMetric`)."""
    if isinstance(inverse_mass, DenseMetric):
        return inverse_mass.velocity(momentum)
    if inverse_mass is None:
        return momentum
    return jax.tree.map(lambda pi, mi: pi * mi, momentum, inverse_mass)


def leapfrog(
    value_and_grad_fn: Callable[[Position], tuple[Array, Position]],
    position: Position,
    momentum: Position,
    grad: Position,
    step_size: Array,
    num_steps: int,
    inverse_mass: Any,
):
    """Velocity-Verlet integration of Hamiltonian dynamics.

    Same trajectory as the reference's ``_leapfrog``
    (``binf/samplers/hmc.py:92-125``) but expressed as half-kick +
    scan(num_steps x [drift, kick]) with the last kick halved -- one gradient
    per iteration, compiled once for any ``num_steps``.
    Returns (position, momentum, logdensity, grad) at trajectory end.
    """

    velocity = lambda p: metric_velocity(p, inverse_mass)

    # initial half kick: p += eps/2 * grad(logdensity)
    momentum = tree_axpy(0.5 * step_size, grad, momentum)

    def body(carry, _):
        q, p, _, g = carry
        q = tree_axpy(step_size, velocity(p), q)  # drift
        ld, g = value_and_grad_fn(q)
        p = tree_axpy(step_size, g, p)  # full kick (last one corrected below)
        return (q, p, ld, g), None

    ld0 = jnp.zeros(())  # placeholder; overwritten on first iteration
    (position, momentum, logdensity, grad), _ = jax.lax.scan(
        body, (position, momentum, ld0, grad), None, length=num_steps
    )
    # correct the trailing full kick down to a half kick
    momentum = tree_axpy(-0.5 * step_size, grad, momentum)
    return position, momentum, logdensity, grad


def hmc(
    logdensity_fn: LogDensityFn,
    step_size: float | Array = 0.1,
    num_integration_steps: int = 10,
    inverse_mass: Any = None,
    divergence_threshold: float = DIVERGENCE_THRESHOLD,
    jitter: float = 0.0,
) -> SamplerKernel:
    """Build an HMC kernel.

    ``inverse_mass``: None (identity) or a pytree matching the position with
    per-component inverse masses (diagonal metric).
    ``jitter``: per-step uniform step-size perturbation eps * U[1-j, 1+j]
    (breaks trajectory-length resonances; 0 disables).
    """
    value_and_grad_fn = jax.value_and_grad(logdensity_fn)

    def init(position: Position) -> HMCState:
        ld, grad = value_and_grad_fn(position)
        return HMCState(position, ld, grad)

    def step(key: Array, state: HMCState) -> tuple[HMCState, HMCInfo]:
        key_mom, key_accept, key_eps = jax.random.split(key, 3)
        p0 = sample_momentum(key_mom, state.position, inverse_mass)

        eps = jnp.asarray(step_size)
        if jitter > 0:
            eps = eps * (1.0 + jitter * (2.0 * jax.random.uniform(key_eps, ()) - 1.0))

        energy_before = -state.logdensity + kinetic_energy(p0, inverse_mass)
        q, p, ld, grad = leapfrog(
            value_and_grad_fn,
            state.position,
            p0,
            state.logdensity_grad,
            eps,
            num_integration_steps,
            inverse_mass,
        )
        energy_after = -ld + kinetic_energy(p, inverse_mass)

        delta = energy_after - energy_before
        delta = jnp.where(jnp.isnan(delta), jnp.inf, delta)
        is_divergent = jnp.abs(delta) > divergence_threshold

        p_accept = jnp.minimum(1.0, safe_exp(-delta))
        u = jax.random.uniform(key_accept, ())
        accepted = u < p_accept

        new_state = HMCState(
            tree_where(accepted, q, state.position),
            jnp.where(accepted, ld, state.logdensity),
            tree_where(accepted, grad, state.logdensity_grad),
        )
        info = HMCInfo(accepted, p_accept, delta, is_divergent, ld)
        return new_state, info

    return SamplerKernel(init=init, step=step)
