"""Slice sampling kernels: elliptical slice sampling and random-direction
(hit-and-run) slice sampling.

Gradient-free kernels the reference's Gibbs stack would host as subsamplers
(the ``RWMCSampler`` slot, ``binf/example/samplers.py:54-92``) but never
provided.  Both are rejection-free -- every step moves -- and tuning-free up
to an initial bracket width, which makes them the robust default for blocks
whose conditional is awkward for HMC (bounded support, non-smooth).

TPU design notes:

* The shrinkage loops are ``lax.while_loop``s with a hard iteration cap --
  fixed trip-count bounds keep the compiled program free of dynamic shapes,
  and under ``vmap`` XLA masks converged lanes, so a chain batch costs the
  SLOWEST chain's iterations, not the sum.
* Elliptical slice sampling (Murray, Adams & MacKay 2010, arXiv:1001.0175)
  is exact for targets  N(position | mean, Sigma) * exp(loglik)  and needs
  only LIKELIHOOD evaluations -- the Gaussian prior is sampled analytically
  on the ellipse, which vectorizes into two elementwise fmas per proposal.
* The random-direction slice sampler (Neal 2003, Annals of Statistics) does
  a stepping-out + shrinkage line search along a random unit direction, so
  one step costs O(evals) full log-density calls independent of dimension;
  all evaluations are batched across chains by ``vmap``.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from binf_tpu.ops.tree import (
    tree_axpy,
    tree_dot,
    tree_normal_like,
    tree_scale,
)
from binf_tpu.samplers.base import LogDensityFn, Position, SamplerKernel

Array = jax.Array

__all__ = [
    "EllipticalSliceState",
    "EllipticalSliceInfo",
    "elliptical_slice",
    "SliceState",
    "SliceInfo",
    "slice_sampler",
]

_TWO_PI = 2.0 * jnp.pi


class EllipticalSliceState(NamedTuple):
    position: Position
    loglikelihood: Array


class EllipticalSliceInfo(NamedTuple):
    """Per-step stats (the ``last_draw_stats`` analogue,
    ``binf/samplers/hmc.py:166-181``): shrinkage iterations used and the
    accepted ellipse angle."""

    num_shrinks: Array
    theta: Array


def elliptical_slice(
    loglikelihood_fn: LogDensityFn,
    prior_mean: Position,
    prior_scale: Any,
    max_shrink: int = 32,
) -> SamplerKernel:
    """Build an elliptical slice sampling kernel for a Gaussian-prior target

        p(x) ∝ N(x | prior_mean, diag(prior_scale^2)) * exp(loglikelihood(x)).

    ``prior_mean`` / ``prior_scale`` are pytrees matching the position
    (scalars broadcast per leaf); a full-covariance prior can be handled by
    whitening the position upstream (``pdf.transforms``).  The stationary
    distribution is exact for any ``max_shrink`` large enough that the
    bracket never collapses spuriously (32 covers ~1e-9 bracket width).
    """

    def init(position: Position) -> EllipticalSliceState:
        return EllipticalSliceState(position, loglikelihood_fn(position))

    def step(key: Array, state: EllipticalSliceState):
        k_nu, k_height, k_theta, k_loop = jax.random.split(key, 4)

        # ellipse auxiliary draw nu ~ N(0, Sigma)
        eps = tree_normal_like(k_nu, state.position)
        nu = jax.tree.map(lambda e, s: e * s, eps, prior_scale)
        centered = jax.tree.map(jnp.subtract, state.position, prior_mean)

        log_y = state.loglikelihood + jnp.log(
            jax.random.uniform(k_height, (), minval=1e-38)
        )

        theta0 = jax.random.uniform(k_theta, (), minval=0.0, maxval=_TWO_PI)

        def point_on_ellipse(theta):
            c, s = jnp.cos(theta), jnp.sin(theta)
            return jax.tree.map(
                lambda x0, n, m: x0 * c + n * s + m, centered, nu, prior_mean
            )

        def cond(carry):
            _theta, _lo, _hi, ll, _k, i, done = carry
            return (~done) & (i < max_shrink)

        def body(carry):
            theta, lo, hi, _ll, k, i, _done = carry
            pos = point_on_ellipse(theta)
            ll = loglikelihood_fn(pos)
            done = ll > log_y
            # shrink the bracket toward theta0 = 0 (Murray et al. alg. 1)
            lo = jnp.where(done | (theta >= 0.0), lo, theta)
            hi = jnp.where(done | (theta < 0.0), hi, theta)
            k, k_draw = jax.random.split(k)
            new_theta = jax.random.uniform(k_draw, (), minval=lo, maxval=hi)
            theta = jnp.where(done, theta, new_theta)
            return theta, lo, hi, ll, k, i + 1, done

        # initial bracket [theta0 - 2pi, theta0]; first proposal at theta0
        init_carry = (
            theta0,
            theta0 - _TWO_PI,
            theta0,
            state.loglikelihood,
            k_loop,
            jnp.zeros((), jnp.int32),
            jnp.zeros((), bool),
        )
        theta, _, _, ll, _, iters, done = jax.lax.while_loop(cond, body, init_carry)

        # if the bracket cap was hit (pathological), stay put -- keeps the
        # kernel a valid (if lazy) Markov transition
        new_pos = point_on_ellipse(theta)
        new_pos = jax.tree.map(
            lambda a, b: jnp.where(done, a, b), new_pos, state.position
        )
        new_ll = jnp.where(done, ll, state.loglikelihood)
        return (
            EllipticalSliceState(new_pos, new_ll),
            EllipticalSliceInfo(iters, theta),
        )

    return SamplerKernel(init=init, step=step)


class SliceState(NamedTuple):
    position: Position
    logdensity: Array


class SliceInfo(NamedTuple):
    num_stepout: Array
    num_shrinks: Array
    interval_width: Array


def slice_sampler(
    logdensity_fn: LogDensityFn,
    width: float = 1.0,
    max_stepout: int = 8,
    max_shrink: int = 32,
) -> SamplerKernel:
    """Random-direction slice sampler (Neal 2003 'stepping out' +
    'shrinkage', along a uniformly random direction per step).

    ``width`` is the initial bracket size in whitened units; ``max_stepout``
    doublings bound the bracket at ``width * 2^max_stepout``.  Works on any
    position pytree; only log-density EVALUATIONS are required.
    """

    def init(position: Position) -> SliceState:
        return SliceState(position, logdensity_fn(position))

    def along(position, direction, t):
        return tree_axpy(t, direction, position)

    def step(key: Array, state: SliceState):
        k_dir, k_height, k_place, k_shrink = jax.random.split(key, 4)

        raw = tree_normal_like(k_dir, state.position)
        norm = jnp.sqrt(tree_dot(raw, raw))
        direction = tree_scale(1.0 / jnp.maximum(norm, 1e-30), raw)

        log_y = state.logdensity + jnp.log(
            jax.random.uniform(k_height, (), minval=1e-38)
        )

        def ld_at(t):
            return logdensity_fn(along(state.position, direction, t))

        # stepping out (Neal 2003, fig. 3): place a width-sized bracket
        # uniformly around 0, then extend each end in width-sized steps.
        # The expansion budget is split randomly between the two ends
        # (J + K = max_stepout - 1) -- that apportionment is what keeps the
        # capped procedure a valid slice update.
        k_place1, k_place2 = jax.random.split(k_place)
        u = jax.random.uniform(k_place1, ())
        lo0, hi0 = -u * width, (1.0 - u) * width
        j_budget = jnp.floor(
            max_stepout * jax.random.uniform(k_place2, ())
        ).astype(jnp.int32)
        k_budget = max_stepout - 1 - j_budget

        def lo_cond(carry):
            lo, j = carry
            return (j > 0) & (ld_at(lo) > log_y)

        def lo_body(carry):
            lo, j = carry
            return lo - width, j - 1

        lo, j_left = jax.lax.while_loop(lo_cond, lo_body, (lo0, j_budget))

        def hi_cond(carry):
            hi, kk = carry
            return (kk > 0) & (ld_at(hi) > log_y)

        def hi_body(carry):
            hi, kk = carry
            return hi + width, kk - 1

        hi, k_left = jax.lax.while_loop(hi_cond, hi_body, (hi0, k_budget))
        n_out = (j_budget - j_left) + (k_budget - k_left)

        # shrinkage: sample t ~ U(lo, hi); reject -> shrink toward 0
        def sh_cond(carry):
            _t, _lo, _hi, _ld, _k, i, done = carry
            return (~done) & (i < max_shrink)

        def sh_body(carry):
            _t, lo, hi, _ld, k, i, _done = carry
            k, k_draw = jax.random.split(k)
            t = jax.random.uniform(k_draw, (), minval=lo, maxval=hi)
            ld = ld_at(t)
            done = ld > log_y
            lo = jnp.where(done | (t >= 0.0), lo, t)
            hi = jnp.where(done | (t < 0.0), hi, t)
            return t, lo, hi, ld, k, i + 1, done

        t, _, _, ld, _, n_shrink, done = jax.lax.while_loop(
            sh_cond,
            sh_body,
            (
                jnp.zeros(()),
                lo,
                hi,
                state.logdensity,
                k_shrink,
                jnp.zeros((), jnp.int32),
                jnp.zeros((), bool),
            ),
        )

        new_pos = along(state.position, direction, t)
        new_pos = jax.tree.map(
            lambda a, b: jnp.where(done, a, b), new_pos, state.position
        )
        new_ld = jnp.where(done, ld, state.logdensity)
        return SliceState(new_pos, new_ld), SliceInfo(n_out, n_shrink, hi - lo)

    return SamplerKernel(init=init, step=step)
