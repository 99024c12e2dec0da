"""Numerics utilities: overflow-safe math and MXU-friendly primitives.

Internalizes what the reference consumed from CSB (``csb.numeric.log/exp``,
``csb.numeric.log_sum_exp`` -- see reference ``binf/pdf/__init__.py:10``,
``binf/samplers/hmc.py:10``, ``binf/example/misc.py:5``): clipped exp/log for
Metropolis acceptance tests, stable logsumexp for posterior predictives --
plus TPU-idiomatic building blocks (matmul-based polynomial evaluation,
Welford moment accumulation as a pytree).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array

__all__ = [
    "EXP_MAX",
    "EXP_MIN",
    "safe_exp",
    "safe_log",
    "log_sum_exp",
    "vandermonde",
    "polyval",
    "WelfordState",
    "welford_init",
    "welford_update",
    "welford_mean",
    "welford_variance",
]

# Clip range matching IEEE float32 safety; reference used csb's clipped
# exp/log for the same purpose (MH acceptance, ``binf/samplers/hmc.py:151``).
EXP_MAX = 80.0
EXP_MIN = -80.0


def safe_exp(x: Array) -> Array:
    """exp with the argument clipped to avoid overflow to inf."""
    return jnp.exp(jnp.clip(x, EXP_MIN, EXP_MAX))


def safe_log(x: Array, eps: float = 1e-38) -> Array:
    """log with the argument floored to avoid -inf/nan on zeros."""
    return jnp.log(jnp.maximum(x, eps))


def log_sum_exp(x: Array, axis: int | None = None, keepdims: bool = False) -> Array:
    """Numerically stable log(sum(exp(x)))."""
    return jax.scipy.special.logsumexp(x, axis=axis, keepdims=keepdims)


def vandermonde(x: Array, n: int, dtype=None) -> Array:
    """Vandermonde matrix V[i, j] = x_i ** j, shape (len(x), n).

    This is both the polynomial design matrix and the forward-model Jacobian
    of the reference's polynomial example
    (``binf/example/likelihood.py:28-30``); here it turns polynomial
    evaluation into a single MXU matmul.
    """
    x = jnp.asarray(x, dtype=dtype)
    powers = jnp.arange(n, dtype=x.dtype)
    return x[:, None] ** powers[None, :]


def polyval(x: Array, coefficients: Array) -> Array:
    """Evaluate sum_j c_j x**j at every x -- as a matmul (MXU-friendly).

    Matches ``numpy.polynomial.polynomial.polyval`` semantics used by the
    reference example (``example_script.py:21``).
    """
    V = vandermonde(x, coefficients.shape[-1], dtype=coefficients.dtype)
    return V @ coefficients


class WelfordState(NamedTuple):
    """Streaming mean/variance accumulator over an arbitrary pytree."""

    count: Array
    mean: jax.Array | dict
    m2: jax.Array | dict


def welford_init(template) -> WelfordState:
    zeros = jax.tree.map(jnp.zeros_like, template)
    return WelfordState(
        count=jnp.zeros((), jnp.float32),
        mean=zeros,
        m2=jax.tree.map(jnp.zeros_like, template),
    )


def welford_update(state: WelfordState, sample) -> WelfordState:
    count = state.count + 1.0
    delta = jax.tree.map(lambda s, m: s - m, sample, state.mean)
    mean = jax.tree.map(lambda m, d: m + d / count, state.mean, delta)
    delta2 = jax.tree.map(lambda s, m: s - m, sample, mean)
    m2 = jax.tree.map(lambda a, d, d2: a + d * d2, state.m2, delta, delta2)
    return WelfordState(count=count, mean=mean, m2=m2)


def welford_mean(state: WelfordState):
    return state.mean


def welford_variance(state: WelfordState, regularize: bool = True):
    """Sample variance; optionally Stan-style regularized toward identity
    (shrinkage 5/(n+5), the standard mass-matrix regularization)."""
    n = state.count

    def var(m2):
        v = m2 / jnp.maximum(n - 1.0, 1.0)
        if regularize:
            w = n / (n + 5.0)
            v = w * v + (1.0 - w) * 1e-3
        return v

    return jax.tree.map(var, state.m2)
