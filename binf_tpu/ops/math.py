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
    "lgamma",
    "i0e",
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


# Lanczos approximation (g=7, n=9).  Rationale for not using
# jax.lax.lgamma: the lgamma primitive has no Pallas/Mosaic TPU lowering, so
# any log density containing it (Poisson, Gamma, Student-t, ...) could not be
# compiled into the fused whole-run kernels.  This formulation uses only
# add/div/log/sin -- all Mosaic-supported -- and is accurate to ~1e-6
# relative in float32, with well-behaved autodiff (its derivative is a
# rational-plus-log expression, effectively digamma).
_LANCZOS_G = 7.0
_LANCZOS_COEF = (
    0.99999999999980993,
    676.5203681218851,
    -1259.1392167224028,
    771.32342877765313,
    -176.61502916214059,
    12.507343278686905,
    -0.13857109526572012,
    9.9843695780195716e-6,
    1.5056327351493116e-7,
)
_HALF_LOG_2PI = 0.9189385332046727


def lgamma(x: Array) -> Array:
    """log Gamma(x) for x > 0, in Mosaic-lowerable primitives only.

    Matches ``jax.scipy.special.gammaln`` to float32 precision on (0, inf);
    negative arguments are out of scope (all framework call sites pass
    positive concentrations / counts + 1).
    """
    x = jnp.asarray(x, jnp.float32)
    # reflection for x < 0.5 keeps the Lanczos series in its accurate range
    small = x < 0.5
    z = jnp.where(small, 1.0 - x, x) - 1.0
    series = _LANCZOS_COEF[0]
    for i, c in enumerate(_LANCZOS_COEF[1:], start=1):
        series = series + c / (z + i)
    t = z + _LANCZOS_G + 0.5
    main = _HALF_LOG_2PI + (z + 0.5) * jnp.log(t) - t + jnp.log(series)
    sin_pix = jnp.sin(jnp.pi * jnp.where(small, x, 0.5))  # safe operand
    reflected = jnp.log(jnp.pi / jnp.maximum(jnp.abs(sin_pix), 1e-30)) - main
    return jnp.where(small, reflected, main)


# Abramowitz & Stegun 9.8.1 / 9.8.2 polynomial fits -- same rationale as
# lgamma: i0e has no Mosaic lowering.
def i0e(x: Array) -> Array:
    """exp(-|x|) * I0(x) in Mosaic-lowerable primitives (f32, ~1e-7 abs)."""
    ax = jnp.abs(jnp.asarray(x, jnp.float32))
    t_small = (ax / 3.75) ** 2
    p_small = 1.0 + t_small * (3.5156229 + t_small * (3.0899424 + t_small * (
        1.2067492 + t_small * (0.2659732 + t_small * (0.0360768 + t_small * 0.0045813)))))
    small = p_small * jnp.exp(-ax)
    t_big = 3.75 / jnp.maximum(ax, 3.75)
    p_big = 0.39894228 + t_big * (0.01328592 + t_big * (0.00225319 + t_big * (
        -0.00157565 + t_big * (0.00916281 + t_big * (-0.02057706 + t_big * (
            0.02635537 + t_big * (-0.01647633 + t_big * 0.00392377)))))))
    big = p_big / jnp.sqrt(jnp.maximum(ax, 3.75))
    return jnp.where(ax <= 3.75, small, big)


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
