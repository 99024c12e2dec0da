"""Distribution library: log-densities + samplers as pure functions.

The reference has no distribution library -- each prior/error model
hand-writes its own unnormalized log-density (e.g. Gamma at
``binf/example/priors.py:23-25``, diagonal Gaussian at ``:49-54``, Gaussian
error at ``binf/example/likelihood.py:54-57``).  A complete framework needs a
reusable, fully-normalized family; everything here is elementwise/VPU-bound,
jit/vmap-safe, float32-by-default, and paired with a ``jax.random`` sampler
so the same objects serve priors, error models, ADVI variational families,
and SMC proposal/mutation kernels.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.scipy import special as jsp

from binf_tpu.ops.math import i0e, lgamma

Array = jax.Array

__all__ = [
    "normal_log_prob",
    "normal_sample",
    "mv_normal_diag_log_prob",
    "mv_normal_full_log_prob",
    "gamma_log_prob",
    "gamma_sample",
    "inverse_gamma_log_prob",
    "exponential_log_prob",
    "uniform_log_prob",
    "beta_log_prob",
    "laplace_log_prob",
    "student_t_log_prob",
    "cauchy_log_prob",
    "lognormal_log_prob",
    "poisson_log_prob",
    "bernoulli_log_prob",
    "halfnormal_log_prob",
    "binomial_log_prob",
    "negative_binomial_log_prob",
    "categorical_log_prob",
    "dirichlet_log_prob",
    "weibull_log_prob",
    "von_mises_log_prob",
    "truncated_normal_log_prob",
]

_LOG_2PI = math.log(2.0 * math.pi)


# -- Gaussian family --------------------------------------------------------


def normal_log_prob(x: Array, loc: Array = 0.0, scale: Array = 1.0) -> Array:
    """Elementwise N(loc, scale^2) log-density (NOT summed)."""
    z = (x - loc) / scale
    return -0.5 * (z * z + _LOG_2PI) - jnp.log(scale)


def normal_sample(key: Array, shape, loc: Array = 0.0, scale: Array = 1.0) -> Array:
    return loc + scale * jax.random.normal(key, shape)


def halfnormal_log_prob(x: Array, scale: Array = 1.0) -> Array:
    z = x / scale
    lp = math.log(2.0) - 0.5 * (_LOG_2PI) - jnp.log(scale) - 0.5 * z * z
    return jnp.where(x >= 0, lp, -jnp.inf)


def mv_normal_diag_log_prob(x: Array, loc: Array, scale_diag: Array) -> Array:
    """Multivariate normal with diagonal covariance; sums over the last axis."""
    return jnp.sum(normal_log_prob(x, loc, scale_diag), axis=-1)


def mv_normal_full_log_prob(x: Array, loc: Array, cov_chol: Array) -> Array:
    """Multivariate normal with full covariance given its Cholesky factor L
    (cov = L L^T).  Triangular solve + reduction; O(d^2), MXU-friendly for
    batches."""
    d = x.shape[-1]
    diff = x - loc
    chol_b = jnp.broadcast_to(cov_chol, diff.shape[:-1] + cov_chol.shape[-2:])
    z = jax.scipy.linalg.solve_triangular(chol_b, diff[..., None], lower=True)[..., 0]
    half_logdet = jnp.sum(jnp.log(jnp.diagonal(cov_chol, axis1=-2, axis2=-1)), axis=-1)
    return -0.5 * jnp.sum(z * z, axis=-1) - half_logdet - 0.5 * d * _LOG_2PI


# -- Gamma family -----------------------------------------------------------


def gamma_log_prob(x: Array, concentration: Array, rate: Array = 1.0) -> Array:
    """Gamma(shape=concentration, rate) log-density, fully normalized.

    The reference's GammaPrior uses the unnormalized
    ``(shape-1)*log(x) - rate*x`` (``binf/example/priors.py:23-25``); the
    normalizer ``a*log(b) - lgamma(a)`` is constant in x so MCMC semantics
    are identical, but we keep full normalization for SMC evidence and VI.
    """
    a = jnp.asarray(concentration, dtype=jnp.result_type(x))
    b = jnp.asarray(rate, dtype=jnp.result_type(x))
    lp = (a - 1.0) * jnp.log(x) - b * x + a * jnp.log(b) - lgamma(a)
    return jnp.where(x > 0, lp, -jnp.inf)


def gamma_sample(key: Array, concentration: Array, rate: Array = 1.0, shape=()) -> Array:
    return jax.random.gamma(key, concentration, shape=shape) / rate


def inverse_gamma_log_prob(x: Array, concentration: Array, scale: Array) -> Array:
    a, b = concentration, scale
    lp = a * jnp.log(b) - lgamma(a) - (a + 1.0) * jnp.log(x) - b / x
    return jnp.where(x > 0, lp, -jnp.inf)


def exponential_log_prob(x: Array, rate: Array = 1.0) -> Array:
    lp = jnp.log(rate) - rate * x
    return jnp.where(x >= 0, lp, -jnp.inf)


# -- bounded / heavy-tailed -------------------------------------------------


def uniform_log_prob(x: Array, low: Array = 0.0, high: Array = 1.0) -> Array:
    inside = (x >= low) & (x <= high)
    return jnp.where(inside, -jnp.log(high - low), -jnp.inf)


def beta_log_prob(x: Array, a: Array, b: Array) -> Array:
    lp = (
        (a - 1.0) * jnp.log(x)
        + (b - 1.0) * jnp.log1p(-x)
        + lgamma(a + b)
        - lgamma(a)
        - lgamma(b)
    )
    return jnp.where((x > 0) & (x < 1), lp, -jnp.inf)


def laplace_log_prob(x: Array, loc: Array = 0.0, scale: Array = 1.0) -> Array:
    return -jnp.abs(x - loc) / scale - jnp.log(2.0 * scale)


def student_t_log_prob(x: Array, df: Array, loc: Array = 0.0, scale: Array = 1.0) -> Array:
    z = (x - loc) / scale
    half = 0.5 * (df + 1.0)
    return (
        lgamma(half)
        - lgamma(0.5 * df)
        - 0.5 * jnp.log(df * math.pi)
        - jnp.log(scale)
        - half * jnp.log1p(z * z / df)
    )


def cauchy_log_prob(x: Array, loc: Array = 0.0, scale: Array = 1.0) -> Array:
    z = (x - loc) / scale
    return -jnp.log(math.pi * scale * (1.0 + z * z))


def lognormal_log_prob(x: Array, loc: Array = 0.0, scale: Array = 1.0) -> Array:
    logx = jnp.log(x)
    lp = normal_log_prob(logx, loc, scale) - logx
    return jnp.where(x > 0, lp, -jnp.inf)


# -- discrete ---------------------------------------------------------------


def poisson_log_prob(k: Array, rate: Array) -> Array:
    k = jnp.asarray(k, dtype=jnp.result_type(rate))
    return k * jnp.log(rate) - rate - lgamma(k + 1.0)


def bernoulli_log_prob(x: Array, logits: Array) -> Array:
    """x in {0,1}; logits = log(p/(1-p)).  Stable via softplus."""
    x = jnp.asarray(x, dtype=jnp.result_type(logits))
    return x * logits - jax.nn.softplus(logits)


def binomial_log_prob(k: Array, n: Array, logits: Array) -> Array:
    """k successes in n trials, success log-odds = logits."""
    k = jnp.asarray(k, dtype=jnp.result_type(logits))
    n = jnp.asarray(n, dtype=jnp.result_type(logits))
    log_comb = lgamma(n + 1.0) - lgamma(k + 1.0) - lgamma(n - k + 1.0)
    return log_comb + k * logits - n * jax.nn.softplus(logits)


def negative_binomial_log_prob(k: Array, total_count: Array, logits: Array) -> Array:
    """Number of failures k before ``total_count`` successes;
    logits = log-odds of failure probability."""
    k = jnp.asarray(k, dtype=jnp.result_type(logits))
    r = jnp.asarray(total_count, dtype=jnp.result_type(logits))
    log_comb = lgamma(k + r) - lgamma(k + 1.0) - lgamma(r)
    return log_comb + k * logits - (k + r) * jax.nn.softplus(logits)


def categorical_log_prob(k: Array, logits: Array) -> Array:
    """Index k in [0, C) with unnormalized logits (..., C); k batches
    broadcast against the logits' batch dims."""
    k = jnp.asarray(k).astype(jnp.int32)
    logz = jsp.logsumexp(logits, axis=-1)
    logits_b = jnp.broadcast_to(logits, k.shape + logits.shape[-1:])
    gathered = jnp.take_along_axis(logits_b, k[..., None], axis=-1)[..., 0]
    return gathered - logz


def dirichlet_log_prob(x: Array, concentration: Array) -> Array:
    """x on the simplex, summed over the last axis."""
    a = concentration
    norm = lgamma(jnp.sum(a, axis=-1)) - jnp.sum(lgamma(a), axis=-1)
    lp = jnp.sum((a - 1.0) * jnp.log(x), axis=-1) + norm
    ok = (x > 0).all(axis=-1)
    return jnp.where(ok, lp, -jnp.inf)


def weibull_log_prob(x: Array, concentration: Array, scale: Array) -> Array:
    k, lam = concentration, scale
    z = x / lam
    lp = jnp.log(k / lam) + (k - 1.0) * jnp.log(z) - z**k
    return jnp.where(x > 0, lp, -jnp.inf)


def von_mises_log_prob(x: Array, loc: Array, concentration: Array) -> Array:
    """Angle x in radians; normalized with log I0(kappa)."""
    kappa = concentration
    log_i0 = jnp.log(i0e(kappa)) + kappa
    return kappa * jnp.cos(x - loc) - jnp.log(2.0 * math.pi) - log_i0


def truncated_normal_log_prob(
    x: Array, loc: Array, scale: Array, low: Array, high: Array
) -> Array:
    z = (x - loc) / scale
    zl = (low - loc) / scale
    zh = (high - loc) / scale
    log_norm = jnp.log(jsp.ndtr(zh) - jsp.ndtr(zl))
    lp = normal_log_prob(x, loc, scale) - log_norm
    return jnp.where((x >= low) & (x <= high), lp, -jnp.inf)
