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
    lp = 0.5 * math.log(2.0) - 0.5 * (_LOG_2PI) - jnp.log(scale) - 0.5 * z * z
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
    z = jax.scipy.linalg.solve_triangular(cov_chol, diff[..., None], lower=True)[..., 0]
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
    lp = (a - 1.0) * jnp.log(x) - b * x + a * jnp.log(b) - jsp.gammaln(a)
    return jnp.where(x > 0, lp, -jnp.inf)


def gamma_sample(key: Array, concentration: Array, rate: Array = 1.0, shape=()) -> Array:
    return jax.random.gamma(key, concentration, shape=shape) / rate


def inverse_gamma_log_prob(x: Array, concentration: Array, scale: Array) -> Array:
    a, b = concentration, scale
    lp = a * jnp.log(b) - jsp.gammaln(a) - (a + 1.0) * jnp.log(x) - b / x
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
        + jsp.gammaln(a + b)
        - jsp.gammaln(a)
        - jsp.gammaln(b)
    )
    return jnp.where((x > 0) & (x < 1), lp, -jnp.inf)


def laplace_log_prob(x: Array, loc: Array = 0.0, scale: Array = 1.0) -> Array:
    return -jnp.abs(x - loc) / scale - jnp.log(2.0 * scale)


def student_t_log_prob(x: Array, df: Array, loc: Array = 0.0, scale: Array = 1.0) -> Array:
    z = (x - loc) / scale
    half = 0.5 * (df + 1.0)
    return (
        jsp.gammaln(half)
        - jsp.gammaln(0.5 * df)
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
    return k * jnp.log(rate) - rate - jsp.gammaln(k + 1.0)


def bernoulli_log_prob(x: Array, logits: Array) -> Array:
    """x in {0,1}; logits = log(p/(1-p)).  Stable via softplus."""
    x = jnp.asarray(x, dtype=jnp.result_type(logits))
    return x * logits - jax.nn.softplus(logits)
