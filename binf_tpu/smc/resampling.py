"""Particle resampling schemes (systematic, stratified, multinomial).

New capability over the reference (which has no SMC; SURVEY.md section 2.3
lists particle parallelism as a new first-class component).  All schemes are
O(N) with static shapes: weights -> cumulative sum -> searchsorted against
deterministic/random grid points -- jit/vmap-safe and, for sharded particle
axes, computable with one all-gather of the (small) normalized weight vector.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

__all__ = [
    "systematic_resample",
    "stratified_resample",
    "multinomial_resample",
    "effective_sample_size",
]


def effective_sample_size(log_weights: Array, axis: int = -1) -> Array:
    """ESS = (sum w)^2 / sum w^2 from unnormalized log weights."""
    lw = log_weights - jax.scipy.special.logsumexp(log_weights, axis=axis, keepdims=True)
    return jnp.exp(-jax.scipy.special.logsumexp(2.0 * lw, axis=axis))


def _resample_indices(cum_weights: Array, positions: Array) -> Array:
    return jnp.searchsorted(cum_weights, positions, side="left")


def systematic_resample(key: Array, log_weights: Array) -> Array:
    """Systematic (low-variance) resampling: one uniform offset, N evenly
    spaced points through the CDF.  Returns ancestor indices (N,)."""
    n = log_weights.shape[0]
    w = jax.nn.softmax(log_weights)
    cum = jnp.cumsum(w)
    u = jax.random.uniform(key, ())
    positions = (jnp.arange(n) + u) / n
    return _resample_indices(cum, positions)


def stratified_resample(key: Array, log_weights: Array) -> Array:
    """One uniform per stratum [i/N, (i+1)/N)."""
    n = log_weights.shape[0]
    w = jax.nn.softmax(log_weights)
    cum = jnp.cumsum(w)
    u = jax.random.uniform(key, (n,))
    positions = (jnp.arange(n) + u) / n
    return _resample_indices(cum, positions)


def multinomial_resample(key: Array, log_weights: Array) -> Array:
    n = log_weights.shape[0]
    return jax.random.categorical(key, log_weights, shape=(n,))


RESAMPLERS = {
    "systematic": systematic_resample,
    "stratified": stratified_resample,
    "multinomial": multinomial_resample,
}
