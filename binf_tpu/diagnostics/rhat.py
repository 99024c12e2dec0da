"""Convergence diagnostics: split-R-hat and effective sample size.

The reference has no convergence diagnostics at all (SURVEY.md section 5:
observability is acceptance-rate printouts, ``example_script.py:35-37``).
These are the standard definitions (Vehtari et al. 2021 rank-normalized
split-R-hat is approximated by the classic split-R-hat on the raw scale; ESS
via FFT autocorrelation with Geyer initial-monotone truncation), written as
pure jittable reductions over (draws, chains, ...) arrays so that under a
sharded chain axis the cross-chain means become ICI collectives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

__all__ = ["split_rhat", "ess", "summary"]


def _split_chains(x: Array) -> Array:
    """(draws, chains, ...) -> (draws//2, 2*chains, ...)."""
    n = (x.shape[0] // 2) * 2
    first, second = x[: n // 2], x[n // 2 : n]
    return jnp.concatenate([first, second], axis=1)


def split_rhat(x: Array) -> Array:
    """Split-R-hat over a (draws, chains, ...) array; returns shape (...)."""
    x = _split_chains(x)
    n = x.shape[0]
    chain_mean = jnp.mean(x, axis=0)  # (chains, ...)
    chain_var = jnp.var(x, axis=0, ddof=1)  # (chains, ...)
    between = n * jnp.var(chain_mean, axis=0, ddof=1)  # (...)
    within = jnp.mean(chain_var, axis=0)
    var_plus = (n - 1) / n * within + between / n
    return jnp.sqrt(var_plus / within)


def _autocovariance_fft(x: Array) -> Array:
    """Autocovariance along axis 0 via FFT; x is (draws, ...), demeaned."""
    n = x.shape[0]
    m = 1  # next power of two >= 2n (static Python computation)
    while m < 2 * n:
        m *= 2
    f = jnp.fft.rfft(x, n=m, axis=0)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=m, axis=0)[:n]
    return acov / n


def ess(x: Array) -> Array:
    """Bulk effective sample size over (draws, chains, ...) -> shape (...).

    Combined-chain estimator: mean autocovariance across chains plus
    between-chain variance (Stan's formulation), with Geyer initial-positive
    truncation implemented via a mask (static shapes, jit-safe).
    """
    x = _split_chains(x)
    n, m = x.shape[0], x.shape[1]
    chain_mean = jnp.mean(x, axis=0)
    demeaned = x - chain_mean[None]
    acov = _autocovariance_fft(demeaned)  # (n, chains, ...)
    acov = jnp.mean(acov, axis=1)  # (n, ...)

    chain_var = jnp.var(x, axis=0, ddof=1)
    within = jnp.mean(chain_var, axis=0)
    between = jnp.var(chain_mean, axis=0, ddof=1) if m > 1 else 0.0
    var_plus = (n - 1) / n * within + between

    rho = 1.0 - (within - acov) / var_plus  # (n, ...)

    # Geyer: sum consecutive autocorrelation pairs; truncate at the first
    # non-positive pair sum (initial positive sequence), then enforce
    # monotone decrease with a running minimum.
    n_pairs = n // 2
    pair = rho[0 : 2 * n_pairs : 2] + rho[1 : 2 * n_pairs : 2]  # (n_pairs, ...)
    good = jnp.cumprod((pair > 0.0).astype(jnp.float32), axis=0) > 0.0
    capped = jax.lax.cummin(pair, axis=0)
    tau = -1.0 + 2.0 * jnp.sum(jnp.where(good, capped, 0.0), axis=0)
    tau = jnp.maximum(tau, 1.0 / jnp.log10(jnp.asarray(float(n * m))))
    return n * m / tau


def summary(samples: dict[str, Array]) -> dict[str, dict[str, Array]]:
    """Per-variable summary over (draws, chains, ...) sample arrays:
    mean, std, split-R-hat, ESS (leading event dims reduced elementwise)."""
    out = {}
    for name, x in samples.items():
        out[name] = {
            "mean": jnp.mean(x, axis=(0, 1)),
            "std": jnp.std(x, axis=(0, 1)),
            "rhat": split_rhat(x),
            "ess": ess(x),
        }
    return out
