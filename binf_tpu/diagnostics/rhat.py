"""Convergence diagnostics: rank-normalized split-R-hat and bulk/tail ESS.

The reference has no convergence diagnostics at all (SURVEY.md section 5:
observability is acceptance-rate printouts, ``example_script.py:35-37``).
These are the modern estimators of Vehtari, Gelman, Simpson, Carpenter &
Buerkner 2021 ("Rank-normalization, folding, and localization"):

* :func:`rhat` -- max of the rank-normalized split-R-hat of the draws and of
  the FOLDED draws ``|x - median|`` (catches scale/tail non-convergence that
  raw-scale split-R-hat misses);
* :func:`ess_bulk` -- ESS of the rank-normalized draws;
* :func:`ess_tail` -- min ESS of the 5% / 95% quantile-indicator sequences.

The classic raw-scale :func:`split_rhat` and combined-chain :func:`ess`
remain available as building blocks.  Everything is a pure jittable
reduction over (draws, chains, ...) arrays, so under a sharded chain axis
the cross-chain means become ICI collectives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import ndtri

Array = jax.Array

__all__ = [
    "split_rhat", "ess", "rhat", "ess_bulk", "ess_tail", "summary",
]


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


# -- rank normalization & the modern estimators (Vehtari et al. 2021) --------


def _rank_normalize(x: Array) -> Array:
    """Fractional-rank z-scores of a (draws, chains, ...) array.

    Ranks are computed over the POOLED draws (all chains together) via
    double argsort (ordinal ranks; ties are measure-zero for continuous
    samplers), mapped through the Blom offset (r - 3/8)/(S + 1/4) and the
    standard-normal quantile function.
    """
    n, m = x.shape[0], x.shape[1]
    s = n * m
    flat = x.reshape((s,) + x.shape[2:])
    order = jnp.argsort(flat, axis=0)
    ranks = jnp.argsort(order, axis=0).astype(jnp.float32) + 1.0
    z = ndtri((ranks - 0.375) / (s + 0.25))
    return z.reshape(x.shape)


def _fold(x: Array) -> Array:
    """|x - median| over pooled draws -- sensitizes R-hat to scale/tails."""
    med = jnp.median(x.reshape((-1,) + x.shape[2:]), axis=0)
    return jnp.abs(x - med)


def rhat(x: Array) -> Array:
    """Rank-normalized + folded split-R-hat (Vehtari et al. 2021, eq. 4 +
    section 4.2): max of the split-R-hat of the rank-normalized draws and of
    the rank-normalized folded draws.  Shape (draws, chains, ...) -> (...).
    """
    bulk = split_rhat(_rank_normalize(x))
    tail = split_rhat(_rank_normalize(_fold(x)))
    return jnp.maximum(bulk, tail)


def ess_bulk(x: Array) -> Array:
    """Bulk ESS: combined-chain ESS of the rank-normalized draws."""
    return ess(_rank_normalize(x))


def ess_tail(x: Array, prob: float = 0.05) -> Array:
    """Tail ESS: min of the ESS of the ``prob`` and ``1-prob`` quantile
    indicator sequences I(x <= q) (Vehtari et al. 2021, section 4.4).
    Default prob=0.05 gives the (5%, 95%) pair."""
    flat = x.reshape((-1,) + x.shape[2:])
    q_lo = jnp.quantile(flat, prob, axis=0)
    q_hi = jnp.quantile(flat, 1.0 - prob, axis=0)
    ess_lo = ess((x <= q_lo).astype(jnp.float32))
    ess_hi = ess((x <= q_hi).astype(jnp.float32))
    return jnp.minimum(ess_lo, ess_hi)


def summary(samples: dict[str, Array]) -> dict[str, dict[str, Array]]:
    """Per-variable summary over (draws, chains, ...) sample arrays:
    mean, std, rank-normalized+folded R-hat, bulk ESS, tail ESS (leading
    event dims reduced elementwise)."""
    out = {}
    for name, x in samples.items():
        out[name] = {
            "mean": jnp.mean(x, axis=(0, 1)),
            "std": jnp.std(x, axis=(0, 1)),
            "rhat": rhat(x),
            "ess": ess_bulk(x),
            "ess_tail": ess_tail(x),
        }
    return out
