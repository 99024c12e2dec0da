"""Diagnostics tests: R-hat and ESS against known-answer cases."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from binf_tpu.diagnostics import (
    ess,
    ess_bulk,
    ess_tail,
    rhat,
    split_rhat,
    summary,
)
from binf_tpu.diagnostics.rhat import _rank_normalize


def _scipy_rank_normalize(x):
    """Independent implementation of Vehtari et al. 2021 rank-normalization
    (the same formula arviz uses): pooled average ranks -> Blom offset ->
    normal quantile."""
    from scipy.stats import norm, rankdata

    s = x.size
    r = rankdata(x, method="average", axis=None).reshape(x.shape)
    return norm.ppf((r - 0.375) / (s + 0.25))


def test_rank_normalize_matches_scipy(key):
    x = np.asarray(jax.random.normal(key, (200, 4)))
    ours = np.asarray(_rank_normalize(jnp.asarray(x)))
    ref = _scipy_rank_normalize(x)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_rhat_matches_reference_pipeline_ar1(key):
    """rhat/ess_bulk on an AR(1) fixture == split_rhat/ess applied to the
    independently rank-normalized draws (within 1e-3)."""
    phi = 0.5
    n, m = 1000, 4
    eps = np.asarray(jax.random.normal(key, (n, m)))
    x = np.zeros((n, m))
    for t in range(1, n):
        x[t] = phi * x[t - 1] + eps[t] * np.sqrt(1 - phi**2)
    xj = jnp.asarray(x)

    z = _scipy_rank_normalize(x)
    med = np.median(x)
    z_fold = _scipy_rank_normalize(np.abs(x - med))
    ref_rhat = max(float(split_rhat(jnp.asarray(z))),
                   float(split_rhat(jnp.asarray(z_fold))))
    ref_bulk = float(ess(jnp.asarray(z)))

    np.testing.assert_allclose(float(rhat(xj)), ref_rhat, rtol=1e-3)
    np.testing.assert_allclose(float(ess_bulk(xj)), ref_bulk, rtol=1e-3)


def test_folded_rhat_detects_variance_mismatch(key):
    """Chains with equal means but unequal variances: raw-scale split-R-hat
    is blind, folded rank-normalized R-hat fires (the Vehtari et al. 2021
    motivating case)."""
    x = jax.random.normal(key, (2000, 4))
    scales = jnp.asarray([1.0, 1.0, 1.0, 4.0])
    x = x * scales[None, :]
    assert float(split_rhat(x)) < 1.02  # classic misses it
    assert float(rhat(x)) > 1.05  # folded catches it


def test_tail_ess_detects_heavy_tail_nonmixing(key):
    """A chain exploring the bulk but with sticky tails: tail-ESS must come
    out far below bulk-ESS.  Construct via a slowly-mixing scale process."""
    n, m = 4000, 4
    k1, k2 = jax.random.split(key)
    z = np.asarray(jax.random.normal(k1, (n, m)))
    # AR(1) log-scale with long memory -> heavy, slowly-mixing tails
    s = np.zeros((n, m))
    eta = np.asarray(jax.random.normal(k2, (n, m)))
    for t in range(1, n):
        s[t] = 0.995 * s[t - 1] + 0.1 * eta[t]
    x = jnp.asarray(z * np.exp(s))
    bulk = float(ess_bulk(x))
    tail = float(ess_tail(x))
    assert tail < 0.5 * bulk


def test_rhat_converged_iid_near_one(key):
    x = jax.random.normal(key, (1000, 8))
    assert abs(float(rhat(x)) - 1.0) < 0.02
    e_bulk = float(ess_bulk(x))
    e_tail = float(ess_tail(x))
    assert 0.5 * 8000 < e_bulk
    assert 0.2 * 8000 < e_tail


def test_rhat_converged_chains(key):
    x = jax.random.normal(key, (1000, 8))
    r = float(split_rhat(x))
    assert abs(r - 1.0) < 0.02


def test_rhat_detects_nonmixing(key):
    x = jax.random.normal(key, (1000, 4))
    offsets = jnp.asarray([0.0, 3.0, -3.0, 6.0])
    x = x + offsets[None, :]
    assert float(split_rhat(x)) > 2.0


def test_rhat_detects_trend(key):
    """Split-R-hat catches within-chain drift (classic R-hat would not)."""
    x = jax.random.normal(key, (1000, 4)) * 0.1
    trend = jnp.linspace(0, 5, 1000)[:, None]
    assert float(split_rhat(x + trend)) > 1.5


def test_ess_iid(key):
    x = jax.random.normal(key, (1000, 8))
    e = float(ess(x))
    assert 0.5 * 8000 < e  # iid -> ESS near the sample count


def test_ess_ar1(key):
    """AR(1) with coefficient phi has tau = (1+phi)/(1-phi)."""
    phi = 0.9
    n, m = 4000, 8
    eps = np.asarray(jax.random.normal(key, (n, m)))
    x = np.zeros((n, m))
    for t in range(1, n):
        x[t] = phi * x[t - 1] + eps[t] * np.sqrt(1 - phi**2)
    tau = (1 + phi) / (1 - phi)  # = 19
    e = float(ess(jnp.asarray(x)))
    assert 0.5 * n * m / tau < e < 2.0 * n * m / tau


def test_ess_vectorized_shape(key):
    x = jax.random.normal(key, (500, 4, 3))
    assert ess(x).shape == (3,)
    assert split_rhat(x).shape == (3,)


@pytest.mark.slow
def test_summary(key):
    samples = {
        "coefficients": jax.random.normal(key, (500, 8, 4)),
        "precision": jax.random.normal(jax.random.key(1), (500, 8)) + 5.0,
    }
    s = summary(samples)
    assert s["coefficients"]["mean"].shape == (4,)
    assert abs(float(s["precision"]["mean"]) - 5.0) < 0.05
    assert float(s["precision"]["rhat"]) < 1.02


def test_transforms_roundtrip():
    from binf_tpu.pdf.transforms import LogTransform, SigmoidTransform, SoftplusTransform

    for t in (LogTransform, SoftplusTransform, SigmoidTransform(-2.0, 3.0)):
        u = jnp.asarray([-1.5, 0.0, 2.0])
        x = t.forward(u)
        u2 = t.inverse(x)
        np.testing.assert_allclose(np.asarray(u2), np.asarray(u), rtol=1e-5, atol=1e-5)


def test_transformed_density_is_correct_change_of_variables(key):
    """Sampling a Gamma(3, 2) via log-transformed RWM must reproduce the
    Gamma moments -- validates the Jacobian term."""
    from binf_tpu.pdf import distributions as dist
    from binf_tpu.pdf.transforms import LogTransform, transform_logdensity
    from binf_tpu.parallel.runner import init_chains, run_chains
    from binf_tpu.samplers import rwm

    def logp(pos):
        return dist.gamma_log_prob(pos["x"], 3.0, 2.0)

    u_logp = transform_logdensity(logp, {"x": LogTransform})
    kernel = rwm(u_logp, step_size=1.0)
    n_chains = 256
    states = init_chains(kernel, {"x": jnp.zeros(n_chains)})
    _, samples = jax.jit(lambda s, k: run_chains(kernel, k, s, 1500))(states, key)
    x = np.exp(np.asarray(samples["x"][500:]).ravel())
    np.testing.assert_allclose(x.mean(), 1.5, rtol=0.05)  # a/b
    np.testing.assert_allclose(x.var(), 0.75, rtol=0.15)  # a/b^2
