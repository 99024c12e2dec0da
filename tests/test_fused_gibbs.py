"""Fused collapsed-Gibbs kernel: exact-posterior recovery (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from binf_tpu.ops.math import vandermonde
from binf_tpu.ops.pallas.fused_gibbs import fused_linreg_gibbs_run


pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def problem():
    key = jax.random.key(1)
    xses = jnp.linspace(-2, 2, 20)
    V = vandermonde(xses, 4)
    coeffs = jnp.asarray([2.0, -4.0, 1.0, 1.5])
    y = V @ coeffs + jax.random.normal(key, (20,)) / jnp.sqrt(2.5)
    prior_var = jnp.ones(4) * 5.0
    return V, y, prior_var


def run(problem, seed=3, steps=400, C=64):
    V, y, prior_var = problem
    q0 = jnp.concatenate([jnp.ones((C, 4)), jnp.ones((C, 1))], axis=1)
    return fused_linreg_gibbs_run(
        q0, seed, V, y, prior_var, 1.0, 0.2,
        num_steps=steps, block_chains=32, steps_per_block=50,
        interpret=True, host_noise=True,
    )


def test_recovers_exact_posterior(problem):
    V, y, prior_var = problem
    draws = run(problem)
    assert draws.shape == (400, 64, 5)
    kept = np.asarray(draws[100:])
    coeffs = kept[..., :4].reshape(-1, 4)
    prec = kept[..., 4].reshape(-1)
    assert (prec > 0).all()

    # coefficient conditional at mean precision
    Vn = np.asarray(V)
    pm = prec.mean()
    exact_mean = np.linalg.inv(pm * Vn.T @ Vn + np.eye(4) / 5.0) @ (
        pm * Vn.T @ np.asarray(y)
    )
    np.testing.assert_allclose(coeffs.mean(0), exact_mean, atol=0.08)

    # precision self-consistency: Gamma(1 + n/2, 0.2 + E[SS]/2)
    resid = np.asarray(y)[:, None] - Vn @ coeffs.T
    ss = (resid**2).sum(0)
    expected = np.mean((1.0 + 10.0) / (0.2 + ss / 2.0))
    np.testing.assert_allclose(prec.mean(), expected, rtol=0.06)

    # coefficient covariance close to the analytic conditional covariance
    cov = np.cov(coeffs.T)
    exact_cov = np.linalg.inv(pm * Vn.T @ Vn + np.eye(4) / 5.0)
    np.testing.assert_allclose(np.diag(cov), np.diag(exact_cov), rtol=0.35)


def test_matches_xla_collapsed_gibbs(problem):
    """Cross-check against the DSL collapsed Gibbs sampler."""
    from binf_tpu.example.polynomial import (
        initial_positions,
        make_collapsed_gibbs_kernel,
        make_data,
        make_posterior,
    )
    from binf_tpu.parallel.runner import init_chains, run_chains

    V, y, prior_var = problem
    xses = jnp.linspace(-2, 2, 20)
    post = make_posterior(xses, y)
    kernel = make_collapsed_gibbs_kernel(post)
    states = init_chains(kernel, initial_positions(64))
    _, gs = jax.jit(lambda s, k: run_chains(kernel, k, s, 400))(
        states, jax.random.key(9)
    )
    gc = np.asarray(gs["coefficients"][100:]).reshape(-1, 4)
    gp = np.asarray(gs["precision"][100:]).reshape(-1)

    draws = run(problem)
    kept = np.asarray(draws[100:])
    fc = kept[..., :4].reshape(-1, 4)
    fp = kept[..., 4].reshape(-1)
    np.testing.assert_allclose(fc.mean(0), gc.mean(0), atol=0.06)
    np.testing.assert_allclose(fc.std(0), gc.std(0), rtol=0.15)
    np.testing.assert_allclose(fp.mean(), gp.mean(), rtol=0.06)
    np.testing.assert_allclose(fp.std(), gp.std(), rtol=0.25)


def test_near_iid_mixing(problem):
    """Collapsed Gibbs draws should be near-iid: ESS/draw close to 1."""
    from binf_tpu.diagnostics import ess

    draws = run(problem, steps=600)
    kept = draws[100:]
    e = ess(kept[..., 0])
    n_total = kept.shape[0] * kept.shape[1]
    assert float(e) > 0.5 * n_total


def test_deterministic(problem):
    d1 = run(problem, seed=5, steps=100)
    d2 = run(problem, seed=5, steps=100)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
