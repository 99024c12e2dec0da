"""Bayesian logistic regression (Bernoulli GLM) end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from binf_tpu.example.logistic import (
    TRUE_WEIGHTS,
    initial_positions,
    make_logistic_posterior,
    predict_proba,
    synthetic_logistic_data,
)


@pytest.fixture(scope="module")
def problem():
    X, y = synthetic_logistic_data(jax.random.key(0))
    post = make_logistic_posterior(X, y)
    return X, y, post


def test_structure_and_gradient(problem):
    X, y, post = problem
    assert post.variables == ("weights",)
    w = jnp.zeros(len(TRUE_WEIGHTS))
    lp = post.log_prob(weights=w)
    # at w=0 every Bernoulli term is log(1/2); prior at its mode
    n = X.shape[0]
    prior_at_zero = float(post.components["weights_prior"].log_prob(weights=w))
    np.testing.assert_allclose(float(lp), n * np.log(0.5) + prior_at_zero, rtol=1e-5)
    g = jax.grad(lambda ww: post.log_prob(weights=ww))(w)
    # analytic: X^T (y - 1/2) at w=0 (prior gradient is zero at the mean)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(X.T @ (y - 0.5)), rtol=1e-4, atol=1e-4
    )


@pytest.fixture(scope="module")
def mcmc_samples(problem):
    X, y, post = problem
    from binf_tpu.parallel.runner import warmup_and_run
    from binf_tpu.samplers.nuts import nuts

    def builder(step_size, inverse_mass):
        return nuts(
            lambda p: post.log_prob(p), step_size=step_size,
            max_doublings=6, inverse_mass=inverse_mass,
        )

    samples, _, _ = warmup_and_run(
        builder,
        initial_positions(16, jax.random.key(1)),
        jax.random.key(2),
        num_warmup=300,
        num_samples=400,
        initial_step_size=0.1,
    )
    return samples


def test_nuts_recovers_weights(problem, mcmc_samples):
    w = np.asarray(mcmc_samples["weights"]).reshape(-1, len(TRUE_WEIGHTS))
    # n=200: posterior concentrated enough to recover the truth coarsely
    np.testing.assert_allclose(w.mean(0), TRUE_WEIGHTS, atol=0.6)
    # the null feature's credible interval straddles zero
    lo, hi = np.percentile(w[:, 3], [2.5, 97.5])
    assert lo < 0.0 < hi


def test_laplace_agrees_with_mcmc(problem, mcmc_samples):
    from binf_tpu.vi import laplace_approximation

    X, y, post = problem
    lap = jax.jit(
        lambda k: laplace_approximation(post, k, num_steps=1500)
    )(jax.random.key(3))
    assert bool(lap.converged)
    w_mcmc = np.asarray(mcmc_samples["weights"]).reshape(-1, len(TRUE_WEIGHTS))
    w_map = np.asarray(lap.mode["weights"])
    # logistic posterior is near-Gaussian at n=200: MAP ~ posterior mean
    np.testing.assert_allclose(w_map, w_mcmc.mean(0), atol=0.15)


@pytest.mark.slow
def test_fused_model_hmc_on_logistic(problem, mcmc_samples):
    from binf_tpu.samplers.fused import fused_model_hmc

    X, y, post = problem
    result = fused_model_hmc(
        lambda p: post.log_prob(p),
        initial_positions(64, jax.random.key(4)),
        jax.random.key(5),
        num_warmup=250,
        num_samples=300,
        num_leapfrog=10,
        block_chains=32,
    )
    assert 0.4 < float(result.accept_rate) <= 1.0
    w_fused = np.asarray(result.samples["weights"][100:]).reshape(-1, len(TRUE_WEIGHTS))
    w_mcmc = np.asarray(mcmc_samples["weights"]).reshape(-1, len(TRUE_WEIGHTS))
    np.testing.assert_allclose(w_fused.mean(0), w_mcmc.mean(0), atol=0.15)


def test_predict_proba(problem, mcmc_samples):
    X, y, post = problem
    w = jnp.asarray(
        np.asarray(mcmc_samples["weights"]).reshape(-1, len(TRUE_WEIGHTS))
    )
    p = np.asarray(predict_proba(X, w))
    assert ((p > 0) & (p < 1)).all()
    # in-sample separation: predicted probabilities track labels
    auc_proxy = p[np.asarray(y) == 1].mean() - p[np.asarray(y) == 0].mean()
    assert auc_proxy > 0.3
