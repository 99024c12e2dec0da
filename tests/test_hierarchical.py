"""Hierarchical nonlinear model: NUTS + ADVI end-to-end (BASELINE config 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from binf_tpu.example.hierarchical import (
    TRUE_MU,
    make_hierarchical_posterior,
    synthetic_hierarchical_data,
)
from binf_tpu.pdf.transforms import LogTransform, transform_logdensity


@pytest.fixture(scope="module")
def problem():
    key = jax.random.key(0)
    n_groups = 8
    x, y, counts, gp_true = synthetic_hierarchical_data(key, n_groups)
    post = make_hierarchical_posterior(x, y, counts, n_groups)
    return post, gp_true, n_groups


def test_structure(problem):
    post, gp_true, n_groups = problem
    assert post.variables == ("group_params", "log_tau", "mu", "precision")
    lp = post.log_prob(
        group_params=gp_true,
        mu=jnp.asarray(TRUE_MU),
        log_tau=jnp.log(jnp.asarray([0.3, 0.25])),
        precision=25.0,
    )
    assert np.isfinite(float(lp))
    # both likelihoods see group_params (shared-variable routing)
    parts = post.component_log_probs(
        group_params=gp_true,
        mu=jnp.asarray(TRUE_MU),
        log_tau=jnp.log(jnp.asarray([0.3, 0.25])),
        precision=25.0,
    )
    assert set(parts) == {"curves", "counts", "hierarchy", "precision_prior"}


@pytest.fixture(scope="module")
def nuts_samples(problem):
    """Window-adapted NUTS: the hierarchical funnel needs the learned
    diagonal metric (fixed-metric NUTS gives ESS ~ 40 here; adapted ~ 5000)."""
    post, gp_true, n_groups = problem
    from binf_tpu.parallel.runner import warmup_and_run
    from binf_tpu.samplers.nuts import nuts

    logdensity = transform_logdensity(
        lambda p: post.log_prob(p), {"precision": LogTransform}
    )

    def builder(step_size, inverse_mass):
        return nuts(
            logdensity, step_size=step_size, max_doublings=7,
            inverse_mass=inverse_mass,
        )

    n_chains = 16
    key = jax.random.key(1)
    positions = {
        "group_params": jnp.zeros((n_chains, n_groups, 2))
        + 0.1 * jax.random.normal(key, (n_chains, n_groups, 2)),
        "mu": jnp.zeros((n_chains, 2)),
        "log_tau": jnp.full((n_chains, 2), -1.0),
        "precision": jnp.full((n_chains,), 2.0),  # log space
    }
    samples, _, _ = warmup_and_run(
        builder,
        positions,
        jax.random.key(2),
        num_warmup=500,
        num_samples=600,
        initial_step_size=0.05,
        target_accept=0.85,
    )
    return samples


def test_nuts_recovers_hyperparameters(problem, nuts_samples):
    post, gp_true, n_groups = problem
    mu = np.asarray(nuts_samples["mu"]).reshape(-1, 2)
    # posterior mean of mu near the truth (8 groups -> moderate precision)
    np.testing.assert_allclose(mu.mean(0), TRUE_MU, atol=0.35)
    prec = np.exp(np.asarray(nuts_samples["precision"]).ravel())
    assert 10.0 < prec.mean() < 45.0  # truth 25

    # per-group params: rate is weakly identified for low-amplitude groups,
    # so compare with the posterior's own scale
    gp = np.asarray(nuts_samples["group_params"]).reshape(-1, n_groups, 2)
    np.testing.assert_allclose(gp.mean(0), np.asarray(gp_true), atol=0.5)
    z = np.abs(gp.mean(0) - np.asarray(gp_true)) / np.maximum(gp.std(0), 1e-3)
    assert np.median(z) < 3.0


def test_nuts_diagnostics(nuts_samples):
    from binf_tpu.diagnostics import split_rhat

    r = np.asarray(split_rhat(nuts_samples["mu"]))
    assert (r < 1.2).all()


@pytest.mark.slow
def test_advi_agrees_with_nuts(problem, nuts_samples):
    from binf_tpu.vi import advi, variational_sample

    post, gp_true, n_groups = problem
    result = jax.jit(
        lambda k: advi(post, k, num_steps=2500, learning_rate=0.02)
    )(jax.random.key(5))
    vi = variational_sample(post, result, jax.random.key(6), 1000)

    nuts_mu = np.asarray(nuts_samples["mu"]).reshape(-1, 2).mean(0)
    vi_mu = np.asarray(vi["mu"]).mean(0)
    np.testing.assert_allclose(vi_mu, nuts_mu, atol=0.25)

    nuts_prec = np.exp(np.asarray(nuts_samples["precision"])).mean()
    vi_prec = np.asarray(vi["precision"]).mean()
    np.testing.assert_allclose(vi_prec, nuts_prec, rtol=0.3)
