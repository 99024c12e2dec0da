"""ADVI tests: exact recovery on Gaussian targets, polynomial workload."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from binf_tpu.core.density import VariableSpec
from binf_tpu.pdf import FunctionPrior, Posterior
from binf_tpu.vi import advi, variational_sample


def make_gaussian_posterior(mean, var):
    mean = jnp.asarray(mean)
    var = jnp.asarray(var)

    def logp(values):
        return -0.5 * jnp.sum((values["z"] - mean) ** 2 / var)

    prior = FunctionPrior.create(
        logp, (VariableSpec("z", shape=mean.shape),), name="target"
    )
    return Posterior.create({}, {"target": prior})


def test_meanfield_recovers_diagonal_gaussian():
    post = make_gaussian_posterior([1.0, -2.0, 0.5], [0.5, 2.0, 1.0])
    result = jax.jit(
        lambda k: advi(post, k, num_steps=1500, learning_rate=0.05)
    )(jax.random.key(0))
    mu = np.asarray(result.params.mu["z"])
    sigma = np.exp(np.asarray(result.params.log_sigma["z"]))
    np.testing.assert_allclose(mu, [1.0, -2.0, 0.5], atol=0.1)
    np.testing.assert_allclose(sigma, np.sqrt([0.5, 2.0, 1.0]), rtol=0.15)
    # ELBO at optimum = entropy-matched: KL = 0 -> ELBO = log Z contribution
    samples = variational_sample(post, result, jax.random.key(1), 2000)
    np.testing.assert_allclose(
        np.asarray(samples["z"]).mean(0), [1.0, -2.0, 0.5], atol=0.12
    )


def test_fullrank_recovers_correlation():
    """Correlated 2-D Gaussian: full-rank must capture rho, mean-field can't."""
    rho = 0.8

    def logp(values):
        x = values["z"]
        return -(x[0] ** 2 - 2 * rho * x[0] * x[1] + x[1] ** 2) / (
            2 * (1 - rho**2)
        )

    prior = FunctionPrior.create(logp, (VariableSpec("z", shape=(2,)),), name="t")
    post = Posterior.create({}, {"t": prior})

    result = jax.jit(
        lambda k: advi(post, k, num_steps=3000, learning_rate=0.03, method="fullrank")
    )(jax.random.key(0))
    samples = np.asarray(variational_sample(post, result, jax.random.key(1), 4000)["z"])
    emp_rho = np.corrcoef(samples[:, 0], samples[:, 1])[0, 1]
    assert abs(emp_rho - rho) < 0.1
    np.testing.assert_allclose(samples.mean(0), [0.0, 0.0], atol=0.1)
    np.testing.assert_allclose(samples.std(0), [1.0, 1.0], rtol=0.15)


@pytest.mark.slow
def test_polynomial_posterior_advi_matches_gibbs():
    """Mean-field ADVI on the reference workload: marginal means must match
    the collapsed Gibbs sampler (variances are underestimated by mean-field,
    which is expected -- only means are compared)."""
    from binf_tpu.example.polynomial import (
        initial_positions,
        make_collapsed_gibbs_kernel,
        make_data,
        make_posterior,
    )
    from binf_tpu.parallel.runner import init_chains, run_chains

    xses, ys = make_data(jax.random.key(1))
    posterior = make_posterior(xses, ys)

    result = jax.jit(
        lambda k: advi(posterior, k, num_steps=3000, learning_rate=0.02)
    )(jax.random.key(2))
    vi_samples = variational_sample(posterior, result, jax.random.key(3), 2000)

    kernel = make_collapsed_gibbs_kernel(posterior)
    states = init_chains(kernel, initial_positions(64))
    _, samples = jax.jit(lambda s, k: run_chains(kernel, k, s, 300))(
        states, jax.random.key(4)
    )
    gibbs_c = np.asarray(samples["coefficients"][100:]).reshape(-1, 4)
    gibbs_p = np.asarray(samples["precision"][100:]).ravel()

    vi_c = np.asarray(vi_samples["coefficients"])
    vi_p = np.asarray(vi_samples["precision"])
    np.testing.assert_allclose(vi_c.mean(0), gibbs_c.mean(0), atol=0.1)
    np.testing.assert_allclose(vi_p.mean(), gibbs_p.mean(), rtol=0.15)
    assert (vi_p > 0).all()  # transform respected positivity


def test_elbo_increases():
    post = make_gaussian_posterior([0.0], [1.0])
    result = jax.jit(lambda k: advi(post, k, num_steps=500))(jax.random.key(0))
    trace = np.asarray(result.elbo_trace)
    assert trace[-50:].mean() > trace[:50].mean()
