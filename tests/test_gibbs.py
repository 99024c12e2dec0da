"""Gibbs engine + conjugate block tests, including the reference workload.

Statistical validation: the polynomial-regression posterior is conjugate
(Normal-Gamma), so the collapsed Gibbs sampler's moments can be checked
against the exact analytic posterior -- a much stronger test than the
reference has (its Gibbs test uses deterministic mock subsamplers only,
``binf/tests/samplers/gibbs.py``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from binf_tpu.example.polynomial import (
    initial_positions,
    make_collapsed_gibbs_kernel,
    make_data,
    make_gibbs_kernel,
    make_posterior,
)
from binf_tpu.parallel.runner import init_chains, run_chains
from binf_tpu.samplers.gibbs import gibbs, mh_block


@pytest.fixture(scope="module")
def setup():
    key = jax.random.key(42)
    xses, ys = make_data(key)
    posterior = make_posterior(xses, ys)
    return xses, ys, posterior


def exact_coefficient_posterior(xses, ys, precision):
    """Analytic conditional N(mean, cov) for coefficients given precision."""
    V = np.vander(np.asarray(xses), 4, increasing=True)
    y = np.asarray(ys)
    prec_mat = precision * V.T @ V + np.eye(4) / 5.0
    cov = np.linalg.inv(prec_mat)
    mean = cov @ (precision * V.T @ y)
    return mean, cov


def test_gibbs_sweep_structure(setup, key):
    _, _, posterior = setup
    kernel = make_gibbs_kernel(posterior, rwmc_stepsize=0.1)
    state = kernel.init({"coefficients": jnp.ones(4), "precision": jnp.ones(())})
    state, infos = kernel.step(key, state)
    assert set(infos) == {"coefficients", "precision"}
    assert state.position["coefficients"].shape == (4,)
    # conjugate block always accepts
    assert bool(infos["precision"].accepted)


def test_gibbs_is_jittable_and_vmappable(setup, key):
    _, _, posterior = setup
    kernel = make_gibbs_kernel(posterior)
    n = 16
    positions = initial_positions(n)
    states = init_chains(kernel, positions)
    final, samples = jax.jit(lambda s, k: run_chains(kernel, k, s, 10))(states, key)
    assert samples["coefficients"].shape == (10, n, 4)
    assert np.isfinite(np.asarray(samples["precision"])).all()


def test_collapsed_gibbs_matches_exact_posterior(setup):
    """Moments from the fully-conjugate Gibbs sampler vs analytic
    Normal-Gamma posterior -- the reference's correctness criterion
    (posterior moments within MC error, BASELINE.md) made exact."""
    xses, ys, posterior = setup
    kernel = make_collapsed_gibbs_kernel(posterior)

    n_chains, n_steps, burn = 128, 400, 100
    key = jax.random.key(7)
    positions = initial_positions(n_chains)
    states = init_chains(kernel, positions)
    _, samples = jax.jit(lambda s, k: run_chains(kernel, k, s, n_steps))(states, key)

    coeffs = np.asarray(samples["coefficients"][burn:]).reshape(-1, 4)
    prec = np.asarray(samples["precision"][burn:]).reshape(-1)

    # marginal mean of coefficients ~ conditional mean at posterior-mean
    # precision (good to a few percent for this well-identified model)
    mean_c = coeffs.mean(axis=0)
    exact_mean, _ = exact_coefficient_posterior(xses, ys, prec.mean())
    np.testing.assert_allclose(mean_c, exact_mean, atol=0.05)

    # precision posterior: Gamma(alpha + n/2, beta + E[SS]/2) self-consistency
    V = np.vander(np.asarray(xses), 4, increasing=True)
    resid = np.asarray(ys)[:, None] - V @ coeffs.T  # (n, draws)
    ss = (resid**2).sum(axis=0)
    alpha_post = 1.0 + 10.0  # alpha + n/2 with n = 20
    expected_prec_mean = np.mean(alpha_post / (0.2 + ss / 2.0))
    np.testing.assert_allclose(prec.mean(), expected_prec_mean, rtol=0.05)


def test_rwm_gibbs_agrees_with_collapsed(setup):
    """The reference-style sampler (RWMC coefficients + conjugate precision)
    must converge to the same posterior as the collapsed sampler."""
    xses, ys, posterior = setup
    ref_kernel = make_gibbs_kernel(posterior, rwmc_stepsize=0.12)
    col_kernel = make_collapsed_gibbs_kernel(posterior)

    key = jax.random.key(3)
    k1, k2 = jax.random.split(key)
    n_chains = 64

    def run(kernel, k, n_steps, burn):
        states = init_chains(kernel, initial_positions(n_chains))
        _, samples = jax.jit(lambda s, kk: run_chains(kernel, kk, s, n_steps))(
            states, k
        )
        return (
            np.asarray(samples["coefficients"][burn:]).reshape(-1, 4),
            np.asarray(samples["precision"][burn:]).reshape(-1),
        )

    # RWM mixes slowly (the reference uses 30k sweeps); use enough sweeps
    c_ref, p_ref = run(ref_kernel, k1, 3000, 1500)
    c_col, p_col = run(col_kernel, k2, 400, 100)

    np.testing.assert_allclose(c_ref.mean(axis=0), c_col.mean(axis=0), atol=0.12)
    np.testing.assert_allclose(p_ref.mean(), p_col.mean(), rtol=0.12)


def test_gamma_block_shape_convention():
    """Validate the conjugate shape alpha + n/2 by moment-matching a pure
    Normal-with-known-mean precision inference where the posterior is
    analytic (SURVEY.md section 2 #22 re-derivation caveat)."""
    from binf_tpu.model import GaussianErrorModel, PolynomialForwardModel
    from binf_tpu.pdf import GammaPrior, Likelihood, Posterior
    from binf_tpu.samplers.conjugate import gamma_precision_block

    key = jax.random.key(0)
    n = 50
    true_prec = 4.0
    data = jax.random.normal(key, (n,)) / jnp.sqrt(true_prec)

    # constant-zero forward model: mock = 0 * c  (degree-0 polynomial times 0)
    fwm = PolynomialForwardModel.create(jnp.zeros(n), 1)
    # x=0 => vandermonde column of ones; fix coefficient to 0 to get mock=0
    em = GaussianErrorModel.create(data)
    lik = Likelihood.create("pts", fwm, em)
    post = Posterior.create(
        {"pts": lik}, {"p": GammaPrior.create(2.0, 1.0, variable="precision")}
    )
    block = gamma_precision_block(post, "precision")

    keys = jax.random.split(jax.random.key(1), 4000)
    pos = {"coefficients": jnp.zeros(1), "precision": jnp.ones(())}
    draws = jax.vmap(lambda k: block(k, pos)[0]["precision"])(keys)
    draws = np.asarray(draws)

    ss = float(jnp.sum(data**2))
    alpha_post, beta_post = 2.0 + n / 2.0, 1.0 + ss / 2.0
    np.testing.assert_allclose(draws.mean(), alpha_post / beta_post, rtol=0.05)
    np.testing.assert_allclose(
        draws.var(), alpha_post / beta_post**2, rtol=0.15
    )


def test_custom_block_composition(key):
    """Gibbs over a correlated 2-D Gaussian with two scalar MH blocks mixes
    to the right marginals (pure engine test, no conjugacy)."""
    from binf_tpu.pdf import FunctionPrior
    from binf_tpu.pdf.posterior import Posterior
    from binf_tpu.core.density import VariableSpec

    rho = 0.5

    def logp(values):
        x, y = values["x"], values["y"]
        return -(x**2 - 2 * rho * x * y + y**2) / (2 * (1 - rho**2))

    prior = FunctionPrior.create(
        logp, (VariableSpec("x"), VariableSpec("y")), name="corr"
    )
    post = Posterior.create({}, {"corr": prior})
    kernel = gibbs(
        {
            "x": mh_block(post, "x", 1.5),
            "y": mh_block(post, "y", 1.5),
        }
    )
    n_chains = 256
    positions = {"x": jnp.zeros(n_chains), "y": jnp.zeros(n_chains)}
    states = init_chains(kernel, positions)
    _, samples = jax.jit(lambda s, k: run_chains(kernel, k, s, 800))(states, key)
    x = np.asarray(samples["x"][400:]).ravel()
    y = np.asarray(samples["y"][400:]).ravel()
    assert abs(x.mean()) < 0.1
    assert abs(x.std() - 1.0) < 0.1
    assert abs(np.corrcoef(x, y)[0, 1] - rho) < 0.1
