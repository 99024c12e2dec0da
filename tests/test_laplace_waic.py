"""Laplace approximation + model comparison (WAIC / PSIS-LOO) tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from binf_tpu.diagnostics.model_comparison import (
    pointwise_log_likelihood,
    psis_loo,
    waic,
)
from binf_tpu.example.polynomial import (
    initial_positions,
    make_collapsed_gibbs_kernel,
    make_data,
    make_posterior,
)
from binf_tpu.parallel.runner import init_chains, run_chains
from binf_tpu.vi.laplace import (
    inverse_mass_from_laplace,
    laplace_approximation,
    laplace_sample,
)


@pytest.fixture(scope="module")
def setup():
    xses, ys = make_data(jax.random.key(1))
    posterior = make_posterior(xses, ys)
    kernel = make_collapsed_gibbs_kernel(posterior)
    states = init_chains(kernel, initial_positions(32))
    _, samples = jax.jit(lambda s, k: run_chains(kernel, k, s, 300))(
        states, jax.random.key(2)
    )
    flat = {
        "coefficients": samples["coefficients"][100:].reshape(-1, 4),
        "precision": samples["precision"][100:].reshape(-1),
    }
    return xses, ys, posterior, flat


class TestLaplace:
    def test_mode_matches_posterior_mean(self, setup):
        xses, ys, posterior, mcmc = setup
        result = jax.jit(
            lambda k: laplace_approximation(posterior, k, num_steps=1500)
        )(jax.random.key(0))
        assert bool(result.converged)
        # near-Gaussian posterior: MAP ~ posterior mean of coefficients
        np.testing.assert_allclose(
            np.asarray(result.mode["coefficients"]),
            np.asarray(mcmc["coefficients"]).mean(0),
            atol=0.05,
        )

    @pytest.mark.slow
    def test_laplace_samples_match_mcmc_spread(self, setup):
        xses, ys, posterior, mcmc = setup
        result = laplace_approximation(posterior, jax.random.key(0), num_steps=1500)
        draws = laplace_sample(posterior, result, jax.random.key(1), 4000)
        lc = np.asarray(draws["coefficients"])
        mc = np.asarray(mcmc["coefficients"])
        np.testing.assert_allclose(lc.mean(0), mc.mean(0), atol=0.06)
        np.testing.assert_allclose(lc.std(0), mc.std(0), rtol=0.25)
        assert (np.asarray(draws["precision"]) > 0).all()

    @pytest.mark.slow
    def test_evidence_matches_smc(self, setup):
        """Laplace evidence vs SMC evidence on the same posterior."""
        from binf_tpu.smc import tempered_smc

        xses, ys, posterior, _ = setup
        # full normalization needed for absolute evidence: rebuild with const
        from binf_tpu.example.polynomial import make_likelihood, make_priors
        from binf_tpu.model import GaussianErrorModel, PolynomialForwardModel
        from binf_tpu.pdf import Likelihood, Posterior

        fwm = PolynomialForwardModel.create(xses, 4)
        em = GaussianErrorModel.create(ys, full_normalization=True)
        lik = Likelihood.create("points", fwm, em)
        post = Posterior.create({"points": lik}, make_priors())

        lap = laplace_approximation(post, jax.random.key(0), num_steps=1500)
        smc = jax.jit(
            lambda k: tempered_smc(post, k, num_particles=2048, num_mutation_steps=8)
        )(jax.random.key(3))
        assert abs(float(lap.log_evidence_laplace) - float(smc.log_evidence)) < 1.5

    def test_inverse_mass_export(self, setup):
        xses, ys, posterior, _ = setup
        result = laplace_approximation(posterior, jax.random.key(0), num_steps=800)
        im = inverse_mass_from_laplace(posterior, result)
        assert set(im) == {"coefficients", "precision"}
        assert (np.asarray(im["coefficients"]) > 0).all()


class TestModelComparison:
    def test_pointwise_ll_shape(self, setup):
        xses, ys, posterior, mcmc = setup
        lik = posterior.likelihoods["points"]
        sub = {k: v[:500] for k, v in mcmc.items()}
        ll = pointwise_log_likelihood(lik, sub)
        assert ll.shape == (500, 20)
        # summing pointwise terms recovers the full (normalized) loglik
        total = float(ll[0].sum())
        from binf_tpu.model import GaussianErrorModel, PolynomialForwardModel
        from binf_tpu.pdf import Likelihood

        fwm = PolynomialForwardModel.create(xses, 4)
        em = GaussianErrorModel.create(ys, full_normalization=True)
        norm_lik = Likelihood.create("p", fwm, em)
        expect = float(norm_lik.log_prob(
            coefficients=sub["coefficients"][0], precision=sub["precision"][0]
        ))
        assert total == pytest.approx(expect, rel=1e-4)

    @pytest.mark.slow
    def test_waic_prefers_true_model(self, setup):
        """WAIC: degree-3 polynomial (true) beats degree-1 on the same data."""
        xses, ys, posterior, mcmc = setup
        sub = {k: v[:1000] for k, v in mcmc.items()}
        ll_true = pointwise_log_likelihood(posterior.likelihoods["points"], sub)
        w_true = waic(ll_true)

        # underfit model: degree-1
        post1 = make_posterior(xses, ys, n_coefficients=2)
        kernel1 = make_collapsed_gibbs_kernel(post1)
        states1 = init_chains(kernel1, initial_positions(32, n_coefficients=2))
        _, s1 = jax.jit(lambda s, k: run_chains(kernel1, k, s, 300))(
            states1, jax.random.key(5)
        )
        sub1 = {
            "coefficients": s1["coefficients"][100:].reshape(-1, 2)[:1000],
            "precision": s1["precision"][100:].reshape(-1)[:1000],
        }
        ll_under = pointwise_log_likelihood(post1.likelihoods["points"], sub1)
        w_under = waic(ll_under)
        assert float(w_true.elpd) > float(w_under.elpd) + 2.0
        assert float(w_true.p_eff) > 0

    def test_psis_loo_close_to_waic(self, setup):
        xses, ys, posterior, mcmc = setup
        sub = {k: v[:1000] for k, v in mcmc.items()}
        ll = pointwise_log_likelihood(posterior.likelihoods["points"], sub)
        w = waic(ll)
        l = psis_loo(ll)
        assert abs(float(w.elpd) - float(l.elpd)) < 2.0
        assert np.asarray(l.pareto_k).shape == (20,)
        assert (np.asarray(l.pareto_k) < 1.0).all()
