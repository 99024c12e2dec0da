"""SMC tests: resampling properties, adaptive tempering, evidence estimates."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from binf_tpu.smc import (
    effective_sample_size,
    multinomial_resample,
    stratified_resample,
    systematic_resample,
    tempered_smc,
)


class TestResampling:
    def test_ess_uniform_weights(self):
        lw = jnp.zeros(100)
        assert float(effective_sample_size(lw)) == pytest.approx(100.0, rel=1e-5)

    def test_ess_degenerate(self):
        lw = jnp.full(100, -jnp.inf).at[0].set(0.0)
        assert float(effective_sample_size(lw)) == pytest.approx(1.0, rel=1e-5)

    @pytest.mark.parametrize(
        "resampler", [systematic_resample, stratified_resample, multinomial_resample]
    )
    def test_unbiased_counts(self, key, resampler):
        """Expected offspring count of particle i is N * w_i."""
        n = 64
        lw = jnp.log(jnp.arange(1, n + 1, dtype=jnp.float32))
        w = np.asarray(jax.nn.softmax(lw))
        keys = jax.random.split(key, 500)
        idx = jax.vmap(lambda k: resampler(k, lw))(keys)
        counts = np.bincount(np.asarray(idx).ravel(), minlength=n) / 500.0
        np.testing.assert_allclose(counts, n * w, atol=0.5)

    def test_systematic_low_variance(self, key):
        """Systematic resampling: offspring count of particle i deviates from
        N*w_i by less than 1 for every draw."""
        n = 32
        lw = jax.random.normal(key, (n,))
        w = np.asarray(jax.nn.softmax(lw))
        idx = np.asarray(systematic_resample(jax.random.key(5), lw))
        counts = np.bincount(idx, minlength=n)
        assert np.all(np.abs(counts - n * w) <= 1.0 + 1e-6)


class TestTemperedSMC:
    def test_gaussian_evidence(self):
        """Conjugate 1-D model: x_i ~ N(mu, 1), mu ~ N(0, 1).  The evidence
        is analytic; SMC must recover it and the posterior moments."""
        from binf_tpu.core.density import VariableSpec
        from binf_tpu.model import GaussianErrorModel
        from binf_tpu.model.forward import ParametricCurveModel
        from binf_tpu.pdf import GaussianPrior, Likelihood, Posterior

        key = jax.random.key(0)
        n = 10
        data = np.asarray(jax.random.normal(key, (n,))) + 1.5

        def const_fn(x, values):
            return jnp.broadcast_to(values["mu"], (n,))

        fwm = ParametricCurveModel(
            x=jnp.zeros(n),
            fn=const_fn,
            specs=(VariableSpec("mu", shape=()),),
        )
        em = GaussianErrorModel.create(data, full_normalization=True)
        em = em.fix(precision=1.0)
        lik = Likelihood.create("obs", fwm, em)
        post = Posterior.create(
            {"obs": lik},
            {"mu_prior": GaussianPrior.create(jnp.zeros(()), jnp.ones(()), variable="mu")},
        )

        result = jax.jit(
            lambda k: tempered_smc(post, k, num_particles=2048, num_mutation_steps=5)
        )(jax.random.key(42))

        # analytic posterior: mu | y ~ N(n ybar / (n+1), 1/(n+1))
        ybar = data.mean()
        post_mean = n * ybar / (n + 1)
        post_var = 1.0 / (n + 1)
        mu = np.asarray(result.particles["mu"])
        assert abs(mu.mean() - post_mean) < 0.05
        assert abs(mu.var() - post_var) < 0.03

        # analytic evidence: y ~ N(0, I + 11^T)
        cov = np.eye(n) + np.ones((n, n))
        _, logdet = np.linalg.slogdet(cov)
        quad = data @ np.linalg.solve(cov, data)
        logZ = -0.5 * (n * np.log(2 * np.pi) + logdet + quad)
        assert abs(float(result.log_evidence) - logZ) < 0.25
        assert float(result.final_beta) == 1.0

    def test_polynomial_posterior_moments(self):
        """SMC on the reference polynomial workload agrees with the collapsed
        Gibbs sampler."""
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
            lambda k: tempered_smc(
                posterior,
                k,
                num_particles=2048,
                mutation="rwm",
                num_mutation_steps=10,
            )
        )(jax.random.key(2))

        kernel = make_collapsed_gibbs_kernel(posterior)
        states = init_chains(kernel, initial_positions(64))
        _, samples = jax.jit(lambda s, k: run_chains(kernel, k, s, 300))(
            states, jax.random.key(3)
        )

        smc_c = np.asarray(result.particles["coefficients"])
        gibbs_c = np.asarray(samples["coefficients"][100:]).reshape(-1, 4)
        np.testing.assert_allclose(smc_c.mean(0), gibbs_c.mean(0), atol=0.1)

        smc_p = np.asarray(result.particles["precision"])
        gibbs_p = np.asarray(samples["precision"][100:]).ravel()
        np.testing.assert_allclose(smc_p.mean(), gibbs_p.mean(), rtol=0.15)
        assert int(result.num_stages) < 50

    def test_hmc_mutation(self):
        from binf_tpu.example.polynomial import make_data, make_posterior

        xses, ys = make_data(jax.random.key(1))
        posterior = make_posterior(xses, ys)
        result = jax.jit(
            lambda k: tempered_smc(
                posterior,
                k,
                num_particles=512,
                mutation="hmc",
                num_mutation_steps=3,
                initial_step_size=0.1,
            )
        )(jax.random.key(4))
        assert float(result.final_beta) == 1.0
        assert np.isfinite(np.asarray(result.particles["coefficients"])).all()

    def test_log_prefixed_variables_not_double_transformed(self):
        """Regression: default_transforms used to match ``log_sigma``
        against the positive-name heuristic (endswith ``_sigma``) and
        apply a LogTransform to an already-log-space variable, producing
        NaN evidence on the mixture posterior."""
        from binf_tpu.example.mixture import (
            make_mixture_posterior,
            synthetic_mixture_data,
        )
        from binf_tpu.pdf.transforms import default_transforms

        y = synthetic_mixture_data(jax.random.key(0))
        post = make_mixture_posterior(y)
        tr = default_transforms(post)
        assert "log_sigma" not in tr
        assert "log_weights" not in tr

    @pytest.mark.slow
    def test_mixture_smc_recovers_modes(self):
        """Tempered SMC on the 3-component mixture: finite evidence and
        sorted component means at the truth (needs >=20 mutation steps --
        5 undermixes, measured)."""
        from binf_tpu.example.mixture import (
            TRUE_MEANS,
            make_mixture_posterior,
            synthetic_mixture_data,
        )

        y = synthetic_mixture_data(jax.random.key(0))
        post = make_mixture_posterior(y)
        result = jax.jit(
            lambda k: tempered_smc(
                post, k, num_particles=1024, mutation="hmc",
                num_mutation_steps=20, max_stages=200,
            )
        )(jax.random.key(5))
        assert np.isfinite(float(result.log_evidence))
        assert float(result.final_beta) == 1.0
        means = np.sort(
            np.asarray(jnp.mean(jnp.sort(result.particles["means"], -1), 0))
        )
        np.testing.assert_allclose(means, TRUE_MEANS, atol=0.35)
