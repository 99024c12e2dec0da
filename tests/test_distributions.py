"""Distribution library: log-densities vs scipy/torch or closed forms."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from binf_tpu.pdf import distributions as d

try:
    import torch

    HAVE_TORCH = True
except ImportError:  # pragma: no cover
    HAVE_TORCH = False


def t(x):
    return torch.tensor(np.asarray(x), dtype=torch.float64)


@pytest.mark.skipif(not HAVE_TORCH, reason="torch unavailable")
class TestAgainstTorch:
    """Cross-check normalized log-densities against torch.distributions."""

    xs = np.asarray([0.2, 1.0, 3.7])

    def check(self, ours, theirs, x=None, atol=1e-5):
        x = self.xs if x is None else np.asarray(x)
        np.testing.assert_allclose(
            np.asarray(ours), theirs.log_prob(t(x)).numpy(), atol=atol
        )

    def test_normal(self):
        self.check(
            d.normal_log_prob(jnp.asarray(self.xs), 0.5, 2.0),
            torch.distributions.Normal(0.5, 2.0),
        )

    def test_gamma(self):
        self.check(
            d.gamma_log_prob(jnp.asarray(self.xs), 2.5, 1.3),
            torch.distributions.Gamma(2.5, 1.3),
        )

    def test_beta(self):
        x = [0.1, 0.5, 0.9]
        self.check(
            d.beta_log_prob(jnp.asarray(x), 2.0, 3.0),
            torch.distributions.Beta(2.0, 3.0),
            x=x,
        )

    def test_student_t(self):
        self.check(
            d.student_t_log_prob(jnp.asarray(self.xs), 4.0, 0.5, 1.5),
            torch.distributions.StudentT(4.0, 0.5, 1.5),
        )

    def test_laplace(self):
        self.check(
            d.laplace_log_prob(jnp.asarray(self.xs), 0.5, 2.0),
            torch.distributions.Laplace(0.5, 2.0),
        )

    def test_cauchy(self):
        self.check(
            d.cauchy_log_prob(jnp.asarray(self.xs), 0.5, 2.0),
            torch.distributions.Cauchy(0.5, 2.0),
        )

    def test_exponential(self):
        self.check(
            d.exponential_log_prob(jnp.asarray(self.xs), 1.7),
            torch.distributions.Exponential(1.7),
        )

    def test_lognormal(self):
        self.check(
            d.lognormal_log_prob(jnp.asarray(self.xs), 0.3, 0.8),
            torch.distributions.LogNormal(0.3, 0.8),
        )

    def test_poisson(self):
        k = [0.0, 2.0, 7.0]
        self.check(
            d.poisson_log_prob(jnp.asarray(k), 3.1),
            torch.distributions.Poisson(3.1),
            x=k,
        )

    def test_binomial(self):
        k = [0.0, 4.0, 10.0]
        logits = 0.3
        self.check(
            d.binomial_log_prob(jnp.asarray(k), 10.0, logits),
            torch.distributions.Binomial(10, logits=torch.tensor(logits)),
            x=k,
        )

    def test_negative_binomial(self):
        k = [0.0, 3.0, 9.0]
        self.check(
            d.negative_binomial_log_prob(jnp.asarray(k), 5.0, -0.4),
            torch.distributions.NegativeBinomial(
                5.0, logits=torch.tensor(-0.4)
            ),
            x=k,
        )

    def test_dirichlet(self):
        x = np.asarray([[0.2, 0.3, 0.5], [0.1, 0.1, 0.8]])
        a = np.asarray([2.0, 1.0, 3.0])
        ours = d.dirichlet_log_prob(jnp.asarray(x), jnp.asarray(a))
        theirs = torch.distributions.Dirichlet(t(a)).log_prob(t(x)).numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)

    def test_weibull(self):
        self.check(
            d.weibull_log_prob(jnp.asarray(self.xs), 1.5, 2.0),
            torch.distributions.Weibull(2.0, 1.5),
        )

    def test_von_mises(self):
        x = [-1.0, 0.0, 2.0]
        self.check(
            d.von_mises_log_prob(jnp.asarray(x), 0.5, 2.0),
            torch.distributions.VonMises(0.5, 2.0),
            x=x,
        )

    def test_halfnormal(self):
        self.check(
            d.halfnormal_log_prob(jnp.asarray(self.xs), 1.5),
            torch.distributions.HalfNormal(1.5),
        )

    def test_categorical(self):
        logits = np.asarray([0.3, -1.0, 2.0, 0.1])
        k = [0, 2, 3]
        ours = d.categorical_log_prob(jnp.asarray(k), jnp.asarray(logits))
        theirs = (
            torch.distributions.Categorical(logits=t(logits))
            .log_prob(torch.tensor(k))
            .numpy()
        )
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


class TestClosedForm:
    def test_uniform(self):
        lp = d.uniform_log_prob(jnp.asarray([0.5, 2.5]), 0.0, 2.0)
        assert float(lp[0]) == pytest.approx(-math.log(2.0))
        assert float(lp[1]) == -np.inf

    def test_mv_normal_full_vs_diag(self, key):
        loc = jnp.asarray([1.0, -1.0, 0.5])
        scale = jnp.asarray([0.5, 2.0, 1.0])
        x = jax.random.normal(key, (5, 3))
        diag_lp = d.mv_normal_diag_log_prob(x, loc, scale)
        chol = jnp.diag(scale)
        full_lp = d.mv_normal_full_log_prob(x, loc, chol)
        np.testing.assert_allclose(
            np.asarray(diag_lp), np.asarray(full_lp), rtol=1e-5
        )

    def test_truncated_normal_integrates_to_one(self):
        xs = jnp.linspace(-1.0, 2.0, 4001)
        lp = d.truncated_normal_log_prob(xs, 0.3, 1.2, -1.0, 2.0)
        integral = float(jnp.trapezoid(jnp.exp(lp), xs))
        assert integral == pytest.approx(1.0, abs=1e-3)

    def test_supports(self):
        assert float(d.gamma_log_prob(jnp.asarray(-1.0), 2.0, 1.0)) == -np.inf
        assert float(d.beta_log_prob(jnp.asarray(1.5), 2.0, 2.0)) == -np.inf
        assert float(d.weibull_log_prob(jnp.asarray(-0.1), 1.0, 1.0)) == -np.inf


def test_lgamma_matches_gammaln():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.scipy import special as jsp

    from binf_tpu.ops.math import lgamma

    x = jnp.concatenate([
        jnp.linspace(0.02, 0.49, 40),
        jnp.linspace(0.5, 20.0, 200),
        jnp.linspace(20.0, 5000.0, 200),
    ])
    np.testing.assert_allclose(
        np.asarray(lgamma(x)), np.asarray(jsp.gammaln(x)), rtol=2e-5, atol=2e-5
    )
    # autodiff agrees with digamma
    g = jax.vmap(jax.grad(lgamma))(jnp.linspace(0.6, 50.0, 100))
    np.testing.assert_allclose(
        np.asarray(g),
        np.asarray(jsp.digamma(jnp.linspace(0.6, 50.0, 100))),
        rtol=1e-3, atol=1e-3,
    )


def test_i0e_matches_scipy():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from binf_tpu.ops.math import i0e

    x = jnp.linspace(0.0, 60.0, 400)
    np.testing.assert_allclose(
        np.asarray(i0e(x)), np.asarray(jax.scipy.special.i0e(x)),
        rtol=2e-5, atol=2e-6,
    )
