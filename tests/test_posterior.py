"""Posterior composition tests (the reference has no Posterior test file --
SURVEY.md section 4 flags this gap; these close it)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from binf_tpu.model import GaussianErrorModel, PolynomialForwardModel
from binf_tpu.ops.math import polyval
from binf_tpu.pdf import GammaPrior, GaussianPrior, Likelihood, Posterior


@pytest.fixture
def poly_posterior():
    xses = jnp.linspace(-2, 2, 20)
    ys = polyval(xses, jnp.asarray([2.0, -4.0, 1.0, 1.5]))
    fwm = PolynomialForwardModel.create(xses, 4)
    em = GaussianErrorModel.create(ys)
    lik = Likelihood.create("points", fwm, em)
    priors = {
        "precision_prior": GammaPrior.create(1.0, 0.2, variable="precision"),
        "coefficients_prior": GaussianPrior.create(
            jnp.zeros(4), jnp.ones(4) * 5.0, variable="coefficients"
        ),
    }
    return Posterior.create({"points": lik}, priors)


def test_variable_aggregation(poly_posterior):
    assert poly_posterior.variables == ("coefficients", "precision")
    assert poly_posterior.differentiable_variables == ("coefficients", "precision")


def test_additive_composition(poly_posterior):
    c = jnp.asarray([2.0, -4.0, 1.0, 1.5])
    p = jnp.asarray(2.5)
    total = poly_posterior.log_prob(coefficients=c, precision=p)
    parts = poly_posterior.component_log_probs(coefficients=c, precision=p)
    assert float(total) == pytest.approx(float(sum(parts.values())), rel=1e-5)
    assert set(parts) == {"points", "precision_prior", "coefficients_prior"}


def test_exact_value_at_truth(poly_posterior):
    # zero residuals at the true coefficients: likelihood = n/2 log(prec)
    c = jnp.asarray([2.0, -4.0, 1.0, 1.5])
    parts = poly_posterior.component_log_probs(coefficients=c, precision=1.0)
    assert float(parts["points"]) == pytest.approx(0.0, abs=1e-4)


def test_conditional_factory(poly_posterior):
    cond = poly_posterior.conditional_factory(precision=2.5)
    assert cond.variables == ("coefficients",)
    c = jnp.asarray([2.0, -4.0, 1.0, 1.5])
    lp1 = cond.log_prob(coefficients=c)
    lp2 = poly_posterior.log_prob(coefficients=c, precision=2.5)
    assert float(lp1) == pytest.approx(float(lp2), rel=1e-6)


def test_gradient_matches_analytic(poly_posterior):
    """grad w.r.t. coefficients = prec * V^T (y - V c) - c / var_prior."""
    c = jnp.asarray([1.0, 1.0, 1.0, 1.0])
    prec = 2.5
    g = poly_posterior.gradient(coefficients=c, precision=prec)

    V = poly_posterior.likelihoods["points"].forward_model.vandermonde
    y = poly_posterior.likelihoods["points"].error_model.data
    resid = V @ c - y
    expected_c = -prec * (V.T @ resid) - c / 5.0
    assert jnp.allclose(g["coefficients"], expected_c, rtol=1e-4)

    # grad w.r.t. precision: -0.5 sum r^2 + n/(2 prec) + (a-1)/prec - b
    n = y.shape[0]
    expected_p = -0.5 * jnp.sum(resid**2) + 0.5 * n / prec + (1.0 - 1.0) / prec - 0.2
    assert float(g["precision"]) == pytest.approx(float(expected_p), rel=1e-4)


def test_gradient_vs_finite_differences(poly_posterior):
    c = jnp.asarray([0.5, -1.0, 0.3, 0.7])
    prec = 1.7
    g = poly_posterior.gradient(coefficients=c, precision=prec)
    eps = 1e-3
    for i in range(4):
        dc = jnp.zeros(4).at[i].set(eps)
        fd = (
            poly_posterior.log_prob(coefficients=c + dc, precision=prec)
            - poly_posterior.log_prob(coefficients=c - dc, precision=prec)
        ) / (2 * eps)
        assert float(g["coefficients"][i]) == pytest.approx(float(fd), rel=2e-2)


def test_tempered_posterior(poly_posterior):
    c = jnp.asarray([0.5, -1.0, 0.3, 0.7])
    half = poly_posterior.tempered(0.5)
    ll = poly_posterior.log_likelihood(coefficients=c, precision=1.3)
    ll_half = half.log_likelihood(coefficients=c, precision=1.3)
    assert float(ll_half) == pytest.approx(0.5 * float(ll), rel=1e-5)
    # beta=0 removes the likelihood entirely
    prior_only = poly_posterior.tempered(0.0)
    parts = prior_only.component_log_probs(coefficients=c, precision=1.3)
    assert float(parts["points"]) == pytest.approx(0.0, abs=1e-6)


def test_posterior_jit_and_vmap(poly_posterior):
    @jax.jit
    def lp(post, c, p):
        return post.log_prob(coefficients=c, precision=p)

    cs = jnp.ones((8, 4))
    ps = jnp.ones(8) * 2.0
    batched = jax.vmap(lambda c, p: lp(poly_posterior, c, p))(cs, ps)
    assert batched.shape == (8,)
    assert np.isfinite(np.asarray(batched)).all()
