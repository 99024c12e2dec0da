"""Exact conjugate Gibbs updates.

Re-derivation of the reference's ``GammaSampler``
(``binf/example/samplers.py:7-51``): for a Gaussian error model with
precision lambda, data y, mock data m(theta), and a Gamma(alpha, beta) prior,

    p(lambda | theta, y) ~ lambda^{n/2} exp(-lambda/2 sum r^2)
                           * lambda^{alpha-1} exp(-beta lambda)
                         = Gamma(shape = alpha + n/2,
                                 rate  = beta + sum(r^2)/2)

SURVEY.md section 2 (#22) flags the reference's ``0.5 n + alpha - 1`` shape
as a parameter-vs-exponent offset against ``np.random.gamma``'s convention;
the exact shape is ``alpha + n/2`` (validated by moment tests in
``tests/test_gibbs.py``), which is what we use.

Also provides the Gaussian-Gaussian conjugate update for linear forward
models (coefficients given precision) -- turning the reference's
polynomial-regression workload into a fully-collapsed Gibbs sampler with
zero rejections.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from binf_tpu.samplers.base import Position
from binf_tpu.samplers.gibbs import BlockFn, direct_block

Array = jax.Array

__all__ = [
    "ConjugateInfo",
    "gamma_precision_block",
    "gaussian_linear_block",
]


class ConjugateInfo(NamedTuple):
    """Exact draws always 'accept'."""

    accepted: Array
    acceptance_prob: Array


def gamma_precision_block(
    posterior,
    precision_var: str = "precision",
    likelihood_name: str | None = None,
    prior_name: str | None = None,
) -> BlockFn:
    """Exact Gibbs draw of a Gaussian error model's precision.

    Introspects the posterior for the Gaussian likelihood and the Gamma
    prior over ``precision_var`` (the reference's ``_get_prior`` pattern,
    ``binf/example/samplers.py:14-25``), then samples the closed-form
    conditional.
    """
    from binf_tpu.model.error import GaussianErrorModel
    from binf_tpu.pdf.priors import GammaPrior

    # resolve components at build time (static structure)
    if likelihood_name is None:
        candidates = [
            n
            for n, l in posterior.likelihoods.items()
            if isinstance(getattr(l, "error_model", None), GaussianErrorModel)
            and precision_var in l.variables
        ]
        if not candidates:
            raise ValueError(
                f"no Gaussian likelihood with variable {precision_var!r} found"
            )
        likelihood_name = candidates[0]
    if prior_name is None:
        candidates = [
            n
            for n, p in posterior.priors.items()
            if isinstance(p, GammaPrior) and precision_var in p.variables
        ]
        if not candidates:
            raise ValueError(f"no GammaPrior over {precision_var!r} found")
        prior_name = candidates[0]

    lik = posterior.likelihoods[likelihood_name]
    prior = posterior.priors[prior_name]
    if not isinstance(prior, GammaPrior):
        raise TypeError(
            f"prior {prior_name!r} is not a GammaPrior"
        )  # reference raises NotImplementedError here (:21-24)

    def sample_fn(key: Array, position: Position):
        fwm = lik.forward_model
        fwm_vals = {k: position[k] for k in fwm.variables if k != precision_var}
        mock = fwm._evaluate(fwm_vals)
        data = lik.error_model.data
        resid = mock - data
        n = data.shape[0]
        shape = prior.shape_param + 0.5 * n
        rate = prior.rate + 0.5 * jnp.sum(resid * resid)
        draw = jax.random.gamma(key, shape) / rate
        info = ConjugateInfo(jnp.asarray(True), jnp.ones(()))
        return {precision_var: draw}, info

    return direct_block(sample_fn)


def gaussian_linear_block(
    posterior,
    coefficients_var: str = "coefficients",
    precision_var: str = "precision",
    likelihood_name: str | None = None,
    prior_name: str | None = None,
) -> BlockFn:
    """Exact Gibbs draw of linear-model coefficients under a Gaussian prior.

    For mock = V theta, Gaussian noise precision lambda, prior
    N(mu0, diag(v0)):  p(theta | lambda, y) = N(Sigma (lambda V^T y + mu0/v0),
    Sigma) with Sigma^{-1} = lambda V^T V + diag(1/v0).  Solved via Cholesky
    each draw -- O(d^3) with tiny d, fully on the MXU for batched chains.
    """
    from binf_tpu.model.forward import LinearForwardModel, PolynomialForwardModel
    from binf_tpu.pdf.priors import GaussianPrior

    if likelihood_name is None:
        candidates = [
            n
            for n, l in posterior.likelihoods.items()
            if isinstance(
                getattr(l, "forward_model", None),
                (LinearForwardModel, PolynomialForwardModel),
            )
        ]
        if not candidates:
            raise ValueError("no linear forward model found")
        likelihood_name = candidates[0]
    if prior_name is None:
        candidates = [
            n
            for n, p in posterior.priors.items()
            if isinstance(p, GaussianPrior) and coefficients_var in p.variables
        ]
        if not candidates:
            raise ValueError(f"no GaussianPrior over {coefficients_var!r} found")
        prior_name = candidates[0]

    lik = posterior.likelihoods[likelihood_name]
    prior = posterior.priors[prior_name]
    fwm = lik.forward_model
    V = fwm.design if hasattr(fwm, "design") else fwm.vandermonde

    def sample_fn(key: Array, position: Position):
        lam = position[precision_var]
        y = lik.error_model.data
        prec_prior = 1.0 / prior.variances
        precision_matrix = lam * (V.T @ V) + jnp.diag(prec_prior)
        b = lam * (V.T @ y) + prior.means * prec_prior
        chol = jnp.linalg.cholesky(precision_matrix)
        mean = jax.scipy.linalg.cho_solve((chol, True), b)
        eps = jax.random.normal(key, mean.shape, mean.dtype)
        # sample = mean + L^{-T} eps  (covariance = (LL^T)^{-1})
        draw = mean + jax.scipy.linalg.solve_triangular(
            chol.T, eps, lower=False
        )
        info = ConjugateInfo(jnp.asarray(True), jnp.ones(()))
        return {coefficients_var: draw}, info

    return direct_block(sample_fn)
