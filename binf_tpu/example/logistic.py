"""Bayesian logistic regression: a GLM workload on the same model DSL.

No reference equivalent -- the reference's DSL (forward model composed with
an error model, reference ``binf/pdf/likelihoods.py:12-40``) claims to
support any observation family; this workload exercises it with a discrete
one: labels y_i ~ Bernoulli(sigmoid(x_i . w)).  The forward model is the
generic :class:`~binf_tpu.model.LinearForwardModel` (one MXU matmul for the
linear predictor), the error model is
:class:`~binf_tpu.model.BernoulliErrorModel`, and the prior is an
independent Gaussian on the weights.  All variables are unconstrained, so
every gradient sampler (and the general fused whole-run kernel,
``samplers.fused_model_hmc``) applies with no transforms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from binf_tpu.model import BernoulliErrorModel, LinearForwardModel
from binf_tpu.pdf import GaussianPrior, Likelihood, Posterior

Array = jax.Array

__all__ = [
    "TRUE_WEIGHTS",
    "synthetic_logistic_data",
    "make_logistic_posterior",
    "initial_positions",
    "predict_proba",
]

TRUE_WEIGHTS = (1.5, -2.0, 0.75, 0.0, 1.0)  # last-but-one is a null feature
N_DATA_POINTS = 200


def synthetic_logistic_data(key: Array, n: int = N_DATA_POINTS):
    """Standardized design (first column = intercept) + Bernoulli labels."""
    k_x, k_y = jax.random.split(key)
    d = len(TRUE_WEIGHTS)
    X = jax.random.normal(k_x, (n, d - 1), jnp.float32)
    X = jnp.concatenate([jnp.ones((n, 1), jnp.float32), X], axis=1)
    logits = X @ jnp.asarray(TRUE_WEIGHTS, jnp.float32)
    y = jax.random.bernoulli(k_y, jax.nn.sigmoid(logits)).astype(jnp.float32)
    return X, y


def make_logistic_posterior(X: Array, y: Array, prior_variance: float = 4.0) -> Posterior:
    d = X.shape[1]
    fwm = LinearForwardModel(design=jnp.asarray(X, jnp.float32), variable="weights")
    em = BernoulliErrorModel.create(y)
    lik = Likelihood.create("labels", fwm, em)
    prior = GaussianPrior.create(
        jnp.zeros(d), jnp.full((d,), prior_variance), variable="weights"
    )
    return Posterior.create({"labels": lik}, {"weights_prior": prior})


def initial_positions(n_chains: int, key: Array | None = None, d: int = len(TRUE_WEIGHTS)):
    k = key if key is not None else jax.random.key(0)
    return {"weights": 0.1 * jax.random.normal(k, (n_chains, d), jnp.float32)}


def predict_proba(X_new: Array, weight_draws: Array) -> Array:
    """Posterior-predictive P(y=1 | x) averaged over flat weight draws.

    The GLM analogue of the reference's ``predict``
    (``binf/example/misc.py:3-16``): a Monte-Carlo average over posterior
    samples, here of the Bernoulli mean function.
    """
    logits = weight_draws @ X_new.T  # (draws, n_new)
    return jnp.mean(jax.nn.sigmoid(logits), axis=0)
