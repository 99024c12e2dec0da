"""The polynomial-regression reference workload, TPU-native.

Feature-parity layer for the reference example
(``binf/example/likelihood.py``, ``binf/example/priors.py``,
``binf/example/samplers.py``, ``binf/example/misc.py``,
``example_script.py``): fit a degree-3 polynomial with unknown Gaussian
noise precision.  Ground truth: coefficients [2.0, -4.0, 1.0, 1.5],
precision 2.5, 20 data points on [-2, 2] (``example_script.py:17-24``).

Differences by design: factories return immutable pytree posteriors and
functional Gibbs kernels; sampling runs thousands of chains under one jitted
scan instead of a 30k-iteration Python loop; the conjugate precision block
uses the exactly-derived Gamma(alpha + n/2, beta + SS/2) conditional
(see ``binf_tpu.samplers.conjugate``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from binf_tpu.model import GaussianErrorModel, PolynomialForwardModel
from binf_tpu.ops.math import log_sum_exp, polyval
from binf_tpu.pdf import GammaPrior, GaussianPrior, Likelihood, Posterior
from binf_tpu.samplers.base import SamplerKernel
from binf_tpu.samplers.conjugate import gamma_precision_block, gaussian_linear_block
from binf_tpu.samplers.gibbs import gibbs, hmc_block, mh_block

Array = jax.Array

__all__ = [
    "TRUE_COEFFICIENTS",
    "TRUE_PRECISION",
    "make_data",
    "make_likelihood",
    "make_priors",
    "make_posterior",
    "make_gibbs_kernel",
    "make_collapsed_gibbs_kernel",
    "initial_positions",
    "predict",
    "get_map",
]

TRUE_COEFFICIENTS = (2.0, -4.0, 1.0, 1.5)
TRUE_PRECISION = 2.5
N_DATA_POINTS = 20


def make_data(key: Array, n_points: int = N_DATA_POINTS):
    """Synthetic dataset exactly as ``example_script.py:17-24``."""
    xses = jnp.linspace(-2.0, 2.0, n_points)
    coeffs = jnp.asarray(TRUE_COEFFICIENTS)
    noise = jax.random.normal(key, (n_points,)) / jnp.sqrt(TRUE_PRECISION)
    ys = polyval(xses, coeffs) + noise
    return xses, ys


def make_likelihood(xses: Array, ys: Array, n_coefficients: int = 4) -> Likelihood:
    """Reference ``make_likelihood`` (``binf/example/likelihood.py:70-79``)."""
    fwm = PolynomialForwardModel.create(xses, n_coefficients)
    em = GaussianErrorModel.create(ys)
    return Likelihood.create("points", fwm, em)


def make_priors(n_coefficients: int = 4):
    """Reference ``make_priors`` (``binf/example/priors.py:67-73``):
    Gamma(1.0, 0.2) precision prior + N(0, 5 I) coefficient prior."""
    return {
        "precision_prior": GammaPrior.create(1.0, 0.2, variable="precision"),
        "coefficients_prior": GaussianPrior.create(
            jnp.zeros(n_coefficients),
            jnp.ones(n_coefficients) * 5.0,
            variable="coefficients",
        ),
    }


def make_posterior(xses: Array, ys: Array, n_coefficients: int = 4) -> Posterior:
    """Reference ``make_posterior`` (``binf/example/misc.py:24-33``)."""
    lik = make_likelihood(xses, ys, n_coefficients)
    return Posterior.create({"points": lik}, make_priors(n_coefficients))


def make_gibbs_kernel(
    posterior: Posterior,
    rwmc_stepsize: float = 0.1,
    coefficients_sampler: str = "rwm",
    hmc_steps: int = 10,
) -> SamplerKernel:
    """Reference ``make_sampler`` (``binf/example/samplers.py:94-111``):
    a Gibbs sweep of [coefficients block, conjugate precision block].

    ``coefficients_sampler``: 'rwm' (reference RWMC semantics) or 'hmc'.
    """
    if coefficients_sampler == "rwm":
        coeff_block = mh_block(
            posterior, "coefficients", rwmc_stepsize, proposal="uniform"
        )
    elif coefficients_sampler == "hmc":
        coeff_block = hmc_block(
            posterior, "coefficients", rwmc_stepsize, num_integration_steps=hmc_steps
        )
    else:
        raise ValueError(coefficients_sampler)
    # sweep order matches the reference's sorted-variable-name order
    # (binf/samplers/gibbs.py:144): coefficients, then precision
    return gibbs(
        {
            "coefficients": coeff_block,
            "precision": gamma_precision_block(posterior, "precision"),
        }
    )


def make_collapsed_gibbs_kernel(posterior: Posterior) -> SamplerKernel:
    """Fully-conjugate Gibbs: exact Gaussian draw of coefficients + exact
    Gamma draw of precision -- zero rejections, the speed-of-light sampler
    for this model family (no reference equivalent; new capability)."""
    return gibbs(
        {
            "coefficients": gaussian_linear_block(posterior),
            "precision": gamma_precision_block(posterior, "precision"),
        }
    )


def initial_positions(n_chains: int, n_coefficients: int = 4, key: Array | None = None):
    """Chain-batched start state; the reference starts at coefficients = 1,
    precision = 1 (``example_script.py:26``), jittered here across chains."""
    base = {
        "coefficients": jnp.ones((n_chains, n_coefficients)),
        "precision": jnp.ones((n_chains,)),
    }
    if key is None:
        return base
    k1, k2 = jax.random.split(key)
    return {
        "coefficients": base["coefficients"]
        + 0.1 * jax.random.normal(k1, (n_chains, n_coefficients)),
        "precision": base["precision"]
        * jnp.exp(0.1 * jax.random.normal(k2, (n_chains,))),
    }


class MAPResult(NamedTuple):
    coefficients: Array
    precision: Array
    log_prob: Array


def get_map(samples: dict[str, Array], log_probs: Array) -> MAPResult:
    """Reference ``get_MAP`` (``binf/example/misc.py:18-22``): the sample
    maximizing the posterior log-prob.  Works on flattened (draws,) arrays."""
    idx = jnp.argmax(log_probs)
    return MAPResult(
        coefficients=samples["coefficients"][idx],
        precision=samples["precision"][idx],
        log_prob=log_probs[idx],
    )


def predict(
    x: Array, y: Array, samples: dict[str, Array]
) -> Array:
    """Posterior-predictive density p(y | x, data), vectorized over draws.

    Reference ``predict`` (``binf/example/misc.py:3-16``):
    exp(logsumexp(per-draw log-lik)) / n_draws, evaluated here for
    arbitrary-shaped broadcastable x, y over ALL draws in one shot.
    """
    coeffs = samples["coefficients"]  # (S, d)
    prec = samples["precision"]  # (S,)
    d = coeffs.shape[-1]
    powers = jnp.arange(d, dtype=coeffs.dtype)
    mock = (x[..., None, None] ** powers) @ coeffs.T[None]  # broadcast, (..., 1, S)
    mock = jnp.squeeze(mock, axis=-2)
    log_integrand = (
        -0.5 * (mock - y[..., None]) ** 2 * prec
        + 0.5 * jnp.log(prec)
        - 0.5 * jnp.log(2.0 * jnp.pi)
    )
    n = coeffs.shape[0]
    return jnp.exp(log_sum_exp(log_integrand, axis=-1)) / n
