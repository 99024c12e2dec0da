"""High-level driver for the fused whole-run HMC kernel.

Bridges the model DSL to ``binf_tpu.ops.pallas.fused_hmc``: given any
Posterior of the Bayesian-linear-regression family --

    one Likelihood with a Linear/Polynomial forward model and a Gaussian
    error model, a GammaPrior on the precision, a GaussianPrior on the
    coefficients --

this introspects the graph (the same pattern as the conjugate blocks,
reference ``binf/example/samplers.py:14-25``), runs window-adapted warmup on
the XLA path, then executes the sampling phase inside the single fused TPU
kernel.  ~50x lower per-step cost than the scan(vmap(step)) path on small
models (see docs/performance.md).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from binf_tpu.model.error import GaussianErrorModel
from binf_tpu.model.forward import LinearForwardModel, PolynomialForwardModel
from binf_tpu.ops.pallas.fused_hmc import (
    fused_linreg_hmc_run,
    linreg_unconstrained_logdensity,
)
from binf_tpu.pdf.priors import GammaPrior, GaussianPrior

Array = jax.Array

__all__ = ["FusedRegressionResult", "fused_regression_hmc"]


class FusedRegressionResult(NamedTuple):
    samples: dict[str, Array]  # constrained space: coefficients, precision
    accept_rate: Array
    step_size: Array
    inverse_mass: Array


def _introspect(posterior):
    lik = None
    for l in posterior.likelihoods.values():
        fwm = getattr(l, "forward_model", None)
        if isinstance(fwm, (LinearForwardModel, PolynomialForwardModel)) and isinstance(
            getattr(l, "error_model", None), GaussianErrorModel
        ):
            lik = l
            break
    if lik is None:
        raise ValueError(
            "fused_regression_hmc needs a linear/polynomial forward model "
            "with a Gaussian error model"
        )
    fwm = lik.forward_model
    V = fwm.design if hasattr(fwm, "design") else fwm.vandermonde
    y = lik.error_model.data

    gamma = next(
        (p for p in posterior.priors.values()
         if isinstance(p, GammaPrior) and "precision" in p.variables),
        None,
    )
    gauss = next(
        (p for p in posterior.priors.values()
         if isinstance(p, GaussianPrior) and p.variable != "precision"),
        None,
    )
    if gamma is None or gauss is None:
        raise ValueError("need a GammaPrior on precision and a GaussianPrior "
                         "on the coefficients")
    return V, y, gamma, gauss


def fused_regression_hmc(
    posterior,
    key: Array,
    n_chains: int = 8192,
    num_warmup: int = 400,
    num_samples: int = 1000,
    num_leapfrog: int = 10,
    initial_step_size: float = 0.05,
    block_chains: int = 512,
    host_noise: bool | None = None,
    interpret: bool = False,
) -> FusedRegressionResult:
    """Adaptive warmup (XLA) + fused-kernel sampling on a regression
    posterior.  Returns constrained-space samples (num_samples, chains, ...)."""
    from binf_tpu.samplers.adaptation import window_adaptation
    from binf_tpu.samplers.hmc import hmc

    V, y, gamma, gauss = _introspect(posterior)
    d = V.shape[1]
    prior_var = gauss.variances
    prior_mean = gauss.means
    if host_noise is None:
        host_noise = jax.default_backend() == "cpu"

    logdensity = linreg_unconstrained_logdensity(
        V, y, prior_var, float(gamma.shape_param), float(gamma.rate),
        prior_mean=prior_mean,
    )

    def builder(step_size, inverse_mass):
        return hmc(logdensity, step_size, num_leapfrog, inverse_mass)

    k_init, k_warm, k_run = jax.random.split(key, 3)
    positions = {
        "coefficients": prior_mean[None, :]
        + 0.1 * jax.random.normal(k_init, (n_chains, d)),
        "precision": jnp.zeros((n_chains,)),
    }

    @jax.jit
    def warm(positions, k):
        kern0 = builder(initial_step_size, None)
        states = jax.vmap(kern0.init)(positions)
        return window_adaptation(
            builder, states, k, num_steps=num_warmup,
            initial_step_size=initial_step_size,
        )

    adapt = warm(positions, k_warm)

    q0 = jnp.concatenate(
        [adapt.final_states.position["coefficients"],
         adapt.final_states.position["precision"][:, None]],
        axis=1,
    )
    im_vec = jnp.concatenate(
        [adapt.inverse_mass["coefficients"], adapt.inverse_mass["precision"][None]]
    )
    seed = jax.random.randint(k_run, (), 0, 2**31 - 1)

    draws, acc = fused_linreg_hmc_run(
        q0, seed, V, y, prior_var,
        float(gamma.shape_param), float(gamma.rate),
        adapt.step_size,
        prior_mean=prior_mean,
        inverse_mass=im_vec,
        num_steps=num_samples,
        num_leapfrog=num_leapfrog,
        d=d,
        block_chains=min(block_chains, n_chains),
        steps_per_block=min(50, num_samples),
        interpret=interpret,
        host_noise=host_noise,
    )
    samples = {
        "coefficients": draws[:, :, :d],
        "precision": jnp.exp(draws[:, :, d]),
    }
    return FusedRegressionResult(
        samples=samples,
        accept_rate=acc,
        step_size=adapt.step_size,
        inverse_mass=im_vec,
    )
