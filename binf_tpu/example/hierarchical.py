"""Hierarchical nonlinear model with Gaussian + Poisson observation channels.

BASELINE.json config 4: "NUTS + ADVI on a hierarchical nonlinear forward
model (Gaussian + Poisson error models)".  The model (no reference
equivalent -- this exercises capabilities the reference's DSL claims to
compose but never demonstrates):

* G groups, each with parameters theta_g = (log_amplitude_g, rate_g);
* nonlinear logistic curve per group:
      f(x; theta_g) = exp(log_amplitude_g) / (1 + exp(-rate_g * x))
  observed at n x-points with iid Gaussian noise (shared precision) --
  one Likelihood with a ParametricCurveModel + GaussianErrorModel;
* a per-group event count observed through a Poisson channel whose
  log-rate is the group's log-amplitude plus an offset -- a second
  Likelihood sharing the ``group_params`` variable (multi-likelihood
  posterior composition, reference ``binf/pdf/posteriors.py:15-42``);
* partial pooling: theta_g ~ N(mu, diag(tau^2)) with hyperprior on mu and
  half-normal-ish prior on tau (sampled as log_tau).

Free variables: group_params (G, 2), mu (2,), log_tau (2,), precision ().
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from binf_tpu.core.density import ValueDict, VariableSpec
from binf_tpu.core.modules import pytree_dataclass, static_field
from binf_tpu.model.error import GaussianErrorModel, PoissonErrorModel
from binf_tpu.model.forward import ForwardModel
from binf_tpu.pdf import GammaPrior, Likelihood, Posterior
from binf_tpu.pdf import distributions as dist
from binf_tpu.pdf.priors import Prior

Array = jax.Array

__all__ = [
    "LogisticCurvesModel",
    "CountRateModel",
    "HierarchicalPrior",
    "make_hierarchical_posterior",
    "synthetic_hierarchical_data",
    "TRUE_MU",
    "TRUE_TAU",
]

TRUE_MU = (0.8, 1.2)  # (log_amplitude, rate)
TRUE_TAU = (0.3, 0.25)
TRUE_PRECISION = 25.0
COUNT_OFFSET = 2.0


@pytree_dataclass
class LogisticCurvesModel(ForwardModel):
    """mock[g, i] = exp(la_g) * sigmoid(rate_g * x_i), flattened to (G*n,)."""

    x: Array  # (n,)
    n_groups: int = static_field()
    name: str = static_field(default="logistic_curves")

    @property
    def variable_specs(self) -> tuple[VariableSpec, ...]:
        return (
            VariableSpec("group_params", shape=(self.n_groups, 2), differentiable=True),
        )

    def _evaluate(self, values: ValueDict) -> Array:
        gp = values["group_params"]  # (G, 2)
        amp = jnp.exp(gp[:, 0])[:, None]  # (G, 1)
        rate = gp[:, 1][:, None]
        curves = amp * jax.nn.sigmoid(rate * self.x[None, :])  # (G, n)
        return curves.reshape(-1)


@pytree_dataclass
class CountRateModel(ForwardModel):
    """Poisson log-rate per group: log rate_g = offset + log_amplitude_g."""

    offset: Array
    n_groups: int = static_field()
    name: str = static_field(default="count_rates")

    @property
    def variable_specs(self) -> tuple[VariableSpec, ...]:
        return (
            VariableSpec("group_params", shape=(self.n_groups, 2), differentiable=True),
        )

    def _evaluate(self, values: ValueDict) -> Array:
        return self.offset + values["group_params"][:, 0]  # log link


@pytree_dataclass
class HierarchicalPrior(Prior):
    """Partial pooling: theta_g ~ N(mu, diag(exp(log_tau)^2)),
    mu ~ N(0, 2^2), log_tau ~ N(-1, 1^2)."""

    fixed: ValueDict
    n_groups: int = static_field()
    name: str = static_field(default="hierarchy")

    @classmethod
    def create(cls, n_groups: int):
        return cls(fixed={}, n_groups=n_groups)

    @property
    def variable_specs(self) -> tuple[VariableSpec, ...]:
        return (
            VariableSpec("group_params", shape=(self.n_groups, 2), differentiable=True),
            VariableSpec("mu", shape=(2,), differentiable=True),
            VariableSpec("log_tau", shape=(2,), differentiable=True),
        )

    def _log_prob(self, values: ValueDict) -> Array:
        gp, mu, log_tau = values["group_params"], values["mu"], values["log_tau"]
        tau = jnp.exp(log_tau)
        pooled = jnp.sum(dist.normal_log_prob(gp, mu[None, :], tau[None, :]))
        hyper_mu = jnp.sum(dist.normal_log_prob(mu, 0.0, 2.0))
        hyper_tau = jnp.sum(dist.normal_log_prob(log_tau, -1.0, 1.0))
        return pooled + hyper_mu + hyper_tau

    def sample(self, key: Array) -> ValueDict:
        k1, k2, k3 = jax.random.split(key, 3)
        mu = 2.0 * jax.random.normal(k1, (2,))
        log_tau = -1.0 + jax.random.normal(k2, (2,))
        gp = mu[None, :] + jnp.exp(log_tau)[None, :] * jax.random.normal(
            k3, (self.n_groups, 2)
        )
        return {"group_params": gp, "mu": mu, "log_tau": log_tau}


def synthetic_hierarchical_data(key: Array, n_groups: int = 8, n_points: int = 15):
    """Ground-truth draws + observations.  Returns (x, y (G*n,), counts (G,),
    true group params)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x = jnp.linspace(-3.0, 3.0, n_points)
    mu = jnp.asarray(TRUE_MU)
    tau = jnp.asarray(TRUE_TAU)
    gp = mu[None, :] + tau[None, :] * jax.random.normal(k1, (n_groups, 2))

    amp = jnp.exp(gp[:, 0])[:, None]
    curves = amp * jax.nn.sigmoid(gp[:, 1][:, None] * x[None, :])
    y = curves.reshape(-1) + jax.random.normal(
        k2, (n_groups * n_points,)
    ) / jnp.sqrt(TRUE_PRECISION)

    log_rates = COUNT_OFFSET + gp[:, 0]
    counts = jax.random.poisson(k3, jnp.exp(log_rates))
    return x, y, counts.astype(jnp.float32), gp


def make_hierarchical_posterior(
    x: Array, y: Array, counts: Array, n_groups: int
) -> Posterior:
    curves = LogisticCurvesModel(x=x, n_groups=n_groups)
    gauss_lik = Likelihood.create(
        "curves", curves, GaussianErrorModel.create(y, full_normalization=True)
    )
    count_model = CountRateModel(
        offset=jnp.asarray(COUNT_OFFSET), n_groups=n_groups
    )
    poisson_lik = Likelihood.create(
        "counts", count_model, PoissonErrorModel.create(counts, log_link=True)
    )
    priors = {
        "hierarchy": HierarchicalPrior.create(n_groups),
        "precision_prior": GammaPrior.create(2.0, 0.1, variable="precision"),
    }
    return Posterior.create(
        {"curves": gauss_lik, "counts": poisson_lik}, priors
    )
