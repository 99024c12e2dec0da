"""Error models: p(observed data | mock data, noise parameters).

Re-conception of the reference's ``AbstractErrorModel``
(``binf/model/errormodels.py:15-18``): an error model is a Density over a
distinguished ``mock_data`` variable plus its noise parameters, with the
observed data held as a traced leaf.  Gradients w.r.t. ``mock_data`` (the
reference hand-writes these, e.g. ``binf/example/likelihood.py:59-61``) come
from autodiff through ``_log_prob``.

Families: Gaussian (precision- and sigma-parameterized), Student-t,
Laplace, Poisson, Log-normal -- covering BASELINE.json's config list
("Gaussian + Poisson error models").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from binf_tpu.core.density import MOCK_DATA, Density, ValueDict, VariableSpec
from binf_tpu.core.modules import pytree_dataclass, static_field
from binf_tpu.pdf import distributions as dist

Array = jax.Array

__all__ = [
    "ErrorModel",
    "GaussianErrorModel",
    "StudentTErrorModel",
    "LaplaceErrorModel",
    "PoissonErrorModel",
    "LogNormalErrorModel",
    "BernoulliErrorModel",
    "MOCK_DATA",
]


class ErrorModel(Density):
    """Marker base: a Density whose variables include ``mock_data``.

    Concrete subclasses declare a ``data`` field holding the observed data.
    """

    @property
    def n_data(self) -> int:
        return int(self.data.shape[0])


@pytree_dataclass
class GaussianErrorModel(ErrorModel):
    """iid Gaussian noise parameterized by precision.

    log p = -0.5 * prec * sum((mock - y)^2) + (n/2) log prec  [+ const]

    Matches the reference example's error model
    (``binf/example/likelihood.py:54-57``), which drops the -n/2 log(2*pi)
    constant; set ``full_normalization=True`` to include it (needed for SMC
    evidence estimates / predictive densities).
    """

    data: Array
    fixed: ValueDict
    full_normalization: bool = static_field(default=False)
    name: str = static_field(default="gaussian_error")

    @classmethod
    def create(cls, data, full_normalization: bool = False, name: str = "gaussian_error"):
        return cls(
            data=jnp.asarray(data, jnp.float32),
            fixed={},
            full_normalization=full_normalization,
            name=name,
        )

    @property
    def variable_specs(self) -> tuple[VariableSpec, ...]:
        return (
            VariableSpec(MOCK_DATA, shape=self.data.shape, differentiable=True),
            VariableSpec("precision", shape=(), differentiable=True),
        )

    def _log_prob(self, values: ValueDict) -> Array:
        mock, prec = values[MOCK_DATA], values["precision"]
        n = self.data.shape[0]
        resid = mock - self.data
        lp = -0.5 * prec * jnp.sum(resid * resid) + 0.5 * n * jnp.log(prec)
        if self.full_normalization:
            lp = lp - 0.5 * n * jnp.log(2.0 * jnp.pi)
        return lp


@pytree_dataclass
class StudentTErrorModel(ErrorModel):
    """iid Student-t noise (robust regression); variables: mock_data, scale."""

    data: Array
    fixed: ValueDict
    df: float = static_field(default=4.0)
    name: str = static_field(default="student_t_error")

    @classmethod
    def create(cls, data, df: float = 4.0, name: str = "student_t_error"):
        return cls(data=jnp.asarray(data, jnp.float32), fixed={}, df=df, name=name)

    @property
    def variable_specs(self) -> tuple[VariableSpec, ...]:
        return (
            VariableSpec(MOCK_DATA, shape=self.data.shape, differentiable=True),
            VariableSpec("scale", shape=(), differentiable=True),
        )

    def _log_prob(self, values: ValueDict) -> Array:
        mock, scale = values[MOCK_DATA], values["scale"]
        return jnp.sum(dist.student_t_log_prob(self.data, self.df, mock, scale))


@pytree_dataclass
class LaplaceErrorModel(ErrorModel):
    """iid Laplace noise; variables: mock_data, scale."""

    data: Array
    fixed: ValueDict
    name: str = static_field(default="laplace_error")

    @classmethod
    def create(cls, data, name: str = "laplace_error"):
        return cls(data=jnp.asarray(data, jnp.float32), fixed={}, name=name)

    @property
    def variable_specs(self) -> tuple[VariableSpec, ...]:
        return (
            VariableSpec(MOCK_DATA, shape=self.data.shape, differentiable=True),
            VariableSpec("scale", shape=(), differentiable=True),
        )

    def _log_prob(self, values: ValueDict) -> Array:
        mock, scale = values[MOCK_DATA], values["scale"]
        return jnp.sum(dist.laplace_log_prob(self.data, mock, scale))


@pytree_dataclass
class PoissonErrorModel(ErrorModel):
    """Poisson counts with rate = mock_data (e.g. Hi-C contact counts).

    The log-link variant (rate = exp(mock)) is selected with
    ``log_link=True``; no extra noise variables.
    """

    data: Array
    fixed: ValueDict
    log_link: bool = static_field(default=False)
    name: str = static_field(default="poisson_error")

    @classmethod
    def create(cls, data, log_link: bool = False, name: str = "poisson_error"):
        return cls(
            data=jnp.asarray(data, jnp.float32),
            fixed={},
            log_link=log_link,
            name=name,
        )

    @property
    def variable_specs(self) -> tuple[VariableSpec, ...]:
        return (VariableSpec(MOCK_DATA, shape=self.data.shape, differentiable=True),)

    def _log_prob(self, values: ValueDict) -> Array:
        mock = values[MOCK_DATA]
        rate = jnp.exp(mock) if self.log_link else jnp.maximum(mock, 1e-10)
        return jnp.sum(dist.poisson_log_prob(self.data, rate))


@pytree_dataclass
class BernoulliErrorModel(ErrorModel):
    """Bernoulli observations with logits = mock_data (classification / GLMs).

    The forward model produces the linear predictor; no extra noise
    variables.  log p = sum_i [ y_i * eta_i - log(1 + exp(eta_i)) ],
    computed via the stable softplus form.
    """

    data: Array  # 0/1 labels, float32
    fixed: ValueDict
    name: str = static_field(default="bernoulli_error")

    @classmethod
    def create(cls, data, name: str = "bernoulli_error"):
        return cls(data=jnp.asarray(data, jnp.float32), fixed={}, name=name)

    @property
    def variable_specs(self) -> tuple[VariableSpec, ...]:
        return (VariableSpec(MOCK_DATA, shape=self.data.shape, differentiable=True),)

    def _log_prob(self, values: ValueDict) -> Array:
        logits = values[MOCK_DATA]
        return jnp.sum(dist.bernoulli_log_prob(self.data, logits))


@pytree_dataclass
class LogNormalErrorModel(ErrorModel):
    """Log-normal noise on positive data; variables: mock_data, precision.

    log y ~ N(log mock, 1/precision) -- the standard error model for
    distance-restraint data in Bayesian structure determination.
    """

    data: Array
    fixed: ValueDict
    name: str = static_field(default="lognormal_error")

    @classmethod
    def create(cls, data, name: str = "lognormal_error"):
        return cls(data=jnp.asarray(data, jnp.float32), fixed={}, name=name)

    @property
    def variable_specs(self) -> tuple[VariableSpec, ...]:
        return (
            VariableSpec(MOCK_DATA, shape=self.data.shape, differentiable=True),
            VariableSpec("precision", shape=(), differentiable=True),
        )

    def _log_prob(self, values: ValueDict) -> Array:
        mock, prec = values[MOCK_DATA], values["precision"]
        n = self.data.shape[0]
        resid = jnp.log(self.data) - jnp.log(jnp.maximum(mock, 1e-12))
        return -0.5 * prec * jnp.sum(resid * resid) + 0.5 * n * jnp.log(prec)
