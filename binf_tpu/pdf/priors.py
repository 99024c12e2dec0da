"""Priors: named-variable densities built on the distribution library.

The reference defines ``AbstractPrior`` as a marker subclass
(``binf/pdf/priors.py:10-12``) with concrete priors in the example layer
(Gamma: ``binf/example/priors.py:10-32``, diagonal Gaussian: ``:35-64``).
Here priors are first-class: a generic :class:`Prior` wraps any log-density
function from :mod:`binf_tpu.pdf.distributions` over one named variable,
with hyperparameters as traced leaves, plus ready-made classes for the
common families.

Note: the reference's ``GammaPrior.clone`` passes shape for rate
(``binf/example/priors.py:29``) and ``GaussianPrior._evaluate_gradient``
references nonexistent attributes (``:56-60``); per SURVEY.md section 7 those
bugs are NOT reproduced -- the math here is re-derived and moment-tested.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from binf_tpu.core.density import Density, ValueDict, VariableSpec
from binf_tpu.core.modules import pytree_dataclass, static_field
from binf_tpu.pdf import distributions as dist

Array = jax.Array

__all__ = [
    "Prior",
    "GammaPrior",
    "GaussianPrior",
    "ExponentialPrior",
    "UniformPrior",
    "HalfNormalPrior",
    "FunctionPrior",
]


class Prior(Density):
    """Marker base class for priors (reference ``binf/pdf/priors.py:10-12``).

    Priors additionally support ``sample(key) -> ValueDict`` (one draw of
    their free variables) -- used for SMC particle initialization and ADVI
    initialization; the reference has no prior sampling at all.
    """

    def sample(self, key: Array) -> ValueDict:  # pragma: no cover
        raise NotImplementedError(f"{type(self).__name__} has no sampler")


@pytree_dataclass
class GammaPrior(Prior):
    """Gamma(shape, rate) prior over a positive scalar variable.

    Equivalent of reference ``binf/example/priors.py:10-32`` (the example
    uses it over ``precision``), with full normalization.
    """

    shape_param: Array
    rate: Array
    fixed: ValueDict
    variable: str = static_field(default="precision")
    name: str = static_field(default="gamma_prior")

    @classmethod
    def create(cls, shape, rate, variable: str = "precision", name: str | None = None):
        return cls(
            shape_param=jnp.asarray(shape, jnp.float32),
            rate=jnp.asarray(rate, jnp.float32),
            fixed={},
            variable=variable,
            name=name or f"{variable}_prior",
        )

    @property
    def variable_specs(self) -> tuple[VariableSpec, ...]:
        return (VariableSpec(self.variable, shape=(), differentiable=True),)

    def _log_prob(self, values: ValueDict) -> Array:
        return dist.gamma_log_prob(values[self.variable], self.shape_param, self.rate)

    def sample(self, key: Array) -> ValueDict:
        return {
            self.variable: jax.random.gamma(key, self.shape_param) / self.rate
        }


@pytree_dataclass
class GaussianPrior(Prior):
    """Independent Gaussian prior over a (possibly vector) variable.

    Equivalent of reference ``binf/example/priors.py:35-64`` (means/variances
    per component), fully normalized.
    """

    means: Array
    variances: Array
    fixed: ValueDict
    variable: str = static_field(default="coefficients")
    name: str = static_field(default="gaussian_prior")

    @classmethod
    def create(cls, means, variances, variable: str = "coefficients", name: str | None = None):
        means = jnp.asarray(means, jnp.float32)
        variances = jnp.broadcast_to(
            jnp.asarray(variances, jnp.float32), means.shape
        )
        return cls(
            means=means,
            variances=variances,
            fixed={},
            variable=variable,
            name=name or f"{variable}_prior",
        )

    @property
    def variable_specs(self) -> tuple[VariableSpec, ...]:
        return (
            VariableSpec(self.variable, shape=self.means.shape, differentiable=True),
        )

    def _log_prob(self, values: ValueDict) -> Array:
        x = values[self.variable]
        return jnp.sum(dist.normal_log_prob(x, self.means, jnp.sqrt(self.variances)))

    def sample(self, key: Array) -> ValueDict:
        eps = jax.random.normal(key, self.means.shape, self.means.dtype)
        return {self.variable: self.means + jnp.sqrt(self.variances) * eps}


@pytree_dataclass
class ExponentialPrior(Prior):
    rate: Array
    fixed: ValueDict
    variable: str = static_field(default="rate")
    name: str = static_field(default="exponential_prior")

    @classmethod
    def create(cls, rate, variable: str, name: str | None = None):
        return cls(
            rate=jnp.asarray(rate, jnp.float32),
            fixed={},
            variable=variable,
            name=name or f"{variable}_prior",
        )

    @property
    def variable_specs(self) -> tuple[VariableSpec, ...]:
        return (VariableSpec(self.variable, shape=(), differentiable=True),)

    def _log_prob(self, values: ValueDict) -> Array:
        return jnp.sum(dist.exponential_log_prob(values[self.variable], self.rate))

    def sample(self, key: Array) -> ValueDict:
        return {self.variable: jax.random.exponential(key, ()) / self.rate}


@pytree_dataclass
class UniformPrior(Prior):
    low: Array
    high: Array
    fixed: ValueDict
    variable: str = static_field(default="x")
    var_shape: tuple[int, ...] = static_field(default=())
    name: str = static_field(default="uniform_prior")

    @classmethod
    def create(cls, low, high, variable: str, var_shape=(), name: str | None = None):
        return cls(
            low=jnp.asarray(low, jnp.float32),
            high=jnp.asarray(high, jnp.float32),
            fixed={},
            variable=variable,
            var_shape=tuple(var_shape),
            name=name or f"{variable}_prior",
        )

    @property
    def variable_specs(self) -> tuple[VariableSpec, ...]:
        return (
            VariableSpec(self.variable, shape=self.var_shape, differentiable=False),
        )

    def _log_prob(self, values: ValueDict) -> Array:
        return jnp.sum(
            dist.uniform_log_prob(values[self.variable], self.low, self.high)
        )

    def sample(self, key: Array) -> ValueDict:
        u = jax.random.uniform(key, self.var_shape)
        return {self.variable: self.low + (self.high - self.low) * u}


@pytree_dataclass
class HalfNormalPrior(Prior):
    scale: Array
    fixed: ValueDict
    variable: str = static_field(default="scale")
    name: str = static_field(default="halfnormal_prior")

    @classmethod
    def create(cls, scale, variable: str, name: str | None = None):
        return cls(
            scale=jnp.asarray(scale, jnp.float32),
            fixed={},
            variable=variable,
            name=name or f"{variable}_prior",
        )

    @property
    def variable_specs(self) -> tuple[VariableSpec, ...]:
        return (VariableSpec(self.variable, shape=(), differentiable=True),)

    def _log_prob(self, values: ValueDict) -> Array:
        return jnp.sum(dist.halfnormal_log_prob(values[self.variable], self.scale))

    def sample(self, key: Array) -> ValueDict:
        return {self.variable: jnp.abs(jax.random.normal(key, ())) * self.scale}


@pytree_dataclass
class FunctionPrior(Prior):
    """Prior from an arbitrary traceable log-density ``fn(values) -> scalar``
    over the declared variables -- the escape hatch for custom models."""

    fixed: ValueDict
    fn: Callable[[ValueDict], Array] = static_field()
    specs: tuple[VariableSpec, ...] = static_field()
    name: str = static_field(default="function_prior")

    @classmethod
    def create(cls, fn, specs, name: str = "function_prior"):
        return cls(fixed={}, fn=fn, specs=tuple(specs), name=name)

    @property
    def variable_specs(self) -> tuple[VariableSpec, ...]:
        return self.specs

    def _log_prob(self, values: ValueDict) -> Array:
        return self.fn(values)
