"""Finite Gaussian mixture: a sort/argmax workload on the model DSL.

No reference equivalent -- this exercises the density families the
reference's DSL cannot express without per-point Python loops: the
log-likelihood is a per-point ``logsumexp`` over components, and the
component means are ORDERED via ``jnp.sort`` (the standard identifiability
constraint for label-switching), so the model graph contains ``sort``,
``logsumexp`` reductions over a component axis, and (in
:func:`classify`) an ``argmax``.

All of these lower into the fused whole-run kernel through the
lane-batching interpreter (``ops/pallas/tile_interpreter.py``): ``sort``
becomes a bitonic network over sublanes, the component-axis reductions are
canonicalized to Mosaic-supported leading-axis reductions, and chains ride
the lane axis end to end.

The mixture is a direct :class:`~binf_tpu.core.density.Density` (not a
forward/error composition): the observation density itself is multimodal,
which the likelihood-composition pattern (reference
``binf/pdf/likelihoods.py:12-40``) cannot factor through a deterministic
``mock_data``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from binf_tpu.core.density import Density, ValueDict, VariableSpec
from binf_tpu.core.modules import pytree_dataclass, static_field
from binf_tpu.ops.math import log_sum_exp
from binf_tpu.pdf import GaussianPrior, Posterior

Array = jax.Array

__all__ = [
    "GaussianMixtureLikelihood",
    "TRUE_MEANS",
    "TRUE_WEIGHTS",
    "TRUE_SIGMA",
    "synthetic_mixture_data",
    "make_mixture_posterior",
    "initial_positions",
    "classify",
]

TRUE_MEANS = (-2.0, 0.5, 3.0)
TRUE_WEIGHTS = (0.3, 0.45, 0.25)
TRUE_SIGMA = 0.6
N_DATA_POINTS = 240


@pytree_dataclass
class GaussianMixtureLikelihood(Density):
    """sum_i log sum_k w_k N(y_i | sort(means)_k, sigma^2).

    Variables: ``means`` (K,) -- sorted inside the density for
    identifiability; ``log_weights`` (K,) -- normalized via logsumexp, so
    the free variable is unconstrained; ``log_sigma`` () -- shared scale.
    """

    data: Array  # (n,)
    n_components: int = static_field(default=3)
    name: str = static_field(default="mixture")
    fixed: ValueDict = None  # type: ignore[assignment]

    @classmethod
    def create(cls, data, n_components: int = 3, name: str = "mixture"):
        return cls(
            data=jnp.asarray(data, jnp.float32),
            n_components=n_components,
            name=name,
            fixed={},
        )

    @property
    def variable_specs(self) -> tuple[VariableSpec, ...]:
        k = self.n_components
        return (
            VariableSpec("means", shape=(k,), differentiable=True),
            VariableSpec("log_weights", shape=(k,), differentiable=True),
            VariableSpec("log_sigma", shape=(), differentiable=True),
        )

    def _log_prob(self, values: ValueDict) -> Array:
        mus = jnp.sort(values["means"])
        logw = values["log_weights"]
        logw = logw - log_sum_exp(logw)
        log_sigma = values["log_sigma"]
        inv_var = jnp.exp(-2.0 * log_sigma)
        comp = (
            -0.5 * inv_var * (self.data[:, None] - mus[None, :]) ** 2
            - log_sigma
            + logw[None, :]
        )
        return jnp.sum(log_sum_exp(comp, axis=1))


def synthetic_mixture_data(key: Array, n: int = N_DATA_POINTS) -> Array:
    k_z, k_e = jax.random.split(key)
    z = jax.random.choice(
        k_z, len(TRUE_MEANS), (n,), p=jnp.asarray(TRUE_WEIGHTS)
    )
    mus = jnp.asarray(TRUE_MEANS, jnp.float32)
    return mus[z] + TRUE_SIGMA * jax.random.normal(k_e, (n,), jnp.float32)


def make_mixture_posterior(y: Array, n_components: int = 3) -> Posterior:
    lik = GaussianMixtureLikelihood.create(y, n_components)
    priors = {
        "means_prior": GaussianPrior.create(
            jnp.zeros(n_components),
            jnp.full((n_components,), 25.0),
            variable="means",
        ),
        "log_weights_prior": GaussianPrior.create(
            jnp.zeros(n_components),
            jnp.ones(n_components),
            variable="log_weights",
        ),
        "log_sigma_prior": GaussianPrior.create(
            jnp.zeros(()), jnp.asarray(1.0), variable="log_sigma"
        ),
    }
    return Posterior.create({"mixture": lik}, priors)


def initial_positions(n_chains: int, n_components: int = 3, key: Array | None = None):
    k = key if key is not None else jax.random.key(0)
    k1, k2, k3 = jax.random.split(k, 3)
    # spread mean inits so chains cover the components
    spread = jnp.linspace(-1.0, 1.0, n_components)
    return {
        "means": spread[None, :]
        + 0.5 * jax.random.normal(k1, (n_chains, n_components), jnp.float32),
        "log_weights": 0.1 * jax.random.normal(
            k2, (n_chains, n_components), jnp.float32
        ),
        "log_sigma": 0.1 * jax.random.normal(k3, (n_chains,), jnp.float32),
    }


def classify(y_new: Array, samples: dict[str, Array]) -> Array:
    """Posterior-mean responsibilities -> hard labels via argmax.

    ``samples`` leaves are flat (draws, ...) unconstrained draws from the
    posterior; the returned labels index the SORTED component means.
    """
    mus = jnp.sort(samples["means"], axis=-1)  # (S, K)
    logw = samples["log_weights"]
    logw = logw - log_sum_exp(logw, axis=-1)[..., None]
    inv_var = jnp.exp(-2.0 * samples["log_sigma"])  # (S,)
    comp = (
        -0.5
        * inv_var[:, None, None]
        * (y_new[None, :, None] - mus[:, None, :]) ** 2
        + logw[:, None, :]
    )  # (S, n, K)
    resp = jax.nn.softmax(comp, axis=-1).mean(axis=0)  # (n, K)
    return jnp.argmax(resp, axis=-1)
