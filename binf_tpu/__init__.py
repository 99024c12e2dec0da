"""binf_tpu: a TPU-native Bayesian inference framework.

A from-scratch re-design of the capabilities of ``simeoncarstens/binf``
(a numpy MCMC model DSL) for TPU hardware: immutable pytree model graphs,
``jax.grad`` instead of hand-written Jacobians, samplers as pure
``(key, state) -> (state, info)`` kernels compiled once with ``lax.scan``
and vectorized over thousands of chains with ``vmap``, sharded across
device meshes with ``jax.sharding``, with Pallas kernels on the hot paths.

Layer map (mirrors SURVEY.md section 1, re-imagined functionally):

* ``binf_tpu.core``        -- pytree modules + the named-variable Density DSL
* ``binf_tpu.pdf``         -- distributions, priors, Likelihood, Posterior
* ``binf_tpu.model``       -- forward models and error models
* ``binf_tpu.samplers``    -- RWM / MALA / HMC / NUTS / Gibbs / conjugate kernels
* ``binf_tpu.smc``         -- tempered sequential Monte Carlo
* ``binf_tpu.vi``          -- ADVI (mean-field & full-rank)
* ``binf_tpu.parallel``    -- meshes, sharded chain running, collectives
* ``binf_tpu.ops``         -- numerics + Pallas TPU kernels
* ``binf_tpu.diagnostics`` -- split-R-hat, ESS, summaries
* ``binf_tpu.io``          -- checkpointing, metrics, profiling
* ``binf_tpu.example``     -- the polynomial-regression reference workload
"""

from binf_tpu.core import Density, ValueDict, VariableSpec, pytree_dataclass, static_field
from binf_tpu.model import (
    ErrorModel,
    ForwardModel,
    GaussianErrorModel,
    PolynomialForwardModel,
)
from binf_tpu.pdf import GammaPrior, GaussianPrior, Likelihood, Posterior, Prior

__version__ = "0.1.0"

__all__ = [
    "Density",
    "ValueDict",
    "VariableSpec",
    "pytree_dataclass",
    "static_field",
    "ErrorModel",
    "ForwardModel",
    "GaussianErrorModel",
    "PolynomialForwardModel",
    "GammaPrior",
    "GaussianPrior",
    "Likelihood",
    "Posterior",
    "Prior",
    "__version__",
]
