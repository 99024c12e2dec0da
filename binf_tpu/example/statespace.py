"""Sequential (state-space / AR) forward model: a ``lax.scan`` workload.

No reference equivalent -- the reference's forward models are all
feed-forward array expressions (``binf/example/likelihood.py:24-26``).  This
module exercises the capability the reference's DSL *claims* (any
``AbstractForwardModel``, ``binf/model/forwardmodels.py:10-66``) with a
genuinely sequential map: the mock data is a deterministic AR(1) trajectory

    x_t = phi * x_{t-1} + drift,   x_0 given,   mock = (x_0 ... x_{T-1})

so every output depends on the whole parameter history -- the structure of
discretized ODEs and latent dynamical systems.  ``phi = tanh(phi_raw)``
keeps the dynamics stationary in unconstrained space.

TPU notes: the trajectory is a ``lax.scan`` that the fused whole-run kernel
admits through the lane-batching interpreter's scan rule
(``ops/pallas/tile_interpreter.py``) -- short horizons unroll to
straight-line code inside the kernel, long horizons stay a real in-kernel
loop.  On the XLA path the same scan vectorizes over chains with ``vmap``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from binf_tpu.core.density import ValueDict, VariableSpec
from binf_tpu.core.modules import pytree_dataclass, static_field
from binf_tpu.model.error import GaussianErrorModel
from binf_tpu.model.forward import ForwardModel
from binf_tpu.pdf import GammaPrior, GaussianPrior, Likelihood, Posterior

Array = jax.Array

__all__ = [
    "AR1TrajectoryModel",
    "TRUE_DYNAMICS",
    "TRUE_PRECISION",
    "synthetic_ar1_data",
    "make_ar1_posterior",
    "initial_positions",
]

# (phi_raw, drift, x0): phi = tanh(0.9) ~= 0.716
TRUE_DYNAMICS = (0.9, 0.5, -1.0)
TRUE_PRECISION = 25.0
N_TIMESTEPS = 64


@pytree_dataclass
class AR1TrajectoryModel(ForwardModel):
    """mock_t = x_t where x_t = tanh(phi_raw) * x_{t-1} + drift (scan)."""

    num_steps: int = static_field(default=N_TIMESTEPS)
    name: str = static_field(default="ar1_trajectory")

    @property
    def variable_specs(self) -> tuple[VariableSpec, ...]:
        return (VariableSpec("dynamics", shape=(3,), differentiable=True),)

    def _evaluate(self, values: ValueDict) -> Array:
        dyn = values["dynamics"]
        phi = jnp.tanh(dyn[0])
        drift = dyn[1]
        x0 = dyn[2]

        def step(x, _):
            x_next = phi * x + drift
            return x_next, x

        _, xs = jax.lax.scan(step, x0, None, length=self.num_steps)
        return xs


def synthetic_ar1_data(key: Array, num_steps: int = N_TIMESTEPS):
    """Noisy observations of the true trajectory."""
    model = AR1TrajectoryModel(num_steps=num_steps)
    traj = model(dynamics=jnp.asarray(TRUE_DYNAMICS, jnp.float32))
    noise = jax.random.normal(key, (num_steps,)) / jnp.sqrt(TRUE_PRECISION)
    return traj + noise


def make_ar1_posterior(y: Array) -> Posterior:
    """dynamics ~ N(0, 4 I); precision ~ Gamma(2, 0.1); Gaussian errors."""
    fwm = AR1TrajectoryModel(num_steps=int(y.shape[0]))
    em = GaussianErrorModel.create(jnp.asarray(y, jnp.float32))
    lik = Likelihood.create("trajectory", fwm, em)
    priors = {
        "dynamics_prior": GaussianPrior.create(
            jnp.zeros(3), jnp.full((3,), 4.0), variable="dynamics"
        ),
        "precision_prior": GammaPrior.create(2.0, 0.1, variable="precision"),
    }
    return Posterior.create({"trajectory": lik}, priors)


def initial_positions(n_chains: int, key: Array | None = None):
    k = key if key is not None else jax.random.key(0)
    k1, k2 = jax.random.split(k)
    return {
        "dynamics": 0.1 * jax.random.normal(k1, (n_chains, 3), jnp.float32),
        "precision": jnp.exp(0.1 * jax.random.normal(k2, (n_chains,), jnp.float32)),
    }
