"""Bijective transforms to unconstrained space (with log-Jacobian terms).

The reference samples constrained variables (precision > 0) with samplers
that simply never propose invalid values (conjugate draws) or would silently
misbehave; a complete framework needs change-of-variables support so HMC /
NUTS / ADVI operate on R^n.  A :class:`TransformedDensity` wraps any Density:
``log_prob_u(u) = log_prob(f(u)) + log |df/du|``.

Transforms are static pytree metadata (hashable singletons), chosen per
variable by name.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from binf_tpu.samplers.base import LogDensityFn, Position

Array = jax.Array

__all__ = [
    "Transform",
    "IdentityTransform",
    "LogTransform",
    "SoftplusTransform",
    "SigmoidTransform",
    "transform_logdensity",
    "constrain",
    "unconstrain",
    "default_transforms",
]


class Transform(NamedTuple):
    """forward: unconstrained -> constrained; inverse: the reverse;
    log_det_jac(u): log |d forward / d u| summed over elements."""

    name: str
    forward: Callable[[Array], Array]
    inverse: Callable[[Array], Array]
    log_det_jac: Callable[[Array], Array]


IdentityTransform = Transform(
    "identity",
    lambda u: u,
    lambda x: x,
    lambda u: jnp.zeros(()),
)

# positive variables: x = exp(u)
LogTransform = Transform(
    "log",
    lambda u: jnp.exp(u),
    lambda x: jnp.log(x),
    lambda u: jnp.sum(u),
)

# positive variables, softer tails: x = softplus(u)
SoftplusTransform = Transform(
    "softplus",
    lambda u: jax.nn.softplus(u),
    lambda x: x + jnp.log(-jnp.expm1(-x)),
    lambda u: jnp.sum(-jax.nn.softplus(-u)),
)


def SigmoidTransform(low: float = 0.0, high: float = 1.0) -> Transform:
    """(low, high)-interval variables: x = low + (high-low) sigmoid(u)."""
    width = high - low

    def forward(u):
        return low + width * jax.nn.sigmoid(u)

    def inverse(x):
        p = (x - low) / width
        return jnp.log(p) - jnp.log1p(-p)

    def log_det_jac(u):
        return jnp.sum(
            jnp.log(width) - jax.nn.softplus(-u) - jax.nn.softplus(u)
        )

    return Transform("sigmoid", forward, inverse, log_det_jac)


def constrain(transforms: dict[str, Transform], u: Position) -> Position:
    return {
        k: (transforms[k].forward(v) if k in transforms else v) for k, v in u.items()
    }


def unconstrain(transforms: dict[str, Transform], x: Position) -> Position:
    return {
        k: (transforms[k].inverse(v) if k in transforms else v) for k, v in x.items()
    }


def transform_logdensity(
    logdensity_fn: LogDensityFn, transforms: dict[str, Transform]
) -> LogDensityFn:
    """Pull a log density back to unconstrained space."""

    def unconstrained_logdensity(u: Position) -> Array:
        x = constrain(transforms, u)
        ldj = jnp.zeros(())
        for k, t in transforms.items():
            if k in u:
                ldj = ldj + t.log_det_jac(u[k])
        return logdensity_fn(x) + ldj

    return unconstrained_logdensity


_POSITIVE_NAMES = ("precision", "scale", "rate", "sigma", "variance", "tau")


def default_transforms(density) -> dict[str, Transform]:
    """Heuristic per-variable transforms for a Density: positive-looking
    names get a log transform.  Override explicitly for anything else."""
    out: dict[str, Transform] = {}
    for name in density.variables:
        if name.startswith("log_") or name.startswith("unconstrained_"):
            # already in log/unconstrained space: a log transform here
            # would take log of negative values (observed: NaN evidence in
            # tempered SMC on the mixture model's ``log_sigma``)
            continue
        if name in _POSITIVE_NAMES or any(name.endswith("_" + p) or name.startswith(p + "_") for p in _POSITIVE_NAMES):
            out[name] = LogTransform
    return out
