"""Laplace approximation: MAP + Gaussian curvature posterior.

A third inference backend over the same model graph (MCMC, ADVI, Laplace):
find the MAP in unconstrained space with Adam (+ optional Newton polish),
take the posterior covariance as the inverse Hessian of -log p at the mode
(``jax.hessian`` over the raveled position -- exact second-order autodiff,
something the reference's hand-written-gradient design could never offer).

Fast model criticism and initialization: the result seeds HMC mass matrices
(`inverse_mass_from_laplace`) and provides instant approximate posteriors
for well-behaved models.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree

from binf_tpu.pdf.transforms import (
    Transform,
    constrain,
    default_transforms,
    transform_logdensity,
    unconstrain,
)
from binf_tpu.samplers.base import Position

Array = jax.Array

__all__ = ["LaplaceResult", "laplace_approximation", "laplace_sample",
           "inverse_mass_from_laplace"]


class LaplaceResult(NamedTuple):
    mode: Position  # constrained-space MAP
    mode_unconstrained: Array  # raveled
    cov: Array  # (d, d) in unconstrained space
    chol_cov: Array
    log_prob_at_mode: Array
    log_evidence_laplace: Array  # Laplace evidence estimate
    converged: Array


def laplace_approximation(
    posterior,
    key: Array,
    num_steps: int = 2000,
    learning_rate: float = 0.05,
    transforms: dict[str, Transform] | None = None,
    initial_position: Position | None = None,
) -> LaplaceResult:
    """Adam ascent to the MAP, then exact Hessian -> Gaussian posterior."""
    if transforms is None:
        transforms = default_transforms(posterior)
    logdensity = transform_logdensity(lambda p: posterior.log_prob(p), transforms)

    template = initial_position or posterior.init_values()
    u0 = unconstrain(transforms, {k: jnp.asarray(v) for k, v in template.items()})
    u0 = {k: jnp.where(jnp.isfinite(v), v, 0.0) for k, v in u0.items()}
    flat0, unravel = ravel_pytree(u0)
    d = flat0.shape[0]

    def neg_logp(flat):
        return -logdensity(unravel(flat))

    opt = optax.adam(learning_rate)

    def opt_step(carry, _):
        flat, state = carry
        loss, g = jax.value_and_grad(neg_logp)(flat)
        updates, state = opt.update(g, state, flat)
        flat = optax.apply_updates(flat, updates)
        return (flat, state), loss

    (flat, _), losses = jax.lax.scan(
        opt_step, (flat0, opt.init(flat0)), None, length=num_steps
    )

    # Newton polish: a few damped steps with the exact Hessian
    def newton_step(flat, _):
        g = jax.grad(neg_logp)(flat)
        H = jax.hessian(neg_logp)(flat)
        H = H + 1e-6 * jnp.eye(d)
        step = jnp.linalg.solve(H, g)
        new = flat - step
        better = neg_logp(new) < neg_logp(flat)
        return jnp.where(better, new, flat), None

    flat, _ = jax.lax.scan(newton_step, flat, None, length=5)

    H = jax.hessian(neg_logp)(flat) + 1e-8 * jnp.eye(d)
    cov = jnp.linalg.inv(H)
    # symmetrize for numerical safety
    cov = 0.5 * (cov + cov.T)
    chol = jnp.linalg.cholesky(cov + 1e-10 * jnp.eye(d))

    lp_mode = -neg_logp(flat)
    sign, logdet_H = jnp.linalg.slogdet(H)
    log_evidence = lp_mode + 0.5 * d * jnp.log(2.0 * jnp.pi) - 0.5 * logdet_H

    grad_norm = jnp.linalg.norm(jax.grad(neg_logp)(flat))
    return LaplaceResult(
        mode=constrain(transforms, unravel(flat)),
        mode_unconstrained=flat,
        cov=cov,
        chol_cov=chol,
        log_prob_at_mode=lp_mode,
        log_evidence_laplace=log_evidence,
        converged=(grad_norm < 1e-2) & (sign > 0),
    )


def laplace_sample(
    posterior,
    result: LaplaceResult,
    key: Array,
    num_samples: int,
    transforms: dict[str, Transform] | None = None,
) -> Position:
    """Draw constrained-space samples from the Laplace Gaussian."""
    if transforms is None:
        transforms = default_transforms(posterior)
    template = posterior.init_values()
    u0 = unconstrain(transforms, template)
    _, unravel = ravel_pytree(u0)
    d = result.mode_unconstrained.shape[0]
    eps = jax.random.normal(key, (num_samples, d))
    flats = result.mode_unconstrained[None, :] + eps @ result.chol_cov.T
    return jax.vmap(lambda f: constrain(transforms, unravel(f)))(flats)


def inverse_mass_from_laplace(posterior, result: LaplaceResult,
                              transforms: dict[str, Transform] | None = None):
    """Diagonal inverse-mass pytree for HMC/NUTS from the Laplace
    covariance diagonal -- a principled warm start for adaptation."""
    if transforms is None:
        transforms = default_transforms(posterior)
    template = posterior.init_values()
    u0 = unconstrain(transforms, template)
    _, unravel = ravel_pytree(u0)
    return unravel(jnp.diagonal(result.cov))
