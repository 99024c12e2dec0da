"""Stein variational gradient descent (SVGD).

Fourth inference backend over the same model graph (MCMC / SMC / ADVI /
SVGD): a deterministic interacting-particle method (Liu & Wang 2016) whose
update is two dense (n, n) kernel matrices against an (n, d) gradient
matrix -- i.e. MXU matmuls over the whole particle set every step, which is
exactly the compute shape TPUs want.  Works in unconstrained space with the
same transforms as HMC/ADVI.

    phi(x_i) = 1/n sum_j [ k(x_j, x_i) grad_j log p(x_j) + grad_j k(x_j, x_i) ]

with an RBF kernel and the median heuristic for the bandwidth.
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

__all__ = ["SVGDResult", "svgd"]


class SVGDResult(NamedTuple):
    particles: Position  # constrained space, (n, ...)
    grad_norm_trace: Array


def _rbf_and_grad(X: Array):
    """RBF kernel matrix and sum_j grad_{x_j} k(x_j, x_i), median bandwidth."""
    n = X.shape[0]
    diff = X[:, None, :] - X[None, :, :]  # (n, n, d)
    sq = jnp.sum(diff * diff, axis=-1)  # (n, n)
    med = jnp.median(sq)
    h = jnp.maximum(med / jnp.log(n + 1.0), 1e-6)
    K = jnp.exp(-sq / h)  # (n, n)
    # sum_j grad_{x_j} k(x_j, x_i) = sum_j K_ji * 2 (x_i - x_j) / h
    grad_K = 2.0 / h * (X * jnp.sum(K, axis=0)[:, None] - K.T @ X)
    return K, grad_K


def svgd(
    posterior,
    key: Array,
    num_particles: int = 256,
    num_steps: int = 1000,
    learning_rate: float = 0.05,
    transforms: dict[str, Transform] | None = None,
    initial_particles: Position | None = None,
) -> SVGDResult:
    """Run SVGD; returns the transported particle set (constrained space)."""
    if transforms is None:
        transforms = default_transforms(posterior)
    logdensity = transform_logdensity(lambda p: posterior.log_prob(p), transforms)

    if initial_particles is None:
        keys = jax.random.split(key, num_particles)
        initial_particles = jax.vmap(posterior.sample_prior)(keys)
    u0 = jax.vmap(lambda p: unconstrain(transforms, p))(initial_particles)
    flat0, unravel = ravel_pytree(jax.tree.map(lambda x: x[0], u0))
    d = flat0.shape[0]
    X0 = jax.vmap(lambda i: ravel_pytree(jax.tree.map(lambda x: x[i], u0))[0])(
        jnp.arange(num_particles)
    )

    grad_logp = jax.vmap(jax.grad(lambda f: logdensity(unravel(f))))
    opt = optax.adam(learning_rate)

    def step(carry, _):
        X, state = carry
        G = grad_logp(X)  # (n, d)
        G = jnp.where(jnp.isfinite(G), G, 0.0)
        K, grad_K = _rbf_and_grad(X)
        phi = (K @ G + grad_K) / num_particles  # (n, d)
        updates, state = opt.update(-phi, state, X)
        X = optax.apply_updates(X, updates)
        return (X, state), jnp.linalg.norm(phi) / num_particles

    (X, _), trace = jax.lax.scan(step, (X0, opt.init(X0)), None, length=num_steps)

    particles = jax.vmap(lambda f: constrain(transforms, unravel(f)))(X)
    return SVGDResult(particles=particles, grad_norm_trace=trace)
