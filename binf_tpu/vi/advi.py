"""ADVI: automatic differentiation variational inference.

New capability over the reference (no VI of any kind; BASELINE.json's north
star lists ADVI on the same model graph as a required backend).  Standard
ADVI (Kucukelbir et al. 2017): transform the posterior to unconstrained
space, fit a Gaussian q by maximizing the reparameterized ELBO with Adam
(optax), Monte-Carlo gradients vectorized over ELBO samples with vmap.

* **mean-field**: q = N(mu, diag(sigma^2)) as a pytree -- heterogeneous
  variable shapes stay first-class;
* **full-rank**: q = N(mu, L L^T) over the raveled parameter vector
  (``jax.flatten_util.ravel_pytree``) -- captures posterior correlations.

The optimization loop is one ``lax.scan``; the whole fit jit-compiles.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax import lax
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

__all__ = [
    "ADVIResult",
    "MeanFieldParams",
    "FullRankParams",
    "advi",
    "variational_sample",
]

_LOG_2PI = jnp.log(2.0 * jnp.pi)


class MeanFieldParams(NamedTuple):
    mu: Position
    log_sigma: Position


class FullRankParams(NamedTuple):
    mu: Array  # (d,)
    chol_flat: Array  # lower-triangular entries, (d(d+1)/2,)


class ADVIResult(NamedTuple):
    params: Any
    elbo_trace: Array
    final_elbo: Array


def _meanfield_sample(params: MeanFieldParams, key: Array) -> tuple[Position, Array]:
    """Draw u ~ q and return (u, log q(u))."""
    leaves, treedef = jax.tree.flatten(params.mu)
    keys = jax.random.split(key, len(leaves))
    eps = jax.tree.unflatten(
        treedef, [jax.random.normal(k, x.shape, x.dtype) for k, x in zip(keys, leaves)]
    )
    sigma = jax.tree.map(jnp.exp, params.log_sigma)
    u = jax.tree.map(lambda m, s, e: m + s * e, params.mu, sigma, eps)
    logq_leaves = jax.tree.map(
        lambda e, ls: -0.5 * jnp.sum(e * e) - jnp.sum(ls) - 0.5 * e.size * _LOG_2PI,
        eps,
        params.log_sigma,
    )
    logq = sum(jax.tree.leaves(logq_leaves))
    return u, logq


def _tril_unflatten(flat: Array, d: int) -> Array:
    L = jnp.zeros((d, d), flat.dtype)
    idx = jnp.tril_indices(d)
    return L.at[idx].set(flat)


def _fullrank_sample(
    params: FullRankParams, key: Array, d: int
) -> tuple[Array, Array]:
    eps = jax.random.normal(key, (d,))
    L = _tril_unflatten(params.chol_flat, d)
    # softplus-positive diagonal for identifiability/stability
    diag_raw = jnp.diagonal(L)
    diag = jax.nn.softplus(diag_raw) + 1e-6
    L = L - jnp.diag(diag_raw) + jnp.diag(diag)
    u = params.mu + L @ eps
    logq = (
        -0.5 * jnp.sum(eps * eps) - jnp.sum(jnp.log(diag)) - 0.5 * d * _LOG_2PI
    )
    return u, logq


def advi(
    posterior,
    key: Array,
    num_steps: int = 2000,
    num_elbo_samples: int = 16,
    learning_rate: float = 0.05,
    method: str = "meanfield",
    transforms: dict[str, Transform] | None = None,
    initial_position: Position | None = None,
    optimizer: optax.GradientTransformation | None = None,
) -> ADVIResult:
    """Fit q to ``posterior``; returns an :class:`ADVIResult` (pure pytree,
    so the whole fit jit-compiles).  Draw posterior samples afterwards with
    :func:`variational_sample`.
    """
    if transforms is None:
        transforms = default_transforms(posterior)
    logdensity = transform_logdensity(lambda p: posterior.log_prob(p), transforms)

    if initial_position is None:
        template = posterior.init_values()
    else:
        template = initial_position
    u0 = unconstrain(transforms, {k: jnp.asarray(v) for k, v in template.items()})
    u0 = {k: jnp.where(jnp.isfinite(v), v, 0.0) for k, v in u0.items()}

    if optimizer is None:
        optimizer = optax.adam(learning_rate)

    if method == "meanfield":
        params = MeanFieldParams(
            mu=u0, log_sigma=jax.tree.map(lambda x: jnp.full_like(x, -1.0), u0)
        )

        def sample_u(params, k):
            return _meanfield_sample(params, k)

        def to_position(u):
            return u

    elif method == "fullrank":
        flat0, unravel = ravel_pytree(u0)
        d = flat0.shape[0]
        tril0 = jnp.zeros(d * (d + 1) // 2)
        # initialize diagonal ~ softplus^{-1}(0.37): raw 0 -> diag ~ 0.69;
        # start smaller via raw=-1 on diagonal entries
        diag_positions = jnp.cumsum(jnp.arange(1, d + 1)) - 1
        tril0 = tril0.at[diag_positions].set(-1.0)
        params = FullRankParams(mu=flat0, chol_flat=tril0)

        def sample_u(params, k):
            return _fullrank_sample(params, k, d)

        def to_position(u_flat):
            return unravel(u_flat)

    else:
        raise ValueError(method)

    def negative_elbo(params, k):
        keys = jax.random.split(k, num_elbo_samples)

        def one(kk):
            u, logq = sample_u(params, kk)
            return logdensity(to_position(u)) - logq

        return -jnp.mean(jax.vmap(one)(keys))

    opt_state = optimizer.init(params)

    def step(carry, k):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(negative_elbo)(params, k)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), -loss

    keys = jax.random.split(key, num_steps)
    (params, _), elbo_trace = lax.scan(step, (params, opt_state), keys)

    return ADVIResult(
        params=params,
        elbo_trace=elbo_trace,
        final_elbo=jnp.mean(elbo_trace[-max(num_steps // 20, 1) :]),
    )


def variational_sample(
    posterior,
    result: ADVIResult,
    key: Array,
    num_samples: int,
    transforms: dict[str, Transform] | None = None,
) -> Position:
    """Draw constrained-space samples from a fitted variational family
    (method is inferred from the params type)."""
    if transforms is None:
        transforms = default_transforms(posterior)
    params = result.params
    keys = jax.random.split(key, num_samples)

    if isinstance(params, MeanFieldParams):

        def one(kk):
            u, _ = _meanfield_sample(params, kk)
            return constrain(transforms, u)

        return jax.vmap(one)(keys)

    if isinstance(params, FullRankParams):
        template = posterior.init_values()
        u0 = unconstrain(transforms, template)
        _, unravel = ravel_pytree(u0)
        d = params.mu.shape[0]

        def one(kk):
            u, _ = _fullrank_sample(params, kk, d)
            return constrain(transforms, unravel(u))

        return jax.vmap(one)(keys)

    raise TypeError(type(params))
