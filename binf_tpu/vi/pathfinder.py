"""Pathfinder variational inference (Zhang, Carpenter, Gelman & Vehtari,
JMLR 2022, arXiv:2108.03782).

Follows an L-BFGS optimization path toward the posterior mode, builds a
local Gaussian approximation N(theta_l, H_l) at every trajectory point
(H_l = the L-BFGS inverse-Hessian estimate = a local covariance), scores
each by a Monte-Carlo ELBO, and returns draws from the best one.  The
multi-path variant pools draws from several independent paths by
truncated importance resampling against the path mixture.

Primary use in this framework: cheap, embarrassingly-parallel
INITIALIZATION for the HMC/fused samplers -- a handful of gradient
evaluations replaces hundreds of warmup steps spent just finding the
typical set (the reference has nothing comparable; its chains start at
user-provided points, ``example_script.py:26``).

TPU-first shape choices: positions flatten to one ``(D,)`` vector
(``samplers.dense.flatten_spec`` pack order); the inverse Hessian is
materialized DENSELY per trajectory point -- J rank-2 BFGS updates of a
(D, D) matrix are MXU outer products, and Cholesky sampling/logdet reuse
the dense-metric machinery.  Everything batches over paths with ``vmap``
and over the trajectory with ``lax.scan``.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from binf_tpu.ops.math import log_sum_exp
from binf_tpu.samplers.dense import flatten_spec

Array = jax.Array

__all__ = ["PathfinderResult", "pathfinder", "pathfinder_init"]

_LOG_2PI = 1.8378770664093453


class PathfinderResult(NamedTuple):
    """``samples``: position-dict draws ``(num_draws, ...)`` resampled from
    the path mixture; ``elbo``: (num_paths,) best ELBO per path;
    ``mean``/``chol``: (num_paths, D[, D]) best Gaussian per path;
    ``pareto_k``: tail-shape diagnostic of the importance weights
    (< 0.7 good)."""

    samples: dict
    elbo: Array
    mean: Array
    chol: Array
    pareto_k: Array


def _bfgs_inverse_hessian(S, Y, valid, gamma, jitter=1e-6):
    """Dense inverse Hessian from a (J, D) history of update/gradient-diff
    pairs: H0 = gamma I, then for each valid pair (oldest first)
    H <- (I - rho s y^T) H (I - rho y s^T) + rho s s^T.

    Callers must pass the pairs in CHRONOLOGICAL order (oldest first) --
    the BFGS recursion weights recent curvature pairs most strongly, so
    applying a wrapped circular buffer in slot order would invert the
    recency weighting (see ``_single_path``'s gather)."""
    d = S.shape[1]

    def update(H, syv):
        s, y, v = syv
        rho = 1.0 / jnp.maximum(s @ y, 1e-12)
        Hy = H @ y
        # (I - rho s y^T) H (I - rho y s^T) + rho s s^T, expanded:
        H_new = (
            H
            - rho * (jnp.outer(s, Hy) + jnp.outer(Hy, s))
            + rho * rho * (y @ Hy) * jnp.outer(s, s)
            + rho * jnp.outer(s, s)
        )
        return jnp.where(v, H_new, H), None

    H0 = gamma * jnp.eye(d)
    H, _ = jax.lax.scan(update, H0, (S, Y, valid))
    return H + jitter * jnp.eye(d)


def _gauss_logq(x, mu, chol):
    z = jax.scipy.linalg.solve_triangular(chol, x - mu, lower=True)
    return (
        -0.5 * z @ z
        - jnp.sum(jnp.log(jnp.diagonal(chol)))
        - 0.5 * x.shape[-1] * _LOG_2PI
    )


def _single_path(
    neg_logdensity_flat: Callable,
    theta0: Array,
    key: Array,
    max_iters: int,
    history: int,
    elbo_samples: int,
):
    """One L-BFGS path; returns (mu*, chol*, elbo*) of the ELBO-best
    trajectory point."""
    d = theta0.shape[0]
    opt = optax.lbfgs(memory_size=history)
    value_and_grad = optax.value_and_grad_from_state(neg_logdensity_flat)

    def opt_step(carry, k_l):
        params, opt_state, S, Y, valid, t = carry
        value, grad = value_and_grad(params, state=opt_state)
        updates, opt_state = opt.update(
            grad, opt_state, params, value=value, grad=grad,
            value_fn=neg_logdensity_flat,
        )
        new_params = optax.apply_updates(params, updates)

        # history pair from this move (curvature condition s^T y > 0); the
        # write cursor t advances ONLY on accepted pairs, so a rejected move
        # never leaves a stale pair sitting in the "newest" slot (ADVICE
        # round 4: with slot = step % history a rejected step kept an
        # ~history-old pair valid AND weighted as most recent)
        s = new_params - params
        _, new_grad = jax.value_and_grad(neg_logdensity_flat)(new_params)
        y = new_grad - grad
        ok = (s @ y) > 1e-12
        slot = t % history
        S = S.at[slot].set(jnp.where(ok, s, S[slot]))
        Y = Y.at[slot].set(jnp.where(ok, y, Y[slot]))
        valid = valid.at[slot].set(valid[slot] | ok)
        t = t + jnp.where(ok, 1, 0).astype(t.dtype)

        gamma = jnp.where(
            ok, (s @ y) / jnp.maximum(y @ y, 1e-12), jnp.ones(())
        )
        # gather the circular buffer into chronological order: t now points
        # one past the newest accepted pair, so oldest..newest is
        # t, t+1, ..., t+history-1 (mod history); invalid slots are skipped
        # by the valid mask in _bfgs_inverse_hessian
        idx = (t + jnp.arange(history)) % history
        H = _bfgs_inverse_hessian(S[idx], Y[idx], valid[idx], gamma)
        chol = jnp.linalg.cholesky(H)

        # MC ELBO of N(new_params, H)
        z = jax.random.normal(k_l, (elbo_samples, d))
        xs = new_params[None, :] + z @ chol.T
        logp = -jax.vmap(neg_logdensity_flat)(xs)
        logq = (
            -0.5 * jnp.sum(z * z, axis=1)
            - jnp.sum(jnp.log(jnp.diagonal(chol)))
            - 0.5 * d * _LOG_2PI
        )
        elbo = jnp.mean(logp - logq)
        elbo = jnp.where(
            jnp.isfinite(elbo) & jnp.all(jnp.isfinite(chol)), elbo, -jnp.inf
        )
        new_carry = (new_params, opt_state, S, Y, valid, t)
        return new_carry, (new_params, chol, elbo)

    S0 = jnp.zeros((history, d))
    Y0 = jnp.zeros((history, d))
    valid0 = jnp.zeros((history,), bool)
    carry0 = (theta0, opt.init(theta0), S0, Y0, valid0, jnp.int32(0))
    keys = jax.random.split(key, max_iters)
    _, (mus, chols, elbos) = jax.lax.scan(opt_step, carry0, keys)

    best = jnp.argmax(elbos)
    return mus[best], chols[best], elbos[best]


def pathfinder(
    logdensity_fn: Callable,
    initial_positions: dict,
    key: Array,
    num_draws: int = 1000,
    max_iters: int = 60,
    history: int = 6,
    elbo_samples: int = 16,
    draws_per_path: int | None = None,
) -> PathfinderResult:
    """Multi-path Pathfinder over a position dict.

    ``initial_positions`` is chain-batched: each row seeds one path
    (typically 4-16 overdispersed points).  ``logdensity_fn`` takes an
    UNBATCHED position dict in unconstrained space.  Draws are pooled
    with truncated importance resampling against the path mixture.  The
    truncation bound is S^{3/4} * mean(w) -- a DELIBERATELY looser bound
    than standard TIS (Ionides 2008 truncates at sqrt(S) * mean(w)),
    trading a little variance for less bias; the ``pareto_k`` field
    reports the untruncated tail shape so callers can judge reliability.
    """
    template = jax.tree.map(lambda x: x[0], initial_positions)
    pack, unpack, d = flatten_spec(template)
    thetas0 = pack(initial_positions)  # (P, D)
    num_paths = thetas0.shape[0]
    if draws_per_path is None:
        draws_per_path = max(num_draws // num_paths, 32)

    def nld(theta):
        return -logdensity_fn(unpack(theta))

    k_paths, k_draw, k_res = jax.random.split(key, 3)
    path_keys = jax.random.split(k_paths, num_paths)
    mus, chols, elbos = jax.vmap(
        lambda t0, k: _single_path(nld, t0, k, max_iters, history,
                                   elbo_samples)
    )(thetas0, path_keys)

    # pooled draws + truncated importance resampling against the mixture
    z = jax.random.normal(k_draw, (num_paths, draws_per_path, d))
    xs = mus[:, None, :] + jnp.einsum("pkd,ped->pke", z, chols)
    xs = xs.reshape(num_paths * draws_per_path, d)

    logp = -jax.vmap(nld)(xs)
    # mixture log q, weighting paths equally (non-finite paths excluded)
    path_ok = jnp.isfinite(elbos)

    def mix_logq(x):
        lqs = jax.vmap(lambda m, c: _gauss_logq(x, m, c))(mus, chols)
        lqs = jnp.where(path_ok, lqs, -jnp.inf)
        return log_sum_exp(lqs) - jnp.log(jnp.maximum(jnp.sum(path_ok), 1))

    logq = jax.vmap(mix_logq)(xs)
    log_w = logp - logq
    log_w = jnp.where(jnp.isfinite(log_w), log_w, -jnp.inf)
    log_w = log_w - jnp.max(log_w)
    w = jnp.exp(log_w)
    s = w.shape[0]
    bound = (float(s) ** 0.75) * jnp.mean(w)
    w_t = jnp.minimum(w, bound)

    from binf_tpu.diagnostics.model_comparison import _fit_pareto_k

    pareto_k = _fit_pareto_k(w)

    # degenerate guard: if every draw got weight 0 (all paths non-finite),
    # fall back to uniform resampling rather than feeding NaN probabilities
    # to random.choice; pareto_k is forced to +inf so callers can detect it
    total = jnp.sum(w_t)
    degenerate = ~jnp.isfinite(total) | (total <= 0.0)
    p = jnp.where(degenerate, jnp.ones_like(w_t) / s, w_t / jnp.where(
        degenerate, 1.0, total))
    pareto_k = jnp.where(degenerate, jnp.inf, pareto_k)

    idx = jax.random.choice(k_res, s, (num_draws,), p=p, replace=True)
    draws = xs[idx]
    return PathfinderResult(
        samples=unpack(draws),
        elbo=elbos,
        mean=mus,
        chol=chols,
        pareto_k=pareto_k,
    )


def pathfinder_init(
    logdensity_fn: Callable,
    initial_positions: dict,
    key: Array,
    n_chains: int,
    **kwargs,
) -> dict:
    """Draw ``n_chains`` HMC starting positions from a pathfinder fit --
    the standard warmup accelerator (chains start inside the typical set,
    so the sampler's initial buffer can be short)."""
    fit = pathfinder(
        logdensity_fn, initial_positions, key, num_draws=n_chains, **kwargs
    )
    return fit.samples
