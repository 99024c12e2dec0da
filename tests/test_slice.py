"""Slice-sampler tests: exactness against analytic Gaussian posteriors.

Statistical layer of the test strategy (SURVEY.md section 4): both kernels
are rejection-free, so the check is moment matching on conjugate targets
where the posterior is known in closed form.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from binf_tpu.samplers import elliptical_slice, slice_sampler
from binf_tpu.samplers.base import run_kernel


def _run_batch(kernel, key, positions, num_steps):
    n = jax.tree.leaves(positions)[0].shape[0]
    states = jax.vmap(kernel.init)(positions)

    def body(states, k):
        keys = jax.random.split(k, n)
        states, infos = jax.vmap(kernel.step)(keys, states)
        return states, states.position

    keys = jax.random.split(key, num_steps)
    _, draws = jax.jit(lambda s, ks: jax.lax.scan(body, s, ks))(states, keys)
    return draws


def test_elliptical_slice_conjugate_gaussian(key):
    """Prior N(0, 1), likelihood N(y | x, sigma^2) with y = 1.2:
    posterior is N(y/(1+s2), s2/(1+s2))."""
    y, s2 = 1.2, 0.5

    def loglik(pos):
        return -0.5 * jnp.sum((pos["x"] - y) ** 2) / s2

    kernel = elliptical_slice(
        loglik,
        prior_mean={"x": jnp.zeros(2)},
        prior_scale={"x": jnp.ones(2)},
    )
    n_chains = 256
    positions = {"x": jnp.zeros((n_chains, 2))}
    draws = _run_batch(kernel, key, positions, 600)

    x = np.asarray(draws["x"][100:]).reshape(-1, 2)
    post_mean = y / (1.0 + s2)
    post_var = s2 / (1.0 + s2)
    np.testing.assert_allclose(x.mean(0), post_mean, atol=0.02)
    np.testing.assert_allclose(x.var(0), post_var, rtol=0.08)


def test_elliptical_slice_nonzero_prior_mean(key):
    """With a flat likelihood the sampler must reproduce the prior."""
    kernel = elliptical_slice(
        lambda pos: jnp.zeros(()),
        prior_mean={"x": 2.0 * jnp.ones(3)},
        prior_scale={"x": 0.5 * jnp.ones(3)},
    )
    positions = {"x": jnp.zeros((128, 3))}
    draws = _run_batch(kernel, key, positions, 500)
    x = np.asarray(draws["x"][100:]).reshape(-1, 3)
    np.testing.assert_allclose(x.mean(0), 2.0, atol=0.03)
    np.testing.assert_allclose(x.std(0), 0.5, atol=0.03)


def test_slice_sampler_correlated_gaussian(key):
    """Random-direction slice sampling on a correlated 2-D Gaussian."""
    rho = 0.8
    prec = np.linalg.inv(np.array([[1.0, rho], [rho, 1.0]]))
    P = jnp.asarray(prec, jnp.float32)

    def logp(pos):
        v = pos["v"]
        return -0.5 * v @ P @ v

    kernel = slice_sampler(logp, width=1.5)
    positions = {"v": jnp.zeros((256, 2))}
    draws = _run_batch(kernel, key, positions, 500)
    v = np.asarray(draws["v"][100:]).reshape(-1, 2)
    np.testing.assert_allclose(v.mean(0), 0.0, atol=0.05)
    cov = np.cov(v.T)
    np.testing.assert_allclose(cov, [[1.0, rho], [rho, 1.0]], atol=0.1)


def test_slice_sampler_bounded_support(key):
    """Exp(1) target (non-smooth at 0): mean and variance must both be 1;
    no gradient is ever taken so the kink is harmless."""

    def logp(pos):
        x = pos["x"]
        return jnp.where(x > 0, -x, -jnp.inf).sum()

    kernel = slice_sampler(logp, width=2.0)
    positions = {"x": jnp.ones((256, 1))}
    draws = _run_batch(kernel, key, positions, 600)
    x = np.asarray(draws["x"][150:]).ravel()
    assert abs(x.mean() - 1.0) < 0.06
    assert abs(x.var() - 1.0) < 0.15


def test_slice_single_chain_scan(key):
    """Single-chain path through run_kernel (scan, no vmap)."""
    kernel = slice_sampler(lambda p: -0.5 * jnp.sum(p["x"] ** 2), width=1.0)
    state = kernel.init({"x": jnp.zeros(2)})
    _, draws = jax.jit(lambda s, k: run_kernel(kernel, k, s, 400))(state, key)
    x = np.asarray(draws["x"][100:])
    assert abs(x.mean()) < 0.25
    assert abs(x.std() - 1.0) < 0.25


def test_elliptical_slice_info_fields(key):
    kernel = elliptical_slice(
        lambda pos: jnp.zeros(()),
        prior_mean={"x": jnp.zeros(2)},
        prior_scale={"x": jnp.ones(2)},
    )
    state = kernel.init({"x": jnp.zeros(2)})
    new_state, info = jax.jit(kernel.step)(key, state)
    assert info.num_shrinks.shape == ()
    assert info.theta.shape == ()
    # flat likelihood: the very first angle is always accepted
    assert int(info.num_shrinks) == 1
