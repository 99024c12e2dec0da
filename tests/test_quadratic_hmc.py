"""Quadratic-HMC (fused-leapfrog) kernel tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from binf_tpu.samplers.quadratic_hmc import quadratic_hmc


def make_target(key, D=8):
    M = jax.random.normal(key, (D, D)) * 0.3
    A = M @ M.T + jnp.eye(D)
    b = jax.random.normal(jax.random.key(99), (D,))
    cov = jnp.linalg.inv(A)
    mean = cov @ b
    return A, b, mean, cov


@pytest.mark.slow
def test_moments_match_gaussian(key):
    # trajectory length 0.45 * 7 ~ 3.15 avoids the half-period resonance of
    # this target's eigenmodes (a resonant length mixes some modes slowly)
    A, b, mean, cov = make_target(jax.random.key(0))
    kernel = quadratic_hmc(A, b, step_size=0.45, num_integration_steps=7,
                           use_pallas=False)
    C = 512
    q0 = jnp.zeros((C, 8))
    state = kernel.init(q0)

    @jax.jit
    def run(state, k):
        def body(state, kk):
            state, info = kernel.step(kk, state)
            return state, state.position

        keys = jax.random.split(k, 1500)
        return jax.lax.scan(body, state, keys)

    _, qs = run(state, key)
    draws = np.asarray(qs[500:]).reshape(-1, 8)
    np.testing.assert_allclose(draws.mean(0), np.asarray(mean), atol=0.05)
    emp_cov = np.cov(draws.T)
    np.testing.assert_allclose(emp_cov, np.asarray(cov), atol=0.12)


def test_acceptance_high_small_step(key):
    A, b, *_ = make_target(jax.random.key(1))
    kernel = quadratic_hmc(A, b, step_size=0.02, num_integration_steps=10,
                           use_pallas=False)
    state = kernel.init(jnp.zeros((64, 8)))
    _, info = kernel.step(key, state)
    assert float(info.acceptance_prob.mean()) > 0.999


def test_pallas_interpret_agrees_with_reference(key):
    A, b, *_ = make_target(jax.random.key(2))
    k_ref = quadratic_hmc(A, b, step_size=0.25, num_integration_steps=8,
                          use_pallas=False)
    k_pal = quadratic_hmc(A, b, step_size=0.25, num_integration_steps=8,
                          use_pallas=True, interpret=True, block_chains=32)
    state_r = k_ref.init(jnp.ones((64, 8)))
    state_p = k_pal.init(jnp.ones((64, 8)))
    sr, ir = k_ref.step(key, state_r)
    sp, ip = k_pal.step(key, state_p)
    np.testing.assert_allclose(
        np.asarray(sr.position), np.asarray(sp.position), rtol=1e-3, atol=1e-4
    )
