"""Fused whole-run HMC kernel: statistical correctness in interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from binf_tpu.ops.math import vandermonde
from binf_tpu.ops.pallas.fused_hmc import (
    fused_linreg_hmc_run,
    linreg_unconstrained_logdensity,
)


@pytest.fixture(scope="module")
def problem():
    key = jax.random.key(1)
    xses = jnp.linspace(-2, 2, 20)
    V = vandermonde(xses, 4)
    coeffs = jnp.asarray([2.0, -4.0, 1.0, 1.5])
    y = V @ coeffs + jax.random.normal(key, (20,)) / jnp.sqrt(2.5)
    prior_var = jnp.ones(4) * 5.0
    return V, y, prior_var


def exact_posterior(V, y, precision):
    V = np.asarray(V)
    y = np.asarray(y)
    prec_mat = precision * V.T @ V + np.eye(4) / 5.0
    cov = np.linalg.inv(prec_mat)
    return cov @ (precision * V.T @ y), cov


def test_logdensity_reference_matches_posterior(problem):
    """The kernel's closed-form density equals the DSL posterior's (up to a
    constant) in unconstrained space."""
    from binf_tpu.example.polynomial import make_posterior
    from binf_tpu.pdf.transforms import LogTransform, transform_logdensity

    V, y, prior_var = problem
    xses = jnp.linspace(-2, 2, 20)
    post = make_posterior(xses, y)
    dsl = transform_logdensity(lambda p: post.log_prob(p), {"precision": LogTransform})
    ker = linreg_unconstrained_logdensity(V, y, prior_var, 1.0, 0.2)

    p1 = {"coefficients": jnp.asarray([1.0, -2.0, 0.5, 1.0]), "precision": jnp.asarray(0.3)}
    p2 = {"coefficients": jnp.asarray([2.0, -4.0, 1.0, 1.5]), "precision": jnp.asarray(1.1)}
    diff1 = float(dsl(p1) - ker(p1))
    diff2 = float(dsl(p2) - ker(p2))
    assert diff1 == pytest.approx(diff2, abs=1e-3)  # constant offset only


@pytest.mark.slow
def test_fused_run_recovers_posterior(problem):
    V, y, prior_var = problem
    C = 64
    key = jax.random.key(0)
    q0 = jnp.concatenate(
        [
            jnp.ones((C, 4)) + 0.1 * jax.random.normal(key, (C, 4)),
            jnp.zeros((C, 1)),
        ],
        axis=1,
    )
    inverse_mass = jnp.asarray([0.05, 0.1, 0.02, 0.02, 0.1])
    draws, acc = fused_linreg_hmc_run(
        q0, 7, V, y, prior_var, 1.0, 0.2,
        step_size=0.25, inverse_mass=inverse_mass,
        num_steps=400, num_leapfrog=10,
        block_chains=32, steps_per_block=50, interpret=True, host_noise=True,
    )
    assert draws.shape == (400, C, 5)
    assert 0.3 < float(acc) <= 1.0

    kept = np.asarray(draws[150:])
    coeffs = kept[..., :4].reshape(-1, 4)
    prec = np.exp(kept[..., 4]).reshape(-1)

    mean_exact, cov_exact = exact_posterior(V, y, prec.mean())
    np.testing.assert_allclose(coeffs.mean(0), mean_exact, atol=0.1)
    # precision posterior center: Gamma(a + n/2, b + E[SS]/2) self-consistency
    Vn = np.asarray(V)
    resid = np.asarray(y)[:, None] - Vn @ coeffs.T
    ss = (resid**2).sum(0)
    expected = np.mean((1.0 + 10.0) / (0.2 + ss / 2))
    np.testing.assert_allclose(prec.mean(), expected, rtol=0.1)


def test_deterministic_given_seed(problem):
    V, y, prior_var = problem
    C = 32
    q0 = jnp.zeros((C, 5))
    im = jnp.ones(5) * 0.05
    kwargs = dict(step_size=0.2, inverse_mass=im, num_steps=100,
                  block_chains=32, steps_per_block=50, interpret=True,
                  host_noise=True)
    d1, a1 = fused_linreg_hmc_run(q0, 3, V, y, prior_var, 1.0, 0.2, **kwargs)
    d2, a2 = fused_linreg_hmc_run(q0, 3, V, y, prior_var, 1.0, 0.2, **kwargs)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
