"""SVGD tests: Gaussian transport + polynomial posterior agreement."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from binf_tpu.core.density import VariableSpec
from binf_tpu.pdf import FunctionPrior, GaussianPrior, Posterior
from binf_tpu.vi.svgd import svgd


pytestmark = pytest.mark.slow


def test_svgd_matches_gaussian_target():
    prior = GaussianPrior.create(
        jnp.asarray([1.0, -2.0]), jnp.asarray([0.25, 4.0]), variable="z"
    )
    post = Posterior.create({}, {"t": prior})
    result = jax.jit(
        lambda k: svgd(post, k, num_particles=256, num_steps=1500,
                       learning_rate=0.1)
    )(jax.random.key(0))
    z = np.asarray(result.particles["z"])
    np.testing.assert_allclose(z.mean(0), [1.0, -2.0], atol=0.1)
    np.testing.assert_allclose(z.std(0), [0.5, 2.0], rtol=0.2)
    # transport converged
    trace = np.asarray(result.grad_norm_trace)
    assert trace[-50:].mean() < trace[:50].mean()


def test_svgd_polynomial_posterior():
    from binf_tpu.example.polynomial import (
        initial_positions,
        make_collapsed_gibbs_kernel,
        make_data,
        make_posterior,
    )
    from binf_tpu.parallel.runner import init_chains, run_chains

    xses, ys = make_data(jax.random.key(1))
    post = make_posterior(xses, ys)
    result = jax.jit(
        lambda k: svgd(post, k, num_particles=256, num_steps=3000,
                       learning_rate=0.1)
    )(jax.random.key(2))

    kernel = make_collapsed_gibbs_kernel(post)
    states = init_chains(kernel, initial_positions(64))
    _, gs = jax.jit(lambda s, k: run_chains(kernel, k, s, 300))(
        states, jax.random.key(3)
    )
    gc = np.asarray(gs["coefficients"][100:]).reshape(-1, 4)

    sc = np.asarray(result.particles["coefficients"])
    np.testing.assert_allclose(sc.mean(0), gc.mean(0), atol=0.15)
    assert (np.asarray(result.particles["precision"]) > 0).all()
