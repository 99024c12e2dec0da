"""NUTS kernel tests: statistical moments, tree mechanics, divergences."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from binf_tpu.parallel.runner import init_chains, run_chains
from binf_tpu.samplers.nuts import nuts


def gaussian_2d_logdensity(pos):
    lx = -0.5 * ((pos["x"] - 1.0) / 2.0) ** 2
    ly = -0.5 * ((pos["y"] + 1.0) / 0.5) ** 2
    return lx + ly


def correlated_logdensity(pos):
    x, y = pos["x"], pos["y"]
    rho = 0.9
    return -(x**2 - 2 * rho * x * y + y**2) / (2 * (1 - rho**2))


@pytest.mark.slow
def test_moments_isotropic(key):
    kernel = nuts(gaussian_2d_logdensity, step_size=0.5, max_doublings=6)
    n_chains = 256
    positions = {"x": jnp.zeros(n_chains), "y": jnp.zeros(n_chains)}
    states = init_chains(kernel, positions)
    _, samples = jax.jit(lambda s, k: run_chains(kernel, k, s, 500))(states, key)
    x = np.asarray(samples["x"][200:]).ravel()
    y = np.asarray(samples["y"][200:]).ravel()
    assert abs(x.mean() - 1.0) < 0.15
    assert abs(x.std() - 2.0) < 0.25
    assert abs(y.mean() + 1.0) < 0.05
    assert abs(y.std() - 0.5) < 0.06


@pytest.mark.slow
def test_moments_correlated(key):
    """Strongly correlated target -- NUTS must adapt trajectory length."""
    kernel = nuts(correlated_logdensity, step_size=0.3, max_doublings=8)
    n_chains = 128
    positions = {"x": jnp.zeros(n_chains), "y": jnp.zeros(n_chains)}
    states = init_chains(kernel, positions)
    _, samples = jax.jit(lambda s, k: run_chains(kernel, k, s, 600))(states, key)
    x = np.asarray(samples["x"][200:]).ravel()
    y = np.asarray(samples["y"][200:]).ravel()
    assert abs(x.mean()) < 0.12
    assert abs(x.std() - 1.0) < 0.12
    assert abs(np.corrcoef(x, np.asarray(samples["y"][200:]).ravel())[0, 1] - 0.9) < 0.05


@pytest.mark.slow
def test_tree_depth_scales_with_step_size(key):
    """Smaller steps -> more doublings before the U-turn."""
    pos = {"x": jnp.asarray(0.5), "y": jnp.asarray(0.1)}

    def mean_depth(step_size):
        kernel = nuts(gaussian_2d_logdensity, step_size=step_size, max_doublings=10)
        state = kernel.init(pos)
        keys = jax.random.split(key, 32)
        _, infos = jax.vmap(lambda k: kernel.step(k, state))(keys)
        return float(jnp.mean(infos.num_doublings))

    assert mean_depth(0.02) > mean_depth(0.8) + 1.0


def test_divergence_detection(key):
    kernel = nuts(gaussian_2d_logdensity, step_size=100.0, max_doublings=5)
    state = kernel.init({"x": jnp.asarray(0.0), "y": jnp.asarray(0.0)})
    _, info = kernel.step(key, state)
    assert bool(info.is_divergent)
    # a divergent first expansion keeps the current position
    assert float(info.num_doublings) <= 5


def test_no_uturn_before_half_period(key):
    """For an isotropic Gaussian started at the mode with unit step, NUTS
    integrates ~ pi/eps steps per period; num_integration_steps must stay
    well below 2^max_doublings when the U-turn criterion works."""
    kernel = nuts(gaussian_2d_logdensity, step_size=0.25, max_doublings=10)
    state = kernel.init({"x": jnp.asarray(1.0), "y": jnp.asarray(-1.0)})
    keys = jax.random.split(key, 64)
    _, infos = jax.vmap(lambda k: kernel.step(k, state))(keys)
    # it must terminate by U-turn, not by exhausting the depth budget
    assert float(jnp.mean(infos.is_turning)) > 0.9
    assert float(jnp.max(infos.num_integration_steps)) < 1024


def test_deterministic(key):
    kernel = nuts(gaussian_2d_logdensity, step_size=0.4)
    state = kernel.init({"x": jnp.asarray(0.3), "y": jnp.asarray(0.2)})
    s1, i1 = jax.jit(kernel.step)(key, state)
    s2, i2 = jax.jit(kernel.step)(key, state)
    assert float(s1.position["x"]) == float(s2.position["x"])
    assert int(i1.num_integration_steps) == int(i2.num_integration_steps)


def test_energy_mean_accept_high_for_small_step(key):
    kernel = nuts(gaussian_2d_logdensity, step_size=0.05, max_doublings=8)
    state = kernel.init({"x": jnp.asarray(0.5), "y": jnp.asarray(-0.8)})
    _, info = kernel.step(key, state)
    assert float(info.acceptance_prob) > 0.95
