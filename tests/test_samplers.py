"""Sampler kernel tests: statistical correctness on analytic targets.

The reference never tests its samplers statistically (SURVEY.md section 4:
HMC sample/leapfrog untested); these tests close that gap with
moment-matching against closed-form targets, using many vectorized chains so
Monte-Carlo error is tiny.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from binf_tpu.parallel.runner import init_chains, run_chains
from binf_tpu.samplers import hmc, mala, rwm
from binf_tpu.samplers.base import sample_chain


def gaussian_2d_logdensity(pos):
    """x ~ N(1, 2^2), y ~ N(-1, 0.5^2) -- heterogeneous dict position."""
    lx = -0.5 * ((pos["x"] - 1.0) / 2.0) ** 2
    ly = -0.5 * ((pos["y"] + 1.0) / 0.5) ** 2
    return lx + ly


def run_many_chains(kernel, key, n_chains=256, n_steps=500, burn=250):
    positions = {
        "x": jnp.zeros((n_chains,)),
        "y": jnp.zeros((n_chains,)),
    }
    states = init_chains(kernel, positions)
    final, samples = jax.jit(
        lambda s, k: run_chains(kernel, k, s, n_steps)
    )(states, key)
    return {k: np.asarray(v[burn:]) for k, v in samples.items()}


def check_moments(samples, atol_mean=0.1, rtol_std=0.15):
    assert np.abs(samples["x"].mean() - 1.0) < atol_mean * 2.0
    assert np.abs(samples["y"].mean() + 1.0) < atol_mean
    assert np.abs(samples["x"].std() - 2.0) < rtol_std * 2.0 * 2
    assert np.abs(samples["y"].std() - 0.5) < rtol_std * 0.5 * 2


class TestRWM:
    def test_moments(self, key):
        kernel = rwm(gaussian_2d_logdensity, step_size=1.0)
        samples = run_many_chains(kernel, key, n_steps=1000, burn=500)
        check_moments(samples)

    def test_gaussian_proposal(self, key):
        kernel = rwm(gaussian_2d_logdensity, step_size=1.0, proposal="normal")
        samples = run_many_chains(kernel, key, n_steps=1000, burn=500)
        check_moments(samples)

    def test_deterministic_same_seed(self, key):
        kernel = rwm(gaussian_2d_logdensity, step_size=0.5)
        s1 = run_many_chains(kernel, key, n_chains=8, n_steps=50, burn=0)
        s2 = run_many_chains(kernel, key, n_chains=8, n_steps=50, burn=0)
        assert np.array_equal(s1["x"], s2["x"])


class TestHMC:
    def test_moments(self, key):
        kernel = hmc(
            gaussian_2d_logdensity,
            step_size=0.3,
            num_integration_steps=8,
            inverse_mass={"x": jnp.asarray(4.0), "y": jnp.asarray(0.25)},
        )
        samples = run_many_chains(kernel, key)
        check_moments(samples)

    def test_energy_conservation_small_step(self, key):
        """With a tiny step size the leapfrog must nearly conserve energy ->
        acceptance ~ 1 (validates the integrator against reference
        ``binf/samplers/hmc.py:92-125`` semantics)."""
        kernel = hmc(gaussian_2d_logdensity, step_size=0.01, num_integration_steps=10)
        state = kernel.init({"x": jnp.asarray(0.5), "y": jnp.asarray(-0.5)})
        _, info = kernel.step(key, state)
        assert float(info.acceptance_prob) > 0.999
        assert abs(float(info.energy_error)) < 1e-3

    def test_reversibility(self):
        """Leapfrog run forward then backward returns to the start."""
        from binf_tpu.samplers.hmc import leapfrog

        vgf = jax.value_and_grad(gaussian_2d_logdensity)
        q0 = {"x": jnp.asarray(0.7), "y": jnp.asarray(-0.2)}
        p0 = {"x": jnp.asarray(0.3), "y": jnp.asarray(-1.1)}
        _, g0 = vgf(q0)
        q1, p1, _, g1 = leapfrog(vgf, q0, p0, g0, jnp.asarray(0.1), 20, None)
        neg_p1 = jax.tree.map(lambda x: -x, p1)
        q2, p2, _, _ = leapfrog(vgf, q1, neg_p1, g1, jnp.asarray(0.1), 20, None)
        assert abs(float(q2["x"] - q0["x"])) < 1e-4
        assert abs(float(q2["y"] - q0["y"])) < 1e-4

    def test_divergence_flagged(self, key):
        kernel = hmc(gaussian_2d_logdensity, step_size=50.0, num_integration_steps=5)
        state = kernel.init({"x": jnp.asarray(0.0), "y": jnp.asarray(0.0)})
        _, info = kernel.step(key, state)
        assert bool(info.is_divergent)
        assert not bool(info.accepted) or float(info.acceptance_prob) < 1e-3


class TestMALA:
    def test_moments(self, key):
        kernel = mala(gaussian_2d_logdensity, step_size=0.5)
        samples = run_many_chains(kernel, key, n_steps=1000, burn=500)
        check_moments(samples)


class TestSampleChain:
    def test_thinning(self, key):
        kernel = rwm(gaussian_2d_logdensity, step_size=0.5)
        pos = {"x": jnp.asarray(0.0), "y": jnp.asarray(0.0)}
        _, samples = sample_chain(kernel, key, pos, num_steps=100, thin=10)
        assert samples["x"].shape == (10,)
