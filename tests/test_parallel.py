"""Distributed-execution tests on the virtual 8-device CPU mesh.

SURVEY.md section 4's distributed-test strategy: chain sharding, collective
adaptation, and diagnostics must run on a multi-device mesh without TPU
hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from binf_tpu.parallel import (
    chain_sharding,
    make_chain_mesh,
    run_chains,
    shard_chains,
    warmup_and_run,
)
from binf_tpu.parallel.runner import init_chains
from binf_tpu.samplers import hmc, rwm


def gaussian_logdensity(pos):
    return -0.5 * ((pos["x"] - 1.0) ** 2 + jnp.sum((pos["y"] + 1.0) ** 2))


def test_eight_devices_available():
    assert jax.device_count() == 8


def test_mesh_and_sharding():
    mesh = make_chain_mesh()
    assert mesh.shape == {"chain": 8}
    x = jnp.zeros((64, 4))
    tree = shard_chains({"a": x}, mesh)
    assert tree["a"].sharding.num_devices == 8


def test_sharded_chains_match_unsharded(key):
    """Same seed, same chain count: sharded and unsharded runs must produce
    bitwise-identical results (PRNG discipline requirement)."""
    kernel = rwm(gaussian_logdensity, step_size=0.8)
    n_chains = 64
    positions = {"x": jnp.zeros(n_chains), "y": jnp.zeros((n_chains, 3))}

    states = init_chains(kernel, positions)
    _, samples_plain = jax.jit(lambda s, k: run_chains(kernel, k, s, 50))(states, key)

    mesh = make_chain_mesh()
    states_sharded = init_chains(kernel, positions, mesh=mesh)
    _, samples_sharded = jax.jit(lambda s, k: run_chains(kernel, k, s, 50))(
        states_sharded, key
    )
    np.testing.assert_array_equal(
        np.asarray(samples_plain["x"]), np.asarray(samples_sharded["x"])
    )
    np.testing.assert_array_equal(
        np.asarray(samples_plain["y"]), np.asarray(samples_sharded["y"])
    )


def test_sharded_output_sharding(key):
    kernel = rwm(gaussian_logdensity, step_size=0.8)
    mesh = make_chain_mesh()
    positions = {"x": jnp.zeros(64), "y": jnp.zeros((64, 3))}
    states = init_chains(kernel, positions, mesh=mesh)

    @jax.jit
    def run(s, k):
        return run_chains(kernel, k, s, 20)

    final, samples = run(states, key)
    # chain axis sharding is preserved through the scan
    assert final.position["x"].sharding.num_devices == 8


def test_warmup_and_run_sharded(key):
    """Full adaptive pipeline on the mesh: pooled dual averaging across
    sharded chains (cross-chain mean acceptance => collective)."""
    mesh = make_chain_mesh()
    n_chains = 64

    def builder(step_size, inverse_mass):
        return hmc(
            gaussian_logdensity,
            step_size=step_size,
            num_integration_steps=8,
            inverse_mass=inverse_mass,
        )

    positions = {"x": jnp.zeros(n_chains), "y": jnp.zeros((n_chains, 3))}
    samples, final_states, adapt = warmup_and_run(
        builder,
        positions,
        key,
        num_warmup=400,
        num_samples=400,
        mesh=mesh,
    )
    x = np.asarray(samples["x"][100:]).ravel()
    y = np.asarray(samples["y"][100:]).reshape(-1, 3)
    assert abs(x.mean() - 1.0) < 0.1
    assert abs(x.std() - 1.0) < 0.1
    assert np.all(np.abs(y.mean(0) + 1.0) < 0.1)
    # adaptation produced a sensible step size and metric
    eps = float(adapt.step_size)
    assert 0.05 < eps < 5.0
    im_x = float(np.asarray(adapt.inverse_mass["x"]))
    assert 0.3 < im_x < 3.0  # true variance is 1


def test_window_adaptation_tunes_anisotropic_metric(key):
    """Mass adaptation must learn the squared scales of an anisotropic
    Gaussian (variances 25 and 0.04)."""

    def logp(pos):
        return -0.5 * ((pos["a"] / 5.0) ** 2 + (pos["b"] / 0.2) ** 2)

    def builder(step_size, inverse_mass):
        return hmc(logp, step_size, num_integration_steps=8, inverse_mass=inverse_mass)

    n_chains = 128
    positions = {"a": jnp.zeros(n_chains), "b": jnp.zeros(n_chains)}
    samples, _, adapt = warmup_and_run(
        builder, positions, key, num_warmup=600, num_samples=300
    )
    im_a = float(np.asarray(adapt.inverse_mass["a"]))
    im_b = float(np.asarray(adapt.inverse_mass["b"]))
    assert 10.0 < im_a < 45.0  # ~25
    assert 0.015 < im_b < 0.1  # ~0.04
    a = np.asarray(samples["a"][50:]).ravel()
    b = np.asarray(samples["b"][50:]).ravel()
    assert abs(a.std() - 5.0) < 0.75
    assert abs(b.std() - 0.2) < 0.03


def test_per_chain_step_size_adaptation(key):
    """per_chain=True gives every chain its own dual-averaged step size
    (arXiv:2503.17405); all must land in a sensible band, drive acceptance
    near the target, and the sampling phase must produce correct moments."""
    from binf_tpu.samplers.adaptation import window_adaptation

    def logp(pos):
        return -0.5 * jnp.sum(pos["x"] ** 2)

    # NOTE: with adapted eps ~0.8 and a fixed trajectory, L*eps near 2*pi
    # resonates on the unit Gaussian (proposals loop back to the start), so
    # per-chain means are heavy-tailed; L=5 keeps the trajectory ~pi
    # (antithetic) and the moment check meaningful.
    def builder(step_size, inverse_mass):
        return hmc(logp, step_size, num_integration_steps=5, inverse_mass=inverse_mass)

    n_chains = 64
    positions = {"x": 0.1 * jnp.arange(n_chains, dtype=jnp.float32)[:, None]
                 * jnp.ones((n_chains, 3))}
    k_warm, k_run = jax.random.split(key)
    states = init_chains(builder(0.1, None), positions)
    adapt = jax.jit(
        lambda s, k: window_adaptation(
            builder, s, k, num_steps=400, initial_step_size=0.1, per_chain=True
        )
    )(states, k_warm)

    eps = np.asarray(adapt.step_size)
    assert eps.shape == (n_chains,)
    assert np.all((eps > 0.05) & (eps < 5.0))
    # chains adapted independently: the step sizes are not all identical
    assert eps.std() > 0.0

    samples, _, _ = warmup_and_run(
        builder, positions, key, num_warmup=400, num_samples=400,
        per_chain_step_size=True,
    )
    x = np.asarray(samples["x"][100:]).reshape(-1, 3)
    assert np.all(np.abs(x.mean(0)) < 0.1)
    assert np.all(np.abs(x.std(0) - 1.0) < 0.1)


def test_gibbs_workload_sharded(key):
    """The reference Gibbs workload sharded over 8 devices."""
    from binf_tpu.example.polynomial import (
        initial_positions,
        make_collapsed_gibbs_kernel,
        make_data,
        make_posterior,
    )

    xses, ys = make_data(jax.random.key(1))
    posterior = make_posterior(xses, ys)
    kernel = make_collapsed_gibbs_kernel(posterior)
    mesh = make_chain_mesh()

    states = init_chains(kernel, initial_positions(128), mesh=mesh)
    _, samples = jax.jit(lambda s, k: run_chains(kernel, k, s, 200))(states, key)
    c = np.asarray(samples["coefficients"][50:]).reshape(-1, 4)
    assert np.isfinite(c).all()
    np.testing.assert_allclose(
        c.mean(0), [2.0, -4.0, 1.0, 1.5], atol=0.6
    )  # data is noisy; loose truth check


@pytest.mark.slow
def test_smc_sharded_particles(key):
    """SMC with the particle axis sharded over the mesh."""
    from binf_tpu.example.polynomial import make_data, make_posterior
    from binf_tpu.smc import tempered_smc

    xses, ys = make_data(jax.random.key(1))
    posterior = make_posterior(xses, ys)
    mesh = make_chain_mesh()

    # sample initial particles, shard them, then run under jit
    keys = jax.random.split(jax.random.key(5), 1024)
    particles = jax.vmap(posterior.sample_prior)(keys)
    particles = shard_chains(particles, mesh)

    result = jax.jit(
        lambda k, p: tempered_smc(
            posterior, k, initial_particles=p, num_mutation_steps=5
        )
    )(key, particles)
    assert float(result.final_beta) == 1.0
    c = np.asarray(result.particles["coefficients"])
    np.testing.assert_allclose(c.mean(0), [2.0, -4.0, 1.0, 1.5], atol=0.6)


@pytest.mark.slow
def test_window_adaptation_auto_initial_step(key):
    """initial_step_size=None runs find_reasonable_step_size (Hoffman &
    Gelman Alg. 4) to seed dual averaging; the result must land in the same
    ballpark as an explicitly well-seeded warmup."""
    from binf_tpu.samplers.adaptation import window_adaptation
    from binf_tpu.samplers.hmc import hmc

    def logdensity(pos):
        return -0.5 * jnp.sum(pos["x"] ** 2)

    def builder(step_size, inverse_mass):
        return hmc(logdensity, step_size, 8, inverse_mass)

    positions = {"x": 0.1 * jax.random.normal(key, (64, 4))}
    states = jax.vmap(builder(1.0, None).init)(positions)

    auto = jax.jit(
        lambda s, k: window_adaptation(
            builder, s, k, num_steps=200, initial_step_size=None
        )
    )(states, jax.random.key(1))
    seeded = jax.jit(
        lambda s, k: window_adaptation(
            builder, s, k, num_steps=200, initial_step_size=0.5
        )
    )(states, jax.random.key(1))
    assert 0.25 < float(auto.step_size) / float(seeded.step_size) < 4.0
