"""shard_map collective tests: distributed resampling equals single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from binf_tpu.parallel.collectives import (
    distributed_systematic_indices,
    pmean_over_chains,
    take_along_chain,
)
from binf_tpu.parallel.mesh import make_chain_mesh, shard_chains
from binf_tpu.smc.resampling import systematic_resample


def test_distributed_indices_match_reference(key):
    mesh = make_chain_mesh()
    n = 128
    lw = jax.random.normal(key, (n,))
    ref = systematic_resample(jax.random.key(3), lw)

    lw_sharded = shard_chains(lw, mesh)
    dist = distributed_systematic_indices(jax.random.key(3), lw_sharded, mesh)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(dist))


def test_take_along_chain(key):
    mesh = make_chain_mesh()
    n = 64
    particles = {
        "a": jnp.arange(n, dtype=jnp.float32),
        "b": jnp.arange(n * 3, dtype=jnp.float32).reshape(n, 3),
    }
    particles = shard_chains(particles, mesh)
    idx = jnp.concatenate([jnp.full(32, 5, jnp.int32), jnp.full(32, 60, jnp.int32)])
    out = take_along_chain(particles, idx)
    assert float(out["a"][0]) == 5.0
    assert float(out["a"][-1]) == 60.0
    np.testing.assert_array_equal(np.asarray(out["b"][0]), [15.0, 16.0, 17.0])


def test_pmean_over_chains(key):
    mesh = make_chain_mesh()
    x = jax.random.normal(key, (64, 4))
    tree = shard_chains({"x": x}, mesh)
    pooled = pmean_over_chains(tree, mesh)
    np.testing.assert_allclose(
        np.asarray(pooled["x"]), np.asarray(x.mean(0)), rtol=1e-5
    )


def test_distributed_resample_in_smc_style_loop(key):
    """Index computation + particle gather as the SMC resample step."""
    mesh = make_chain_mesh()
    n = 64
    particles = {"theta": jax.random.normal(key, (n, 2))}
    particles = shard_chains(particles, mesh)
    lw = jax.random.normal(jax.random.key(1), (n,))
    lw = shard_chains(lw, mesh)

    @jax.jit
    def resample(k, lw, particles):
        idx = distributed_systematic_indices(k, lw, mesh)
        return take_along_chain(particles, idx)

    out = resample(jax.random.key(2), lw, particles)
    # the resampled set is a subset of the original particles
    orig = np.asarray(jax.device_get(particles["theta"]))
    new = np.asarray(jax.device_get(out["theta"]))
    for row in new[:8]:
        assert (np.abs(orig - row[None, :]).sum(axis=1) < 1e-6).any()
