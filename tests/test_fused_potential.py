"""General fused-potential HMC: arbitrary models in the whole-run kernel.

Covers the ``tile_potential_from_scalar`` compiler (jaxpr const hoisting +
lane-axis vmap) and the ``fused_model_hmc`` driver on models the hand-tiled
linreg kernel rejects.  Runs in Pallas interpret mode on the CPU mesh.
"""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from binf_tpu.ops.pallas.fused_potential import (
    pack_positions,
    pack_template,
    tile_potential_from_scalar,
    unpack_draws,
)
from binf_tpu.samplers.fused import fused_model_hmc


def test_pack_unpack_roundtrip():
    positions = {
        "scalar": jnp.arange(6.0),
        "vec": jnp.arange(18.0).reshape(6, 3),
        "mat": jnp.arange(24.0).reshape(6, 2, 2),
    }
    spec = pack_template({k: v[0] for k, v in positions.items()})
    flat = pack_positions(positions, spec)
    assert flat.shape == (6, 1 + 3 + 4)
    back = unpack_draws(flat, spec)
    for k in positions:
        np.testing.assert_array_equal(np.asarray(back[k]), np.asarray(positions[k]))


def test_tile_potential_hoists_consts():
    mean = jnp.asarray([1.0, -2.0, 3.0])
    scale = 0.5

    def logdensity(pos):
        return -0.5 * jnp.sum(((pos["x"] - mean) / scale) ** 2)

    template = {"x": jnp.zeros((3,))}
    potential, consts, spec = tile_potential_from_scalar(logdensity, template)
    # the closed-over mean must be hoisted into kernel operands
    assert len(consts) >= 1
    # evaluate the tile potential directly (outside any kernel): pad consts
    from binf_tpu.ops.pallas.fused_potential import _pad_const

    padded = {k: _pad_const(v) for k, v in consts.items()}
    q = jnp.zeros((8, 4), jnp.float32)  # D_pad=8, BC=4 chains, x=0
    u = potential(q, padded)
    expected = 0.5 * float(jnp.sum((mean / scale) ** 2))
    np.testing.assert_allclose(np.asarray(u), expected, rtol=1e-5)


@pytest.mark.slow
def test_fused_model_gaussian_moments():
    """Anisotropic Gaussian with scalar+vector variables: exact moments."""
    mu_v = jnp.asarray([1.0, -1.0, 2.0])
    sd_v = jnp.asarray([0.5, 1.0, 2.0])

    def logdensity(pos):
        lp = -0.5 * jnp.sum(((pos["v"] - mu_v) / sd_v) ** 2)
        lp += -0.5 * (pos["s"] - 3.0) ** 2 / 0.7**2
        return lp

    n_chains = 64
    k = jax.random.key(0)
    init = {
        "v": 0.1 * jax.random.normal(k, (n_chains, 3)),
        "s": jnp.zeros((n_chains,)),
    }
    result = fused_model_hmc(
        logdensity,
        init,
        jax.random.key(1),
        num_warmup=300,
        num_samples=500,
        num_leapfrog=8,
        block_chains=32,
    )
    assert 0.5 < float(result.accept_rate) <= 1.0
    v = np.asarray(result.samples["v"][100:]).reshape(-1, 3)
    s = np.asarray(result.samples["s"][100:]).ravel()
    np.testing.assert_allclose(v.mean(0), np.asarray(mu_v), atol=0.15)
    np.testing.assert_allclose(v.std(0), np.asarray(sd_v), rtol=0.15)
    np.testing.assert_allclose(s.mean(), 3.0, atol=0.15)
    np.testing.assert_allclose(s.std(), 0.7, rtol=0.15)


@pytest.mark.slow
def test_fused_model_on_posterior_graph():
    """The general path handles the polynomial posterior end-to-end and
    agrees with collapsed Gibbs (same check as the hand-tiled kernel)."""
    from binf_tpu.example.polynomial import (
        initial_positions,
        make_collapsed_gibbs_kernel,
        make_data,
        make_posterior,
    )
    from binf_tpu.parallel.runner import init_chains, run_chains
    from binf_tpu.pdf.transforms import LogTransform, transform_logdensity

    xses, ys = make_data(jax.random.key(1))
    posterior = make_posterior(xses, ys)
    logdensity = transform_logdensity(
        lambda p: posterior.log_prob(p), {"precision": LogTransform}
    )

    n_chains = 64
    init = {
        "coefficients": 0.1 * jax.random.normal(jax.random.key(2), (n_chains, 4)),
        "precision": jnp.zeros((n_chains,)),  # log space
    }
    result = fused_model_hmc(
        logdensity,
        init,
        jax.random.key(0),
        num_warmup=300,
        num_samples=400,
        num_leapfrog=12,
        block_chains=32,
    )
    assert 0.3 < float(result.accept_rate) <= 1.0
    c = np.asarray(result.samples["coefficients"][100:]).reshape(-1, 4)
    p = np.exp(np.asarray(result.samples["precision"][100:])).ravel()

    kernel = make_collapsed_gibbs_kernel(posterior)
    states = init_chains(kernel, initial_positions(n_chains))
    _, gs = jax.jit(lambda s, k: run_chains(kernel, k, s, 400))(
        states, jax.random.key(3)
    )
    gc = np.asarray(gs["coefficients"][100:]).reshape(-1, 4)
    gp = np.asarray(gs["precision"][100:]).reshape(-1)
    np.testing.assert_allclose(c.mean(0), gc.mean(0), atol=0.1)
    np.testing.assert_allclose(p.mean(), gp.mean(), rtol=0.2)


@pytest.mark.slow
def test_fused_model_per_chain_step_and_thin():
    """Per-chain step sizes + draw thinning keep exact moments."""
    mu = jnp.asarray([0.5, -0.5])

    def logdensity(pos):
        return -0.5 * jnp.sum((pos["x"] - mu) ** 2)

    n_chains = 64
    init = {"x": 0.1 * jax.random.normal(jax.random.key(0), (n_chains, 2))}
    result = fused_model_hmc(
        logdensity,
        init,
        jax.random.key(1),
        num_warmup=300,
        num_samples=600,
        num_leapfrog=8,
        block_chains=32,
        per_chain_step_size=True,
        thin=3,
    )
    assert result.samples["x"].shape == (200, n_chains, 2)
    assert 0.5 < float(result.accept_rate) <= 1.0
    x = np.asarray(result.samples["x"][50:]).reshape(-1, 2)
    np.testing.assert_allclose(x.mean(0), np.asarray(mu), atol=0.1)
    np.testing.assert_allclose(x.std(0), 1.0, rtol=0.1)
    # per-chain step sizes are genuinely per-chain (vector, not broadcast)
    assert np.asarray(result.step_size).shape == (n_chains,)


@pytest.mark.slow
def test_fused_model_sharded_over_mesh():
    """One fused kernel per device over the sharded chain axis (8-device
    CPU mesh; north-star chain parallelism for the fused path)."""
    from binf_tpu.parallel.mesh import make_chain_mesh

    mesh = make_chain_mesh()
    mu = jnp.asarray([0.3, -0.7, 1.1])

    def logdensity(pos):
        return -0.5 * jnp.sum((pos["x"] - mu) ** 2)

    n_chains = 64
    init = {"x": 0.1 * jax.random.normal(jax.random.key(0), (n_chains, 3))}
    result = fused_model_hmc(
        logdensity,
        init,
        jax.random.key(1),
        # NOTE: Pallas interpret-mode emulation under shard_map degrades
        # sharply beyond ~200 steps on CPU; on TPU the kernel is compiled
        # and this limit does not exist.
        num_warmup=300,
        num_samples=200,
        num_leapfrog=8,
        block_chains=8,
        mesh=mesh,
    )
    assert 0.5 < float(result.accept_rate) <= 1.0
    x = np.asarray(result.samples["x"][50:]).reshape(-1, 3)
    np.testing.assert_allclose(x.mean(0), np.asarray(mu), atol=0.25)
    np.testing.assert_allclose(x.std(0), 1.0, rtol=0.2)
    # chains on different devices see different PRNG streams
    first_draw = np.asarray(result.samples["x"][0])
    assert np.std(first_draw[:8] - first_draw[8:16]) > 1e-4


@pytest.mark.slow
def test_fused_model_chees_trajectory():
    """trajectory='chees' adapts the trajectory length in warmup and freezes
    it to a static leapfrog count for the fused kernel; moments still match."""
    mu_v = jnp.asarray([1.0, -1.0, 2.0])
    sd_v = jnp.asarray([0.5, 1.0, 2.0])

    def logdensity(pos):
        return -0.5 * jnp.sum(((pos["v"] - mu_v) / sd_v) ** 2)

    n_chains = 64
    init = {"v": 0.1 * jax.random.normal(jax.random.key(0), (n_chains, 3))}
    result = fused_model_hmc(
        logdensity,
        init,
        jax.random.key(1),
        num_warmup=300,
        num_samples=400,
        block_chains=32,
        trajectory="chees",
    )
    assert 0.4 < float(result.accept_rate) <= 1.0
    v = np.asarray(result.samples["v"][100:]).reshape(-1, 3)
    np.testing.assert_allclose(v.mean(0), np.asarray(mu_v), atol=0.2)
    np.testing.assert_allclose(v.std(0), np.asarray(sd_v), rtol=0.2)


@pytest.mark.slow
def test_fused_model_auto_step_size():
    """initial_step_size=None seeds warmup with find_reasonable_step_size."""

    def logdensity(pos):
        return -0.5 * jnp.sum(pos["x"] ** 2)

    init = {"x": 0.1 * jax.random.normal(jax.random.key(0), (32, 2))}
    result = fused_model_hmc(
        logdensity,
        init,
        jax.random.key(1),
        num_warmup=200,
        num_samples=200,
        num_leapfrog=8,
        block_chains=32,
        initial_step_size=None,
    )
    assert 0.5 < float(result.accept_rate) <= 1.0
    assert float(result.step_size) > 0.01
