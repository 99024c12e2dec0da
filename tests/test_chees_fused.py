"""Fused in-kernel ChEES: jittered traced-length trajectories + in-kernel
trajectory adaptation (round-5; supersedes the round-4 freeze-to-static-L
bridge).  Interpret-mode statistics here; TPU timings in
benchmarks/bench_algorithms.py / docs/performance.md."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from binf_tpu.ops.pallas.fused_potential import (
    fused_potential_hmc_run,
    fused_warmup_run,
    tile_potential_from_scalar,
)
from binf_tpu.samplers.fused import fused_model_hmc

SCALES = np.asarray([0.5, 1.0, 2.0, 4.0], np.float32)


def _target():
    s = jnp.asarray(SCALES)

    def ld(p):
        return -0.5 * jnp.sum((p["x"] / s) ** 2)

    return ld, {"x": jnp.zeros((4,))}


def test_fused_chees_sampling_preserves_target():
    """Jittered traced-L trajectories keep the stationary distribution:
    exact moments on an anisotropic Gaussian (kernel-level test)."""
    ld, template = _target()
    potential, consts, spec = tile_potential_from_scalar(ld, template)
    C = 64
    q0 = jnp.zeros((C, 4), jnp.float32)
    im = jnp.asarray(SCALES**2)  # ideal metric
    res = fused_potential_hmc_run(
        potential, q0, 3, 0.9, im, consts,
        num_steps=600, block_chains=C, steps_per_block=50,
        interpret=True, host_noise=True,
        trajectory="chees", traj_length=2.0, max_leapfrog=16,
    )
    assert 0.5 < float(res.accept_rate) <= 1.0
    draws = np.asarray(res.draws)[200:].reshape(-1, 4)
    np.testing.assert_allclose(draws.mean(0), 0.0, atol=0.15)
    np.testing.assert_allclose(draws.std(0), SCALES, rtol=0.12)


@pytest.mark.slow
def test_fused_model_chees_xla_warmup_jittered_kernel():
    """fused_model_hmc(trajectory='chees'): ChEES warmup on the XLA path,
    then the JITTERED fused kernel (traced loop bound, not a frozen L)."""
    ld, _ = _target()
    C = 64
    positions = {"x": 0.5 * jax.random.normal(jax.random.key(0), (C, 4))}
    res = fused_model_hmc(
        ld, positions, jax.random.key(1),
        num_warmup=300, num_samples=400, trajectory="chees",
        max_leapfrog=32, block_chains=C,
    )
    assert res.trajectory_length is not None
    T = float(jnp.mean(res.trajectory_length))
    assert T > 0.0
    assert 0.4 < float(res.accept_rate) <= 1.0
    draws = np.asarray(res.samples["x"])[100:].reshape(-1, 4)
    np.testing.assert_allclose(draws.mean(0), 0.0, atol=0.2)
    np.testing.assert_allclose(draws.std(0), SCALES, rtol=0.2)


@pytest.mark.slow
def test_fused_chees_full_in_kernel():
    """The round-5 headline path: ChEES trajectory adaptation INSIDE the
    fused warmup kernel (Adam on log T, tile-pooled surrogate gradient),
    then jittered fused sampling -- warmup + sampling as one dispatch."""
    ld, _ = _target()
    C = 64
    positions = {"x": 0.5 * jax.random.normal(jax.random.key(2), (C, 4))}
    res = fused_model_hmc(
        ld, positions, jax.random.key(3),
        num_warmup=400, num_samples=400,
        trajectory="chees", warmup="fused", block_chains=C,
        max_leapfrog=32,
    )
    # T adapted away from its T0 = 10 * eps0 init and within the clamp band
    T = np.asarray(res.trajectory_length)
    eps = np.asarray(res.step_size)
    assert T.shape == (C,) and eps.shape == (C,)
    assert np.all(T >= eps - 1e-6) and np.all(T <= eps * 32 + 1e-5)
    # ChEES targets 0.651 acceptance (pooled dual averaging)
    assert 0.45 < float(res.accept_rate) <= 0.9
    draws = np.asarray(res.samples["x"])[100:].reshape(-1, 4)
    np.testing.assert_allclose(draws.mean(0), 0.0, atol=0.25)
    np.testing.assert_allclose(draws.std(0), SCALES, rtol=0.25)


def test_fused_chees_warmup_kernel_outputs():
    """fused_warmup_run(trajectory='chees') returns (q, eps, im, T) with a
    sane adapted metric on the anisotropic target."""
    ld, template = _target()
    potential, consts, spec = tile_potential_from_scalar(ld, template)
    C = 64
    q0 = 0.1 * jax.random.normal(jax.random.key(4), (C, 4))
    qf, eps, im, T = fused_warmup_run(
        potential, q0, 11, 0.5, consts,
        num_warmup=400, block_chains=C, interpret=True, host_noise=True,
        trajectory="chees", max_leapfrog=32, target_accept=0.651,
    )
    assert qf.shape == (C, 4) and T.shape == (C,)
    # metric learned the anisotropy (variances within ~2x per coordinate)
    ratio = np.asarray(im).mean(0) / SCALES**2
    assert np.all(ratio > 0.3) and np.all(ratio < 3.0)
