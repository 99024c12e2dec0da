"""Production driver tests: streaming moments, checkpoint mid-run resume,
divergence accounting."""

import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from binf_tpu.io.metrics import MetricsLogger
from binf_tpu.parallel.production import run_blocks
from binf_tpu.parallel.runner import init_chains
from binf_tpu.samplers import hmc, rwm


def logp(pos):
    return -0.5 * ((pos["x"] - 2.0) ** 2 + jnp.sum((pos["y"] + 1.0) ** 2))


def make_states(kernel, n=64):
    return init_chains(kernel, {"x": jnp.zeros(n), "y": jnp.zeros((n, 2))})


def test_streaming_moments_match_draws(key):
    kernel = rwm(logp, 0.8, proposal="normal")
    states = make_states(kernel)
    res = run_blocks(kernel, states, key, num_steps=600, block_size=100,
                     collect_draws=True)
    # streaming moments over ALL draws == moments of collected draws
    x = np.asarray(res.draws["x"])
    np.testing.assert_allclose(float(res.mean["x"]), x.mean(), rtol=1e-4)
    np.testing.assert_allclose(
        float(res.variance["x"]), x.reshape(-1).var(ddof=1), rtol=1e-3
    )
    # and they approximate the target
    assert abs(float(res.mean["x"]) - 2.0) < 0.2


def test_checkpoint_resume_bitwise(tmp_path, key):
    kernel = rwm(logp, 0.8)
    states = make_states(kernel, n=16)
    path = str(tmp_path / "ckpt")

    # full run, checkpointing at block 2 of 4
    res_full = run_blocks(kernel, states, key, num_steps=400, block_size=100,
                          checkpoint_path=path, checkpoint_every_blocks=2)

    # "crashed" run restarted from the checkpoint: same final state
    res_resumed = run_blocks(kernel, states, key, num_steps=400, block_size=100,
                             checkpoint_path=path, resume=True)
    np.testing.assert_array_equal(
        np.asarray(res_full.carry.states.position["x"]),
        np.asarray(res_resumed.carry.states.position["x"]),
    )
    assert int(res_resumed.carry.step) == 400


def test_divergence_accounting(key):
    # absurd step size -> everything diverges, nothing crashes
    kernel = hmc(logp, step_size=100.0, num_integration_steps=5)
    states = make_states(kernel, n=32)
    res = run_blocks(kernel, states, key, num_steps=100, block_size=50)
    assert res.divergence_fraction > 0.9
    assert np.isfinite(np.asarray(res.carry.states.position["x"])).all()


def test_metrics_logging(key):
    kernel = rwm(logp, 0.8)
    states = make_states(kernel, n=8)
    buf = io.StringIO()
    logger = MetricsLogger(stream=buf)
    run_blocks(kernel, states, key, num_steps=200, block_size=100, logger=logger)
    lines = [l for l in buf.getvalue().splitlines() if l]
    assert len(lines) == 2
    assert '"step": 200' in lines[1]


# -- fused whole-run kernel driven in blocks ---------------------------------


def _fused_positions(n=32):
    return {"x": jnp.zeros((n,)), "y": jnp.zeros((n, 2))}


@pytest.mark.slow
def test_fused_blocks_moments_match_draws(key):
    """In-kernel Welford moments == host-side moments of the same draws."""
    from binf_tpu.parallel.production import run_fused_blocks

    kwargs = dict(
        num_steps=300, block_size=100, num_warmup=150,
        block_chains=32, num_leapfrog=5,
    )
    res_m = run_fused_blocks(logp, _fused_positions(), key, **kwargs)
    res_d = run_fused_blocks(
        logp, _fused_positions(), key, collect_draws=True, **kwargs
    )
    # identical per-block PRNG streams -> identical trajectories, so the
    # two moment pipelines agree to float tolerance
    np.testing.assert_allclose(
        np.asarray(res_m.mean["x"]), np.asarray(res_d.mean["x"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(res_m.variance["y"]), np.asarray(res_d.variance["y"]),
        rtol=1e-3, atol=1e-5,
    )
    assert res_d.draws["x"].shape == (300, 32)
    # and the streaming moments approximate the target N(2, 1) x-marginal
    assert abs(float(res_m.mean["x"].mean())) - 2.0 < 0.3


@pytest.mark.slow
def test_fused_blocks_checkpoint_resume_bitwise(tmp_path, key):
    """Round-1 VERDICT item 3: a preempted FUSED run resumes bitwise."""
    from binf_tpu.parallel.production import run_fused_blocks

    path = str(tmp_path / "fused_ckpt")
    kwargs = dict(
        num_steps=400, block_size=100, num_warmup=100,
        block_chains=16, num_leapfrog=5,
    )
    res_full = run_fused_blocks(
        logp, _fused_positions(16), key,
        checkpoint_path=path, checkpoint_every_blocks=2, **kwargs,
    )
    res_resumed = run_fused_blocks(
        logp, _fused_positions(16), key,
        checkpoint_path=path, resume=True, **kwargs,
    )
    np.testing.assert_array_equal(
        np.asarray(res_full.carry.positions),
        np.asarray(res_resumed.carry.positions),
    )
    np.testing.assert_array_equal(
        np.asarray(res_full.carry.mean), np.asarray(res_resumed.carry.mean)
    )
    assert int(res_resumed.carry.block) == 4


@pytest.mark.slow
def test_fused_blocks_sharded_mesh(tmp_path, key):
    """run_fused_blocks(mesh=...): one fused kernel per device per block over
    the sharded chain axis, sharded Orbax checkpoint, bitwise resume
    (round-2 VERDICT item 5)."""
    from binf_tpu.parallel.mesh import make_chain_mesh
    from binf_tpu.parallel.production import run_fused_blocks

    mesh = make_chain_mesh()
    path = str(tmp_path / "fused_mesh_ckpt")
    kwargs = dict(
        num_steps=400, block_size=100, num_warmup=100,
        block_chains=4, num_leapfrog=5, mesh=mesh,
    )
    res_full = run_fused_blocks(
        logp, _fused_positions(32), key,
        checkpoint_path=path, checkpoint_every_blocks=2, **kwargs,
    )
    res_resumed = run_fused_blocks(
        logp, _fused_positions(32), key,
        checkpoint_path=path, resume=True, **kwargs,
    )
    np.testing.assert_array_equal(
        np.asarray(res_full.carry.positions),
        np.asarray(res_resumed.carry.positions),
    )
    np.testing.assert_array_equal(
        np.asarray(res_full.carry.mean), np.asarray(res_resumed.carry.mean)
    )
    assert int(res_resumed.carry.block) == 4
    # moments approximate the target N(2,1) x N(-1,1)^2
    assert abs(float(res_full.mean["x"].mean()) - 2.0) < 0.3
    assert abs(float(res_full.mean["y"].mean()) + 1.0) < 0.3
    # the carry stays sharded over the chain axis
    sh = res_full.carry.positions.sharding
    assert getattr(sh, "spec", None) is not None


@pytest.mark.slow
def test_fused_blocks_fused_warmup(key):
    """run_fused_blocks(warmup='fused'): in-kernel adaptation feeds the
    block driver; per-chain step size/metric carried through blocks."""
    from binf_tpu.parallel.production import run_fused_blocks

    res = run_fused_blocks(
        logp, _fused_positions(32), key,
        num_steps=300, block_size=100, num_warmup=150,
        block_chains=32, num_leapfrog=5, warmup="fused",
    )
    assert res.carry.step_size.shape == (32,)
    assert res.carry.inverse_mass.shape == (32, 3)
    assert abs(float(res.mean["x"].mean()) - 2.0) < 0.3
    assert 0.5 < res.accept_rate <= 1.0


def test_fused_blocks_dense_warmup(tmp_path, key):
    """warmup='dense': block-driven fused runs under a full-covariance
    metric, with the bitwise resume contract intact."""
    from binf_tpu.parallel.production import run_fused_blocks

    path = str(tmp_path / "fused_dense_ckpt")
    kwargs = dict(
        num_steps=300, block_size=100, num_warmup=150,
        block_chains=16, num_leapfrog=5, warmup="dense",
    )
    res_full = run_fused_blocks(
        logp, _fused_positions(16), key,
        checkpoint_path=path, checkpoint_every_blocks=1, **kwargs,
    )
    assert res_full.carry.inverse_mass.shape == (3, 3)  # dense (D, D)
    assert 0.5 < float(res_full.accept_rate) <= 1.0
    # moments should match the (independent-Gaussian-ish) target scales
    std = np.sqrt(np.asarray(res_full.variance["y"])).mean(axis=0)
    assert std.shape == (2,)

    res_resumed = run_fused_blocks(
        logp, _fused_positions(16), key,
        checkpoint_path=path, resume=True, **kwargs,
    )
    np.testing.assert_array_equal(
        np.asarray(res_full.carry.positions),
        np.asarray(res_resumed.carry.positions),
    )
