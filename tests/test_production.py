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
