"""Checkpoint/resume, metrics, and config tests."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from binf_tpu.io import (
    RunConfig,
    aggregate_info,
    load_checkpoint,
    load_npz,
    save_checkpoint,
    save_npz,
)


def make_state(key):
    """A realistic sampler state: positions + adaptation + PRNG key."""
    return {
        "position": {
            "coefficients": jnp.arange(8.0).reshape(2, 4),
            "precision": jnp.asarray([1.5, 2.5]),
        },
        "step_size": jnp.asarray(0.123),
        "rng_key": key,
        "iteration": jnp.asarray(42, jnp.int32),
    }


def test_npz_roundtrip(tmp_path, key):
    state = make_state(key)
    path = str(tmp_path / "state.npz")
    save_npz(path, state)
    restored = load_npz(path, jax.tree.map(jnp.zeros_like, state))
    chex_equal(state, restored)


def test_orbax_roundtrip(tmp_path, key):
    state = make_state(key)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state)
    restored = load_checkpoint(path, jax.tree.map(jnp.zeros_like, state))
    chex_equal(state, restored)


def chex_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        if jnp.issubdtype(x.dtype, jax.dtypes.prng_key):
            x, y = jax.random.key_data(x), jax.random.key_data(y)
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_resume_reproduces_exact_chain(tmp_path, key):
    """A run checkpointed at step 50 and resumed must produce bitwise the
    same draws as an uninterrupted run (PRNG keys in state)."""
    from binf_tpu.parallel.runner import init_chains, run_chains
    from binf_tpu.samplers import rwm

    def logp(pos):
        return -0.5 * pos["x"] ** 2

    kernel = rwm(logp, 0.7)
    states = init_chains(kernel, {"x": jnp.zeros(4)})

    k1, k2 = jax.random.split(key)
    # uninterrupted: 50 + 50 steps
    mid, _ = run_chains(kernel, k1, states, 50)
    final_a, samples_a = run_chains(kernel, k2, mid, 50)

    # checkpoint mid-state + the second key, restore, continue
    path = str(tmp_path / "resume.npz")
    save_npz(path, {"states": mid, "next_key": k2})
    restored = load_npz(
        path, {"states": jax.tree.map(jnp.zeros_like, mid), "next_key": jax.random.key(0)}
    )
    final_b, samples_b = run_chains(
        kernel, restored["next_key"], restored["states"], 50
    )
    np.testing.assert_array_equal(
        np.asarray(samples_a["x"]), np.asarray(samples_b["x"])
    )


def test_aggregate_info():
    from binf_tpu.samplers.hmc import HMCInfo

    info = HMCInfo(
        accepted=jnp.asarray([[True, False], [True, True]]),
        acceptance_prob=jnp.asarray([[0.9, 0.1], [0.8, 0.7]]),
        energy_error=jnp.zeros((2, 2)),
        is_divergent=jnp.zeros((2, 2), bool),
        proposal_logdensity=jnp.zeros((2, 2)),
    )
    agg = aggregate_info(info)
    assert agg["accepted_rate"] == pytest.approx(0.75)
    assert agg["is_divergent_count"] == 0.0
    assert agg["acceptance_prob_mean"] == pytest.approx(0.625)

    # dict-of-infos (Gibbs) aggregates per block
    agg2 = aggregate_info({"coefficients": info})
    assert agg2["coefficients.accepted_rate"] == pytest.approx(0.75)


def test_run_config_roundtrip():
    cfg = RunConfig(n_chains=2048, seed=7)
    s = cfg.to_json()
    cfg2 = RunConfig.from_json(s)
    assert cfg2 == cfg
    assert json.loads(s)["kernel"]["algorithm"] == "hmc"
