"""Parallel tempering tests: multimodal mixing that plain kernels can't do."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from binf_tpu.samplers.tempering import geometric_betas, parallel_tempering


def bimodal_logdensity(pos):
    """Two well-separated modes at x = -4 and x = +4 (scale 0.5): a plain
    RWM chain started in one mode essentially never crosses."""
    x = pos["x"]
    la = -0.5 * ((x + 4.0) / 0.5) ** 2
    lb = -0.5 * ((x - 4.0) / 0.5) ** 2
    return jnp.logaddexp(la, lb)


def run_pt(key, n_steps=3000, K=6):
    betas = geometric_betas(K, beta_min=0.02)
    kernel = parallel_tempering(bimodal_logdensity, betas, step_size=0.8)
    # all replicas start in the LEFT mode
    positions = {"x": jnp.full((K,), -4.0)}
    state = kernel.init(positions)

    @jax.jit
    def run(state, k):
        def body(state, kk):
            state, info = kernel.step(kk, state)
            return state, (state.positions["x"][0], info.swap_accepted)

        keys = jax.random.split(k, n_steps)
        return jax.lax.scan(body, state, keys)

    return run(state, key)


def test_pt_crosses_modes(key):
    _, (xs, swaps) = run_pt(key)
    xs = np.asarray(xs[500:])
    right_frac = (xs > 0).mean()
    # symmetric bimodal: cold chain should spend ~half its time in each mode
    assert 0.25 < right_frac < 0.75
    # modes are correct
    assert abs(np.abs(xs).mean() - 4.0) < 0.3


def test_plain_rwm_fails_to_cross(key):
    """Control: without tempering the chain stays stuck (validates that the
    PT test is meaningful)."""
    from binf_tpu.samplers.rwm import rwm

    kernel = rwm(bimodal_logdensity, step_size=0.8, proposal="normal")
    state = kernel.init({"x": jnp.asarray(-4.0)})

    @jax.jit
    def run(state, k):
        def body(state, kk):
            state, _ = kernel.step(kk, state)
            return state, state.position["x"]

        keys = jax.random.split(k, 3000)
        return jax.lax.scan(body, state, keys)

    _, xs = run(state, key)
    assert (np.asarray(xs) < 0).all()


def test_swap_acceptance_reasonable(key):
    _, (_, swaps) = run_pt(key)
    # average over active sweeps: each pair is active every other sweep
    rate = np.asarray(swaps).mean() * 2.0
    assert 0.1 < rate < 1.0


def test_pt_vmaps_over_chains(key):
    betas = geometric_betas(4, beta_min=0.05)
    kernel = parallel_tempering(bimodal_logdensity, betas, step_size=0.8)
    n_chains = 8
    positions = {"x": jnp.full((n_chains, 4), -4.0)}
    states = jax.vmap(kernel.init)(positions)
    keys = jax.random.split(key, n_chains)
    states, infos = jax.jit(jax.vmap(kernel.step))(keys, states)
    assert states.positions["x"].shape == (n_chains, 4)
    assert infos.swap_accepted.shape == (n_chains, 3)
