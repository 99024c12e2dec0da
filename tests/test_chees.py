"""ChEES-HMC tests: trajectory-length adaptation + statistical correctness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from binf_tpu.parallel.runner import init_chains, run_chains
from binf_tpu.samplers.chees import (
    chees_adaptation,
    chees_hmc,
    halton_sequence,
    leapfrog_dynamic,
)


def test_halton_low_discrepancy():
    h = halton_sequence(128)
    assert (h > 0).all() and (h < 1).all()
    assert abs(h.mean() - 0.5) < 0.02
    # stratification: every length-16 window covers (0,1) reasonably
    for i in range(0, 128, 16):
        w = h[i : i + 16]
        assert w.min() < 0.15 and w.max() > 0.85


def test_leapfrog_dynamic_matches_static():
    from binf_tpu.samplers.hmc import leapfrog

    def logp(pos):
        return -0.5 * (pos["x"] ** 2 + jnp.sum(pos["y"] ** 2))

    vgf = jax.value_and_grad(logp)
    q = {"x": jnp.asarray(0.5), "y": jnp.asarray([1.0, -0.3])}
    p = {"x": jnp.asarray(-0.2), "y": jnp.asarray([0.4, 0.9])}
    _, g = vgf(q)
    q1, p1, ld1, _ = leapfrog(vgf, q, p, g, jnp.asarray(0.1), 7, None)
    q2, p2, ld2, _ = leapfrog_dynamic(vgf, q, p, g, jnp.asarray(0.1),
                                      jnp.asarray(7), None)
    assert float(q1["x"]) == pytest.approx(float(q2["x"]), rel=1e-6)
    assert np.allclose(np.asarray(p1["y"]), np.asarray(p2["y"]), rtol=1e-6)


@pytest.fixture(scope="module")
def adapted():
    """Anisotropic Gaussian: scales (10, 1, 0.1) -- trajectory must stretch
    toward the slow direction."""

    def logp(pos):
        z = pos["z"]
        scales = jnp.asarray([10.0, 1.0, 0.1])
        return -0.5 * jnp.sum((z / scales) ** 2)

    n_chains = 128
    positions = {"z": 0.1 * jax.random.normal(jax.random.key(0), (n_chains, 3))}
    result = jax.jit(
        lambda k: chees_adaptation(
            logp, positions, k, num_steps=600, initial_step_size=0.1
        )
    )(jax.random.key(1))
    return logp, result


def test_adaptation_finds_long_trajectories(adapted):
    logp, result = adapted
    eps = float(result.step_size)
    T = float(result.trajectory_length)
    assert 0.3 < result.mean_accept < 1.0
    # with the metric adapting scales, trajectory ~ O(1) rotations; must be
    # several leapfrog steps, not degenerate
    assert T / eps > 2.0
    assert np.isfinite(np.asarray(result.final_positions["z"])).all()


def test_chees_hmc_moments(adapted):
    logp, result = adapted
    kernel = chees_hmc(
        logp,
        step_size=result.step_size,
        trajectory_length=result.trajectory_length,
        inverse_mass=result.inverse_mass,
    )
    states = jax.vmap(kernel.init)(result.final_positions)

    n_chains = 128

    @jax.jit
    def run(states, k):
        def body(states, kk):
            keys = jax.random.split(kk, n_chains)
            states, infos = jax.vmap(kernel.step)(keys, states)
            return states, (states.position["z"], infos.acceptance_prob)

        return jax.lax.scan(body, states, jax.random.split(k, 400))

    _, (zs, accs) = run(states, jax.random.key(5))
    z = np.asarray(zs[100:]).reshape(-1, 3)
    assert np.all(np.abs(z.mean(0)) < np.asarray([0.9, 0.12, 0.02]))
    np.testing.assert_allclose(z.std(0), [10.0, 1.0, 0.1], rtol=0.15)
    assert 0.4 < float(np.asarray(accs).mean()) <= 1.0


def test_ess_beats_short_trajectories(adapted):
    """Adapted trajectories must mix the slow direction far better than
    single-step HMC at the same step size."""
    from binf_tpu.diagnostics import ess
    from binf_tpu.samplers.hmc import hmc

    logp, result = adapted
    n_chains = 64
    positions = jax.tree.map(lambda x: x[:n_chains], result.final_positions)

    def run_kernel(kernel):
        states = jax.vmap(kernel.init)(positions)

        @jax.jit
        def run(states, k):
            def body(states, kk):
                keys = jax.random.split(kk, n_chains)
                states, _ = jax.vmap(kernel.step)(keys, states)
                return states, states.position["z"]

            return jax.lax.scan(body, states, jax.random.split(k, 300))

        _, zs = run(states, jax.random.key(9))
        return float(jnp.min(ess(zs)))

    chees_ess = run_kernel(
        chees_hmc(logp, result.step_size, result.trajectory_length,
                  result.inverse_mass)
    )
    short_ess = run_kernel(
        hmc(logp, step_size=result.step_size, num_integration_steps=1,
            inverse_mass=result.inverse_mass)
    )
    assert chees_ess > 1.5 * short_ess
