"""In-kernel (fused) warmup: ``fused_warmup_run`` and ``warmup="fused"``.

Regression suite for the fused Stan-window adaptation (ADVICE r2 items 1-3):
metric recovery on an anisotropic Gaussian, step size adapted UNDER the
final metric (final-buffer reset), agreement with the XLA
``window_adaptation``, bitwise determinism, the mesh/shard_map variant, the
in-kernel step-size search, and the unsupported-option guards.  Runs in
Pallas interpret mode (host noise) on the CPU platform.
"""

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

# anisotropic Gaussian: marginal variances span 3 orders of magnitude so an
# identity metric (the pre-fix failure mode) is unmistakably wrong
MU = jnp.asarray([1.0, -2.0, 0.5, 3.0])
SD = jnp.asarray([0.1, 1.0, 3.0, 0.4])


def _logdensity(pos):
    return -0.5 * jnp.sum(((pos["x"] - MU) / SD) ** 2)


def _build(n_chains=64):
    init = {"x": MU[None, :] + 0.1 * jax.random.normal(jax.random.key(0), (n_chains, 4))}
    template = jax.tree.map(lambda x: x[0], init)
    potential, consts, spec = tile_potential_from_scalar(_logdensity, template)
    q0 = init["x"]
    return potential, consts, spec, q0


def test_fused_warmup_metric_recovery():
    """The harvested inverse mass must track the true marginal variances
    (regression for the r2 bug where accumulation was wiped every step)."""
    potential, consts, _, q0 = _build()
    qf, eps, im = fused_warmup_run(
        potential, q0, 7, 0.1, consts,
        num_warmup=400, num_leapfrog=8, block_chains=32,
        interpret=True, host_noise=True,
    )
    assert qf.shape == q0.shape and eps.shape == (64,) and im.shape == (64, 4)
    true_var = np.asarray(SD) ** 2
    im_mean = np.asarray(im).mean(axis=0)
    np.testing.assert_allclose(im_mean, true_var, rtol=0.4)
    # variance ratio across dimensions spans ~1000x: the metric must order
    # the scales correctly, far from identity
    assert im_mean[2] / im_mean[0] > 100.0
    assert np.all(np.asarray(eps) > 0.01)


@pytest.mark.slow
def test_fused_warmup_step_size_calibrated_to_final_metric():
    """Step size must be dual-averaged UNDER the harvested metric (Stan
    final-buffer reset; ADVICE r2 item 1): sampling with the returned
    (eps, im) pair lands near the 0.8 target, not at ~1.0."""
    potential, consts, _, q0 = _build()
    qf, eps, im = fused_warmup_run(
        potential, q0, 3, 0.1, consts,
        num_warmup=400, num_leapfrog=8, block_chains=32,
        interpret=True, host_noise=True,
    )
    res = fused_potential_hmc_run(
        potential, qf, 11, eps, im, consts,
        num_steps=200, num_leapfrog=8, block_chains=32, steps_per_block=50,
        interpret=True, host_noise=True,
    )
    acc = float(res.accept_rate)
    assert 0.6 < acc < 0.95, f"acceptance {acc} not calibrated to target 0.8"


@pytest.mark.slow
def test_fused_warmup_matches_xla_window_adaptation():
    """Fused and XLA warmup must agree on the metric (ADVICE r2 item 2:
    regression for the inverted Welford reset in window_adaptation)."""
    from binf_tpu.samplers.adaptation import window_adaptation
    from binf_tpu.samplers.hmc import hmc

    potential, consts, _, q0 = _build()
    _, eps_f, im_f = fused_warmup_run(
        potential, q0, 5, 0.1, consts,
        num_warmup=400, num_leapfrog=8, block_chains=32,
        interpret=True, host_noise=True,
    )

    def builder(step_size, inverse_mass):
        return hmc(_logdensity, step_size, num_integration_steps=8,
                   inverse_mass=inverse_mass)

    init = {"x": q0}
    states = jax.vmap(builder(0.1, None).init)(init)
    adapt = jax.jit(
        lambda s, k: window_adaptation(
            builder, s, k, num_steps=400, initial_step_size=0.1
        )
    )(states, jax.random.key(2))

    im_xla = np.asarray(adapt.inverse_mass["x"])
    im_fused = np.asarray(im_f).mean(axis=0)
    true_var = np.asarray(SD) ** 2
    # both recover the true metric...
    np.testing.assert_allclose(im_xla, true_var, rtol=0.4)
    np.testing.assert_allclose(im_fused, true_var, rtol=0.4)
    # ...and agree with each other
    np.testing.assert_allclose(im_fused, im_xla, rtol=0.5)
    # step sizes in the same ballpark (pooled vs per-tile pooling)
    ratio = np.asarray(eps_f).mean() / float(adapt.step_size)
    assert 0.33 < ratio < 3.0


@pytest.mark.slow
def test_warmup_fused_end_to_end_moments():
    """fused_model_hmc(warmup='fused'): ONE dispatch for warmup+sampling,
    exact moments on the anisotropic Gaussian."""
    n_chains = 64
    init = {"x": MU[None, :] + 0.1 * jax.random.normal(jax.random.key(0), (n_chains, 4))}
    result = fused_model_hmc(
        _logdensity, init, jax.random.key(1),
        num_warmup=400, num_samples=400, num_leapfrog=8,
        block_chains=32, warmup="fused",
    )
    assert 0.55 < float(result.accept_rate) <= 1.0
    assert np.asarray(result.step_size).shape == (n_chains,)
    assert np.asarray(result.inverse_mass).shape == (n_chains, 4)
    x = np.asarray(result.samples["x"][100:]).reshape(-1, 4)
    # scale-normalized mean error: tolerance in units of each marginal SD
    rel_err = np.abs(x.mean(0) - np.asarray(MU)) / np.asarray(SD)
    assert np.all(rel_err < 0.15), rel_err
    np.testing.assert_allclose(x.std(0), np.asarray(SD), rtol=0.2)


@pytest.mark.slow
def test_warmup_fused_moments_collect():
    """warmup='fused' composes with collect='moments' (O(D) HBM path)."""
    n_chains = 32
    init = {"x": MU[None, :] + 0.1 * jax.random.normal(jax.random.key(0), (n_chains, 4))}
    result = fused_model_hmc(
        _logdensity, init, jax.random.key(1),
        num_warmup=400, num_samples=400, num_leapfrog=8,
        block_chains=32, warmup="fused", collect="moments",
    )
    assert result.samples is None
    m = np.asarray(result.mean["x"]).mean(axis=0)
    v = np.asarray(result.variance["x"]).mean(axis=0)
    np.testing.assert_allclose(m, np.asarray(MU), atol=0.3)
    np.testing.assert_allclose(np.sqrt(v), np.asarray(SD), rtol=0.3)


@pytest.mark.slow
def test_warmup_fused_bitwise_determinism():
    """Same key -> bitwise-identical draws, step sizes, and metric."""
    init = {"x": MU[None, :] + 0.1 * jax.random.normal(jax.random.key(0), (32, 4))}
    kwargs = dict(num_warmup=200, num_samples=100, num_leapfrog=4,
                  block_chains=32, warmup="fused")
    r1 = fused_model_hmc(_logdensity, init, jax.random.key(9), **kwargs)
    r2 = fused_model_hmc(_logdensity, init, jax.random.key(9), **kwargs)
    np.testing.assert_array_equal(np.asarray(r1.samples["x"]), np.asarray(r2.samples["x"]))
    np.testing.assert_array_equal(np.asarray(r1.step_size), np.asarray(r2.step_size))
    np.testing.assert_array_equal(np.asarray(r1.inverse_mass), np.asarray(r2.inverse_mass))


@pytest.mark.slow
def test_warmup_fused_sharded_over_mesh():
    """warmup='fused' under shard_map: one warmup+sampling kernel pair per
    device over the sharded chain axis."""
    from binf_tpu.parallel.mesh import make_chain_mesh

    mesh = make_chain_mesh()
    n_chains = 64
    init = {"x": MU[None, :] + 0.1 * jax.random.normal(jax.random.key(0), (n_chains, 4))}
    result = fused_model_hmc(
        _logdensity, init, jax.random.key(1),
        num_warmup=300, num_samples=200, num_leapfrog=8,
        block_chains=8, warmup="fused", mesh=mesh,
    )
    assert 0.5 < float(result.accept_rate) <= 1.0
    x = np.asarray(result.samples["x"][50:]).reshape(-1, 4)
    np.testing.assert_allclose(x.mean(0), np.asarray(MU), atol=0.4)
    np.testing.assert_allclose(x.std(0), np.asarray(SD), rtol=0.35)
    # per-device PRNG streams differ
    first_draw = np.asarray(result.samples["x"][0])
    assert np.std(first_draw[:8] - first_draw[8:16]) > 1e-5


@pytest.mark.slow
def test_warmup_fused_init_search():
    """initial_step_size=None runs the in-kernel Hoffman-Gelman doubling
    search; the adapted step size must land in a sensible band."""
    init = {"x": MU[None, :] + 0.1 * jax.random.normal(jax.random.key(0), (32, 4))}
    result = fused_model_hmc(
        _logdensity, init, jax.random.key(1),
        num_warmup=300, num_samples=200, num_leapfrog=8,
        block_chains=32, warmup="fused", initial_step_size=None,
    )
    assert 0.5 < float(result.accept_rate) <= 1.0
    eps = np.asarray(result.step_size)
    assert np.all((eps > 1e-3) & (eps < 10.0))
    x = np.asarray(result.samples["x"][50:]).reshape(-1, 4)
    np.testing.assert_allclose(x.std(0), np.asarray(SD), rtol=0.25)


def test_warmup_fused_guards():
    """Unsupported options raise instead of silently degrading (ADVICE r2)."""
    init = {"x": jnp.zeros((32, 4))}
    with pytest.raises(ValueError, match="per_chain_step_size"):
        fused_model_hmc(
            _logdensity, init, jax.random.key(0),
            warmup="fused", per_chain_step_size=True,
        )
    # round 5: warmup='fused' + trajectory='chees' is now SUPPORTED (the
    # in-kernel ChEES path); an unknown trajectory still raises
    with pytest.raises(ValueError, match="trajectory"):
        fused_model_hmc(
            _logdensity, init, jax.random.key(0),
            warmup="fused", trajectory="bogus",
        )
    potential, consts, _, q0 = _build(32)
    with pytest.raises(ValueError, match="host_noise"):
        fused_warmup_run(
            potential, q0, 0, 0.1, consts,
            num_warmup=100, block_chains=32,
            interpret=False, host_noise=True,
        )
