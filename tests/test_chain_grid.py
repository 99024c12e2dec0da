"""Chain-grid fused kernel: chains on the grid, data in lanes.

The round-5 tiling mode for data-heavy densities (chromatin-class models
whose per-chain intermediates blow VMEM in the chains-in-lanes kernel).
Interpret-mode correctness here; hardware timings in
benchmarks/bench_models.py and docs/performance.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from binf_tpu.ops.pallas.chain_grid import (
    chain_grid_hmc_run,
    chain_grid_potential_from_scalar,
)
from binf_tpu.ops.pallas.fused_potential import _pad_const


def _gaussian_model():
    m = jnp.arange(6.0).reshape(3, 2)

    def ld(p):
        return -0.5 * jnp.sum((p["x"] - m) ** 2 / 0.25) - 0.5 * p["y"] ** 2

    template = {"x": jnp.zeros((3, 2)), "y": jnp.zeros(())}
    return ld, template, m


def test_potential_matches_value_and_grad():
    ld, template, _ = _gaussian_model()
    pot, consts, spec = chain_grid_potential_from_scalar(ld, template)
    kc = {k: _pad_const(v) for k, v in consts.items()}
    pos = {
        "x": jax.random.normal(jax.random.key(0), (3, 2)),
        "y": jnp.float32(0.7),
    }
    u, g = pot.value_and_grad(pos, kc)
    u_ref, g_ref = jax.value_and_grad(lambda p: -ld(p))(pos)
    assert np.isclose(float(u), float(u_ref))
    for k in g_ref:
        np.testing.assert_allclose(np.asarray(g[k]), np.asarray(g_ref[k]))


@pytest.mark.slow
def test_chain_grid_samples_gaussian():
    """Exact moments on a factorized Gaussian with mixed-rank variables
    (2-D matrix + scalar), anisotropic metric, 8-chain blocks."""
    ld, template, m = _gaussian_model()
    pot, consts, _ = chain_grid_potential_from_scalar(ld, template)
    C = 32
    q0 = {"x": jnp.zeros((C, 3, 2)), "y": jnp.zeros((C,))}
    im = {"x": jnp.full((3, 2), 4.0), "y": jnp.ones(())}
    res = chain_grid_hmc_run(
        pot, q0, 7, 0.3, im, consts, num_steps=600, num_leapfrog=8,
        block_chains=8, steps_per_block=50, interpret=True, host_noise=True,
    )
    assert 0.5 < float(res.accept_rate) <= 1.0
    xs = np.asarray(res.draws["x"])[300:]
    np.testing.assert_allclose(xs.mean((0, 1)), np.asarray(m), atol=0.05)
    np.testing.assert_allclose(xs.std(axis=(0, 1)), 0.5, rtol=0.1)
    ys = np.asarray(res.draws["y"])[300:]
    assert abs(ys.mean()) < 0.1 and abs(ys.std() - 1.0) < 0.1


@pytest.mark.slow
def test_chain_grid_sequential_density_with_matvec():
    """The mosaic-safe evaluator rebuilds scan bodies (and promotes the
    1-D dots inside them): an AR(1)-style density whose scan body does a
    matvec against the state samples correctly through the chain-grid
    kernel."""
    T_len = 12
    A = jnp.asarray([[0.6, 0.2], [0.0, 0.5]])
    y = 0.3 * jax.random.normal(jax.random.key(9), (T_len, 2))

    def ld(p):
        x0 = p["x0"]  # (2,)

        def body(x, y_t):
            x = A @ x  # matvec inside the scan body (1-D dot operand)
            return x, jnp.sum((y_t - x) ** 2)

        _, sq = jax.lax.scan(body, x0, y)
        return -0.5 * jnp.sum(sq) - 0.5 * jnp.sum(x0**2)

    pot, consts, _ = chain_grid_potential_from_scalar(
        ld, {"x0": jnp.zeros((2,))}
    )
    # evaluator output matches plain value_and_grad
    kc = {k: _pad_const(v) for k, v in consts.items()}
    pos = {"x0": jnp.asarray([0.4, -0.7])}
    u, g = pot.value_and_grad(pos, kc)
    u_ref, g_ref = jax.value_and_grad(lambda p: -ld(p))(pos)
    np.testing.assert_allclose(float(u), float(u_ref), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g["x0"]), np.asarray(g_ref["x0"]), rtol=1e-5
    )
    # and the kernel samples it
    C = 16
    res = chain_grid_hmc_run(
        pot, {"x0": jnp.zeros((C, 2))}, 3, 0.2,
        {"x0": jnp.ones((2,))}, consts,
        num_steps=100, num_leapfrog=5, block_chains=8,
        steps_per_block=50, interpret=True, host_noise=True,
    )
    assert 0.3 < float(res.accept_rate) <= 1.0
    assert np.all(np.isfinite(np.asarray(res.draws["x0"])))


def test_chain_grid_1d_variable_metric_applied():
    """Regression (round-5 review): a 1-D variable's inverse mass was
    rebuilt from the wrong padded layout and collapsed to im[0].  With a
    strongly anisotropic 1-D metric, the wide coordinate (scale 10) can
    only mix if its own metric entry is applied -- under the collapsed
    metric its drift per step is ~100x too small to reach std 10."""
    s = jnp.asarray([0.1, 10.0, 1.0, 2.0])

    def ld(p):
        return -0.5 * jnp.sum((p["x"] / s) ** 2)

    pot, consts, _ = chain_grid_potential_from_scalar(
        ld, {"x": jnp.zeros((4,))}
    )
    C = 16
    q0 = {"x": jnp.zeros((C, 4))}
    im = {"x": s**2}  # ideal per-coordinate metric
    res = chain_grid_hmc_run(
        pot, q0, 5, 0.9, im, consts, num_steps=400, num_leapfrog=5,
        block_chains=8, steps_per_block=50, interpret=True, host_noise=True,
    )
    assert 0.5 < float(res.accept_rate) <= 1.0
    draws = np.asarray(res.draws["x"])[200:]
    np.testing.assert_allclose(
        draws.reshape(-1, 4).std(0), np.asarray(s), rtol=0.25
    )


@pytest.mark.slow
def test_chain_grid_moments_match_draws():
    ld, template, _ = _gaussian_model()
    pot, consts, _ = chain_grid_potential_from_scalar(ld, template)
    C = 16
    q0 = {"x": jnp.zeros((C, 3, 2)), "y": jnp.zeros((C,))}
    im = {"x": jnp.ones((3, 2)), "y": jnp.ones(())}
    kw = dict(num_steps=100, num_leapfrog=5, block_chains=8,
              steps_per_block=50, interpret=True, host_noise=True)
    rd = chain_grid_hmc_run(pot, q0, 3, 0.3, im, consts, **kw)
    rm = chain_grid_hmc_run(pot, q0, 3, 0.3, im, consts,
                            collect="moments", **kw)
    # identical noise stream -> the streaming Welford moments must equal
    # the draw-based moments to f32 accuracy
    np.testing.assert_allclose(
        np.asarray(rm.mean["x"]), np.asarray(rd.draws["x"]).mean(0),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(rm.variance["y"]),
        np.asarray(rd.draws["y"]).var(0, ddof=1),
        rtol=1e-4, atol=1e-5,
    )
    for k in ("x", "y"):
        np.testing.assert_array_equal(
            np.asarray(rm.final_positions[k]),
            np.asarray(rd.final_positions[k]),
        )


@pytest.mark.slow
def test_chain_grid_resume_bitwise():
    """block_offset resume: two chained 50-step calls replay one 100-step
    run bitwise (the checkpoint contract shared with the lane kernel)."""
    ld, template, _ = _gaussian_model()
    pot, consts, _ = chain_grid_potential_from_scalar(ld, template)
    C = 16
    q0 = {"x": jnp.zeros((C, 3, 2)), "y": jnp.zeros((C,))}
    im = {"x": jnp.ones((3, 2)), "y": jnp.ones(())}
    kw = dict(num_leapfrog=5, block_chains=8, steps_per_block=50,
              interpret=True)
    full = chain_grid_hmc_run(pot, q0, 7, 0.3, im, consts,
                              num_steps=100, **kw)
    a = chain_grid_hmc_run(pot, q0, 7, 0.3, im, consts, num_steps=50, **kw)
    b = chain_grid_hmc_run(pot, a.final_positions, 7, 0.3, im, consts,
                           num_steps=50, block_offset=1, **kw)
    for k in ("x", "y"):
        np.testing.assert_array_equal(
            np.asarray(full.final_positions[k]),
            np.asarray(b.final_positions[k]),
        )


@pytest.mark.slow
def test_gram_logdensity_matches_posterior():
    """The Gram-form chromatin density equals the production posterior
    (constant offset in value, exact in gradient)."""
    from binf_tpu.example.chromatin import (
        make_chromatin_posterior,
        make_gram_logdensity,
        synthetic_restraints,
    )
    from binf_tpu.pdf.transforms import LogTransform, transform_logdensity

    n = 16
    _, logD, W = synthetic_restraints(jax.random.key(0), n, observe_frac=0.4)
    posterior = make_chromatin_posterior(logD, W, use_pallas=False)
    base = transform_logdensity(
        lambda p: posterior.log_prob(p), {"precision": LogTransform}
    )
    gram = make_gram_logdensity(logD, W)

    k1, k2 = jax.random.split(jax.random.key(1))
    p1 = {"structure": jax.random.normal(k1, (n, 3)),
          "precision": jnp.float32(0.3)}
    p2 = {"structure": 2.0 * jax.random.normal(k2, (n, 3)),
          "precision": jnp.float32(-0.5)}

    g1 = jax.grad(base)(p1)
    g2 = jax.grad(gram)(p1)
    for k in g1:
        np.testing.assert_allclose(
            np.asarray(g1[k]), np.asarray(g2[k]), rtol=2e-4, atol=2e-4
        )
    d1 = float(base(p1)) - float(gram(p1))
    d2 = float(base(p2)) - float(gram(p2))
    assert abs(d1 - d2) < 1e-2  # value differs by a constant only


@pytest.mark.slow
def test_chain_grid_model_hmc_sharded_mesh():
    """chain_grid_model_hmc(mesh=...): one chain-grid kernel per device
    over the sharded chain axis, pooled accept via pmean, draws sharded
    back on the chain axis."""
    from binf_tpu.parallel.mesh import make_chain_mesh
    from binf_tpu.samplers.chain_grid import chain_grid_model_hmc

    mesh = make_chain_mesh()
    if mesh.shape["chain"] < 2:
        pytest.skip("needs a multi-device mesh")
    ld, template, m = _gaussian_model()
    n_dev = mesh.shape["chain"]
    C = 16 * n_dev
    positions = {
        "x": jnp.zeros((C, 3, 2)),
        "y": jnp.zeros((C,)),
    }
    res = chain_grid_model_hmc(
        ld, positions, jax.random.key(0),
        num_warmup=100, num_samples=200, num_leapfrog=5,
        block_chains=8, mesh=mesh,
    )
    assert res.samples["x"].shape == (200, C, 3, 2)
    assert 0.4 < float(res.accept_rate) <= 1.0
    xs = np.asarray(res.samples["x"])[100:]
    np.testing.assert_allclose(xs.mean((0, 1)), np.asarray(m), atol=0.2)


@pytest.mark.slow
def test_chain_grid_chromatin_samples():
    """The reference's application workload through the chain-grid kernel
    (interpret mode): finite draws, healthy acceptance, precision
    recovering the restraint noise scale."""
    from binf_tpu.example.chromatin import (
        make_gram_logdensity,
        synthetic_restraints,
    )

    n = 16
    X_true, logD, W = synthetic_restraints(
        jax.random.key(0), n, observe_frac=0.5, noise_prec=25.0
    )
    gram = make_gram_logdensity(logD, W)
    pot, consts, _ = chain_grid_potential_from_scalar(
        gram, {"structure": jnp.zeros((n, 3)), "precision": jnp.zeros(())}
    )
    C = 8
    q0 = {
        "structure": X_true[None] + 0.1 * jax.random.normal(
            jax.random.key(3), (C, n, 3)
        ),
        "precision": jnp.full((C,), jnp.log(20.0)),
    }
    im = {"structure": jnp.full((n, 3), 4.0), "precision": jnp.ones(())}
    res = chain_grid_hmc_run(
        pot, q0, 11, 0.008, im, consts, num_steps=200, num_leapfrog=10,
        block_chains=8, steps_per_block=50, interpret=True, host_noise=True,
    )
    assert 0.5 < float(res.accept_rate) <= 1.0
    draws = np.asarray(res.draws["precision"])[100:]
    assert np.all(np.isfinite(np.asarray(res.draws["structure"])))

    # statistical agreement with the XLA sampler on the SAME density,
    # identical settings (the cross-path contract every fused kernel meets)
    from binf_tpu.parallel.runner import init_chains, run_chains
    from binf_tpu.samplers.hmc import hmc

    kernel = hmc(gram, 0.008, 10, im)
    states = init_chains(kernel, q0)
    _, (samples, acc) = run_chains(
        kernel, jax.random.key(5), states, 200,
        collect=lambda state, info: (state.position["precision"],
                                     info.accepted),
    )
    ref = np.asarray(samples)[100:]
    assert abs(float(jnp.mean(acc)) - float(res.accept_rate)) < 0.15
    assert abs(ref.mean() - draws.mean()) < 3.0 * (
        ref.std() + draws.std()
    ) / np.sqrt(8.0) + 0.05
