"""Auto-routing (samplers/auto.py): the measured-winner cost model.

Asserts the chosen path on each bench_models family/shape row
(docs/performance.md:79-104) so the framework never ships a measured
loss as the routed default (round-3 VERDICT item 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from binf_tpu.cli import _unconstrain_batch, build_model
from binf_tpu.pdf.transforms import transform_logdensity
from binf_tpu.samplers.auto import adaptive_hmc, route_algorithm


def _family(name, n_chains, chain_key=1):
    posterior, init_fn, transforms = build_model(name, jax.random.key(0))
    logdensity = transform_logdensity(
        lambda p: posterior.log_prob(p), transforms
    )
    positions = _unconstrain_batch(
        transforms, init_fn(n_chains, key=jax.random.key(chain_key))
    )
    return logdensity, positions


def test_route_sequential_model_to_fused():
    """statespace (lax.scan AR(1)): fused measured 2.4-2.7x at EVERY
    batch size -> must route fused regardless of chains."""
    logdensity, positions = _family("statespace", 64)
    big = jax.tree.map(
        lambda x: jnp.broadcast_to(x[:1], (8192,) + x.shape[1:]), positions
    )
    for pos in (positions, big):
        d = route_algorithm(logdensity, pos)
        assert d.path == "fused"
        assert d.sequential
        assert d.reason.startswith("sequential")


def test_route_small_batch_to_fused():
    """hierarchical at 1024 chains: measured 1.6x fused."""
    logdensity, positions = _family("hierarchical", 1024)
    d = route_algorithm(logdensity, positions)
    assert d.path == "fused"
    assert d.reason.startswith("small/medium")
    assert d.n_local_chains == 1024


def test_route_large_batch_bigD_to_xla():
    """hierarchical at 8192 chains (D=21, d_pad=24): measured 0.47x fused
    at every tile width -> must route XLA (the round-3 shipped loss)."""
    logdensity, positions = _family("hierarchical", 8192)
    d = route_algorithm(logdensity, positions)
    assert d.path == "xla"
    assert d.d_pad > 8
    assert not d.sequential


def test_route_large_batch_smallD_to_fused():
    """polynomial at 8192 chains (D=5 -> one lane group, wide tile):
    measured 1.0x with single-dispatch structural advantages."""
    logdensity, positions = _family("polynomial", 8192)
    d = route_algorithm(logdensity, positions)
    assert d.path == "fused"
    assert d.d_pad <= 8
    assert d.block_chains >= 2048


def test_route_large_batch_small_state_mixture_to_fused():
    """mixture at 8192 chains (d_pad=8, VMEM-bound 1024 tile): since the
    canonical lane-level value+grad the fused kernel measures 1.02x even
    here -> routed fused (round-3 measured 0.95x and routed XLA)."""
    logdensity, positions = _family("mixture", 8192)
    d = route_algorithm(logdensity, positions)
    assert d.path == "fused"
    assert d.d_pad <= 8


def test_route_data_heavy_density_to_xla():
    """chromatin (D=193, ~8.3k const elements): the fused kernel measured
    203MB of scoped VMEM at a 128-lane tile vs the chip's 128MB -- the
    router must hand off to XLA at every batch size (explicit
    --algorithm fused remains available for interpret-mode runs)."""
    logdensity, positions = _family("chromatin", 64)
    d = route_algorithm(logdensity, positions)
    assert d.path == "xla"
    assert d.reason.startswith("data-heavy")


def test_route_unsupported_density_to_xla():
    """A density the lane-batching interpreter cannot compile must fall
    back to XLA rather than raising at run time."""

    def weird(pos):
        # eigh has no tile rule
        w = jnp.linalg.eigvalsh(jnp.outer(pos["x"], pos["x"]) + jnp.eye(3))
        return -jnp.sum(w**2)

    positions = {"x": jax.random.normal(jax.random.key(0), (64, 3))}
    d = route_algorithm(weird, positions)
    assert d.path == "xla"
    assert d.reason.startswith("not tile-compilable")


def test_route_3d_constant_density_to_xla():
    """A density closing over a >2-D constant cannot become a fused-kernel
    operand; the router must fall back to XLA instead of crashing (ADVICE
    round 4: _register_const raised a plain ValueError the router did not
    catch)."""
    cube = jax.random.normal(jax.random.key(1), (4, 5, 6))

    def density(pos):
        x = pos["x"]
        return -jnp.sum((jnp.einsum("ijk,i->jk", cube, x)) ** 2)

    positions = {"x": jax.random.normal(jax.random.key(2), (64, 4))}
    d = route_algorithm(density, positions)
    assert d.path == "xla"
    assert d.reason.startswith("not tile-compilable")

    # and the full adaptive entry point runs (routes, does not raise)
    res, dec = adaptive_hmc(
        density, positions, jax.random.key(3), num_warmup=30, num_samples=30,
        num_leapfrog=3,
    )
    assert dec.path == "xla"
    assert res.samples["x"].shape[0] == 30


def test_route_nuts_rerouted_on_cheap_density():
    """NUTS on a cheap density: batched lockstep tree overhead measured
    39-119x fixed-L at every max_doublings (round 5) -> reroute."""
    from binf_tpu.samplers.auto import route_trajectory_sampler

    logdensity, positions = _family("hierarchical", 64)
    sampler, reason = route_trajectory_sampler("nuts", logdensity, positions)
    assert sampler == "hmc"
    assert "lockstep" in reason


def test_route_nuts_honored_on_data_heavy_density():
    """Chromatin-class density: gradients are the scarce resource, NUTS's
    ~10x ESS/grad advantage is worth the tree overhead -> honored."""
    from binf_tpu.samplers.auto import route_trajectory_sampler

    logdensity, positions = _family("chromatin", 8)
    sampler, reason = route_trajectory_sampler("nuts", logdensity, positions)
    assert sampler == "nuts"
    assert reason.startswith("nuts honored")


def test_route_non_nuts_passthrough():
    from binf_tpu.samplers.auto import route_trajectory_sampler

    logdensity, positions = _family("polynomial", 16)
    assert route_trajectory_sampler("mala", logdensity, positions)[0] == "mala"


def test_route_mesh_uses_per_device_chains():
    """8192 chains over an 8-device mesh = 1024/device -> the small-batch
    rule fires even though the global batch is large."""
    from binf_tpu.parallel.mesh import make_chain_mesh

    mesh = make_chain_mesh()
    if mesh.shape["chain"] < 2:
        pytest.skip("needs a multi-device mesh")
    logdensity, positions = _family("hierarchical", 8192)
    d = route_algorithm(logdensity, positions, mesh)
    assert d.n_local_chains == 8192 // mesh.shape["chain"]
    assert d.path == "fused"


def test_adaptive_hmc_auto_and_forced_agree_statistically():
    """Both paths sample the same posterior: moments agree within MC
    error on the polynomial workload, and the result contract matches."""
    logdensity, positions = _family("polynomial", 128)
    key = jax.random.key(3)

    res_auto, dec = adaptive_hmc(
        logdensity, positions, key, num_warmup=150, num_samples=150,
        num_leapfrog=8,
    )
    assert dec.path == "fused"  # 128 chains -> small-batch rule
    res_xla, dec_x = adaptive_hmc(
        logdensity, positions, key, num_warmup=150, num_samples=150,
        num_leapfrog=8, algorithm="xla",
    )
    assert dec_x.path == "xla"
    assert dec_x.reason.startswith("forced")

    for r in (res_auto, res_xla):
        assert 0.5 < float(r.accept_rate) <= 1.0
        assert set(r.samples) == {"coefficients", "precision"}
        assert r.samples["coefficients"].shape == (150, 128, 4)
        assert r.final_positions["coefficients"].shape == (128, 4)
        assert r.inverse_mass.shape[-1] == 5

    for k in res_auto.samples:
        a = np.asarray(res_auto.samples[k][50:]).mean(axis=(0, 1))
        b = np.asarray(res_xla.samples[k][50:]).mean(axis=(0, 1))
        np.testing.assert_allclose(a, b, atol=0.25)


def test_adaptive_hmc_xla_moments_contract():
    logdensity, positions = _family("polynomial", 64)
    res, dec = adaptive_hmc(
        logdensity, positions, jax.random.key(0), num_warmup=100,
        num_samples=100, collect="moments", algorithm="xla",
    )
    assert res.samples is None
    assert res.mean["coefficients"].shape == (64, 4)
    assert res.variance["precision"].shape == (64,)
    assert bool(jnp.all(res.variance["coefficients"] >= 0))


def test_adaptive_hmc_xla_rejects_fused_only_options():
    logdensity, positions = _family("hierarchical", 8192)
    with pytest.raises(ValueError, match="fused path only"):
        adaptive_hmc(
            logdensity, positions, jax.random.key(0), num_warmup=10,
            num_samples=10, warmup="fused",
        )
