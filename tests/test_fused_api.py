"""High-level fused_regression_hmc API test (host-noise path on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from binf_tpu.example.polynomial import make_data, make_posterior
from binf_tpu.samplers.fused import fused_regression_hmc


@pytest.mark.slow
def test_fused_regression_end_to_end():
    xses, ys = make_data(jax.random.key(1))
    posterior = make_posterior(xses, ys)
    result = fused_regression_hmc(
        posterior,
        jax.random.key(0),
        n_chains=64,
        num_warmup=200,
        num_samples=300,
        block_chains=32,
        interpret=True,
        host_noise=True,
    )
    assert 0.3 < float(result.accept_rate) <= 1.0
    c = np.asarray(result.samples["coefficients"][100:]).reshape(-1, 4)
    p = np.asarray(result.samples["precision"][100:]).reshape(-1)
    assert (p > 0).all()

    # cross-check against collapsed Gibbs
    from binf_tpu.example.polynomial import (
        initial_positions,
        make_collapsed_gibbs_kernel,
    )
    from binf_tpu.parallel.runner import init_chains, run_chains

    kernel = make_collapsed_gibbs_kernel(posterior)
    states = init_chains(kernel, initial_positions(64))
    _, gs = jax.jit(lambda s, k: run_chains(kernel, k, s, 300))(
        states, jax.random.key(3)
    )
    gc = np.asarray(gs["coefficients"][100:]).reshape(-1, 4)
    gp = np.asarray(gs["precision"][100:]).reshape(-1)
    np.testing.assert_allclose(c.mean(0), gc.mean(0), atol=0.1)
    np.testing.assert_allclose(p.mean(), gp.mean(), rtol=0.15)


def test_fused_rejects_wrong_model():
    from binf_tpu.example.hierarchical import (
        make_hierarchical_posterior,
        synthetic_hierarchical_data,
    )

    x, y, counts, _ = synthetic_hierarchical_data(jax.random.key(0), 4)
    post = make_hierarchical_posterior(x, y, counts, 4)
    with pytest.raises(ValueError):
        fused_regression_hmc(post, jax.random.key(0), n_chains=8)


def test_auto_block_chains_heuristic():
    """'auto' tile sizing: small-state/small-data -> wide tiles, data-heavy
    -> narrow; and the fused driver accepts the string."""
    from binf_tpu.samplers.fused import _auto_block_chains, fused_model_hmc

    # tiny model: d=5, ~100 const elements -> wide tile (2048+: measured
    # parity between 2048 and 4096 on the polynomial family)
    spec_small = [("coefficients", (4,), 4), ("precision", (), 1)]
    consts_small = {"V": jnp.zeros((20, 4)), "y": jnp.zeros(20)}
    assert _auto_block_chains(spec_small, consts_small) >= 2048

    # data-heavy model: per-datapoint intermediates shrink the tile
    consts_big = {"data": jnp.zeros((4000,))}
    assert _auto_block_chains(spec_small, consts_big) <= 1024

    logdensity = lambda p: -0.5 * jnp.sum(p["x"] ** 2)
    pos = {"x": 0.1 * jax.random.normal(jax.random.key(0), (64, 3))}
    result = fused_model_hmc(
        logdensity, pos, jax.random.key(1),
        num_warmup=50, num_samples=50, block_chains="auto",
    )
    assert result.samples["x"].shape == (50, 64, 3)
