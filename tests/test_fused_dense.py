"""Dense metric inside the fused sampling kernel (warmup="dense").

CPU interpret-mode: the same kernel graph lowers through Mosaic on TPU.
Target: a strongly correlated Gaussian -- the geometry the diagonal
metric cannot precondition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from binf_tpu.samplers.fused import fused_model_hmc


def _target(d=4, rho=0.9, seed=0):
    rng = np.random.default_rng(seed)
    scales = np.exp(np.linspace(-0.5, 1.0, d))
    corr = np.full((d, d), rho) + (1 - rho) * np.eye(d)
    S = np.diag(scales) @ corr @ np.diag(scales)
    mu = rng.normal(size=d) * 0.5
    P = np.linalg.inv(S)
    mu_j, P_j = jnp.asarray(mu, jnp.float32), jnp.asarray(P, jnp.float32)

    def logdensity(pos):
        x = pos["x"] - mu_j
        return -0.5 * x @ (P_j @ x)

    return logdensity, mu, S


def test_fused_dense_recovers_correlated_moments():
    logdensity, mu, S = _target(d=4, rho=0.9)
    n = 64
    pos = {"x": 0.3 * jax.random.normal(jax.random.key(0), (n, 4))}

    result = fused_model_hmc(
        logdensity, pos, jax.random.key(1),
        num_warmup=400, num_samples=500, block_chains=32,
        warmup="dense",
    )
    assert 0.5 < float(result.accept_rate) <= 1.0
    assert result.inverse_mass.shape == (4, 4)
    # adapted metric should capture the correlation structure
    minv = np.asarray(result.inverse_mass)
    corr_est = minv / np.sqrt(np.outer(np.diag(minv), np.diag(minv)))
    corr_true = S / np.sqrt(np.outer(np.diag(S), np.diag(S)))
    assert np.abs(corr_est - corr_true).max() < 0.3

    X = np.asarray(result.samples["x"][150:]).reshape(-1, 4)
    np.testing.assert_allclose(X.mean(0), mu, atol=0.3)
    np.testing.assert_allclose(X.std(0), np.sqrt(np.diag(S)), rtol=0.3)


@pytest.mark.slow
def test_fused_dense_beats_diag_on_correlated_target():
    from binf_tpu.diagnostics import ess

    logdensity, mu, S = _target(d=4, rho=0.98, seed=2)
    n = 64
    pos = {"x": 0.3 * jax.random.normal(jax.random.key(0), (n, 4))}
    common = dict(num_warmup=400, num_samples=500, block_chains=32)

    dense = fused_model_hmc(
        logdensity, pos, jax.random.key(1), warmup="dense", **common
    )
    diag = fused_model_hmc(
        logdensity, pos, jax.random.key(1), warmup="xla", **common
    )
    ess_dense = float(jnp.min(ess(dense.samples["x"][100:])))
    ess_diag = float(jnp.min(ess(diag.samples["x"][100:])))
    assert ess_dense > 1.5 * ess_diag, (ess_dense, ess_diag)


@pytest.mark.slow
def test_fused_dense_mesh_sharded():
    from binf_tpu.parallel.mesh import make_chain_mesh

    logdensity, mu, S = _target(d=4, rho=0.9, seed=3)
    n = 64
    pos = {"x": 0.3 * jax.random.normal(jax.random.key(0), (n, 4))}
    mesh = make_chain_mesh()

    result = fused_model_hmc(
        logdensity, pos, jax.random.key(1),
        num_warmup=300, num_samples=300, block_chains=8,
        warmup="dense", mesh=mesh,
    )
    assert 0.5 < float(result.accept_rate) <= 1.0
    X = np.asarray(result.samples["x"][100:]).reshape(-1, 4)
    np.testing.assert_allclose(X.mean(0), mu, atol=0.35)


def test_fused_dense_option_guards():
    logdensity, _, _ = _target()
    pos = {"x": jnp.zeros((8, 4))}
    with pytest.raises(ValueError, match="per_chain_step_size"):
        fused_model_hmc(
            logdensity, pos, jax.random.key(0),
            num_warmup=10, num_samples=10, warmup="dense",
            per_chain_step_size=True, block_chains=8,
        )
    with pytest.raises(ValueError, match="trajectory"):
        fused_model_hmc(
            logdensity, pos, jax.random.key(0),
            num_warmup=10, num_samples=10, warmup="dense",
            trajectory="chees", block_chains=8,
        )
