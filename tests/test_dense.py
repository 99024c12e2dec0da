"""Dense-metric HMC (samplers/dense.py): correctness + preconditioning win.

The target throughout is a correlated Gaussian: exactly the geometry a
diagonal metric cannot fix (the reference's polynomial posterior has the
same pathology through its Vandermonde design)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from binf_tpu.parallel.runner import init_chains, run_chains
from binf_tpu.samplers.dense import (
    dense_hmc,
    dense_window_adaptation,
    flatten_spec,
)


def _correlated_gaussian(d=6, rho=0.95, seed=0):
    """N(mu, S) with strong equicorrelation and varied scales."""
    rng = np.random.default_rng(seed)
    scales = np.exp(np.linspace(-1.0, 1.5, d))
    corr = np.full((d, d), rho) + (1 - rho) * np.eye(d)
    S = np.diag(scales) @ corr @ np.diag(scales)
    mu = rng.normal(size=d)
    P = np.linalg.inv(S)
    mu_j, P_j = jnp.asarray(mu, jnp.float32), jnp.asarray(P, jnp.float32)

    def logdensity(pos):
        x = pos["x"] - mu_j
        return -0.5 * x @ (P_j @ x)

    return logdensity, mu, S


def test_flatten_spec_round_trip():
    template = {"a": jnp.zeros((2, 3)), "b": jnp.zeros(()), "c": jnp.zeros((4,))}
    pack, unpack, d = flatten_spec(template)
    assert d == 11
    pos = {
        "a": jnp.arange(24.0).reshape(4, 2, 3),  # batched
        "b": jnp.arange(4.0),
        "c": jnp.arange(16.0).reshape(4, 4),
    }
    q = pack(pos)
    assert q.shape == (4, 11)
    back = unpack(q)
    for k in pos:
        np.testing.assert_array_equal(np.asarray(back[k]), np.asarray(pos[k]))


def test_momentum_covariance_matches_mass():
    """p = W z must have covariance M = inv(Minv)."""
    logdensity, mu, S = _correlated_gaussian(d=4)
    minv = jnp.asarray(np.linalg.inv(S), jnp.float32) * 0.5  # arbitrary SPD
    template = {"x": jnp.zeros(4)}
    kernel = dense_hmc(logdensity, template, 0.01, 2, inverse_mass_matrix=minv)

    # reach into the sampling path indirectly: draw many single steps from a
    # fixed state and check the empirical proposal-momentum energy change is
    # consistent -- instead test _metric_ops directly for exactness
    from binf_tpu.samplers.dense import _metric_ops

    W = _metric_ops(minv)
    M = np.linalg.inv(np.asarray(minv))
    np.testing.assert_allclose(np.asarray(W @ W.T), M, rtol=1e-4, atol=1e-4)


def test_dense_adaptation_recovers_metric_and_moments():
    logdensity, mu, S = _correlated_gaussian(d=6, rho=0.95)
    n = 256
    pos = {"x": 0.5 * jax.random.normal(jax.random.key(0), (n, 6))}

    adapt = jax.jit(
        lambda k: dense_window_adaptation(
            logdensity, pos, k, num_steps=600, num_integration_steps=8,
        )
    )(jax.random.key(1))

    # the adapted metric should approximate the target covariance: the
    # correlation structure is the important part
    minv = np.asarray(adapt.inverse_mass_matrix)
    corr_est = minv / np.sqrt(np.outer(np.diag(minv), np.diag(minv)))
    corr_true = S / np.sqrt(np.outer(np.diag(S), np.diag(S)))
    assert np.abs(corr_est - corr_true).max() < 0.25
    assert 0.6 < float(adapt.accept_rate) <= 1.0

    # sample with the adapted kernel and check moments
    template = jax.tree.map(lambda x: x[0], pos)
    kernel = dense_hmc(
        logdensity, template, adapt.step_size, 8,
        inverse_mass_matrix=adapt.inverse_mass_matrix,
    )
    states = init_chains(kernel, adapt.final_positions)
    _, samples = jax.jit(
        lambda s, k: run_chains(kernel, k, s, 400)
    )(states, jax.random.key(2))
    X = np.asarray(samples["x"][100:]).reshape(-1, 6)
    np.testing.assert_allclose(X.mean(0), mu, atol=0.25)
    np.testing.assert_allclose(X.std(0), np.sqrt(np.diag(S)), rtol=0.25)


@pytest.mark.slow
def test_dense_beats_diagonal_on_correlated_target():
    """Same budget, same target: the dense metric must deliver much higher
    min-ESS than the diagonal metric when correlations are strong."""
    from binf_tpu.diagnostics import ess
    from binf_tpu.samplers.adaptation import window_adaptation
    from binf_tpu.samplers.hmc import hmc

    logdensity, mu, S = _correlated_gaussian(d=6, rho=0.97, seed=3)
    n = 128
    pos = {"x": 0.5 * jax.random.normal(jax.random.key(0), (n, 6))}
    template = jax.tree.map(lambda x: x[0], pos)
    L, draws = 8, 400

    # dense
    adapt_d = jax.jit(
        lambda k: dense_window_adaptation(
            logdensity, pos, k, num_steps=600, num_integration_steps=L,
        )
    )(jax.random.key(1))
    kern_d = dense_hmc(
        logdensity, template, adapt_d.step_size, L,
        inverse_mass_matrix=adapt_d.inverse_mass_matrix,
    )
    st = init_chains(kern_d, adapt_d.final_positions)
    _, samp_d = jax.jit(lambda s, k: run_chains(kern_d, k, s, draws))(
        st, jax.random.key(2)
    )

    # diagonal (same schedule/budget)
    def builder(eps, im):
        return hmc(logdensity, eps, L, im)

    states0 = init_chains(builder(0.1, None), pos)
    adapt_g = jax.jit(
        lambda k: window_adaptation(builder, states0, k, num_steps=600)
    )(jax.random.key(1))
    kern_g = builder(adapt_g.step_size, adapt_g.inverse_mass)
    _, samp_g = jax.jit(lambda s, k: run_chains(kern_g, k, s, draws))(
        adapt_g.final_states, jax.random.key(2)
    )

    ess_d = float(jnp.min(ess(samp_d["x"])))
    ess_g = float(jnp.min(ess(samp_g["x"])))
    # with rho=0.97 the diagonal metric leaves a ~60:1 condition number;
    # dense should win by a wide margin -- require 2x to stay flake-proof
    assert ess_d > 2.0 * ess_g, (ess_d, ess_g)


def test_nuts_with_dense_metric():
    """DenseMetric plugs into NUTS through the shared metric helpers."""
    from binf_tpu.samplers.hmc import DenseMetric
    from binf_tpu.samplers.nuts import nuts

    logdensity, mu, S = _correlated_gaussian(d=4, rho=0.9, seed=5)
    n = 128
    pos = {"x": 0.3 * jax.random.normal(jax.random.key(0), (n, 4))}
    template = jax.tree.map(lambda x: x[0], pos)

    adapt = jax.jit(
        lambda k: dense_window_adaptation(
            logdensity, pos, k, num_steps=400, num_integration_steps=8,
        )
    )(jax.random.key(1))
    metric = DenseMetric(adapt.inverse_mass_matrix, template)
    kernel = nuts(logdensity, step_size=adapt.step_size, max_doublings=6,
                  inverse_mass=metric)
    states = init_chains(kernel, adapt.final_positions)
    _, samples = jax.jit(lambda s, k: run_chains(kernel, k, s, 300))(
        states, jax.random.key(2)
    )
    X = np.asarray(samples["x"][75:]).reshape(-1, 4)
    np.testing.assert_allclose(X.mean(0), mu, atol=0.25)
    np.testing.assert_allclose(X.std(0), np.sqrt(np.diag(S)), rtol=0.25)
