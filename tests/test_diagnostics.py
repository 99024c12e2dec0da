"""Diagnostics tests: R-hat and ESS against known-answer cases."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from binf_tpu.diagnostics import ess, split_rhat, summary


def test_rhat_converged_chains(key):
    x = jax.random.normal(key, (1000, 8))
    r = float(split_rhat(x))
    assert abs(r - 1.0) < 0.02


def test_rhat_detects_nonmixing(key):
    x = jax.random.normal(key, (1000, 4))
    offsets = jnp.asarray([0.0, 3.0, -3.0, 6.0])
    x = x + offsets[None, :]
    assert float(split_rhat(x)) > 2.0


def test_rhat_detects_trend(key):
    """Split-R-hat catches within-chain drift (classic R-hat would not)."""
    x = jax.random.normal(key, (1000, 4)) * 0.1
    trend = jnp.linspace(0, 5, 1000)[:, None]
    assert float(split_rhat(x + trend)) > 1.5


def test_ess_iid(key):
    x = jax.random.normal(key, (1000, 8))
    e = float(ess(x))
    assert 0.5 * 8000 < e  # iid -> ESS near the sample count


def test_ess_ar1(key):
    """AR(1) with coefficient phi has tau = (1+phi)/(1-phi)."""
    phi = 0.9
    n, m = 4000, 8
    eps = np.asarray(jax.random.normal(key, (n, m)))
    x = np.zeros((n, m))
    for t in range(1, n):
        x[t] = phi * x[t - 1] + eps[t] * np.sqrt(1 - phi**2)
    tau = (1 + phi) / (1 - phi)  # = 19
    e = float(ess(jnp.asarray(x)))
    assert 0.5 * n * m / tau < e < 2.0 * n * m / tau


def test_ess_vectorized_shape(key):
    x = jax.random.normal(key, (500, 4, 3))
    assert ess(x).shape == (3,)
    assert split_rhat(x).shape == (3,)


def test_summary(key):
    samples = {
        "coefficients": jax.random.normal(key, (500, 8, 4)),
        "precision": jax.random.normal(jax.random.key(1), (500, 8)) + 5.0,
    }
    s = summary(samples)
    assert s["coefficients"]["mean"].shape == (4,)
    assert abs(float(s["precision"]["mean"]) - 5.0) < 0.05
    assert float(s["precision"]["rhat"]) < 1.02


def test_transforms_roundtrip():
    from binf_tpu.pdf.transforms import LogTransform, SigmoidTransform, SoftplusTransform

    for t in (LogTransform, SoftplusTransform, SigmoidTransform(-2.0, 3.0)):
        u = jnp.asarray([-1.5, 0.0, 2.0])
        x = t.forward(u)
        u2 = t.inverse(x)
        np.testing.assert_allclose(np.asarray(u2), np.asarray(u), rtol=1e-5, atol=1e-5)


def test_transformed_density_is_correct_change_of_variables(key):
    """Sampling a Gamma(3, 2) via log-transformed RWM must reproduce the
    Gamma moments -- validates the Jacobian term."""
    from binf_tpu.pdf import distributions as dist
    from binf_tpu.pdf.transforms import LogTransform, transform_logdensity
    from binf_tpu.parallel.runner import init_chains, run_chains
    from binf_tpu.samplers import rwm

    def logp(pos):
        return dist.gamma_log_prob(pos["x"], 3.0, 2.0)

    u_logp = transform_logdensity(logp, {"x": LogTransform})
    kernel = rwm(u_logp, step_size=1.0)
    n_chains = 256
    states = init_chains(kernel, {"x": jnp.zeros(n_chains)})
    _, samples = jax.jit(lambda s, k: run_chains(kernel, k, s, 1500))(states, key)
    x = np.exp(np.asarray(samples["x"][500:]).ravel())
    np.testing.assert_allclose(x.mean(), 1.5, rtol=0.05)  # a/b
    np.testing.assert_allclose(x.var(), 0.75, rtol=0.15)  # a/b^2
