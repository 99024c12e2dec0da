"""Example-layer parity tests: predict, get_map, plots (reference misc/plots)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from binf_tpu.example.polynomial import (
    get_map,
    initial_positions,
    make_collapsed_gibbs_kernel,
    make_data,
    make_posterior,
    predict,
)
from binf_tpu.parallel.runner import init_chains, run_chains


@pytest.fixture(scope="module")
def samples_and_posterior():
    xses, ys = make_data(jax.random.key(1))
    posterior = make_posterior(xses, ys)
    kernel = make_collapsed_gibbs_kernel(posterior)
    states = init_chains(kernel, initial_positions(64))
    _, samples = jax.jit(lambda s, k: run_chains(kernel, k, s, 200))(
        states, jax.random.key(2)
    )
    flat = {
        "coefficients": samples["coefficients"][50:].reshape(-1, 4),
        "precision": samples["precision"][50:].reshape(-1),
    }
    return xses, ys, posterior, flat


def test_predict_matches_direct_computation(samples_and_posterior):
    """predict == mean over draws of the pointwise Gaussian likelihood
    (reference ``binf/example/misc.py:3-16``)."""
    xses, ys, posterior, flat = samples_and_posterior
    sub = {k: v[:500] for k, v in flat.items()}
    x0, y0 = 0.5, 1.0
    dens = float(predict(jnp.asarray([x0]), jnp.asarray([y0]), sub)[0])

    c = np.asarray(sub["coefficients"])
    p = np.asarray(sub["precision"])
    mock = np.polynomial.polynomial.polyval(x0, c.T)
    lik = np.exp(-0.5 * (mock - y0) ** 2 * p) * np.sqrt(p / (2 * np.pi))
    assert dens == pytest.approx(float(lik.mean()), rel=1e-4)


def test_predict_integrates_to_one(samples_and_posterior):
    xses, ys, posterior, flat = samples_and_posterior
    sub = {k: v[:300] for k, v in flat.items()}
    ygrid = jnp.linspace(-10.0, 15.0, 801)
    dens = predict(jnp.full_like(ygrid, 1.0), ygrid, sub)
    integral = float(jnp.trapezoid(dens, ygrid))
    assert integral == pytest.approx(1.0, abs=0.02)


def test_get_map(samples_and_posterior):
    xses, ys, posterior, flat = samples_and_posterior
    sub = {k: v[:1000] for k, v in flat.items()}
    lps = jax.vmap(
        lambda c, p: posterior.log_prob(coefficients=c, precision=p)
    )(sub["coefficients"], sub["precision"])
    m = get_map(sub, lps)
    assert float(m.log_prob) == float(jnp.max(lps))
    # the MAP should beat the posterior-mean point's own draws' median lp
    assert float(m.log_prob) >= float(jnp.median(lps))


def test_plots_smoke(samples_and_posterior, tmp_path):
    matplotlib = pytest.importorskip("matplotlib")
    matplotlib.use("Agg")
    from binf_tpu.example.plots import plot_fit, plot_hists, plot_prediction_tube

    xses, ys, posterior, flat = samples_and_posterior
    sub = {k: v[:200] for k, v in flat.items()}
    fig = plot_hists(sub, [2.0, -4.0, 1.0, 1.5], 2.5)
    fig.savefig(tmp_path / "hists.png")

    import matplotlib.pyplot as plt

    _, ax = plt.subplots()
    plot_fit(xses, ys, np.linspace(-2, 2, 50), sub["coefficients"].mean(0),
             [2.0, -4.0, 1.0, 1.5], ax=ax)
    plot_prediction_tube(sub, np.linspace(-2, 2, 10), -15.0, 25.0, n_y=60, ax=ax)
    ax.figure.savefig(tmp_path / "fit.png")
    assert (tmp_path / "hists.png").exists()
    assert (tmp_path / "fit.png").exists()
