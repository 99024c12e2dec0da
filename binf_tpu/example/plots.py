"""Plotting helpers for the polynomial example (matplotlib-gated).

Feature parity with reference ``binf/example/plots.py``:

* :func:`plot_hists`        <- ``plot_hists`` (``:40-61``): marginal
  histograms of each coefficient and the precision vs ground truth;
* :func:`plot_fit`          <- ``plot_fit`` (``:26-38``): data, true curve,
  and the MAP curve;
* :func:`plot_prediction_tube` <- ``plot_prediction_tube`` (``:4-24``):
  95% equal-tailed credible band of the posterior predictive, computed from
  predictive CDFs on a y-grid.

All heavy math runs vectorized through :func:`binf_tpu.example.polynomial.predict`;
matplotlib is imported lazily so headless/TPU environments never pay for it.
"""

from __future__ import annotations

import numpy as np

from binf_tpu.example.polynomial import predict
from binf_tpu.ops.math import polyval

__all__ = ["plot_hists", "plot_fit", "plot_prediction_tube"]


def _plt():
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    return plt


def plot_hists(samples, real_coefficients, real_precision, bins=30, fig=None):
    """Marginal histograms with ground-truth lines (reference ``:40-61``)."""
    plt = _plt()
    coeffs = np.asarray(samples["coefficients"]).reshape(-1, len(real_coefficients))
    prec = np.asarray(samples["precision"]).reshape(-1)
    n = coeffs.shape[1] + 1
    if fig is None:
        fig = plt.figure(figsize=(3 * n, 3))
    for j in range(coeffs.shape[1]):
        ax = fig.add_subplot(1, n, j + 1)
        ax.hist(coeffs[:, j], bins=bins, density=True, alpha=0.7)
        ax.axvline(real_coefficients[j], color="r", lw=2)
        ax.set_title(f"coefficient {j}")
    ax = fig.add_subplot(1, n, n)
    ax.hist(prec, bins=bins, density=True, alpha=0.7)
    ax.axvline(real_precision, color="r", lw=2)
    ax.set_title("precision")
    return fig


def plot_fit(xses, ys, plot_x, map_coefficients, real_coefficients=None, ax=None):
    """Data + MAP polynomial (+ true curve) (reference ``:26-38``)."""
    plt = _plt()
    if ax is None:
        _, ax = plt.subplots()
    ax.scatter(np.asarray(xses), np.asarray(ys), label="data", zorder=3)
    grid = np.asarray(plot_x)
    ax.plot(grid, np.asarray(polyval(grid, np.asarray(map_coefficients))),
            label="MAP fit", lw=2)
    if real_coefficients is not None:
        ax.plot(grid, np.asarray(polyval(grid, np.asarray(real_coefficients))),
                "--", label="truth", lw=1.5)
    ax.legend()
    return ax


def plot_prediction_tube(
    samples, plot_x, y_min, y_max, n_y=150, level=0.95, ax=None
):
    """95% equal-tailed posterior-predictive band (reference ``:4-24``):
    for each x, evaluate the predictive density on a y-grid, form the CDF,
    and find the (2.5%, 97.5%) quantiles."""
    plt = _plt()
    if ax is None:
        _, ax = plt.subplots()
    import jax.numpy as jnp

    xs = np.asarray(plot_x)
    lows, highs = [], []
    y_grid = np.linspace(float(np.min(y_min)), float(np.max(y_max)), n_y)
    tail = (1.0 - level) / 2.0
    for x in xs:
        dens = np.asarray(
            predict(jnp.full((n_y,), float(x)), jnp.asarray(y_grid), samples)
        )
        cdf = np.cumsum(dens)
        cdf = cdf / cdf[-1]
        lows.append(np.interp(tail, cdf, y_grid))
        highs.append(np.interp(1.0 - tail, cdf, y_grid))
    ax.fill_between(xs, lows, highs, alpha=0.25, label=f"{level:.0%} predictive")
    ax.legend()
    return ax
