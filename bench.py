#!/usr/bin/env python
"""Headline benchmark: effective samples/sec/chip on the polynomial posterior.

Protocol (BASELINE.md primary metric):

* **This framework**: N_CHAINS vectorized HMC chains on the reference's
  polynomial-regression posterior (4 coefficients + 1 precision, 20 data
  points), window-adapted warmup, then a timed sampling phase compiled as
  one scan.  Score = min-across-parameters bulk ESS of the collected draws
  divided by wall time.
* **Baseline**: the reference's own algorithm (single-chain random-walk
  Metropolis over coefficients + conjugate Gamma precision draw,
  ``example_script.py`` / ``binf/example/samplers.py``) re-implemented in
  clean numpy, timed the same way.  (The reference publishes no numbers, so
  its algorithm on this host CPU is the baseline.)

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

N_CHAINS = int(os.environ.get("BENCH_CHAINS", 8192))
N_WARMUP = int(os.environ.get("BENCH_WARMUP", 500))
N_SAMPLES = int(os.environ.get("BENCH_SAMPLES", 1000))
BASELINE_SWEEPS = int(os.environ.get("BENCH_BASELINE_SWEEPS", 4000))


def baseline_numpy_ess_per_sec(xses, ys, rng):
    """Reference-equivalent sampler in numpy: RWM(step 0.1) coefficients +
    exact conjugate Gamma precision, single chain (the reference's workload,
    ``example_script.py:30-37``)."""
    V = np.vander(xses, 4, increasing=True)
    n = len(ys)
    alpha, beta_ = 1.0, 0.2  # Gamma prior (binf/example/priors.py:67)
    prior_var = 5.0

    def log_posterior_coeffs(c, prec):
        resid = V @ c - ys
        return (
            -0.5 * prec * resid @ resid
            + 0.5 * n * np.log(prec)
            - 0.5 * c @ c / prior_var
        )

    c = np.ones(4)
    prec = 1.0
    draws = np.empty((BASELINE_SWEEPS, 5))
    step = 0.1
    t0 = time.perf_counter()
    lp = log_posterior_coeffs(c, prec)
    for i in range(BASELINE_SWEEPS):
        prop = c + rng.uniform(-step, step, size=4)
        lp_prop = log_posterior_coeffs(prop, prec)
        if rng.random() < np.exp(min(lp_prop - lp, 0.0)):
            c, lp = prop, lp_prop
        resid = V @ c - ys
        prec = rng.gamma(alpha + 0.5 * n) / (beta_ + 0.5 * resid @ resid)
        lp = log_posterior_coeffs(c, prec)
        draws[i, :4] = c
        draws[i, 4] = prec
    elapsed = time.perf_counter() - t0

    kept = draws[BASELINE_SWEEPS // 2 :]
    ess_vals = [_numpy_ess(kept[:, j]) for j in range(5)]
    # rate over the whole run (warmup half counted as cost, like the TPU run)
    return min(ess_vals) / elapsed, elapsed


def _numpy_ess(x):
    """Scalar bulk ESS via autocorrelation with Geyer truncation."""
    x = x - x.mean()
    n = len(x)
    f = np.fft.rfft(x, 2 * n)
    acov = np.fft.irfft(f * np.conj(f))[:n] / n
    rho = acov / acov[0]
    pair = rho[0 : n - 1 : 2][: (n - 1) // 2] + rho[1 : n : 2][: (n - 1) // 2]
    tau = -1.0
    run_min = np.inf
    for p in pair:
        if p <= 0:
            break
        run_min = min(run_min, p)
        tau += 2.0 * run_min
    return n / max(tau, 1.0)


def main():
    import jax
    import jax.numpy as jnp

    from binf_tpu.diagnostics import ess
    from binf_tpu.example.polynomial import make_data, make_posterior
    from binf_tpu.pdf.transforms import LogTransform, transform_logdensity
    from binf_tpu.samplers.adaptation import window_adaptation
    from binf_tpu.samplers.hmc import hmc
    from binf_tpu.parallel.runner import run_chains

    key = jax.random.key(0)
    xses, ys = make_data(jax.random.key(1))
    posterior = make_posterior(xses, ys)
    logdensity = transform_logdensity(
        lambda p: posterior.log_prob(p), {"precision": LogTransform}
    )

    def builder(step_size, inverse_mass):
        return hmc(
            logdensity,
            step_size=step_size,
            num_integration_steps=10,
            inverse_mass=inverse_mass,
        )

    positions = {
        "coefficients": jnp.ones((N_CHAINS, 4))
        + 0.1 * jax.random.normal(jax.random.key(2), (N_CHAINS, 4)),
        "precision": jnp.zeros((N_CHAINS,)),
    }

    @jax.jit
    def warmup(positions, k):
        kern0 = builder(0.05, None)
        states = jax.vmap(kern0.init)(positions)
        return window_adaptation(
            builder, states, k, num_steps=N_WARMUP, initial_step_size=0.05
        )

    @jax.jit
    def sample(adapt_step_size, adapt_inverse_mass, states, k):
        kernel = builder(adapt_step_size, adapt_inverse_mass)
        final, samples = run_chains(kernel, k, states, N_SAMPLES)
        return samples

    k_w, k_s = jax.random.split(key)

    # compile (excluded from timing)
    adapt = warmup(positions, k_w)
    jax.block_until_ready(adapt.step_size)
    s = sample(adapt.step_size, adapt.inverse_mass, adapt.final_states, k_s)
    jax.block_until_ready(s)

    # timed run: warmup + sampling (amortized like a real inference run)
    t0 = time.perf_counter()
    adapt = warmup(positions, k_w)
    samples = sample(adapt.step_size, adapt.inverse_mass, adapt.final_states, k_s)
    jax.block_until_ready(samples)
    elapsed = time.perf_counter() - t0

    # ESS on constrained-space draws: (draws, chains, ...)
    coeff_ess = ess(samples["coefficients"])  # (4,)
    prec_ess = ess(jnp.exp(samples["precision"]))  # scalar
    min_ess = float(jnp.minimum(jnp.min(coeff_ess), prec_ess))
    ess_per_sec = min_ess / elapsed

    rng = np.random.default_rng(0)
    base_eps, base_elapsed = baseline_numpy_ess_per_sec(
        np.asarray(xses), np.asarray(ys), rng
    )

    print(
        json.dumps(
            {
                "metric": "effective samples/sec/chip, polynomial posterior (HMC, "
                f"{N_CHAINS} chains)",
                "value": round(ess_per_sec, 1),
                "unit": "ESS/s",
                "vs_baseline": round(ess_per_sec / base_eps, 1),
            }
        )
    )
    print(
        f"# details: min_ess={min_ess:.0f} elapsed={elapsed:.2f}s "
        f"step_size={float(adapt.step_size):.4f} "
        f"baseline={base_eps:.1f} ESS/s ({base_elapsed:.2f}s numpy single chain) "
        f"device={jax.devices()[0].device_kind}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
