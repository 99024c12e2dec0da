#!/usr/bin/env python
"""Headline benchmark: effective samples/sec/chip on the polynomial posterior.

Protocol (BASELINE.md primary metric, round-3 honest version):

* **This framework**: N_CHAINS vectorized HMC chains on the reference's
  polynomial-regression posterior (4 coefficients + 1 precision, 20 data
  points).  One scored run = Stan-window warmup (fused in-kernel
  adaptation, ``ops/pallas/fused_potential.fused_warmup_run``) + sampling
  (hand-tiled fused kernel, ``ops/pallas/fused_hmc``), executed as ONE jit
  (single host dispatch).  Score = min-across-parameters bulk ESS of the
  sampling draws divided by the END-TO-END wall time of a scored run
  (warmup INCLUDED, per-run ``block_until_ready``, mean over BENCH_REPS
  runs) -- what a user pays for a complete adaptive run.
* **Baseline**: the reference's own algorithm (single-chain random-walk
  Metropolis over coefficients + conjugate Gamma precision draw,
  ``example_script.py`` / ``binf/example/samplers.py``) re-implemented in
  clean numpy, ESS over the kept half divided by the FULL run wall time
  (burn-in included, same accounting), mean over BENCH_BASELINE_REPS runs.
  (The reference publishes no numbers, so its algorithm on this host CPU
  is the baseline.)

Every phase prints a progress line to stderr with wall + compile seconds,
so a driver timeout is diagnosable and a cold-compile regression is caught
in-repo (round-2 postmortem: a 29-minute cold compile of the XLA
window-adaptation scan zeroed the recorded bench; the fused warmup kernel
compiles in seconds and replaced it here).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

N_CHAINS = int(os.environ.get("BENCH_CHAINS", 16384))
N_WARMUP = int(os.environ.get("BENCH_WARMUP", 500))
N_SAMPLES = int(os.environ.get("BENCH_SAMPLES", 4000))
# optional: chain CHAIN_BLOCKS sampling kernels (state-in/state-out) inside
# one jit instead of one long kernel.  Measured on the remote-compile
# service both shapes cost the same cold compile (~9 min for 4000 total
# steps at 16k chains -- the cost tracks total kernel-instance steps), so
# the default is ONE kernel; the knob remains for hosts with local compile.
CHAIN_BLOCKS = int(os.environ.get("BENCH_CHAIN_BLOCKS", 1))
REPS = int(os.environ.get("BENCH_REPS", 4))
BASELINE_SWEEPS = int(os.environ.get("BENCH_BASELINE_SWEEPS", 4000))
BASELINE_REPS = int(os.environ.get("BENCH_BASELINE_REPS", 3))

_T0 = time.perf_counter()


def _progress(msg: str) -> None:
    print(f"# [{time.perf_counter() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


# -- numpy baseline (reference algorithm) ------------------------------------


def baseline_numpy_ess_per_sec(xses, ys, rng):
    """Reference-equivalent sampler in numpy: RWM(step 0.1) coefficients +
    exact conjugate Gamma precision, single chain (the reference's workload,
    ``example_script.py:30-37``).  Returns (ESS/s over the full run, wall)."""
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
    # rate over the whole run (burn-in half counted as cost, mirroring the
    # TPU score's included warmup)
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


# -- the TPU run --------------------------------------------------------------


def main():
    import jax

    from binf_tpu.io.cache import enable_persistent_cache
    from binf_tpu.io.health import wait_for_device_health

    enable_persistent_cache()
    if jax.default_backend() != "cpu":
        # the tunneled TPU's device->host path wedges intermittently; in
        # that state block_until_ready doesn't wait and timings are garbage.
        # Gate the scored run on a subprocess canary (see io/health.py).
        _progress("device-health canary ...")
        # observed outage windows run ~60-75 min; spend most of the bench
        # budget waiting for a heal rather than refusing early (a completed
        # late run beats an early null)
        max_wait = float(os.environ.get("BENCH_HEALTH_WAIT", 1380.0))
        if not wait_for_device_health(max_wait=max_wait, log=_progress):
            print(json.dumps({
                "metric": "effective samples/sec/chip, polynomial posterior",
                "value": None,
                "unit": "ESS/s",
                "vs_baseline": None,
                "error": "device->host path unhealthy; measurement refused",
            }), flush=True)
            return
        _progress("device healthy")
    import jax.numpy as jnp

    from binf_tpu.diagnostics import ess
    from binf_tpu.example.polynomial import make_data, make_posterior
    from binf_tpu.ops.math import vandermonde
    from binf_tpu.ops.pallas.fused_hmc import (
        fused_linreg_hmc_run,
        linreg_unconstrained_logdensity,
    )
    from binf_tpu.ops.pallas.fused_potential import (
        fused_warmup_run,
        tile_potential_from_scalar,
    )

    on_cpu = jax.default_backend() == "cpu"
    _progress(
        f"build: {N_CHAINS} chains, {N_WARMUP} warmup + {N_SAMPLES} samples, "
        f"device={jax.devices()[0].device_kind}"
    )

    xses, ys = make_data(jax.random.key(1))
    # make_posterior is the user-facing construction; the bench density below
    # is the same posterior in unconstrained space (cross-checked in tests)
    make_posterior(xses, ys)
    V = vandermonde(jnp.linspace(-2.0, 2.0, 20), 4)
    prior_var = jnp.ones(4) * 5.0
    logdensity = linreg_unconstrained_logdensity(V, ys, prior_var, 1.0, 0.2)
    template = {
        "coefficients": jnp.zeros((4,), jnp.float32),
        "precision": jnp.zeros((), jnp.float32),
    }
    potential, consts, _ = tile_potential_from_scalar(logdensity, template)

    q_init = jnp.concatenate(
        [
            jnp.ones((N_CHAINS, 4))
            + 0.1 * jax.random.normal(jax.random.key(2), (N_CHAINS, 4)),
            jnp.zeros((N_CHAINS, 1)),
        ],
        axis=1,
    )

    # Tile-width sweep on v5e (2026-08-21, docs/performance.md): one tile
    # spanning ALL chains is fastest -- 512-lane tiles leave the VPU
    # underfilled on this small-state model (bc=512: 1.09e8 ESS/s e2e;
    # 2048: 2.54e8; 4096: 2.94-2.98e8; 16384 single tile: 3.07-3.12e8).
    bc = min(int(os.environ.get("BENCH_BLOCK_CHAINS", N_CHAINS)), N_CHAINS)
    kern_kwargs = dict(
        num_leapfrog=10,
        block_chains=bc,
        interpret=on_cpu,
        host_noise=on_cpu,
    )

    @jax.jit
    def full_run(q0, seed):
        """One complete adaptive run (warmup + chained sampling), ONE
        dispatch."""
        qw, eps_c, im_c = fused_warmup_run(
            potential, q0, seed, 0.1, consts, num_warmup=N_WARMUP, **kern_kwargs
        )
        # pool the per-tile adapted step size / metric across all chains
        # (the estimates are per 512-chain tile; pooling only sharpens them)
        eps = jnp.mean(eps_c)
        im = jnp.mean(im_c, axis=0)
        q = qw
        blocks = []
        acc = 0.0
        for b in range(CHAIN_BLOCKS):
            draws, a = fused_linreg_hmc_run(
                q, seed + 1 + b, V, ys, prior_var, 1.0, 0.2, eps,
                inverse_mass=im,
                num_steps=N_SAMPLES,
                steps_per_block=min(50, N_SAMPLES),
                **kern_kwargs,
            )
            q = draws[-1]  # state-out -> state-in chaining
            blocks.append(draws)
            acc = acc + a
        draws = jnp.concatenate(blocks, axis=0) if CHAIN_BLOCKS > 1 else blocks[0]
        return draws, acc / CHAIN_BLOCKS, eps

    t0 = time.perf_counter()
    draws, acc, eps = full_run(q_init, 0)
    jax.block_until_ready(draws)
    cold_s = time.perf_counter() - t0
    _progress(f"warmup+sampling compiled + first run: {cold_s:.1f}s cold")

    # scored phase: end-to-end wall per complete adaptive run, each rep
    # blocked (includes warmup, packing, and host dispatch -- what a user
    # pays for a fresh adaptive run; NOT pipelined)
    rep_times = []
    for i in range(REPS):
        t0 = time.perf_counter()
        draws, acc, eps = full_run(q_init, 2 * i + 2)
        jax.block_until_ready(draws)
        rep_times.append(time.perf_counter() - t0)
    e2e = float(np.mean(rep_times))
    _progress(
        f"{REPS} scored end-to-end runs: mean {e2e*1e3:.1f}ms "
        f"(min {min(rep_times)*1e3:.1f}, max {max(rep_times)*1e3:.1f}), "
        f"accept={float(acc):.2f}"
    )

    # diagnostic (stderr only): pipelined steady-state, amortizing dispatch
    t0 = time.perf_counter()
    for i in range(REPS):
        d2, _, _ = full_run(q_init, 100 + i)
    jax.block_until_ready(d2)
    pipelined = (time.perf_counter() - t0) / REPS
    _progress(f"pipelined steady-state: {pipelined*1e3:.1f}ms/run")

    t0 = time.perf_counter()

    @jax.jit
    def min_ess(draws):
        coeff = ess(draws[:, :, :4])
        prec = ess(jnp.exp(draws[:, :, 4]))
        return jnp.minimum(jnp.min(coeff), prec)

    m_ess = float(min_ess(draws))
    _progress(
        f"ESS computed in {time.perf_counter() - t0:.1f}s: min bulk ESS "
        f"{m_ess:.3g} over {N_SAMPLES}x{N_CHAINS} draws"
    )

    rate = m_ess / e2e

    # -- general-kernel phase (same protocol, interpreter-compiled kernel) --
    # The headline uses the hand-tiled linreg kernel; the framework's
    # actual any-model capability is the general path
    # (tile_potential_from_scalar -> fused_potential_hmc_run).  Score it at
    # the IDENTICAL protocol so a regression there is visible even while
    # the hand-tiled headline stays green (round-3 VERDICT item 6).
    gen_rate = None
    gen_ratio = None
    if os.environ.get("BENCH_GENERAL", "1") == "1":
        from binf_tpu.ops.pallas.fused_potential import fused_potential_hmc_run

        # measured tile sweep for the general kernel at 16k chains
        # (2026-08-21): 4096 -> 121.8, 8192 -> 118.3, 16384 -> 115.2
        # ms/1000 steps -- the full-batch tile wins here too
        gen_kwargs = dict(kern_kwargs, block_chains=bc)

        @jax.jit
        def full_run_general(q0, seed):
            qw, eps_c, im_c = fused_warmup_run(
                potential, q0, seed, 0.1, consts, num_warmup=N_WARMUP,
                **kern_kwargs,
            )
            eps = jnp.mean(eps_c) * jnp.ones((q0.shape[0],), jnp.float32)
            im = jnp.mean(im_c, axis=0)
            r = fused_potential_hmc_run(
                potential, qw, seed + 1, eps, im, consts,
                num_steps=N_SAMPLES,
                steps_per_block=min(50, N_SAMPLES),
                **gen_kwargs,
            )
            return r.draws, r.accept_rate

        try:
            t0 = time.perf_counter()
            gdraws, gacc = full_run_general(q_init, 1000)
            jax.block_until_ready(gdraws)
            _progress(
                f"general kernel compiled + first run: "
                f"{time.perf_counter() - t0:.1f}s cold"
            )
            g_times = []
            for i in range(REPS):
                t0 = time.perf_counter()
                gdraws, gacc = full_run_general(q_init, 1000 + 2 * i + 2)
                jax.block_until_ready(gdraws)
                g_times.append(time.perf_counter() - t0)
            g_e2e = float(np.mean(g_times))
            g_ess = float(min_ess(gdraws))
            gen_rate = g_ess / g_e2e
            gen_ratio = gen_rate / rate
            _progress(
                f"general kernel ({REPS} scored runs): {g_e2e*1e3:.1f}ms/run, "
                f"min_ess={g_ess:.3g}, {gen_rate:.3g} ESS/s = "
                f"{gen_ratio:.2f}x the hand-tiled headline, "
                f"accept={float(gacc):.2f}"
            )
            if gen_ratio < 0.9:
                _progress(
                    "WARNING: general kernel >10% behind the hand-tiled "
                    "headline -- regression signal (docs/performance.md)"
                )
        except Exception as e:  # never let the diagnostic kill the score
            _progress(f"general-kernel phase failed: {e!r}")

    # -- ChEES phase (round 5): in-kernel trajectory adaptation + jittered
    # traced-length sampling, same end-to-end protocol.  ChEES measured
    # 3.9-5.3x fixed-L ESS/s on the XLA path (round 4); the headline
    # records whichever algorithm honestly maximizes end-to-end ESS/s.
    chees_rate = None
    chees_T = None
    if os.environ.get("BENCH_CHEES", "1") == "1":
        from binf_tpu.ops.pallas.fused_potential import fused_potential_hmc_run

        @jax.jit
        def full_run_chees(q0, seed):
            qw, eps_c, im_c, T = fused_warmup_run(
                potential, q0, seed, 0.1, consts, num_warmup=N_WARMUP,
                trajectory="chees", max_leapfrog=128, target_accept=0.651,
                **kern_kwargs,
            )
            r = fused_potential_hmc_run(
                potential, qw, seed + 1, eps_c, jnp.mean(im_c, axis=0),
                consts, num_steps=N_SAMPLES, trajectory="chees",
                traj_length=T, max_leapfrog=128,
                steps_per_block=min(50, N_SAMPLES), **kern_kwargs,
            )
            return r.draws, r.accept_rate, T

        try:
            t0 = time.perf_counter()
            cdraws, cacc, cT = full_run_chees(q_init, 500)
            jax.block_until_ready(cdraws)
            _progress(
                f"chees kernel compiled + first run: "
                f"{time.perf_counter() - t0:.1f}s cold"
            )
            c_times = []
            for i in range(REPS):
                t0 = time.perf_counter()
                cdraws, cacc, cT = full_run_chees(q_init, 500 + 2 * i + 2)
                jax.block_until_ready(cdraws)
                c_times.append(time.perf_counter() - t0)
            c_e2e = float(np.mean(c_times))
            c_ess = float(min_ess(cdraws))
            chees_rate = c_ess / c_e2e
            chees_T = float(jnp.mean(cT))
            _progress(
                f"chees ({REPS} scored runs): {c_e2e*1e3:.1f}ms/run, "
                f"min_ess={c_ess:.3g}, {chees_rate:.3g} ESS/s = "
                f"{chees_rate / rate:.2f}x fixed-L, T={chees_T:.2f}, "
                f"accept={float(cacc):.2f}"
            )
        except Exception as e:  # never let the new phase kill the score
            _progress(f"chees phase failed: {e!r}")

    rng = np.random.default_rng(0)
    base_rates = []
    for _ in range(BASELINE_REPS):
        r, elapsed = baseline_numpy_ess_per_sec(np.asarray(xses), np.asarray(ys), rng)
        base_rates.append(r)
    base = float(np.mean(base_rates))
    _progress(
        f"baseline ({BASELINE_REPS} reps numpy single chain, burn-in "
        f"included): {base:.1f} ESS/s "
        f"(spread {min(base_rates):.1f}-{max(base_rates):.1f})"
    )

    # headline = the honest best algorithm at the same protocol
    algorithm = "fixed-L fused HMC"
    best_rate = rate
    if chees_rate is not None and chees_rate > rate:
        algorithm = "in-kernel ChEES-HMC (jittered trajectories)"
        best_rate = chees_rate

    record = {
        "metric": "effective samples/sec/chip, polynomial posterior "
        f"(adaptive HMC end-to-end incl. warmup, {N_CHAINS} chains)",
        "value": round(best_rate, 1),
        "unit": "ESS/s",
        "vs_baseline": round(best_rate / base, 1),
        "algorithm": algorithm,
        "fixed_l_ess_per_sec": round(rate, 1),
    }
    if chees_rate is not None:
        record["chees_ess_per_sec"] = round(chees_rate, 1)
        record["chees_mean_trajectory"] = round(chees_T, 3)
    if gen_rate is not None:
        # the any-model general-kernel path at the identical protocol,
        # recorded beside the hand-tiled headline as a regression signal
        record["general_kernel_ess_per_sec"] = round(gen_rate, 1)
        record["general_vs_handtiled"] = round(gen_ratio, 3)
    print(json.dumps(record), flush=True)
    _progress(
        f"details: min_ess={m_ess:.0f} e2e={e2e*1e3:.1f}ms/run "
        f"(pipelined {pipelined*1e3:.1f}ms) cold_first_run={cold_s:.1f}s "
        f"step_size={float(eps):.4f} device={jax.devices()[0].device_kind}"
    )


if __name__ == "__main__":
    main()
