#!/usr/bin/env python
"""TPU throughput for the algorithm surface beyond fixed-L HMC.

Round-3 VERDICT item 3: NUTS, ChEES, dense-metric HMC, SMC, and
Pathfinder had correctness tests but no recorded TPU performance.  This
records, per section (one JSON line each):

1. ``trajectory``: fixed-L HMC vs NUTS vs ChEES on a correlated Gaussian
   and the hierarchical family -- min bulk ESS/s (north star) plus
   ESS per gradient evaluation (the equal-gradient-budget view; NUTS and
   ChEES report their measured per-step integration counts).
2. ``metric``: diagonal vs dense mass matrix through the fused sampling
   kernel at the headline polynomial shape (end-to-end, warmup included).
3. ``smc``: one adaptive tempered-SMC run on the mixture posterior --
   particle-stage throughput and the evidence estimate.
4. ``pathfinder``: pathfinder-init + short fused warmup vs the standard
   500-step fused warmup on the headline shape -- end-to-end min-ESS/s of
   the complete adaptive run, same sampling phase.

All sections gate on the device-health canary and reuse the persistent
compile cache.  Sizes are chosen to bound remote-compile time; override
with BENCH_ALG_CHAINS / BENCH_ALG_STEPS.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def _progress(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def _correlated_gaussian(d=16, rho=0.9):
    corr = np.full((d, d), rho) + (1 - rho) * np.eye(d)
    scales = np.exp(np.linspace(-0.5, 0.5, d))
    S = np.diag(scales) @ corr @ np.diag(scales)
    P = np.asarray(np.linalg.inv(S), np.float32)

    def logdensity(pos):
        x = pos["x"]
        return -0.5 * x @ (P @ x)

    return logdensity, {"x": np.zeros((d,), np.float32)}


def _target(name, n_chains):
    if name == "correlated":
        logdensity, template = _correlated_gaussian()
        positions = {
            "x": 2.0
            * jax.random.normal(jax.random.key(1), (n_chains, 16))
        }
        return logdensity, positions
    from binf_tpu.cli import _unconstrain_batch, build_model
    from binf_tpu.pdf.transforms import transform_logdensity

    posterior, init_fn, transforms = build_model(name, jax.random.key(0))
    posterior = jax.device_get(posterior)
    logdensity = transform_logdensity(
        lambda p: posterior.log_prob(p), transforms
    )
    positions = _unconstrain_batch(
        transforms, init_fn(n_chains, key=jax.random.key(1))
    )
    return logdensity, positions


def _min_ess_rate(samples, elapsed):
    from binf_tpu.diagnostics import ess

    @jax.jit
    def _min_ess(samples):
        vals = [jnp.min(ess(v)) for v in jax.tree.leaves(samples)]
        return jnp.min(jnp.stack(vals))

    m = float(_min_ess(samples))
    return m, m / elapsed


def bench_trajectory(target: str, n_chains: int, num_steps: int):
    """Fixed-L HMC vs NUTS vs ChEES at a shared adapted step size/metric."""
    from binf_tpu.parallel.runner import run_chains, warmup_and_run
    from binf_tpu.samplers.adaptation import window_adaptation
    from binf_tpu.samplers.chees import chees_adaptation, chees_hmc
    from binf_tpu.samplers.hmc import hmc
    from binf_tpu.samplers.nuts import nuts

    logdensity, positions = _target(target, n_chains)
    key = jax.random.key(7)

    # shared calibration from the diagonal window adaptation (untimed)
    def builder(step_size, inverse_mass):
        return hmc(logdensity, step_size, 10, inverse_mass)

    @jax.jit
    def warm(positions, k):
        states = jax.vmap(builder(0.1, None).init)(positions)
        return window_adaptation(builder, states, k, num_steps=400,
                                 initial_step_size=0.1)

    t0 = time.perf_counter()
    adapt = warm(positions, key)
    jax.block_until_ready(adapt.step_size)
    eps = float(adapt.step_size)
    im = jax.device_get(adapt.inverse_mass)
    pos_w = jax.device_get(adapt.final_states.position)
    _progress(f"{target}: warmup {time.perf_counter()-t0:.1f}s eps={eps:.4f}")

    rows = {}
    for alg in ("hmc", "nuts", "chees"):
        if alg == "hmc":
            kernel = hmc(logdensity, eps, 10, im)
            grads_per_step = 11.0
        elif alg == "nuts":
            kernel = nuts(logdensity, eps, 6, im)
            grads_per_step = None  # measured from info
        else:
            # ChEES needs its own trajectory adaptation (that IS the alg)
            t0 = time.perf_counter()
            ch = jax.jit(
                lambda k: chees_adaptation(
                    logdensity, positions, k, num_steps=400,
                    initial_step_size=0.1,
                )
            )(jax.random.key(8))
            jax.block_until_ready(ch.step_size)
            _progress(
                f"{target}: chees warmup {time.perf_counter()-t0:.1f}s "
                f"T={float(ch.trajectory_length):.2f} "
                f"eps={float(ch.step_size):.4f}"
            )
            kernel = chees_hmc(logdensity, ch.step_size,
                               ch.trajectory_length, ch.inverse_mass)
            grads_per_step = None
            pos_w = jax.device_get(ch.final_positions)

        @jax.jit
        def run(positions, k, kernel=kernel):
            states = jax.vmap(kernel.init)(positions)
            _, (samples, nsteps) = run_chains(
                kernel, k, states, num_steps,
                collect=lambda s, i: (
                    s.position if hasattr(s, "position") else s[0].position,
                    getattr(i, "num_integration_steps", jnp.ones(())),
                ),
            )
            return samples, nsteps

        t0 = time.perf_counter()
        (samples, nsteps) = run(pos_w, jax.random.key(9))
        jax.block_until_ready(samples)
        cold = time.perf_counter() - t0
        t, (samples, nsteps) = timeit(run, pos_w, jax.random.key(9))
        m_ess, rate = _min_ess_rate(samples, t)
        mean_steps = (
            grads_per_step if grads_per_step is not None
            else float(jnp.mean(nsteps.astype(jnp.float32))) + 1.0
        )
        grads = n_chains * num_steps * mean_steps
        rows[alg] = {
            "ms": round(t * 1e3, 1),
            "min_ess": round(m_ess),
            "ess_per_s": round(rate),
            "grads_per_step": round(mean_steps, 1),
            "ess_per_megagrad": round(m_ess / grads * 1e6, 2),
            "cold_s": round(cold, 1),
        }
        _progress(f"{target}/{alg}: {rows[alg]}")

    print(json.dumps({
        "section": "trajectory", "target": target, "chains": n_chains,
        "steps": num_steps, **rows,
    }), flush=True)
    return rows


def bench_metric(n_chains: int, num_samples: int):
    """Diagonal (in-kernel fused warmup) vs dense metric at the headline
    polynomial shape, end-to-end including warmup."""
    from binf_tpu.samplers.fused import fused_model_hmc

    logdensity, positions = _target("polynomial", n_chains)
    rows = {}
    for metric, warmup in (("diag", "fused"), ("dense", "dense")):
        def run(k, warmup=warmup):
            return fused_model_hmc(
                logdensity, positions, k, num_warmup=500,
                num_samples=num_samples, num_leapfrog=10, warmup=warmup,
            )

        t0 = time.perf_counter()
        res = run(jax.random.key(3))
        jax.block_until_ready(res.samples)
        cold = time.perf_counter() - t0
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            res = run(jax.random.key(4 + i))
            jax.block_until_ready(res.samples)
            times.append(time.perf_counter() - t0)
        t = float(np.mean(times))
        m_ess, rate = _min_ess_rate(res.samples, t)
        rows[metric] = {
            "e2e_ms": round(t * 1e3, 1),
            "min_ess": round(m_ess),
            "ess_per_s": round(rate),
            "accept": round(float(jnp.mean(res.accept_rate)), 3),
            "cold_s": round(cold, 1),
        }
        _progress(f"metric/{metric}: {rows[metric]}")
    print(json.dumps({
        "section": "metric", "target": "polynomial", "chains": n_chains,
        "samples": num_samples, **rows,
    }), flush=True)
    return rows


def bench_smc(n_particles: int):
    from binf_tpu.cli import build_model
    from binf_tpu.smc import tempered_smc

    posterior, _, _ = build_model("mixture", jax.random.key(0))
    posterior = jax.device_get(posterior)

    @jax.jit
    def run(k):
        # 20 mutation steps: measured minimum for full mode recovery on
        # the 3-component mixture (5 steps undermixes, truth not found)
        return tempered_smc(posterior, k, num_particles=n_particles,
                            mutation="hmc", num_mutation_steps=20,
                            max_stages=200)

    t0 = time.perf_counter()
    res = run(jax.random.key(5))
    jax.block_until_ready(res.particles)
    cold = time.perf_counter() - t0
    t, res = timeit(run, jax.random.key(5))
    stages = int(res.num_stages)
    rec = {
        "section": "smc", "target": "mixture", "particles": n_particles,
        "stages": stages,
        "ms": round(t * 1e3, 1),
        "particle_stages_per_s": round(n_particles * stages / t),
        "log_evidence": round(float(res.log_evidence), 3),
        "cold_s": round(cold, 1),
    }
    _progress(f"smc: {rec}")
    print(json.dumps(rec), flush=True)
    return rec


def bench_pathfinder_init(n_chains: int, num_samples: int):
    """pathfinder-init + 100-step fused warmup vs 500-step fused warmup:
    end-to-end wall + resulting min-ESS/s, identical sampling phase."""
    from binf_tpu.samplers.fused import fused_model_hmc
    from binf_tpu.vi.pathfinder import pathfinder_init

    logdensity, positions = _target("polynomial", n_chains)
    seeds = jax.tree.map(lambda x: x[:8], positions)

    def run_std(k):
        return fused_model_hmc(
            logdensity, positions, k, num_warmup=500,
            num_samples=num_samples, num_leapfrog=10, warmup="fused",
        )

    def run_pf(k):
        k1, k2 = jax.random.split(k)
        starts = pathfinder_init(logdensity, seeds, k1, n_chains=n_chains)
        return fused_model_hmc(
            logdensity, starts, k2, num_warmup=100,
            num_samples=num_samples, num_leapfrog=10, warmup="fused",
        )

    rows = {}
    for name, run in (("warmup500", run_std), ("pf_init_warmup100", run_pf)):
        t0 = time.perf_counter()
        res = run(jax.random.key(11))
        jax.block_until_ready(res.samples)
        cold = time.perf_counter() - t0
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            res = run(jax.random.key(12 + i))
            jax.block_until_ready(res.samples)
            times.append(time.perf_counter() - t0)
        t = float(np.mean(times))
        m_ess, rate = _min_ess_rate(res.samples, t)
        rows[name] = {
            "e2e_ms": round(t * 1e3, 1),
            "min_ess": round(m_ess),
            "ess_per_s": round(rate),
            "accept": round(float(jnp.mean(res.accept_rate)), 3),
            "cold_s": round(cold, 1),
        }
        _progress(f"pathfinder/{name}: {rows[name]}")
    print(json.dumps({
        "section": "pathfinder", "target": "polynomial",
        "chains": n_chains, "samples": num_samples, **rows,
    }), flush=True)
    return rows


if __name__ == "__main__":
    from binf_tpu.io.cache import enable_persistent_cache
    from binf_tpu.io.health import wait_for_device_health

    enable_persistent_cache()
    if jax.default_backend() != "cpu" and not wait_for_device_health():
        sys.exit(1)
    _progress(f"device: {jax.devices()[0].device_kind}")

    on_cpu = jax.default_backend() == "cpu"
    chains = int(os.environ.get("BENCH_ALG_CHAINS", 64 if on_cpu else 2048))
    steps = int(os.environ.get("BENCH_ALG_STEPS", 20 if on_cpu else 200))
    sections = sys.argv[1:] or ["trajectory", "metric", "smc", "pathfinder"]

    if "trajectory" in sections:
        for target in ("correlated", "hierarchical"):
            bench_trajectory(target, n_chains=chains, num_steps=steps)
    if "metric" in sections:
        bench_metric(
            n_chains=64 if on_cpu else 16384,
            num_samples=20 if on_cpu else 1000,
        )
    if "smc" in sections:
        bench_smc(n_particles=512 if on_cpu else 8192)
    if "pathfinder" in sections:
        bench_pathfinder_init(
            n_chains=64 if on_cpu else 16384,
            num_samples=20 if on_cpu else 1000,
        )
