#!/usr/bin/env python
"""Chain-grid kernel vs XLA on the chromatin restraint workload (TPU).

Round-5 measurement for the data-heavy regime: the chains-in-lanes fused
kernel cannot compile chromatin (203 MB scoped VMEM at a 128-lane tile,
round-4 boundary); the chain-grid kernel evaluates the Gram-form density
at natural per-chain shapes, so VMEM holds one chain block + one copy of
the (N, N) constants.  Times the sampling phase (identical calibration)
for:

* chain-grid fused, S in {8, 16, 32} (the kernel requires S % 8 == 0);
* XLA scan(vmap(hmc)) on the SAME Gram-form density;
* XLA scan(vmap(hmc)) on the original broadcast-form density (what the
  router shipped in round 4).

Prints one JSON line per configuration.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.bench_models import timeit


def main():
    from binf_tpu.example.chromatin import (
        make_chromatin_posterior,
        make_gram_logdensity,
        synthetic_restraints,
    )
    from binf_tpu.ops.pallas.chain_grid import (
        chain_grid_hmc_run,
        chain_grid_potential_from_scalar,
    )
    from binf_tpu.parallel.runner import init_chains, run_chains
    from binf_tpu.pdf.transforms import LogTransform, transform_logdensity
    from binf_tpu.samplers.adaptation import window_adaptation
    from binf_tpu.samplers.hmc import hmc

    on_cpu = jax.default_backend() == "cpu"
    n_beads = int(os.environ.get("CG_BEADS", "64"))
    n_chains = int(os.environ.get("CG_CHAINS", "64" if on_cpu else "2048"))
    steps = int(os.environ.get("CG_STEPS", "20" if on_cpu else "200"))
    warm_steps = 50 if on_cpu else 200
    L = 10

    key = jax.random.key(0)
    X_true, logD, W = synthetic_restraints(key, n_beads, observe_frac=0.3)
    X_true, logD, W = jax.device_get((X_true, logD, W))
    posterior = jax.device_get(make_chromatin_posterior(logD, W, use_pallas=False))
    base = transform_logdensity(
        lambda p: posterior.log_prob(p), {"precision": LogTransform}
    )
    gram = make_gram_logdensity(logD, W)

    k1 = jax.random.key(1)
    positions = {
        "structure": jnp.asarray(X_true)[None]
        + 0.1 * jax.random.normal(k1, (n_chains, n_beads, 3)),
        "precision": jnp.full((n_chains,), float(np.log(20.0))),
    }

    # calibration: XLA window adaptation on the gram density (not timed)
    def builder(step_size, inverse_mass):
        return hmc(gram, step_size, L, inverse_mass)

    t0 = time.perf_counter()

    @jax.jit
    def warm(pos, k):
        states = jax.vmap(builder(0.01, None).init)(pos)
        return window_adaptation(builder, states, k, num_steps=warm_steps,
                                 initial_step_size=0.01)

    adapt = warm(positions, jax.random.key(2))
    jax.block_until_ready(adapt.step_size)
    eps = float(adapt.step_size)
    im = jax.device_get(adapt.inverse_mass)
    q0 = jax.device_get(adapt.final_states.position)
    print(f"# warmup {time.perf_counter() - t0:.1f}s eps={eps:.5f}",
          file=sys.stderr, flush=True)

    pot, consts, _ = chain_grid_potential_from_scalar(
        gram, jax.tree.map(lambda a: a[0], positions)
    )
    results = []
    for S in (8, 16, 32):
        cg = lambda q, s: chain_grid_hmc_run(
            pot, q, s, eps, im, consts, num_steps=steps, num_leapfrog=L,
            block_chains=S, steps_per_block=min(50, steps),
            interpret=on_cpu, host_noise=on_cpu,
        )
        try:
            t, res = timeit(cg, q0, 7, iters=2 if on_cpu else 5)
        except Exception as e:
            print(json.dumps({"config": f"chain_grid_S{S}",
                              "error": str(e).split(chr(10))[0][:150]}),
                  flush=True)
            continue
        rec = {"config": f"chain_grid_S{S}", "ms": round(t * 1e3, 2),
               "accept": round(float(res.accept_rate), 3)}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    for dname, density in (("xla_gram", gram), ("xla_base", base)):
        kernel = hmc(density, eps, L, im)
        states = init_chains(kernel, q0)

        def xla_run(states, k):
            final, (samples, acc) = run_chains(
                kernel, k, states, steps,
                collect=lambda st, info: (st.position["precision"],
                                          info.accepted),
            )
            return final.position, samples, acc

        t, (_, _, acc) = timeit(jax.jit(xla_run), states, jax.random.key(9),
                                iters=2 if on_cpu else 5)
        rec = {"config": dname, "ms": round(t * 1e3, 2),
               "accept": round(float(jax.jit(jnp.mean)(acc)), 3)}
        results.append(rec)
        print(json.dumps(rec), flush=True)
    return results


if __name__ == "__main__":
    from binf_tpu.io.cache import enable_persistent_cache
    from binf_tpu.io.health import wait_for_device_health

    enable_persistent_cache()
    if jax.default_backend() != "cpu" and not wait_for_device_health():
        sys.exit(1)
    main()
