#!/usr/bin/env python
"""NUTS lockstep cost vs max_doublings on the hierarchical target (TPU).

Round-5 VERDICT item 5: the masked fixed-shape NUTS tree does
worst-case-depth work for every chain whenever any chain keeps doubling
(measured 119x fixed-L wall on this target, round 4).  This measures the
actual depth distribution and whether capping max_doublings at a running
quantile recovers the wall time -- or whether the negative result stands
and "NUTS only when gradients are scarce" goes into the router.

Prints one JSON line per configuration.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.bench_models import timeit


def main():
    from binf_tpu.cli import _unconstrain_batch, build_model
    from binf_tpu.parallel.runner import init_chains, run_chains
    from binf_tpu.pdf.transforms import transform_logdensity
    from binf_tpu.samplers.adaptation import window_adaptation
    from binf_tpu.samplers.hmc import hmc
    from binf_tpu.samplers.nuts import nuts

    on_cpu = jax.default_backend() == "cpu"
    C = int(os.environ.get("ND_CHAINS", "64" if on_cpu else "2048"))
    steps = int(os.environ.get("ND_STEPS", "10" if on_cpu else "200"))

    key = jax.random.key(0)
    posterior, init_fn, transforms = build_model("hierarchical", key)
    posterior = jax.device_get(posterior)
    logdensity = transform_logdensity(
        lambda p: posterior.log_prob(p), transforms
    )
    positions = _unconstrain_batch(
        transforms, init_fn(C, key=jax.random.key(1))
    )

    def builder(step_size, inverse_mass):
        return hmc(logdensity, step_size, 10, inverse_mass)

    @jax.jit
    def warm(pos, k):
        states = jax.vmap(builder(0.05, None).init)(pos)
        return window_adaptation(builder, states, k,
                                 num_steps=50 if on_cpu else 300,
                                 initial_step_size=0.05)

    adapt = warm(positions, jax.random.key(2))
    eps = float(adapt.step_size)
    im = jax.device_get(adapt.inverse_mass)
    q0 = jax.device_get(adapt.final_states.position)
    print(f"# eps={eps:.4f}", file=sys.stderr, flush=True)

    # fixed-L anchor
    kern_fixed = hmc(logdensity, eps, 10, im)

    def run_kernel(kernel, collect):
        states = init_chains(kernel, q0)

        def go(states, k):
            final, out = run_chains(kernel, k, states, steps, collect=collect)
            return final.position, out

        return timeit(jax.jit(go), states, jax.random.key(9),
                      iters=2 if on_cpu else 3)

    t_fix, _ = run_kernel(
        kern_fixed, lambda st, info: (st.position["mu"], info.accepted)
    )
    print(json.dumps({"config": "fixed_L10", "ms": round(t_fix * 1e3, 1)}),
          flush=True)

    for D in (4, 5, 6, 8):
        kern = nuts(logdensity, eps, max_doublings=D, inverse_mass=im)
        t, (_, out) = run_kernel(
            kern,
            lambda st, info: (info.num_doublings, info.acceptance_prob),
        )
        depths = np.asarray(out[0])
        print(json.dumps({
            "config": f"nuts_D{D}", "ms": round(t * 1e3, 1),
            "vs_fixed": round(t / t_fix, 1),
            "depth_mean": round(float(depths.mean()), 2),
            "depth_q50": int(np.quantile(depths, 0.5)),
            "depth_q90": int(np.quantile(depths, 0.9)),
            "accept": round(float(np.asarray(out[1]).mean()), 3),
        }), flush=True)


if __name__ == "__main__":
    from binf_tpu.io.cache import enable_persistent_cache
    from binf_tpu.io.health import wait_for_device_health

    enable_persistent_cache()
    if jax.default_backend() != "cpu" and not wait_for_device_health():
        sys.exit(1)
    main()
