#!/usr/bin/env python
"""State-space (AR(1) trajectory) demo: fused whole-run HMC on a scan model.

The forward model is a genuinely sequential ``lax.scan`` (every observation
depends on the whole parameter history) — the workload class the reference's
DSL claims (any ``AbstractForwardModel``, reference
``binf/model/forwardmodels.py:10-66``) but only ever instantiates with
feed-forward array math.  Here the scan lowers INTO the fused Pallas kernel
through the lane-batching interpreter, so warmup + sampling run as one
device program; an XLA NUTS run cross-checks the posterior.

Run: python examples/run_statespace.py [--chains 1024] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=1024)
    ap.add_argument("--timesteps", type=int, default=64)
    ap.add_argument("--warmup", type=int, default=400)
    ap.add_argument("--samples", type=int, default=500)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--persistent-cache", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.persistent_cache:
        from binf_tpu.io.cache import enable_persistent_cache

        enable_persistent_cache()

    import jax.numpy as jnp
    import numpy as np

    from binf_tpu.diagnostics import summary
    from binf_tpu.example.statespace import (
        TRUE_DYNAMICS,
        TRUE_PRECISION,
        initial_positions,
        make_ar1_posterior,
        synthetic_ar1_data,
    )
    from binf_tpu.parallel.runner import warmup_and_run
    from binf_tpu.pdf.transforms import LogTransform, transform_logdensity
    from binf_tpu.samplers.fused import fused_model_hmc
    from binf_tpu.samplers.nuts import nuts

    key = jax.random.key(0)
    y = synthetic_ar1_data(key, args.timesteps)
    post = make_ar1_posterior(y)
    print(f"AR(1) trajectory: {args.timesteps} timesteps, "
          f"{args.chains} chains, device={jax.devices()[0].device_kind}")

    logdensity = transform_logdensity(
        lambda p: post.log_prob(p), {"precision": LogTransform}
    )
    pos = initial_positions(args.chains, key=jax.random.key(1))
    pos = {**pos, "precision": jnp.log(pos["precision"])}

    # -- fused whole-run kernel (scan model inside Pallas) ----------------
    t0 = time.perf_counter()
    result = fused_model_hmc(
        logdensity, pos, jax.random.key(2),
        num_warmup=args.warmup, num_samples=args.samples,
        block_chains=min(512, args.chains), warmup="fused",
    )
    jax.block_until_ready(result.samples["dynamics"])
    elapsed = time.perf_counter() - t0

    burn = args.samples // 4
    dyn = np.asarray(result.samples["dynamics"][burn:])
    prec = np.exp(np.asarray(result.samples["precision"][burn:])).mean()
    stats = summary({"dynamics": result.samples["dynamics"][burn:]})
    print(f"fused HMC: {args.samples * args.chains:,} draws in {elapsed:.1f}s "
          f"(accept {float(result.accept_rate):.2f})")
    m = dyn.reshape(-1, 3).mean(0)
    print(f"dynamics = [{m[0]:+.3f} {m[1]:+.3f} {m[2]:+.3f}]   "
          f"truth {TRUE_DYNAMICS}  "
          f"rhat {np.asarray(stats['dynamics']['rhat']).round(3)}")
    print(f"precision ~ {prec:.1f}   truth {TRUE_PRECISION}")

    # -- XLA NUTS cross-check ---------------------------------------------
    def builder(step_size, inverse_mass):
        return nuts(logdensity, step_size=step_size, max_doublings=6,
                    inverse_mass=inverse_mass)

    n_ref = min(args.chains, 64)
    ref_pos = jax.tree.map(lambda x: x[:n_ref], pos)
    t0 = time.perf_counter()
    samples, _, _ = warmup_and_run(
        builder, ref_pos, jax.random.key(3),
        num_warmup=300, num_samples=300,
    )
    jax.block_until_ready(samples["dynamics"])
    ref = np.asarray(samples["dynamics"][75:]).reshape(-1, 3).mean(0)
    print(f"NUTS cross-check ({time.perf_counter()-t0:.1f}s): "
          f"dynamics = {ref.round(3)}  (max |delta| "
          f"{np.abs(ref - m).max():.3f})")


if __name__ == "__main__":
    main()
