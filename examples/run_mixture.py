#!/usr/bin/env python
"""Gaussian-mixture demo: fused whole-run HMC on a sort/logsumexp model.

The density sorts the component means in-model (identifiability under label
switching) and reduces a per-point ``logsumexp`` over components — graph
shapes the reference's per-point Python loops cannot vectorize.  Both lower
into the fused Pallas kernel via the lane-batching interpreter (sort becomes
a bitonic network over sublanes).  After sampling, posterior-mean
responsibilities classify held-out points.

Run: python examples/run_mixture.py [--chains 1024] [--cpu]
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
    ap.add_argument("--points", type=int, default=240)
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
    from binf_tpu.example.mixture import (
        TRUE_MEANS,
        TRUE_SIGMA,
        TRUE_WEIGHTS,
        classify,
        initial_positions,
        make_mixture_posterior,
        synthetic_mixture_data,
    )
    from binf_tpu.samplers.fused import fused_model_hmc

    key = jax.random.key(0)
    y = synthetic_mixture_data(key, args.points)
    post = make_mixture_posterior(y)
    print(f"Gaussian mixture: {args.points} points, 3 components, "
          f"{args.chains} chains, device={jax.devices()[0].device_kind}")

    logdensity = lambda p: post.log_prob(p)
    pos = initial_positions(args.chains, key=jax.random.key(1))

    t0 = time.perf_counter()
    result = fused_model_hmc(
        logdensity, pos, jax.random.key(2),
        num_warmup=args.warmup, num_samples=args.samples,
        block_chains=min(512, args.chains), warmup="fused",
    )
    jax.block_until_ready(result.samples["means"])
    elapsed = time.perf_counter() - t0

    burn = args.samples // 4
    flat = {k: np.asarray(v[burn:]).reshape(-1, *v.shape[2:])
            for k, v in result.samples.items()}
    mus = np.sort(flat["means"], axis=1).mean(0)
    logw = flat["log_weights"]
    w = np.exp(logw - np.log(np.exp(logw).sum(1, keepdims=True))).mean(0)
    sigma = np.exp(flat["log_sigma"]).mean()
    stats = summary({"means": jnp.sort(result.samples["means"][burn:], axis=-1)})

    print(f"fused HMC: {args.samples * args.chains:,} draws in {elapsed:.1f}s "
          f"(accept {float(result.accept_rate):.2f})")
    print(f"means   = {mus.round(3)}   truth {np.sort(TRUE_MEANS)}  "
          f"rhat {np.asarray(stats['means']['rhat']).round(3)}")
    print(f"weights = {w.round(3)}   truth {TRUE_WEIGHTS}")
    print(f"sigma   ~ {sigma:.3f}   truth {TRUE_SIGMA}")

    # posterior-predictive classification of held-out points
    y_new = synthetic_mixture_data(jax.random.key(9), 32)
    sub = {k: jnp.asarray(v[:: max(1, len(v) // 256)]) for k, v in flat.items()}
    labels = classify(y_new, sub)
    # accuracy against nearest-true-mean assignment
    true_labels = np.argmin(
        np.abs(np.asarray(y_new)[:, None] - np.sort(TRUE_MEANS)[None, :]), axis=1
    )
    acc = float((np.asarray(labels) == true_labels).mean())
    print(f"held-out classification vs nearest-true-mean: {acc:.0%} agreement")


if __name__ == "__main__":
    main()
