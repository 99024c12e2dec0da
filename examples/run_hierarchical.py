#!/usr/bin/env python
"""Hierarchical nonlinear model demo: window-adapted NUTS + ADVI cross-check.

BASELINE config 4 workload: G logistic growth curves with partial pooling,
observed through a Gaussian channel (curve points) and a Poisson channel
(per-group event counts) sharing the group parameters.

Run: python examples/run_hierarchical.py [--groups 8] [--chains 32] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--groups", type=int, default=8)
    ap.add_argument("--chains", type=int, default=32)
    ap.add_argument("--warmup", type=int, default=400)
    ap.add_argument("--samples", type=int, default=400)
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
    from binf_tpu.example.hierarchical import (
        TRUE_MU,
        TRUE_TAU,
        make_hierarchical_posterior,
        synthetic_hierarchical_data,
    )
    from binf_tpu.parallel.runner import warmup_and_run
    from binf_tpu.pdf.transforms import LogTransform, transform_logdensity
    from binf_tpu.samplers.nuts import nuts
    from binf_tpu.vi import advi, variational_sample

    key = jax.random.key(0)
    x, y, counts, gp_true = synthetic_hierarchical_data(key, args.groups)
    post = make_hierarchical_posterior(x, y, counts, args.groups)
    print(f"{args.groups} groups, {y.shape[0]} curve points + "
          f"{args.groups} Poisson counts, device={jax.devices()[0].device_kind}")

    logdensity = transform_logdensity(
        lambda p: post.log_prob(p), {"precision": LogTransform}
    )

    def builder(step_size, inverse_mass):
        return nuts(logdensity, step_size=step_size, max_doublings=7,
                    inverse_mass=inverse_mass)

    n = args.chains
    positions = {
        "group_params": 0.1 * jax.random.normal(jax.random.key(1), (n, args.groups, 2)),
        "mu": jnp.zeros((n, 2)),
        "log_tau": jnp.full((n, 2), -1.0),
        "precision": jnp.full((n,), 2.0),
    }
    t0 = time.perf_counter()
    samples, final, adapt = warmup_and_run(
        builder, positions, jax.random.key(2),
        num_warmup=args.warmup, num_samples=args.samples,
        initial_step_size=0.05, target_accept=0.85,
    )
    jax.block_until_ready(samples["mu"])
    elapsed = time.perf_counter() - t0

    n_draws = args.samples * n
    print(f"NUTS: {n_draws:,} draws in {elapsed:.1f}s "
          f"(eps={float(adapt.step_size):.3f})")
    stats = summary({"mu": samples["mu"], "log_tau": samples["log_tau"]})
    mu = np.asarray(stats["mu"]["mean"])
    tau = np.exp(np.asarray(samples["log_tau"]).reshape(-1, 2).mean(0))
    print(f"mu     = [{mu[0]:+.3f} {mu[1]:+.3f}]   truth {TRUE_MU}  "
          f"rhat {np.asarray(stats['mu']['rhat']).round(3)}")
    print(f"tau    ~ [{tau[0]:.3f} {tau[1]:.3f}]   truth {TRUE_TAU}")
    prec = np.exp(np.asarray(samples["precision"]).ravel()).mean()
    print(f"precision ~ {prec:.1f}   truth 25.0")

    t0 = time.perf_counter()
    fit = jax.jit(lambda k: advi(post, k, num_steps=2500, learning_rate=0.02))(
        jax.random.key(3)
    )
    vi = variational_sample(post, fit, jax.random.key(4), 1000)
    jax.block_until_ready(vi["mu"])
    print(f"ADVI ({time.perf_counter()-t0:.1f}s): "
          f"mu = {np.asarray(vi['mu']).mean(0).round(3)}  "
          f"ELBO = {float(fit.final_elbo):.1f}")


if __name__ == "__main__":
    main()
