#!/usr/bin/env python
"""Bayesian logistic regression demo: fused-kernel HMC + Laplace cross-check.

A Bernoulli GLM on the model DSL (LinearForwardModel + BernoulliErrorModel):
recovers the weights, reports the null feature's credible interval, and
prints held-out predictive accuracy from the posterior-predictive mean.

Run: python examples/run_logistic.py [--chains 512] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--chains", type=int, default=512)
    ap.add_argument("--warmup", type=int, default=400)
    ap.add_argument("--samples", type=int, default=600)
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
    from binf_tpu.example.logistic import (
        TRUE_WEIGHTS,
        initial_positions,
        make_logistic_posterior,
        predict_proba,
        synthetic_logistic_data,
    )
    from binf_tpu.samplers.fused import fused_model_hmc

    print(f"backend: {jax.default_backend()}  devices: {len(jax.devices())}")

    X, y = synthetic_logistic_data(jax.random.key(0), args.n)
    X_test, y_test = synthetic_logistic_data(jax.random.key(7), 500)
    post = make_logistic_posterior(X, y)
    d = X.shape[1]

    t0 = time.time()
    result = fused_model_hmc(
        lambda p: post.log_prob(p),
        initial_positions(args.chains, jax.random.key(1)),
        jax.random.key(2),
        num_warmup=args.warmup,
        num_samples=args.samples,
        num_leapfrog=10,
    )
    jax.block_until_ready(result.samples)
    elapsed = time.time() - t0
    n_draws = args.samples * args.chains
    print(f"fused HMC: {elapsed:.1f}s  ({n_draws / elapsed:,.0f} draws/s)  "
          f"accept {float(result.accept_rate):.2f}")

    keep = args.samples // 3
    w = result.samples["weights"][keep:]
    stats = summary({"weights": w})["weights"]
    print(f"\n{'':12s}{'true':>8s}{'mean':>8s}{'sd':>8s}{'rhat':>8s}")
    for j in range(d):
        print(f"weight[{j}]   {TRUE_WEIGHTS[j]:8.2f}{stats['mean'][j]:8.2f}"
              f"{stats['std'][j]:8.2f}{stats['rhat'][j]:8.3f}")

    flat = np.asarray(w).reshape(-1, d)
    lo, hi = np.percentile(flat[:, 3], [2.5, 97.5])
    print(f"\nnull feature 95% CI: [{lo:+.2f}, {hi:+.2f}] "
          f"({'contains 0' if lo < 0 < hi else 'EXCLUDES 0'})")

    p_test = np.asarray(predict_proba(X_test, jnp.asarray(flat[::7])))
    acc = ((p_test > 0.5) == np.asarray(y_test)).mean()
    print(f"held-out predictive accuracy: {acc:.3f}")

    # Laplace cross-check (MAP should sit at the posterior mean for n=200)
    from binf_tpu.vi import laplace_approximation

    lap = jax.jit(lambda k: laplace_approximation(post, k, num_steps=1500))(
        jax.random.key(3)
    )
    gap = np.abs(np.asarray(lap.mode["weights"]) - flat.mean(0)).max()
    print(f"Laplace MAP vs MCMC mean: max gap {gap:.3f} "
          f"(converged={bool(lap.converged)})")


if __name__ == "__main__":
    main()
