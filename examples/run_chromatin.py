#!/usr/bin/env python
"""Chromatin-style structure determination demo (the reference's science
domain, ``README.rst:9``): infer a 3D polymer structure from noisy pairwise
log-distance restraints.

Pipeline: synthetic ground truth -> Gibbs alternation of [HMC over the
(N, 3) structure (gradients through the blockwise Pallas restraint kernel on
TPU), exact conjugate Gamma draw of the restraint precision].

Run: python examples/run_chromatin.py [--beads 128] [--sweeps 200]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--beads", type=int, default=128)
    ap.add_argument("--sweeps", type=int, default=200)
    ap.add_argument("--hmc-steps", type=int, default=5)
    ap.add_argument("--step-size", type=float, default=3e-3)
    ap.add_argument("--observe-frac", type=float, default=0.3)
    ap.add_argument("--persistent-cache", action="store_true")
    args = ap.parse_args()

    if args.persistent_cache:
        from binf_tpu.io.cache import enable_persistent_cache

        enable_persistent_cache()

    from binf_tpu.example.chromatin import (
        make_chromatin_posterior,
        restraint_precision_block,
        synthetic_restraints,
    )
    from binf_tpu.samplers.gibbs import gibbs, hmc_block

    key = jax.random.key(0)
    X_true, log_target, W = synthetic_restraints(
        key, args.beads, observe_frac=args.observe_frac
    )
    posterior = make_chromatin_posterior(log_target, W, block=min(256, args.beads))
    print(f"{args.beads} beads, {int(np.asarray(W).sum())} restraints, "
          f"device={jax.devices()[0].device_kind}")

    kernel = gibbs({
        "structure": hmc_block(
            posterior, "structure", step_size=args.step_size,
            num_integration_steps=args.hmc_steps,
        ),
        "precision": restraint_precision_block(posterior),
    })

    X0 = X_true + 0.3 * jax.random.normal(jax.random.key(1), X_true.shape)
    state = kernel.init({"structure": X0, "precision": jnp.asarray(5.0)})

    @jax.jit
    def run(state, k):
        def body(s, kk):
            s, infos = kernel.step(kk, s)
            return s, (s.position["precision"], infos["structure"].acceptance_prob)

        return jax.lax.scan(body, state, jax.random.split(k, args.sweeps))

    jax.block_until_ready(run(state, key))  # compile
    t0 = time.perf_counter()
    final, (precs, accs) = run(state, jax.random.key(2))
    jax.block_until_ready(precs)
    elapsed = time.perf_counter() - t0

    n_pairs = float(np.asarray(W).sum()) * args.sweeps * (args.hmc_steps + 2)
    print(f"{args.sweeps} Gibbs sweeps in {elapsed:.2f}s "
          f"({args.sweeps/elapsed:.1f} sweeps/s, "
          f"{n_pairs/elapsed/1e9:.2f} G restraint-evals/s)")
    print(f"HMC acceptance: {float(np.asarray(accs).mean()):.2f}  "
          f"precision estimate: {float(np.asarray(precs)[-50:].mean()):.1f} (truth 25)")

    # structure quality: restrained-pair distance error vs ground truth
    X = np.asarray(final.position["structure"])
    Xt = np.asarray(X_true)

    def dists(A):
        d = A[:, None, :] - A[None, :, :]
        return np.sqrt(np.maximum((d**2).sum(-1), 1e-12))

    mask = np.asarray(W) > 0
    rel = np.abs(dists(X) - dists(Xt))[mask] / np.maximum(dists(Xt)[mask], 0.1)
    print(f"median restrained-distance error vs truth: {np.median(rel):.3f}")


if __name__ == "__main__":
    main()
