#!/usr/bin/env python
"""Microbenchmarks: Pallas TPU kernels vs their XLA reference paths.

Run on real TPU hardware; prints one JSON line per kernel to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_leapfrog():
    from binf_tpu.ops.pallas.leapfrog import (
        quadratic_leapfrog,
        quadratic_leapfrog_reference,
    )

    C, D, L = 8192, 128, 32
    key = jax.random.key(0)
    M = jax.random.normal(key, (D, D)) * 0.05
    A = M @ M.T + jnp.eye(D)
    b = jax.random.normal(jax.random.key(1), (D,))
    q = jax.random.normal(jax.random.key(2), (C, D))
    p = jax.random.normal(jax.random.key(3), (C, D))

    pallas_fn = jax.jit(
        lambda q, p: quadratic_leapfrog(q, p, A, b, 0.01, L, block_chains=512)
    )
    ref_fn = jax.jit(
        lambda q, p: quadratic_leapfrog_reference(q, p, A, b, 0.01, L)
    )

    # numerical agreement on-hardware
    qp_p = pallas_fn(q, p)
    qp_r = ref_fn(q, p)
    err = max(
        float(jnp.max(jnp.abs(qp_p[0] - qp_r[0]))),
        float(jnp.max(jnp.abs(qp_p[1] - qp_r[1]))),
    )

    t_pallas = timeit(pallas_fn, q, p)
    t_ref = timeit(ref_fn, q, p)
    flops = 2 * C * D * D * (L + 2)
    print(
        json.dumps(
            {
                "kernel": "quadratic_leapfrog",
                "shape": f"C={C} D={D} L={L}",
                "pallas_ms": round(t_pallas * 1e3, 3),
                "xla_ms": round(t_ref * 1e3, 3),
                "speedup": round(t_ref / t_pallas, 2),
                "pallas_tflops": round(flops / t_pallas / 1e12, 2),
                "max_err": err,
            }
        )
    )


def bench_pairwise():
    from binf_tpu.ops.pallas.pairwise import (
        pairwise_restraint_loss_pallas,
        pairwise_restraint_loss_reference,
    )

    N = 2048
    key = jax.random.key(0)
    X = jax.random.normal(key, (N, 3)) * 2.0
    raw = jax.random.uniform(jax.random.key(1), (N, N))
    W = ((raw + raw.T) < 0.4).astype(jnp.float32) * (1.0 - jnp.eye(N))
    diff = X[:, None, :] - X[None, :, :]
    d = jnp.sqrt(jnp.maximum(jnp.sum(diff**2, -1), 1e-12))
    logD = jnp.log(d + 0.2)

    pallas_fwd = jax.jit(lambda X: pairwise_restraint_loss_pallas(X, logD, W))
    ref_fwd = jax.jit(lambda X: pairwise_restraint_loss_reference(X, logD, W))
    pallas_grad = jax.jit(jax.grad(lambda X: pairwise_restraint_loss_pallas(X, logD, W)))
    ref_grad = jax.jit(jax.grad(lambda X: pairwise_restraint_loss_reference(X, logD, W)))

    err_f = abs(float(pallas_fwd(X)) - float(ref_fwd(X))) / abs(float(ref_fwd(X)))
    err_g = float(jnp.max(jnp.abs(pallas_grad(X) - ref_grad(X))))

    t_pf, t_rf = timeit(pallas_fwd, X), timeit(ref_fwd, X)
    t_pg, t_rg = timeit(pallas_grad, X), timeit(ref_grad, X)
    print(
        json.dumps(
            {
                "kernel": "pairwise_restraint_loss",
                "shape": f"N={N}",
                "fwd_pallas_ms": round(t_pf * 1e3, 3),
                "fwd_xla_ms": round(t_rf * 1e3, 3),
                "fwd_speedup": round(t_rf / t_pf, 2),
                "grad_pallas_ms": round(t_pg * 1e3, 3),
                "grad_xla_ms": round(t_rg * 1e3, 3),
                "grad_speedup": round(t_rg / t_pg, 2),
                "rel_err_fwd": err_f,
                "max_err_grad": err_g,
            }
        )
    )


if __name__ == "__main__":
    from binf_tpu.io.cache import enable_persistent_cache
    from binf_tpu.io.health import wait_for_device_health

    enable_persistent_cache()
    if jax.default_backend() != "cpu" and not wait_for_device_health():
        sys.exit(1)
    print(f"# device: {jax.devices()[0].device_kind}", file=sys.stderr)
    bench_leapfrog()
    bench_pairwise()
