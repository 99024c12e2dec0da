#!/usr/bin/env python
"""Shape sweep: find the regimes where the standalone Pallas kernels beat XLA.

Round-3 VERDICT item 4: at the single recorded shape (C=8192, D=128, L=32 /
N=2048) both `quadratic_leapfrog` and `pairwise_restraint_loss` measured at
or slightly below XLA.  This sweep probes the VMEM-residency hypothesis:
larger D (state dim) and L (trajectory length) raise the XLA path's per-step
HBM round-trips of (C, D) position/momentum buffers, while the Pallas kernel
keeps them VMEM-resident; larger N raises the XLA pairwise path's temporary
materialization.  Prints one JSON line per shape.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def sweep_leapfrog():
    from binf_tpu.ops.pallas.leapfrog import (
        quadratic_leapfrog,
        quadratic_leapfrog_reference,
    )

    shapes = [
        # (C, D, L, block_chains)
        (8192, 128, 32, 512),      # recorded round-1 shape (loses)
        (8192, 128, 128, 512),
        (2048, 512, 64, 256),
        (2048, 512, 128, 256),
        (1024, 1024, 64, 128),
        (1024, 1024, 128, 128),
        (4096, 256, 64, 512),
        (4096, 256, 128, 512),
    ]
    for C, D, L, bc in shapes:
        key = jax.random.key(0)
        M = jax.random.normal(key, (D, D)) * (0.05 * (128.0 / D) ** 0.5)
        A = M @ M.T + jnp.eye(D)
        b = jax.random.normal(jax.random.key(1), (D,))
        q = jax.random.normal(jax.random.key(2), (C, D))
        p = jax.random.normal(jax.random.key(3), (C, D))

        # NB: pass A/b as ARGUMENTS, never close over device arrays inside a
        # jit -- a closure-captured device array lowers as an MLIR constant,
        # which forces a device->host fetch during lowering (pathological /
        # deadlock-prone over the remote-TPU tunnel).
        ref_jit = jax.jit(quadratic_leapfrog_reference, static_argnums=(5,))
        pallas_fn = lambda q, p, A=A, b=b, L=L, bc=bc: quadratic_leapfrog(
            q, p, A, b, 0.001, L, block_chains=bc
        )
        ref_fn = lambda q, p, A=A, b=b, L=L: ref_jit(q, p, A, b, 0.001, L)
        try:
            t_p = timeit(pallas_fn, q, p)
        except Exception as e:  # VMEM overflow etc.
            print(json.dumps({"kernel": "quadratic_leapfrog",
                              "shape": f"C={C} D={D} L={L} bc={bc}",
                              "error": str(e)[:120]}))
            continue
        t_r = timeit(ref_fn, q, p)
        if os.environ.get("SWEEP_SKIP_CHECKS") == "1":
            # device->host fetches hang when the tunnel's d2h path is down;
            # timings only need block_until_ready.  Agreement is covered by
            # tests (bitwise leapfrog test) and by runs without this flag.
            err = None
        else:
            qp_p = pallas_fn(q, p)
            qp_r = ref_fn(q, p)
            err = float(
                jax.jit(lambda a, b: jnp.max(jnp.abs(a - b)))(qp_p[0], qp_r[0])
            )
        flops = 2 * C * D * D * (L + 2)
        print(json.dumps({
            "kernel": "quadratic_leapfrog",
            "shape": f"C={C} D={D} L={L} bc={bc}",
            "pallas_ms": round(t_p * 1e3, 3),
            "xla_ms": round(t_r * 1e3, 3),
            "speedup": round(t_r / t_p, 3),
            "pallas_tflops": round(flops / t_p / 1e12, 2),
            "max_err": err,
        }), flush=True)


def sweep_pairwise():
    from binf_tpu.ops.pallas.pairwise import (
        pairwise_restraint_loss_pallas,
        pairwise_restraint_loss_reference,
    )

    for N, block in [(2048, 256), (4096, 256), (4096, 512), (8192, 512)]:
        key = jax.random.key(0)
        X = jax.random.normal(key, (N, 3)) * 2.0
        raw = jax.random.uniform(jax.random.key(1), (N, N))
        W = ((raw + raw.T) < 0.4).astype(jnp.float32) * (1.0 - jnp.eye(N))
        diff = X[:, None, :] - X[None, :, :]
        d = jnp.sqrt(jnp.maximum(jnp.sum(diff**2, -1), 1e-12))
        logD = jnp.log(d + 0.2)

        # logD/W as jit ARGUMENTS (see leapfrog note on closure constants)
        p_fwd_j = jax.jit(pairwise_restraint_loss_pallas, static_argnums=(3,))
        r_fwd_j = jax.jit(pairwise_restraint_loss_reference)
        p_grad_j = jax.jit(
            jax.grad(pairwise_restraint_loss_pallas, argnums=0), static_argnums=(3,)
        )
        r_grad_j = jax.jit(jax.grad(pairwise_restraint_loss_reference, argnums=0))
        p_fwd = lambda X: p_fwd_j(X, logD, W, block)
        r_fwd = lambda X: r_fwd_j(X, logD, W)
        p_grad = lambda X: p_grad_j(X, logD, W, block)
        r_grad = lambda X: r_grad_j(X, logD, W)
        try:
            t_pf = timeit(p_fwd, X)
            t_pg = timeit(p_grad, X)
        except Exception as e:
            print(json.dumps({"kernel": "pairwise", "shape": f"N={N} b={block}",
                              "error": str(e)[:120]}))
            continue
        try:
            t_rf = timeit(r_fwd, X)
            t_rg = timeit(r_grad, X)
        except Exception as e:
            t_rf = t_rg = float("nan")
        if os.environ.get("SWEEP_SKIP_CHECKS") == "1":
            err_f = None
        else:
            pv = float(p_fwd(X))
            rv = float(r_fwd(X))
            err_f = abs(pv - rv) / max(abs(rv), 1e-9)
        print(json.dumps({
            "kernel": "pairwise_restraint_loss",
            "shape": f"N={N} block={block}",
            "fwd_pallas_ms": round(t_pf * 1e3, 3),
            "fwd_xla_ms": round(t_rf * 1e3, 3),
            "fwd_speedup": round(t_rf / t_pf, 3),
            "grad_pallas_ms": round(t_pg * 1e3, 3),
            "grad_xla_ms": round(t_rg * 1e3, 3),
            "grad_speedup": round(t_rg / t_pg, 3),
            "rel_err_fwd": err_f,
        }), flush=True)


if __name__ == "__main__":
    from binf_tpu.io.cache import enable_persistent_cache
    from binf_tpu.io.health import wait_for_device_health

    enable_persistent_cache()
    if jax.default_backend() != "cpu" and not wait_for_device_health():
        sys.exit(1)
    print(f"# device: {jax.devices()[0].device_kind}", file=sys.stderr)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "leapfrog"):
        sweep_leapfrog()
    if which in ("all", "pairwise"):
        sweep_pairwise()
