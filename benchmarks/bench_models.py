#!/usr/bin/env python
"""Fused whole-run kernel vs XLA `scan(vmap(hmc))` across model families.

Round-3 VERDICT item 9: the lane-batching interpreter's scan / sort /
logsumexp / mixture rules are correctness-tested on CPU; this records their
TPU speedup at production chain counts.  Per family (statespace AR(1),
Gaussian mixture, hierarchical two-channel, polynomial reference workload):

1. build the posterior + unconstrained log density exactly as the CLI does;
2. calibrate (step size, shared diagonal inverse mass) with the in-kernel
   fused warmup (single dispatch; NOT timed — calibration only), reduced to
   one scalar eps (median over chains) and one shared metric (mean) so BOTH
   timed paths integrate with identical settings;
3. time the sampling phase: the fused kernel (`fused_potential_hmc_run`)
   against the XLA path (`run_chains(hmc(...))`), same chains/steps/L, both
   steady-state (1 warm call, then mean over reps with block_until_ready).

Prints one JSON line per family.
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


def timeit(fn, *args, iters=5):
    """Pipelined steady-state: dispatch all reps, block once (throughput)."""
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def timeit_blocked(fn, *args, iters=5):
    """Serialized: block every rep (single-run latency incl. dispatch)."""
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / iters


def bench_family(
    name: str, n_chains: int, num_steps: int, num_leapfrog: int,
    block_chains: int | None = None,
):
    from binf_tpu.cli import _unconstrain_batch, build_model
    from binf_tpu.ops.pallas.fused_potential import (
        fused_potential_hmc_run,
        fused_warmup_run,
        pack_positions,
        tile_potential_from_scalar,
        unpack_draws,
    )
    from binf_tpu.parallel.runner import init_chains, run_chains
    from binf_tpu.pdf.transforms import transform_logdensity
    from binf_tpu.samplers.auto import route_algorithm
    from binf_tpu.samplers.hmc import hmc

    key = jax.random.key(0)
    posterior, init_fn, transforms = build_model(name, key)
    # pull model data to host: closure-captured DEVICE arrays lower as MLIR
    # constants, forcing a device->host fetch inside jit lowering (slow /
    # deadlock-prone over the remote-TPU tunnel); numpy constants don't
    posterior = jax.device_get(posterior)
    logdensity = transform_logdensity(lambda p: posterior.log_prob(p), transforms)
    positions = _unconstrain_batch(
        transforms, init_fn(n_chains, key=jax.random.key(1))
    )

    # framework-default routing (samplers/auto.py): which path would
    # `--algorithm auto` run here, and at which chain tile?  The fused
    # timing below uses the router's tile unless BENCH_MODEL_BC overrides,
    # so default_vs_best measures what the default actually executes.
    decision = route_algorithm(logdensity, positions)
    if block_chains is None:
        block_chains = decision.block_chains or 512

    template = jax.tree.map(lambda x: x[0], positions)
    potential, consts, spec = tile_potential_from_scalar(logdensity, template)
    q0 = pack_positions(positions, spec)
    D = q0.shape[1]
    on_cpu = jax.default_backend() == "cpu"  # interpret-mode shakeout runs

    # -- calibration (not timed): in-kernel Stan-window warmup ------------
    t0 = time.perf_counter()
    warm = jax.jit(
        functools.partial(
            fused_warmup_run,
            potential,
            num_warmup=400 if not on_cpu else 100,
            num_leapfrog=num_leapfrog,
            block_chains=min(block_chains, n_chains),
            init_search=True,
            interpret=on_cpu,
            host_noise=on_cpu,
        )
    )
    q1, eps_c, im_c = warm(q0, 7, 1.0, consts)
    jax.block_until_ready(q1)
    # reduce to host scalars/arrays so downstream kernel closures hold
    # numpy constants, not device arrays (see note above)
    eps = float(jax.jit(jnp.median)(eps_c))
    im = jax.device_get(jax.jit(lambda x: jnp.mean(x, axis=0))(im_c))
    print(
        f"# {name}: warmup {time.perf_counter() - t0:.1f}s "
        f"eps={float(eps):.4f} D={D}",
        file=sys.stderr, flush=True,
    )

    # -- fused sampling path (eps/im ride as runtime args) -----------------
    fused = lambda q, s: fused_potential_hmc_run(
        potential, q, s, eps, im, consts,
        num_steps=num_steps, num_leapfrog=num_leapfrog,
        block_chains=min(block_chains, n_chains),
        steps_per_block=min(50, num_steps),
        interpret=on_cpu,
        host_noise=on_cpu,
    )
    t_fused, fres = timeit(fused, q1, 7)
    t_fused_blk = timeit_blocked(fused, q1, 7)

    # -- XLA path (im_tree is numpy -> plain constants in the jit) ---------
    import numpy as np

    im_tree, off = {}, 0
    for vname, vshape, vsize in spec:
        im_tree[vname] = np.asarray(im[off : off + vsize]).reshape(vshape)
        off += vsize
    kernel = hmc(logdensity, eps, num_leapfrog, im_tree)
    pos1 = jax.tree.map(lambda x: x[0], unpack_draws(q1[None], spec))  # (C, ...)
    states = init_chains(kernel, pos1)

    def xla_run(states, key):
        # collect positions AND acceptance: the fused kernel stores draws
        # too, so both paths pay the draw-output HBM traffic
        final, (samples, acc) = run_chains(
            kernel, key, states, num_steps,
            collect=lambda state, info: (state.position, info.accepted),
        )
        return final.position, samples, acc

    xla = jax.jit(xla_run)
    t_xla, (xpos, _, xacc) = timeit(xla, states, jax.random.key(9))
    t_xla_blk = timeit_blocked(xla, states, jax.random.key(9))

    # default_vs_best = t(best of both) / t(routed path): 1.0 means the
    # router chose the winner; < 1.0 quantifies a routing loss.
    t_default = t_fused if decision.path == "fused" else t_xla
    t_best = min(t_fused, t_xla)

    rec = {
        "family": name,
        "chains": n_chains,
        "steps": num_steps,
        "L": num_leapfrog,
        "D": D,
        "routed": decision.path,
        "default_vs_best": round(t_best / t_default, 2),
        "fused_ms": round(t_fused * 1e3, 2),
        "xla_ms": round(t_xla * 1e3, 2),
        "speedup": round(t_xla / t_fused, 2),
        "fused_ms_blocked": round(t_fused_blk * 1e3, 2),
        "xla_ms_blocked": round(t_xla_blk * 1e3, 2),
        "speedup_blocked": round(t_xla_blk / t_fused_blk, 2),
        "block_chains": block_chains,
        "fused_accept": round(float(fres.accept_rate), 3),
        "xla_accept": round(float(jax.jit(jnp.mean)(xacc)), 3),
        "grad_evals_per_s_fused": round(
            n_chains * num_steps * (num_leapfrog + 1) / t_fused
        ),
    }
    print(json.dumps(rec), flush=True)
    return rec


if __name__ == "__main__":
    from binf_tpu.io.cache import enable_persistent_cache
    from binf_tpu.io.health import wait_for_device_health

    enable_persistent_cache()
    if jax.default_backend() != "cpu" and not wait_for_device_health():
        sys.exit(1)
    print(f"# device: {jax.devices()[0].device_kind}", file=sys.stderr)
    families = sys.argv[1:] or ["statespace", "mixture", "hierarchical", "polynomial"]
    on_cpu = jax.default_backend() == "cpu"
    chains = int(os.environ.get("BENCH_MODEL_CHAINS", 64 if on_cpu else 8192))
    steps = int(os.environ.get("BENCH_MODEL_STEPS", 50 if on_cpu else 500))
    bc_env = os.environ.get("BENCH_MODEL_BC")
    for fam in families:
        bench_family(fam, n_chains=chains, num_steps=steps, num_leapfrog=10,
                     block_chains=int(bc_env) if bc_env else None)
