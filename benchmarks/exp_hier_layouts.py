#!/usr/bin/env python
"""Round-5 experiment: can any density FORM make hierarchical@8k win fused?

Round-4 measured the general fused kernel at 0.47x vs XLA on the
hierarchical family at 8192 chains (the one fused loss), diagnosed as the
(G, n, BC) 3-D tile graph, and measured a flat-axis rewrite recovering only
11%.  This experiment tries the remaining graph-shape lever before the
chain-grid tiling work: a ``lax.scan``-over-groups form of the SAME density
-- sequential graphs are the fused kernel's strongest regime (statespace
2.8-7x) because the per-iteration live set is a small 2-D (n, BC) tile
instead of the whole 420-equation 3-D graph.

Each variant is verified (value up to a constant, gradient exactly) against
the production posterior before timing.  Prints one JSON line per
(variant, tile) plus the XLA anchor.
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
import numpy as np

from benchmarks.bench_models import timeit

N_GROUPS = 8
N_POINTS = 15
OFFSET = 2.0
_LOG2PI = float(np.log(2.0 * np.pi))


def build():
    from binf_tpu.cli import _unconstrain_batch, build_model
    from binf_tpu.pdf.transforms import transform_logdensity

    key = jax.random.key(0)
    posterior, init_fn, transforms = build_model("hierarchical", key)
    posterior = jax.device_get(posterior)
    base = transform_logdensity(lambda p: posterior.log_prob(p), transforms)

    lik = posterior.likelihoods["curves"]
    x = np.asarray(lik.forward_model.x)  # (n,)
    y = np.asarray(lik.error_model.data).reshape(N_GROUPS, N_POINTS)
    counts = np.asarray(posterior.likelihoods["counts"].error_model.data)

    def scan_logprob(p):
        """Same density, lax.scan over groups: per-iteration tiles are
        (n,)-shaped, so the fused kernel sees a small 2-D live set."""
        gp, mu, log_tau = p["group_params"], p["mu"], p["log_tau"]
        prec = p["precision"]
        tau = jnp.exp(log_tau)

        def body(carry, xs):
            gp_g, y_g, c_g = xs  # (2,), (n,), ()
            amp = jnp.exp(gp_g[0])
            mock = amp * jax.nn.sigmoid(gp_g[1] * x)
            r = y_g - mock
            ll = (
                -0.5 * prec * jnp.sum(r * r)
                + 0.5 * N_POINTS * jnp.log(prec)
                - 0.5 * N_POINTS * _LOG2PI
            )
            lograte = OFFSET + gp_g[0]
            # lgamma(c+1) is a data-only constant: dropped (no Mosaic rule
            # needed in-kernel; the verify step checks grad + const offset)
            lp = c_g * lograte - jnp.exp(lograte)
            z = (gp_g - mu) / tau
            pooled = jnp.sum(-0.5 * z * z - log_tau - 0.5 * _LOG2PI)
            return carry + ll + lp + pooled, None

        total, _ = jax.lax.scan(
            body, jnp.float32(0.0),
            (gp, jnp.asarray(y), jnp.asarray(counts)),
        )
        hyper_mu = jnp.sum(-0.5 * (mu / 2.0) ** 2 - jnp.log(2.0) - 0.5 * _LOG2PI)
        hyper_tau = jnp.sum(-0.5 * (log_tau + 1.0) ** 2 - 0.5 * _LOG2PI)
        # GammaPrior(2, 0.1): (a-1) log prec - rate * prec  [+ const]
        gamma = (2.0 - 1.0) * jnp.log(prec) - 0.1 * prec
        return total + hyper_mu + hyper_tau + gamma

    def scan_unconstrained(p):
        q = dict(p)
        u = q.pop("precision")
        q["precision"] = jnp.exp(u)
        return scan_logprob(q) + u  # + log-Jacobian of exp

    positions = _unconstrain_batch(
        transforms, init_fn(int(os.environ.get("EXP_CHAINS", "8192")),
                            key=jax.random.key(1))
    )
    return base, scan_unconstrained, positions


def verify(base, variant, positions):
    tpl = jax.tree.map(lambda a: a[0], positions)
    tpl2 = jax.tree.map(lambda a: a[1], positions)
    g1 = jax.grad(base)(tpl)
    g2 = jax.grad(variant)(tpl)
    for k in g1:
        np.testing.assert_allclose(
            np.asarray(g1[k]), np.asarray(g2[k]), rtol=2e-4, atol=2e-4
        )
    d1 = float(base(tpl)) - float(variant(tpl))
    d2 = float(base(tpl2)) - float(variant(tpl2))
    assert abs(d1 - d2) < 2e-2, (d1, d2)  # value differs by a constant only
    print(f"# verified: grad match, const offset {d1:+.3f}", file=sys.stderr)


def main():
    from binf_tpu.ops.pallas.fused_potential import (
        fused_potential_hmc_run,
        fused_warmup_run,
        pack_positions,
        tile_potential_from_scalar,
    )
    from binf_tpu.parallel.runner import init_chains, run_chains
    from binf_tpu.samplers.hmc import hmc

    base, scan_u, positions = build()
    verify(base, scan_u, positions)

    n_chains = jax.tree.leaves(positions)[0].shape[0]
    steps, L = int(os.environ.get("EXP_STEPS", "500")), 10
    on_cpu = jax.default_backend() == "cpu"
    template = jax.tree.map(lambda a: a[0], positions)

    # one calibration (base density) shared by every timed configuration
    potential, consts, spec = tile_potential_from_scalar(base, template)
    q0 = pack_positions(positions, spec)
    qw, eps_c, im_c = jax.jit(functools.partial(
        fused_warmup_run, potential,
        num_warmup=100 if on_cpu else 400, num_leapfrog=L,
        block_chains=min(512, n_chains), interpret=on_cpu,
        host_noise=on_cpu,
    ))(q0, 7, 0.05, consts)
    eps = float(jax.jit(jnp.median)(eps_c))
    im = jax.device_get(jax.jit(lambda a: jnp.mean(a, axis=0))(im_c))
    print(f"# calibrated eps={eps:.4f}", file=sys.stderr)

    variants = {"base3d": base, "scan_groups": scan_u}
    tiles = [512, 2048, 4096] if not on_cpu else [min(64, n_chains)]
    only = os.environ.get("EXP_VARIANTS")
    for vname, density in variants.items():
        if only and vname not in only.split(","):
            continue
        pot_v, consts_v, spec_v = tile_potential_from_scalar(density, template)
        # identical pack order (sorted names) -> q0/im transfer directly
        assert [s[0] for s in spec_v] == [s[0] for s in spec]
        for bc in tiles:
            fused = lambda q, s: fused_potential_hmc_run(
                pot_v, q, s, eps, im, consts_v,
                num_steps=steps, num_leapfrog=L,
                block_chains=min(bc, n_chains),
                steps_per_block=min(50, steps),
                interpret=on_cpu, host_noise=on_cpu,
            )
            try:
                t, res = timeit(fused, qw, 7, iters=3 if on_cpu else 5)
            except Exception as e:  # e.g. VMEM OOM at wide tiles
                print(json.dumps({
                    "variant": vname, "tile": bc,
                    "error": str(e).split("\n")[0][:120],
                }), flush=True)
                continue
            print(json.dumps({
                "variant": vname, "tile": bc, "ms": round(t * 1e3, 2),
                "accept": round(float(res.accept_rate), 3),
            }), flush=True)

    im_tree, off = {}, 0
    for name, shape, size in spec:
        im_tree[name] = np.asarray(im[off:off + size]).reshape(shape)
        off += size
    kernel = hmc(base, eps, L, im_tree)
    states = init_chains(kernel, positions)

    def xla_run(states, key):
        final, (samples, acc) = run_chains(
            kernel, key, states, steps,
            collect=lambda state, info: (state.position, info.accepted),
        )
        return final.position, samples, acc

    t_xla, (_, _, acc) = timeit(jax.jit(xla_run), states, jax.random.key(9),
                                iters=3 if on_cpu else 5)
    print(json.dumps({
        "variant": "xla", "tile": None, "ms": round(t_xla * 1e3, 2),
        "accept": round(float(jax.jit(jnp.mean)(acc)), 3),
    }), flush=True)


if __name__ == "__main__":
    from binf_tpu.io.cache import enable_persistent_cache
    from binf_tpu.io.health import wait_for_device_health

    enable_persistent_cache()
    if jax.default_backend() != "cpu" and not wait_for_device_health():
        sys.exit(1)
    main()
