#!/usr/bin/env python
"""Fused in-kernel ChEES vs fixed-L vs XLA ChEES at the headline shape.

Round-5 VERDICT item 2: the framework's measured-best algorithm (ChEES,
3.9-5.3x fixed-L ESS/s on the XLA path) meets its best execution engine
(the whole-run fused kernel).  Protocol = the headline bench: polynomial
posterior, 16,384 chains, 500 in-kernel warmup + 1,000 sampling steps as
ONE jit, scored end-to-end (warmup + dispatch inside the denominator),
min-across-parameters bulk ESS per second.

Prints one JSON line per configuration.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from binf_tpu.diagnostics import ess
    from binf_tpu.example.polynomial import make_data
    from binf_tpu.ops.math import vandermonde
    from binf_tpu.ops.pallas.fused_hmc import linreg_unconstrained_logdensity
    from binf_tpu.ops.pallas.fused_potential import (
        fused_potential_hmc_run,
        fused_warmup_run,
        tile_potential_from_scalar,
    )

    on_cpu = jax.default_backend() == "cpu"
    model = os.environ.get("CHEES_MODEL", "polynomial")
    C = int(os.environ.get("CHEES_CHAINS", "256" if on_cpu else "16384"))
    N_WARM = int(os.environ.get("CHEES_WARMUP", "100" if on_cpu else "500"))
    N_SAMP = int(os.environ.get("CHEES_SAMPLES", "200" if on_cpu else "1000"))
    REPS = 2 if on_cpu else 4

    if model == "polynomial":
        xses, ys = make_data(jax.random.key(1))
        V = vandermonde(jnp.linspace(-2.0, 2.0, 20), 4)
        logdensity = linreg_unconstrained_logdensity(
            V, ys, jnp.ones(4) * 5.0, 1.0, 0.2
        )
        template = {
            "coefficients": jnp.zeros((4,), jnp.float32),
            "precision": jnp.zeros((), jnp.float32),
        }
    else:
        from binf_tpu.cli import _unconstrain_batch, build_model
        from binf_tpu.ops.pallas.fused_potential import pack_positions as _pp
        from binf_tpu.pdf.transforms import transform_logdensity

        posterior, init_fn, transforms = build_model(model, jax.random.key(1))
        posterior = jax.device_get(posterior)
        logdensity = transform_logdensity(
            lambda p: posterior.log_prob(p), transforms
        )
        upos = _unconstrain_batch(transforms, init_fn(C, key=jax.random.key(2)))
        template = jax.tree.map(lambda a: a[0], upos)
    potential, consts, _ = tile_potential_from_scalar(logdensity, template)
    if model == "polynomial":
        q_init = jnp.concatenate(
            [jnp.ones((C, 4))
             + 0.1 * jax.random.normal(jax.random.key(2), (C, 4)),
             jnp.zeros((C, 1))], axis=1,
        )
    else:
        q_init = _pp(upos)
    kern = dict(block_chains=C, interpret=on_cpu, host_noise=on_cpu)

    @jax.jit
    def min_ess(draws):
        if model == "polynomial":
            coeff = ess(draws[:, :, :4])
            prec = ess(jnp.exp(draws[:, :, 4]))
            return jnp.minimum(jnp.min(coeff), prec)
        return jnp.min(ess(draws))

    def score(name, full_run, extra=None):
        t0 = time.perf_counter()
        out = full_run(q_init, 0)
        jax.block_until_ready(out[0])
        cold = time.perf_counter() - t0
        times = []
        for i in range(REPS):
            t0 = time.perf_counter()
            out = full_run(q_init, 2 * i + 2)
            jax.block_until_ready(out[0])
            times.append(time.perf_counter() - t0)
        e2e = float(np.mean(times))
        m = float(min_ess(out[0]))
        rec = {
            "config": name, "e2e_ms": round(e2e * 1e3, 1),
            "min_ess": round(m, 1), "ess_per_s": round(m / e2e, 1),
            "accept": round(float(out[1]), 3), "cold_s": round(cold, 1),
        }
        if extra:
            rec.update({k: round(float(v(out)), 3) for k, v in extra.items()})
        print(json.dumps(rec), flush=True)
        return rec

    @jax.jit
    def run_fixed(q0, seed):
        qw, eps_c, im_c = fused_warmup_run(
            potential, q0, seed, 0.1, consts, num_warmup=N_WARM,
            num_leapfrog=10, **kern,
        )
        eps = jnp.mean(eps_c) * jnp.ones((C,), jnp.float32)
        im = jnp.mean(im_c, axis=0)
        r = fused_potential_hmc_run(
            potential, qw, seed + 1, eps, im, consts, num_steps=N_SAMP,
            num_leapfrog=10, steps_per_block=min(50, N_SAMP), **kern,
        )
        return r.draws, r.accept_rate

    @jax.jit
    def run_chees(q0, seed):
        qw, eps_c, im_c, T = fused_warmup_run(
            potential, q0, seed, 0.1, consts, num_warmup=N_WARM,
            num_leapfrog=10, trajectory="chees", max_leapfrog=128,
            target_accept=0.651, **kern,
        )
        r = fused_potential_hmc_run(
            potential, qw, seed + 1, eps_c, jnp.mean(im_c, axis=0), consts,
            num_steps=N_SAMP, trajectory="chees", traj_length=T,
            max_leapfrog=128, steps_per_block=min(50, N_SAMP), **kern,
        )
        return r.draws, r.accept_rate, T, eps_c

    score("fused_fixed_L10", run_fixed)
    score(
        "fused_chees", run_chees,
        extra={
            "T": lambda o: jnp.mean(o[2]),
            "eps": lambda o: jnp.mean(o[3]),
        },
    )

    # XLA ChEES anchor (round-4 measured path: host-driven adaptation +
    # scan(vmap) sampling)
    from binf_tpu.ops.pallas.fused_potential import pack_positions, unpack_draws, pack_template
    from binf_tpu.parallel.runner import init_chains, run_chains
    from binf_tpu.samplers.chees import chees_adaptation, chees_hmc

    spec = pack_template(template)

    def run_xla_chees(q0, seed):
        positions = unpack_draws(q0, spec)
        adapt = jax.jit(lambda p, k: chees_adaptation(
            logdensity, p, k, num_steps=N_WARM, initial_step_size=0.1,
            max_leapfrog=128,
        ))(positions, jax.random.key(seed))
        kernel = chees_hmc(
            logdensity, adapt.step_size, adapt.trajectory_length,
            adapt.inverse_mass, max_leapfrog=128,
        )
        states = init_chains(kernel, adapt.final_positions)
        _, (samples, acc) = jax.jit(lambda s, k: run_chains(
            kernel, k, s, N_SAMP,
            collect=lambda st, info: (st.position, info.accepted),
        ))(states, jax.random.key(seed + 1))
        from binf_tpu.ops.pallas.fused_potential import pack_positions as _pk

        draws = jax.vmap(lambda t: _pk(t, spec))(
            jax.tree.map(lambda a: a, samples)
        )
        return draws, jnp.mean(acc)

    score("xla_chees", run_xla_chees)


if __name__ == "__main__":
    from binf_tpu.io.cache import enable_persistent_cache
    from binf_tpu.io.health import wait_for_device_health

    enable_persistent_cache()
    if jax.default_backend() != "cpu" and not wait_for_device_health():
        sys.exit(1)
    main()
