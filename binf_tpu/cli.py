"""Command-line inference runner: ``python -m binf_tpu ...``.

The reference's "runtime" is a hand-written script (``example_script.py``);
this CLI is the productionized equivalent: pick a registered model, a
kernel, and run sizes; get a diagnostics summary (JSON) plus optional
checkpointing -- driven by the typed config system (`io/config.py`).

    python -m binf_tpu --model polynomial --algorithm gibbs --chains 1024 \\
        --samples 500 --summary-out results.json

Registered models: ``polynomial`` (reference workload), ``hierarchical``
(Gaussian+Poisson channels), ``logistic`` (Bernoulli GLM), ``chromatin``
(distance restraints), ``statespace`` (AR(1) trajectory via lax.scan),
``mixture`` (Gaussian mixture via in-model logsumexp).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def build_model(name: str, key):
    """Returns (posterior, initial_positions_fn, transforms)."""
    import jax
    import jax.numpy as jnp

    from binf_tpu.pdf.transforms import LogTransform

    if name == "polynomial":
        from binf_tpu.example.polynomial import (
            initial_positions,
            make_data,
            make_posterior,
        )

        xses, ys = make_data(key)
        post = make_posterior(xses, ys)
        return post, initial_positions, {"precision": LogTransform}

    if name == "hierarchical":
        from binf_tpu.example.hierarchical import (
            make_hierarchical_posterior,
            synthetic_hierarchical_data,
        )

        n_groups = 8
        x, y, counts, _ = synthetic_hierarchical_data(key, n_groups)
        post = make_hierarchical_posterior(x, y, counts, n_groups)

        def init_fn(n_chains, key=None):
            k = key if key is not None else jax.random.key(0)
            return {
                "group_params": 0.1 * jax.random.normal(k, (n_chains, n_groups, 2)),
                "mu": jnp.zeros((n_chains, 2)),
                "log_tau": jnp.full((n_chains, 2), -1.0),
                "precision": jnp.full((n_chains,), 5.0),
            }

        return post, init_fn, {"precision": LogTransform}

    if name == "logistic":
        from binf_tpu.example.logistic import (
            initial_positions,
            make_logistic_posterior,
            synthetic_logistic_data,
        )

        X, y = synthetic_logistic_data(key)
        post = make_logistic_posterior(X, y)
        return post, initial_positions, {}

    if name == "chromatin":
        from binf_tpu.example.chromatin import (
            make_chromatin_posterior,
            synthetic_restraints,
        )

        n_beads = 64
        _, log_target, W = synthetic_restraints(key, n_beads, observe_frac=0.3)
        # use_pallas=False: at 64 beads the (N, N) restraint field fits any
        # memory budget, and the plain-XLA density is what the fused-kernel
        # interpreter can lane-batch (--algorithm fused/auto).  The blockwise
        # Pallas pairwise kernel pays off at N >= 2048
        # (docs/performance.md) -- examples/run_chromatin.py keeps it.
        post = make_chromatin_posterior(log_target, W, use_pallas=False)

        def init_fn(n_chains, key=None):
            k = key if key is not None else jax.random.key(0)
            keys = jax.random.split(k, n_chains)
            return jax.vmap(post.sample_prior)(keys)

        return post, init_fn, {"precision": LogTransform}

    if name == "statespace":
        from binf_tpu.example.statespace import (
            initial_positions,
            make_ar1_posterior,
            synthetic_ar1_data,
        )

        y = synthetic_ar1_data(key)
        post = make_ar1_posterior(y)
        return post, initial_positions, {"precision": LogTransform}

    if name == "mixture":
        from binf_tpu.example.mixture import (
            initial_positions,
            make_mixture_posterior,
            synthetic_mixture_data,
        )

        y = synthetic_mixture_data(key)
        post = make_mixture_posterior(y)
        return post, initial_positions, {}

    raise SystemExit(
        f"unknown model {name!r}; choose polynomial|hierarchical|logistic|"
        "chromatin|statespace|mixture"
    )


def main(argv=None):
    ap = argparse.ArgumentParser(prog="binf_tpu")
    ap.add_argument("--model", default="polynomial")
    ap.add_argument("--algorithm", default="auto",
                    choices=["auto", "hmc", "nuts", "chees", "rwm", "mala",
                             "gibbs", "smc", "advi", "laplace", "svgd",
                             "fused", "chain-grid", "pathfinder"],
                    help="'auto' (default) routes adaptive HMC to the "
                         "measured winner (fused Pallas kernel vs XLA "
                         "scan) for this model/shape -- see "
                         "samplers/auto.py and docs/performance.md")
    ap.add_argument("--no-reroute", action="store_true",
                    help="run the requested sampler even where the router "
                         "has measured it losing (e.g. NUTS on a cheap "
                         "density pays a 39-119x lockstep tree overhead; "
                         "samplers/auto.py::route_trajectory_sampler)")
    ap.add_argument("--init", default="default",
                    choices=["default", "pathfinder"],
                    help="chain initialization: the model's init_fn, or "
                         "pathfinder draws (chains start in the typical "
                         "set, so short warmups suffice)")
    ap.add_argument("--chains", type=int, default=256)
    ap.add_argument("--warmup", type=int, default=300)
    ap.add_argument("--samples", type=int, default=500)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--step-size", type=float, default=0.1)
    ap.add_argument("--summary-out", default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--mesh", action="store_true", help="shard chains over all devices")
    ap.add_argument("--thin", type=int, default=1,
                    help="keep every k-th draw (fused algorithm: in-kernel)")
    ap.add_argument("--per-chain-step", action="store_true",
                    help="per-chain step-size adaptation (fused algorithm)")
    ap.add_argument("--auto-step-size", action="store_true",
                    help="seed warmup with find_reasonable_step_size "
                         "(Hoffman & Gelman Algorithm 4) instead of --step-size")
    ap.add_argument("--trajectory", default="fixed", choices=["fixed", "chees"],
                    help="fused algorithm: trajectory-length source (chees "
                         "= ChEES-adapted mean length T, sampled in-kernel "
                         "with halton-jittered TRACED trajectory bounds)")
    ap.add_argument("--warmup-mode", default="xla",
                    choices=["xla", "fused", "dense"],
                    help="fused algorithm: adaptation on the XLA path, "
                         "INSIDE a Pallas kernel (warmup+sampling = one "
                         "dispatch; per-chain step size/metric), or 'dense' "
                         "(full-covariance metric; fused sampling with MXU "
                         "matmul momenta)")
    ap.add_argument("--collect", default="draws", choices=["draws", "moments"],
                    help="fused algorithm: collect draws, or stream Welford "
                         "moments in-kernel (O(D) HBM for long runs)")
    ap.add_argument("--block-chains", default="auto",
                    help="fused algorithm: chain-tile width (int, or 'auto' "
                         "(default) to size from a VMEM estimate -- "
                         "small-state models want 2048+ lanes, see "
                         "docs/performance.md)")
    ap.add_argument("--metric", default="diag", choices=["diag", "dense"],
                    help="hmc algorithm: diagonal or full-covariance mass "
                         "matrix (dense preconditions correlated posteriors; "
                         "adaptation in samplers/dense.py)")
    ap.add_argument("--persistent-cache", action="store_true")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    if args.persistent_cache:
        from binf_tpu.io.cache import enable_persistent_cache

        enable_persistent_cache()

    from binf_tpu.diagnostics import summary
    from binf_tpu.parallel.mesh import make_chain_mesh
    from binf_tpu.parallel.runner import init_chains, run_chains, warmup_and_run
    from binf_tpu.pdf.transforms import transform_logdensity

    key = jax.random.key(args.seed)
    k_model, k_init, k_run = jax.random.split(key, 3)
    posterior, init_fn, transforms = build_model(args.model, k_model)
    mesh = make_chain_mesh() if args.mesh else None

    t0 = time.perf_counter()

    if args.algorithm == "smc":
        from binf_tpu.smc import tempered_smc

        result = jax.jit(
            lambda k: tempered_smc(
                posterior, k, num_particles=args.chains, mutation="hmc",
                num_mutation_steps=5, mesh=mesh,
            )
        )(k_run)
        jax.block_until_ready(result.particles)
        elapsed = time.perf_counter() - t0
        out = {
            "model": args.model, "algorithm": "smc",
            "log_evidence": float(result.log_evidence),
            "num_stages": int(result.num_stages),
            "elapsed_sec": round(elapsed, 3),
            "posterior_means": {
                k: jnp.mean(v, axis=0).tolist()
                for k, v in result.particles.items()
            },
        }

    elif args.algorithm == "pathfinder":
        from binf_tpu.vi import pathfinder

        logdensity = transform_logdensity(
            lambda p: posterior.log_prob(p), transforms
        )
        seeds = _unconstrain_batch(
            transforms, init_fn(min(args.chains, 8), key=k_init)
        )
        fit = jax.jit(
            lambda k: pathfinder(logdensity, seeds, k, num_draws=1000)
        )(k_run)
        jax.block_until_ready(fit.samples)
        elapsed = time.perf_counter() - t0
        from binf_tpu.pdf.transforms import constrain

        draws = jax.vmap(lambda p: constrain(transforms, p))(fit.samples)
        out = {
            "model": args.model, "algorithm": "pathfinder",
            "best_elbo": float(jnp.max(fit.elbo)),
            "pareto_k": round(float(fit.pareto_k), 3),
            "elapsed_sec": round(elapsed, 3),
            "posterior_means": {
                k: jnp.mean(v, axis=0).tolist() for k, v in draws.items()
            },
        }

    elif args.algorithm == "advi":
        from binf_tpu.vi import advi, variational_sample

        result = jax.jit(
            lambda k: advi(posterior, k, num_steps=args.samples * 4,
                           transforms=transforms)
        )(k_run)
        draws = variational_sample(posterior, result, k_init, 1000, transforms)
        jax.block_until_ready(draws)
        elapsed = time.perf_counter() - t0
        out = {
            "model": args.model, "algorithm": "advi",
            "final_elbo": float(result.final_elbo),
            "elapsed_sec": round(elapsed, 3),
            "posterior_means": {
                k: jnp.mean(v, axis=0).tolist() for k, v in draws.items()
            },
        }

    elif args.algorithm == "laplace":
        from binf_tpu.vi import laplace_approximation, laplace_sample

        result = jax.jit(
            lambda k: laplace_approximation(posterior, k, num_steps=args.samples * 4,
                                            transforms=transforms)
        )(k_run)
        draws = laplace_sample(posterior, result, k_init, 1000, transforms)
        jax.block_until_ready(draws)
        elapsed = time.perf_counter() - t0
        out = {
            "model": args.model, "algorithm": "laplace",
            "converged": bool(result.converged),
            "log_evidence_laplace": float(result.log_evidence_laplace),
            "elapsed_sec": round(elapsed, 3),
            "posterior_means": {
                k: jnp.mean(v, axis=0).tolist() for k, v in draws.items()
            },
        }

    elif args.algorithm == "svgd":
        from binf_tpu.vi import svgd

        result = jax.jit(
            lambda k: svgd(posterior, k, num_particles=args.chains,
                           num_steps=args.samples * 4, transforms=transforms)
        )(k_run)
        jax.block_until_ready(result.particles)
        elapsed = time.perf_counter() - t0
        out = {
            "model": args.model, "algorithm": "svgd",
            "elapsed_sec": round(elapsed, 3),
            "posterior_means": {
                k: jnp.mean(v, axis=0).tolist()
                for k, v in result.particles.items()
            },
        }

    elif args.algorithm == "gibbs":
        if args.model != "polynomial":
            raise SystemExit("--algorithm gibbs is wired for --model polynomial")
        from binf_tpu.example.polynomial import make_collapsed_gibbs_kernel

        kernel = make_collapsed_gibbs_kernel(posterior)
        states = init_chains(kernel, init_fn(args.chains, key=k_init), mesh=mesh)
        run = jax.jit(lambda s, k: run_chains(kernel, k, s, args.samples))
        jax.block_until_ready(run(states, k_run))  # compile (excluded)
        t0 = time.perf_counter()
        _, samples = run(states, k_run)
        jax.block_until_ready(samples)
        elapsed = time.perf_counter() - t0
        out = _summarize(args, samples, elapsed, burn=args.samples // 4)

    elif args.algorithm == "chain-grid":
        # chain-grid fused kernel: chains on the Pallas grid, data in
        # lanes -- the fusibility path for data-heavy densities whose
        # per-chain intermediates blow the lane kernel's VMEM
        # (docs/performance.md "Chain-grid kernel")
        from binf_tpu.samplers.chain_grid import chain_grid_model_hmc

        logdensity = transform_logdensity(
            lambda p: posterior.log_prob(p), transforms
        )
        u_positions = _init_positions(
            args, logdensity, init_fn, transforms, args.chains, k_init
        )
        result = chain_grid_model_hmc(
            logdensity, u_positions, k_run,
            num_warmup=args.warmup, num_samples=args.samples,
            initial_step_size=(
                None if args.auto_step_size else args.step_size
            ),
            thin=args.thin, mesh=mesh, collect=args.collect,
        )
        if args.collect == "moments":
            jax.block_until_ready(result.mean)
            elapsed = time.perf_counter() - t0
            out = {
                "model": args.model, "algorithm": "chain-grid",
                "chains": args.chains, "space": "unconstrained",
                "elapsed_sec": round(elapsed, 3),
                "posterior_means": {
                    k: jnp.mean(v, axis=0).tolist()
                    for k, v in result.mean.items()
                },
            }
        else:
            jax.block_until_ready(result.samples)
            elapsed = time.perf_counter() - t0
            samples = _constrain_batch(transforms, result.samples)
            out = _summarize(args, samples, elapsed, burn=0)
        out["accept_rate"] = round(float(result.accept_rate), 4)

    elif args.algorithm in ("fused", "auto"):
        # whole-run fused HMC kernel (general path, works for ANY model via
        # tile_potential_from_scalar), or 'auto': route this model/shape to
        # the measured winner -- fused kernel vs XLA scan (samplers/auto.py)
        logdensity = transform_logdensity(
            lambda p: posterior.log_prob(p), transforms
        )
        u_positions = _init_positions(
            args, logdensity, init_fn, transforms, args.chains, k_init
        )
        decision = None
        if args.algorithm == "auto":
            from binf_tpu.samplers.auto import adaptive_hmc

            # forward non-default fused-only flags so e.g. '--warmup-mode
            # dense' is honored (adaptive_hmc raises a clear error if the
            # run routes to XLA while these are set -- ADVICE round 4)
            fused_only = {}
            if args.per_chain_step:
                fused_only["per_chain_step_size"] = True
            if args.trajectory != "fixed":
                fused_only["trajectory"] = args.trajectory
            if args.warmup_mode != "xla":
                fused_only["warmup"] = args.warmup_mode
            if args.block_chains != "auto":
                fused_only["block_chains"] = int(args.block_chains)
            result, decision = adaptive_hmc(
                logdensity, u_positions, k_run,
                num_warmup=args.warmup, num_samples=args.samples,
                initial_step_size=(
                    None if args.auto_step_size else args.step_size
                ),
                thin=args.thin,
                mesh=mesh,
                collect=args.collect,
                **fused_only,
            )
        else:
            from binf_tpu.samplers.fused import fused_model_hmc

            result = fused_model_hmc(
                logdensity, u_positions, k_run,
                num_warmup=args.warmup, num_samples=args.samples,
                initial_step_size=(
                    None if args.auto_step_size else args.step_size
                ),
                block_chains=(args.block_chains if args.block_chains == "auto"
                              else int(args.block_chains)),
                per_chain_step_size=args.per_chain_step,
                thin=args.thin,
                mesh=mesh,
                trajectory=args.trajectory,
                warmup=args.warmup_mode,
                collect=args.collect,
            )
        elapsed = None
        if args.collect == "moments":
            jax.block_until_ready(result.mean)
            elapsed = time.perf_counter() - t0
            # in-kernel streaming moments: no draws to summarize; moments
            # are in UNCONSTRAINED space (apply transforms downstream)
            out = {
                "model": args.model, "algorithm": args.algorithm,
                "chains": args.chains, "draws": args.samples * args.chains,
                "space": "unconstrained",
                "elapsed_sec": round(elapsed, 3),
                "posterior_means": {
                    k: jnp.mean(v, axis=0).tolist()
                    for k, v in result.mean.items()
                },
                "posterior_variances": {
                    k: jnp.mean(v, axis=0).tolist()
                    for k, v in result.variance.items()
                },
            }
        else:
            jax.block_until_ready(result.samples)
            elapsed = time.perf_counter() - t0
            samples = _constrain_batch(transforms, result.samples)
            out = _summarize(args, samples, elapsed,
                             burn=(args.samples // args.thin) // 4)
        out["accept_rate"] = round(float(result.accept_rate), 4)
        if decision is not None:
            out["routed_to"] = decision.path
            out["routing_reason"] = decision.reason

    else:  # gradient samplers via adaptive warmup
        logdensity = transform_logdensity(
            lambda p: posterior.log_prob(p), transforms
        )
        sampler = args.algorithm
        reroute_reason = None

        if args.algorithm == "chees":
            u_positions = _init_positions(
                args, logdensity, init_fn, transforms, args.chains, k_init
            )
            # fused in-kernel ChEES when the density tile-compiles (traced
            # jittered trajectory bounds; measured 33-40x the XLA ChEES
            # path end-to-end, docs/performance.md); XLA otherwise
            from binf_tpu.ops.pallas.tile_interpreter import (
                UnsupportedPrimitiveError,
            )
            from binf_tpu.samplers.fused import _cached_tile_potential

            try:
                _cached_tile_potential(
                    logdensity, jax.tree.map(lambda x: x[0], u_positions)
                )
                fused_ok = True
            except (UnsupportedPrimitiveError, ValueError):
                fused_ok = False
            if args.warmup_mode == "dense":
                raise ValueError(
                    "--algorithm chees does not support "
                    "--warmup-mode dense (the dense metric pairs with "
                    "fixed trajectories); use --warmup-mode xla/fused"
                )
            if fused_ok:
                from binf_tpu.samplers.fused import fused_model_hmc

                result = fused_model_hmc(
                    logdensity, u_positions, k_run,
                    num_warmup=args.warmup, num_samples=args.samples,
                    initial_step_size=(
                        None if args.auto_step_size else args.step_size
                    ),
                    trajectory="chees",
                    warmup=args.warmup_mode,
                    thin=args.thin, mesh=mesh,
                )
                samples = result.samples
                sampler = "chees (fused in-kernel)"
            else:
                from binf_tpu.samplers.chees import chees_adaptation, chees_hmc

                adapt = jax.jit(
                    lambda k: chees_adaptation(
                        logdensity, u_positions, k, num_steps=args.warmup,
                        initial_step_size=args.step_size,
                    )
                )(k_run)
                kernel = chees_hmc(logdensity, adapt.step_size,
                                   adapt.trajectory_length, adapt.inverse_mass)
                states = jax.vmap(kernel.init)(adapt.final_positions)
                _, samples = jax.jit(
                    lambda s, k: run_chains(kernel, k, s, args.samples)
                )(states, jax.random.fold_in(k_run, 1))
                sampler = "chees (xla)"
        elif args.algorithm == "hmc" and args.metric == "dense":
            from binf_tpu.samplers.dense import dense_hmc, dense_window_adaptation

            u_positions = _init_positions(
                args, logdensity, init_fn, transforms, args.chains, k_init
            )
            template = jax.tree.map(lambda x: x[0], u_positions)
            adapt = jax.jit(
                lambda k: dense_window_adaptation(
                    logdensity, u_positions, k, num_steps=args.warmup,
                    num_integration_steps=10,
                    initial_step_size=args.step_size,
                )
            )(k_run)
            kernel = dense_hmc(
                logdensity, template, adapt.step_size, 10,
                inverse_mass_matrix=adapt.inverse_mass_matrix,
            )
            states = init_chains(kernel, adapt.final_positions, mesh=mesh)
            _, samples = jax.jit(
                lambda s, k: run_chains(kernel, k, s, args.samples, mesh=mesh)
            )(states, jax.random.fold_in(k_run, 1))
        else:
            from binf_tpu.samplers.hmc import hmc
            from binf_tpu.samplers.mala import mala
            from binf_tpu.samplers.nuts import nuts
            from binf_tpu.samplers.rwm import rwm

            u_positions = _init_positions(
                args, logdensity, init_fn, transforms, args.chains, k_init
            )

            if sampler == "nuts" and not args.no_reroute:
                from binf_tpu.samplers.auto import route_trajectory_sampler

                sampler, reroute_reason = route_trajectory_sampler(
                    "nuts", logdensity, u_positions
                )
                if sampler != "nuts":
                    print(f"# {reroute_reason}", file=sys.stderr)

            def builder(step_size, inverse_mass):
                if sampler == "hmc":
                    return hmc(logdensity, step_size, 10, inverse_mass)
                if sampler == "nuts":
                    return nuts(logdensity, step_size, 8, inverse_mass)
                if sampler == "mala":
                    return mala(logdensity, step_size)
                return rwm(logdensity, step_size)
            samples, _, adapt = warmup_and_run(
                builder, u_positions, k_run,
                num_warmup=args.warmup, num_samples=args.samples,
                initial_step_size=None if args.auto_step_size else args.step_size,
                mesh=mesh,
            )
        jax.block_until_ready(samples)
        elapsed = time.perf_counter() - t0
        samples = _constrain_batch(transforms, samples)
        out = _summarize(args, samples, elapsed, burn=0)
        if sampler != args.algorithm:
            out["sampler"] = sampler
            if reroute_reason is not None:
                out["reroute_reason"] = reroute_reason

    line = json.dumps(out, indent=2)
    print(line)
    if args.summary_out:
        with open(args.summary_out, "w") as f:
            f.write(line)
    return out


def _init_positions(args, logdensity, init_fn, transforms, n, key):
    """Unconstrained starting positions: the model's init_fn, or (with
    --init pathfinder) draws from a pathfinder fit seeded by a few
    overdispersed init_fn points."""
    import jax

    u = _unconstrain_batch(transforms, init_fn(n, key=key))
    if args.init != "pathfinder":
        return u
    from binf_tpu.vi import pathfinder_init

    seeds = jax.tree.map(lambda x: x[: min(n, 8)], u)
    return pathfinder_init(
        logdensity, seeds, jax.random.fold_in(key, 7), n_chains=n
    )


def _unconstrain_batch(transforms, positions):
    import jax

    from binf_tpu.pdf.transforms import unconstrain

    return jax.vmap(lambda p: unconstrain(transforms, p))(positions)


def _constrain_batch(transforms, samples):
    import jax

    from binf_tpu.pdf.transforms import constrain

    # samples leaves: (steps, chains, ...) -- map over both axes
    return jax.vmap(jax.vmap(lambda p: constrain(transforms, p)))(samples)


def _summarize(args, samples, elapsed, burn=0):
    from binf_tpu.diagnostics import summary

    kept = {k: v[burn:] for k, v in samples.items()}
    stats = summary(kept)
    first = kept[next(iter(kept))]
    n_draws = first.shape[0] * first.shape[1]
    return {
        "model": args.model,
        "algorithm": args.algorithm,
        "chains": args.chains,
        "draws": n_draws,
        "elapsed_sec": round(elapsed, 3),
        "draws_per_sec": round(n_draws / elapsed, 1),
        "summary": {
            name: {
                stat: (v.tolist() if hasattr(v, "tolist") else float(v))
                for stat, v in s.items()
            }
            for name, s in stats.items()
        },
    }


if __name__ == "__main__":
    main()
