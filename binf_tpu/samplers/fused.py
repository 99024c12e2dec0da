"""High-level drivers for the fused whole-run HMC kernels.

Two entry points, both running warmup on the XLA path and the sampling
phase inside a single Pallas kernel (~50x lower per-step cost than the
scan(vmap(step)) path on small models, see docs/performance.md):

* :func:`fused_regression_hmc` -- introspects a Posterior of the
  Bayesian-linear-regression family (the same graph-introspection pattern
  as the conjugate blocks, reference ``binf/example/samplers.py:14-25``)
  and dispatches to the hand-tiled linreg kernel;
* :func:`fused_model_hmc` -- the GENERAL path: takes any per-chain log
  density + position template, compiles it into the fused kernel via
  ``tile_potential_from_scalar`` (trace -> hoist data consts -> the
  lane-batching interpreter), no introspection or hand tiling required.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from binf_tpu.model.error import GaussianErrorModel
from binf_tpu.model.forward import LinearForwardModel, PolynomialForwardModel
from binf_tpu.ops.pallas.fused_hmc import (
    fused_linreg_hmc_run,
    linreg_unconstrained_logdensity,
)
from binf_tpu.ops.pallas.fused_potential import (
    fused_potential_hmc_run,
    fused_warmup_run,
    pack_positions,
    tile_potential_from_scalar,
    unpack_draws,
)
from binf_tpu.pdf.priors import GammaPrior, GaussianPrior

Array = jax.Array

__all__ = [
    "FusedRegressionResult",
    "fused_regression_hmc",
    "FusedModelResult",
    "fused_model_hmc",
]


class FusedRegressionResult(NamedTuple):
    samples: dict[str, Array]  # constrained space: coefficients, precision
    accept_rate: Array
    step_size: Array
    inverse_mass: Array


def _introspect(posterior):
    lik = None
    for l in posterior.likelihoods.values():
        fwm = getattr(l, "forward_model", None)
        if isinstance(fwm, (LinearForwardModel, PolynomialForwardModel)) and isinstance(
            getattr(l, "error_model", None), GaussianErrorModel
        ):
            lik = l
            break
    if lik is None:
        raise ValueError(
            "fused_regression_hmc needs a linear/polynomial forward model "
            "with a Gaussian error model"
        )
    fwm = lik.forward_model
    V = fwm.design if hasattr(fwm, "design") else fwm.vandermonde
    y = lik.error_model.data

    gamma = next(
        (p for p in posterior.priors.values()
         if isinstance(p, GammaPrior) and "precision" in p.variables),
        None,
    )
    gauss = next(
        (p for p in posterior.priors.values()
         if isinstance(p, GaussianPrior) and p.variable != "precision"),
        None,
    )
    if gamma is None or gauss is None:
        raise ValueError("need a GammaPrior on precision and a GaussianPrior "
                         "on the coefficients")
    return V, y, gamma, gauss


def fused_regression_hmc(
    posterior,
    key: Array,
    n_chains: int = 8192,
    num_warmup: int = 400,
    num_samples: int = 1000,
    num_leapfrog: int = 10,
    initial_step_size: float = 0.05,
    block_chains: int = 512,
    host_noise: bool | None = None,
    interpret: bool = False,
) -> FusedRegressionResult:
    """Adaptive warmup (XLA) + fused-kernel sampling on a regression
    posterior.  Returns constrained-space samples (num_samples, chains, ...)."""
    from binf_tpu.samplers.adaptation import window_adaptation
    from binf_tpu.samplers.hmc import hmc

    V, y, gamma, gauss = _introspect(posterior)
    d = V.shape[1]
    prior_var = gauss.variances
    prior_mean = gauss.means
    if host_noise is None:
        host_noise = jax.default_backend() == "cpu"

    logdensity = linreg_unconstrained_logdensity(
        V, y, prior_var, float(gamma.shape_param), float(gamma.rate),
        prior_mean=prior_mean,
    )

    def builder(step_size, inverse_mass):
        return hmc(logdensity, step_size, num_leapfrog, inverse_mass)

    k_init, k_warm, k_run = jax.random.split(key, 3)
    positions = {
        "coefficients": prior_mean[None, :]
        + 0.1 * jax.random.normal(k_init, (n_chains, d)),
        "precision": jnp.zeros((n_chains,)),
    }

    @jax.jit
    def warm(positions, k):
        kern0 = builder(initial_step_size, None)
        states = jax.vmap(kern0.init)(positions)
        return window_adaptation(
            builder, states, k, num_steps=num_warmup,
            initial_step_size=initial_step_size,
        )

    adapt = warm(positions, k_warm)

    q0 = jnp.concatenate(
        [adapt.final_states.position["coefficients"],
         adapt.final_states.position["precision"][:, None]],
        axis=1,
    )
    im_vec = jnp.concatenate(
        [adapt.inverse_mass["coefficients"], adapt.inverse_mass["precision"][None]]
    )
    seed = jax.random.randint(k_run, (), 0, 2**31 - 1)

    draws, acc = fused_linreg_hmc_run(
        q0, seed, V, y, prior_var,
        float(gamma.shape_param), float(gamma.rate),
        adapt.step_size,
        prior_mean=prior_mean,
        inverse_mass=im_vec,
        num_steps=num_samples,
        num_leapfrog=num_leapfrog,
        d=d,
        block_chains=min(block_chains, n_chains),
        steps_per_block=min(50, num_samples),
        interpret=interpret,
        host_noise=host_noise,
    )
    samples = {
        "coefficients": draws[:, :, :d],
        "precision": jnp.exp(draws[:, :, d]),
    }
    return FusedRegressionResult(
        samples=samples,
        accept_rate=acc,
        step_size=adapt.step_size,
        inverse_mass=im_vec,
    )


@functools.partial(jax.jit, static_argnames=("spec_key",))
def _unpack_jit(draws, spec_key):
    # one dispatch for the whole draw unpacking (vs per-leaf eager slices)
    return unpack_draws(draws, list(spec_key))


_TILE_CACHE: dict = {}


def _cached_potential(cache, build, logdensity_fn, template):
    """Build-once cache shared by the fused potential front ends: tracing
    + the build-time supportability dry-run cost ~1s of host time, so
    repeated runs with the same log density (by identity, like jit) and
    template structure reuse the compiled potential."""
    key = (
        logdensity_fn,
        tuple(
            (name, tuple(jnp.shape(template[name]))) for name in sorted(template)
        ),
    )
    try:
        hit = cache.get(key)
    except TypeError:  # unhashable logdensity
        return build(logdensity_fn, template)
    if hit is None:
        hit = cache[key] = build(logdensity_fn, template)
    return hit


def _cached_tile_potential(logdensity_fn, template):
    return _cached_potential(
        _TILE_CACHE, tile_potential_from_scalar, logdensity_fn, template
    )


def _contains_loop(jaxpr) -> bool:
    """True if any equation (recursively) is a scan or while loop."""
    for eqn in jaxpr.eqns:
        if eqn.primitive.name in ("scan", "while"):
            return True
        for v in eqn.params.values():
            for sub in _sub_jaxprs(v):
                if _contains_loop(sub):
                    return True
    return False


def _sub_jaxprs(v):
    if hasattr(v, "jaxpr"):  # ClosedJaxpr
        yield v.jaxpr
    elif hasattr(v, "eqns"):  # raw Jaxpr
        yield v
    elif isinstance(v, (tuple, list)):
        for item in v:
            yield from _sub_jaxprs(item)


def _auto_block_chains(spec, consts, sequential: bool = False):
    """Pick the chain-tile width from a VMEM-usage estimate.

    Measured on v5e (docs/performance.md): small-state models need
    2048-4096-chain tiles to fill the VPU/MXU (polynomial 0.58x -> 1.01x
    vs XLA going 512 -> 2048 at 8k chains), while data-heavy models spill
    VMEM at wide tiles and gain nothing past 512-1024.  Estimate the
    dominant per-lane VMEM bytes -- state buffers plus per-datapoint VJP
    intermediates, ~32 live f32 copies of (d_pad + total constant
    elements) matches the observed footprint (mixture: 16.6MB at 512
    lanes ~= 32.4KB/lane with ~250 const elements) -- and take the widest
    power-of-two tile in [512, 4096] under a 48MB budget (half the
    kernels' 100MB scoped-VMEM cap, leaving room for noise staging and
    draw buffers).

    ``sequential`` (density contains a scan/while): cap at 512 lanes --
    the in-kernel loop keeps its carries live per lane, and the measured
    statespace@8192 timings are 74 ms at 512 vs 104 ms at 4096."""
    import numpy as _np

    if sequential:
        return 512
    d = sum(size for _, _, size in spec)
    d_pad = ((d + 7) // 8) * 8
    c_tot = sum(
        int(_np.prod(v.shape)) if getattr(v, "shape", ()) else 1
        for v in consts.values()
    )
    per_lane = 4 * 32 * (d_pad + c_tot)
    budget = 48 * 1024 * 1024
    bc = 4096
    while bc > 512 and per_lane * bc > budget:
        bc //= 2
    return bc


class FusedModelResult(NamedTuple):
    samples: dict[str, Array] | None  # unconstrained, (num_samples, C, ...)
    accept_rate: Array
    step_size: Array  # scalar (warmup="xla") or per-chain (C,) (warmup="fused")
    # flat (D,) shared (warmup="xla"), per-chain (C, D) (warmup="fused"),
    # or a full (D, D) matrix (warmup="dense");
    # pack order = sorted variable names
    inverse_mass: Array
    mean: dict[str, Array] | None = None  # Welford moments (collect="moments")
    variance: dict[str, Array] | None = None
    final_positions: dict[str, Array] | None = None  # (C, ...) per leaf
    # adapted mean trajectory length T (trajectory="chees"; scalar or
    # per-chain); sampling jitters L_t ~ U(0, 2T)/eps per step
    trajectory_length: Array | None = None


def fused_model_hmc(
    logdensity_fn: Callable,
    initial_positions: dict[str, Array],  # chain-batched (C, ...) per leaf
    key: Array,
    num_warmup: int = 400,
    num_samples: int = 1000,
    num_leapfrog: int = 10,
    initial_step_size: float | None = 0.05,
    block_chains: int | str = "auto",
    per_chain_step_size: bool = False,
    thin: int = 1,
    mesh=None,
    host_noise: bool | None = None,
    interpret: bool | None = None,
    trajectory: str = "fixed",
    max_leapfrog: int = 256,
    collect: str = "draws",
    warmup: str = "xla",
) -> FusedModelResult:
    """Whole-run fused HMC for an ARBITRARY model.

    ``logdensity_fn`` is a per-chain log density over a position dict in
    UNCONSTRAINED space (wrap constrained variables with
    ``pdf.transforms.transform_logdensity`` first); every array it closes
    over (data, hyperparameters) is hoisted into VMEM-resident kernel
    operands automatically.  Warmup (Stan windows, pooled dual averaging +
    cross-chain diagonal mass) runs on the XLA path; the sampling phase is
    ONE ``pallas_call``.  Returns unconstrained draws -- apply
    ``transforms.constrain`` / ``jnp.exp`` downstream as the model requires.

    With ``mesh`` (a Mesh with a ``chain`` axis), chains are sharded over
    the devices: warmup adaptation statistics reduce across devices via the
    collectives XLA inserts, and the sampling phase runs ONE fused kernel
    PER DEVICE over its chain shard (``shard_map``), with per-device PRNG
    streams.  Draws come back sharded on the chain axis.

    ``collect="moments"`` accumulates streaming Welford mean/variance
    INSIDE the kernel (O(D) HBM instead of O(num_samples * D)) and returns
    them in ``result.mean`` / ``result.variance``; ``result.samples`` is
    then None.  ``result.final_positions`` always carries the last state,
    so runs can be chained or checkpointed
    (``parallel.production.run_fused_blocks``).

    ``warmup="fused"`` runs the adaptation INSIDE a Pallas kernel too
    (``fused_warmup_run``: same Stan windows / dual averaging / Welford
    mass, pooled per chain tile instead of across all chains): warmup +
    sampling + packing then execute as ONE jit -- a single host dispatch,
    which on a tunneled TPU cuts end-to-end warm latency from ~1.2 s to the
    device compute time.  Composes with ``trajectory="chees"`` (the whole
    adaptive ChEES run as one dispatch); ``step_size`` and
    ``inverse_mass`` in the result are then per-chain arrays.

    ``warmup="dense"`` adapts a FULL covariance metric
    (``samplers.dense.dense_window_adaptation`` on the XLA path) and runs
    the fused sampling kernel with (D_pad, D_pad) MXU-matmul momenta and
    velocities -- the preconditioner for correlated posteriors;
    ``inverse_mass`` in the result is then the (D, D) matrix.

    ``trajectory="chees"`` adapts the mean trajectory length T during
    warmup with ChEES (Hoffman, Radul & Sountsov 2021) instead of using
    the fixed ``num_leapfrog``, and the fused sampling kernel integrates
    halton-jittered trajectories with a TRACED loop bound
    ``L_t = ceil(h_t * 2T/eps)`` clamped to ``max_leapfrog`` -- no frozen
    static length, no host sync (round 5; ``result.trajectory_length``
    carries T).  ``initial_step_size=None`` seeds warmup with
    ``find_reasonable_step_size``.
    """
    from binf_tpu.samplers.adaptation import window_adaptation
    from binf_tpu.samplers.hmc import hmc

    n_chains = jax.tree.leaves(initial_positions)[0].shape[0]
    template = jax.tree.map(lambda x: x[0], initial_positions)
    potential, consts, spec = _cached_tile_potential(logdensity_fn, template)

    on_cpu = jax.default_backend() == "cpu"
    if host_noise is None:
        host_noise = on_cpu
    if interpret is None:
        interpret = on_cpu

    k_warm, k_run = jax.random.split(key)

    if mesh is not None:
        from binf_tpu.parallel.mesh import shard_chains

        initial_positions = shard_chains(initial_positions, mesh)

    if num_samples % thin:
        raise ValueError(f"{num_samples=} must be divisible by {thin=}")
    n_dev = mesh.shape["chain"] if mesh is not None else 1
    if n_chains % n_dev:
        raise ValueError(f"{n_chains=} must be divisible by mesh chain axis {n_dev}")
    n_local = n_chains // n_dev
    if block_chains == "auto":
        block_chains = _auto_block_chains(
            spec, consts,
            sequential=_contains_loop(
                jax.make_jaxpr(logdensity_fn)(template).jaxpr
            ),
        )
    bc = min(block_chains, n_local)
    while n_local % bc:
        bc -= 1
    spb = min(max(50, thin), num_samples)
    while num_samples % spb or spb % thin:
        spb -= 1

    run_kwargs = dict(
        num_steps=num_samples,
        num_leapfrog=num_leapfrog,
        block_chains=bc,
        steps_per_block=spb,
        interpret=interpret,
        host_noise=host_noise,
        thin=thin,
        collect=collect,
    )

    if warmup == "fused":
        if per_chain_step_size:
            raise ValueError(
                "per_chain_step_size is not supported with warmup='fused' "
                "(the fused warmup pools dual averaging per chain tile); "
                "use warmup='xla'"
            )
        return _fused_warmup_path(
            potential, consts, spec, initial_positions, key,
            num_warmup=num_warmup, num_leapfrog=num_leapfrog,
            # None -> in-kernel Hoffman-Gelman doubling search from 1.0
            # (the fused analogue of find_reasonable_step_size)
            initial_step_size=(
                1.0 if initial_step_size is None else initial_step_size
            ),
            init_search=initial_step_size is None,
            block_chains=bc, mesh=mesh, interpret=interpret,
            host_noise=host_noise, collect=collect, trajectory=trajectory,
            max_leapfrog=max_leapfrog,
            run_kwargs=run_kwargs,
        )
    if warmup == "dense":
        # full-covariance metric: XLA dense window adaptation, then the
        # fused sampling kernel integrates with (D_pad, D_pad) MXU matmuls
        # (momentum p = W z, velocity M^{-1} p) -- the preconditioner for
        # correlated posteriors (see samplers/dense.py)
        if per_chain_step_size:
            raise ValueError(
                "per_chain_step_size is not supported with warmup='dense' "
                "(the dense metric is pooled across chains)"
            )
        if trajectory != "fixed":
            raise ValueError("warmup='dense' requires trajectory='fixed'")
        return _dense_full_run(
            initial_positions, key, consts,
            potential=potential,
            logdensity_fn=logdensity_fn,
            spec_t=tuple(spec),
            mesh=mesh,
            collect=collect,
            num_warmup=num_warmup,
            initial_step_size=(
                0.1 if initial_step_size is None else float(initial_step_size)
            ),
            run_statics=tuple(sorted(run_kwargs.items())),
        )

    if warmup != "xla":
        raise ValueError(f"unknown {warmup=}; use 'xla', 'dense', or 'fused'")

    if trajectory == "chees":
        chees = _chees_warmup_cached(
            initial_positions, k_warm,
            logdensity_fn=logdensity_fn, num_warmup=num_warmup,
            initial_step_size=(
                0.1 if initial_step_size is None else float(initial_step_size)
            ),
            max_leapfrog=max_leapfrog,
        )
        # the sampling kernel jitters trajectories in-kernel around the
        # adapted mean length T (traced loop bound) -- no host sync, no
        # frozen static L (round-4 behavior superseded)
        run_kwargs = dict(
            run_kwargs, trajectory="chees", max_leapfrog=max_leapfrog,
            traj_length=chees.trajectory_length,
        )

        class _Adapt(NamedTuple):
            step_size: Any
            inverse_mass: Any
            final_states: Any

        class _States(NamedTuple):
            position: Any

        adapt = _Adapt(chees.step_size, chees.inverse_mass,
                       _States(chees.final_positions))
    elif trajectory != "fixed":
        raise ValueError(f"unknown {trajectory=}; use 'fixed' or 'chees'")
    else:
        adapt = _xla_window_warmup(
            initial_positions, k_warm,
            logdensity_fn=logdensity_fn, num_warmup=num_warmup,
            num_leapfrog=num_leapfrog,
            initial_step_size=(
                None if initial_step_size is None else float(initial_step_size)
            ),
            per_chain=per_chain_step_size,
        )

    @jax.jit  # one dispatch for all packing (tunnel RTT is ~70 ms/call)
    def prepare(adapt, k):
        q0 = pack_positions(adapt.final_states.position, spec)
        im_vec = pack_positions(
            jax.tree.map(lambda x: jnp.broadcast_to(x, (1,) + jnp.shape(x)),
                         adapt.inverse_mass),
            spec,
        )[0]
        eps = jnp.broadcast_to(
            jnp.asarray(adapt.step_size, jnp.float32).reshape(-1),
            (q0.shape[0],),
        )
        seed = jax.random.randint(k, (), 0, 2**31 - 1)
        return q0, im_vec, eps, seed

    q0, im_vec, eps, seed = prepare(adapt, k_run)

    if mesh is None:
        res = fused_potential_hmc_run(
            potential, q0, seed, eps, im_vec, consts, **run_kwargs
        )
        collected, acc, qf = (
            (res.mean, res.variance) if collect == "moments" else (res.draws,)
        ), res.accept_rate, res.final_positions
    else:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        # traj_length (chees) is a traced array: pass it as an explicit
        # replicated shard_map operand rather than a closure capture
        traj = run_kwargs.pop("traj_length", None)
        has_traj = traj is not None
        if not has_traj:
            traj = jnp.zeros(())

        def device_run(seed_g, q0_l, eps_l, im_l, traj_g, consts_l):
            seed_l = seed_g + jax.lax.axis_index("chain")
            r = fused_potential_hmc_run(
                potential, q0_l, seed_l, eps_l, im_l, consts_l,
                **(dict(run_kwargs, traj_length=traj_g) if has_traj
                   else run_kwargs),
            )
            a = jax.lax.pmean(r.accept_rate, "chain")
            if collect == "moments":
                return (r.mean, r.variance), a, r.final_positions
            return (r.draws,), a, r.final_positions

        if collect == "moments":
            coll_spec = (P("chain", None), P("chain", None))
        else:
            coll_spec = (P(None, "chain", None),)
        collected, acc, qf = jax.jit(
            shard_map(
                device_run,
                mesh=mesh,
                in_specs=(P(), P("chain", None), P("chain"), P(), P(), P()),
                out_specs=(coll_spec, P(), P("chain", None)),
                check_vma=False,  # pallas_call does not annotate vma
            )
        )(seed, q0, eps, im_vec, traj, consts)
    final_positions = _unpack_jit(qf, tuple(spec))
    T_res = (getattr(adapt, "trajectory_length", None)
             if trajectory != "chees" else chees.trajectory_length)
    if collect == "moments":
        mean, variance = collected
        return FusedModelResult(
            samples=None,
            accept_rate=acc,
            step_size=adapt.step_size,
            inverse_mass=im_vec,
            mean=_unpack_jit(mean, tuple(spec)),
            variance=_unpack_jit(variance, tuple(spec)),
            final_positions=final_positions,
            trajectory_length=T_res,
        )
    (draws,) = collected
    return FusedModelResult(
        samples=_unpack_jit(draws, tuple(spec)),
        accept_rate=acc,
        step_size=adapt.step_size,
        inverse_mass=im_vec,
        final_positions=final_positions,
        trajectory_length=T_res,
    )


# -- fused (in-kernel) warmup path -------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=(
        "potential", "spec_t", "mesh", "collect", "initial_step_size",
        "warm_statics", "run_statics",
    ),
)
def _fused_full_run(
    positions,
    k,
    consts,
    *,
    potential,
    spec_t,
    mesh,
    collect,
    initial_step_size,
    warm_statics,
    run_statics,
) -> FusedModelResult:
    """Pack -> fused warmup kernel -> fused sampling kernel -> unpack, all
    under ONE jit: a single host dispatch for the complete adaptive run."""
    warm_kwargs = dict(warm_statics)
    run_kwargs = dict(run_statics)
    chees = warm_kwargs.get("trajectory", "fixed") == "chees"
    spec = list(spec_t)
    q0 = pack_positions(positions, spec)
    kw, kr = jax.random.split(k)
    seed_w = jax.random.randint(kw, (), 0, 2**31 - 1)
    seed_r = jax.random.randint(kr, (), 0, 2**31 - 1)

    if mesh is None:
        warm_out = fused_warmup_run(
            potential, q0, seed_w, initial_step_size, consts, **warm_kwargs
        )
        qw, eps, im = warm_out[:3]
        T = warm_out[3] if chees else None
        res = fused_potential_hmc_run(
            potential, qw, seed_r, eps, im, consts,
            **(dict(run_kwargs, traj_length=T) if chees else run_kwargs),
        )
        collected = (
            (res.mean, res.variance) if collect == "moments" else (res.draws,)
        )
        acc, qf = res.accept_rate, res.final_positions
    else:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        def device_run(sw, sr, q0_l, consts_l):
            ax = jax.lax.axis_index("chain")
            warm_out = fused_warmup_run(
                potential, q0_l, sw + ax, initial_step_size, consts_l,
                **warm_kwargs,
            )
            qw, eps_l, im_l = warm_out[:3]
            T_l = warm_out[3] if chees else jnp.zeros_like(eps_l)
            r = fused_potential_hmc_run(
                potential, qw, sr + ax, eps_l, im_l, consts_l,
                **(dict(run_kwargs, traj_length=T_l) if chees
                   else run_kwargs),
            )
            a = jax.lax.pmean(r.accept_rate, "chain")
            coll = (
                (r.mean, r.variance) if collect == "moments" else (r.draws,)
            )
            return coll, a, r.final_positions, eps_l, im_l, T_l

        coll_spec = (
            (P("chain", None), P("chain", None))
            if collect == "moments"
            else (P(None, "chain", None),)
        )
        collected, acc, qf, eps, im, T = shard_map(
            device_run,
            mesh=mesh,
            in_specs=(P(), P(), P("chain", None), P()),
            out_specs=(coll_spec, P(), P("chain", None), P("chain"),
                       P("chain", None), P("chain")),
            check_vma=False,  # pallas_call does not annotate vma
        )(seed_w, seed_r, q0, consts)
        if not chees:
            T = None

    final_positions = unpack_draws(qf, spec)
    if collect == "moments":
        mean, variance = collected
        return FusedModelResult(
            samples=None,
            accept_rate=acc,
            step_size=eps,
            inverse_mass=im,
            mean=unpack_draws(mean, spec),
            variance=unpack_draws(variance, spec),
            final_positions=final_positions,
            trajectory_length=T,
        )
    (draws,) = collected
    return FusedModelResult(
        samples=unpack_draws(draws, spec),
        accept_rate=acc,
        step_size=eps,
        inverse_mass=im,
        final_positions=final_positions,
        trajectory_length=T,
    )


def _fused_warmup_path(
    potential, consts, spec, initial_positions, key, *,
    num_warmup, num_leapfrog, initial_step_size, block_chains, mesh,
    interpret, host_noise, collect, trajectory, run_kwargs,
    init_search=False, max_leapfrog=256,
) -> FusedModelResult:
    if trajectory not in ("fixed", "chees"):
        raise ValueError(f"unknown {trajectory=}; use 'fixed' or 'chees'")
    chees = trajectory == "chees"
    warm_statics = (
        ("num_warmup", num_warmup),
        ("num_leapfrog", num_leapfrog),
        ("block_chains", block_chains),
        ("interpret", interpret),
        ("host_noise", host_noise),
        ("init_search", init_search),
        ("trajectory", trajectory),
        ("max_leapfrog", max_leapfrog),
        # ChEES paper target acceptance (Hoffman/Radul/Sountsov 2021)
        ("target_accept", 0.651 if chees else 0.8),
    )
    if chees:
        run_kwargs = dict(
            run_kwargs, trajectory="chees", max_leapfrog=max_leapfrog
        )
    return _fused_full_run(
        initial_positions, key, consts,
        potential=potential,
        spec_t=tuple(spec),
        mesh=mesh,
        collect=collect,
        initial_step_size=float(initial_step_size),
        warm_statics=warm_statics,
        run_statics=tuple(sorted(run_kwargs.items())),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "potential", "logdensity_fn", "spec_t", "mesh", "collect",
        "num_warmup", "initial_step_size", "run_statics",
    ),
)
def _dense_full_run(
    positions,
    k,
    consts,
    *,
    potential,
    logdensity_fn,
    spec_t,
    mesh,
    collect,
    num_warmup,
    initial_step_size,
    run_statics,
) -> FusedModelResult:
    """Dense-metric warmup + fused MXU-momenta sampling under ONE cached
    jit.  Round-5 fix: the previous driver defined its warmup jit inside
    ``fused_model_hmc``, so every call RETRACED and re-looked-up the
    compilation -- 862.8 ms end-to-end at the headline shape against a
    measured 29.2 ms (warmup) + 35.0 ms (sampling) of device time.  One
    module-level jit keyed on (potential, logdensity_fn, statics) makes
    repeat dense runs pay device time plus a single dispatch."""
    from binf_tpu.samplers.dense import dense_window_adaptation

    run_kwargs = dict(run_statics)
    spec = list(spec_t)
    num_leapfrog = run_kwargs.get("num_leapfrog", 10)

    a = dense_window_adaptation(
        logdensity_fn, positions, k, num_steps=num_warmup,
        num_integration_steps=num_leapfrog,
        initial_step_size=initial_step_size,
    )
    q0 = pack_positions(a.final_positions, spec)
    minv = a.inverse_mass_matrix
    eps = jnp.broadcast_to(
        jnp.asarray(a.step_size, jnp.float32).reshape(-1), (q0.shape[0],)
    )
    seed = jax.random.randint(jax.random.fold_in(k, 1), (), 0, 2**31 - 1)
    dense_kwargs = dict(run_kwargs, dense_mass=True)

    if mesh is None:
        r = fused_potential_hmc_run(
            potential, q0, seed, eps, minv, consts, **dense_kwargs
        )
        collected = (
            (r.mean, r.variance) if collect == "moments" else (r.draws,)
        )
        acc, qf = r.accept_rate, r.final_positions
    else:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        def device_run_dense(seed_g, q0_l, eps_l, minv_g, consts_l):
            seed_l = seed_g + jax.lax.axis_index("chain")
            r = fused_potential_hmc_run(
                potential, q0_l, seed_l, eps_l, minv_g, consts_l,
                **dense_kwargs
            )
            a_l = jax.lax.pmean(r.accept_rate, "chain")
            if collect == "moments":
                return (r.mean, r.variance), a_l, r.final_positions
            return (r.draws,), a_l, r.final_positions

        if collect == "moments":
            coll_spec = (P("chain", None), P("chain", None))
        else:
            coll_spec = (P(None, "chain", None),)
        collected, acc, qf = shard_map(
            device_run_dense,
            mesh=mesh,
            in_specs=(P(), P("chain", None), P("chain"), P(None, None), P()),
            out_specs=(coll_spec, P(), P("chain", None)),
            check_vma=False,
        )(seed, q0, eps, minv, consts)

    final_positions = unpack_draws(qf, spec)
    if collect == "moments":
        mean, variance = collected
        return FusedModelResult(
            samples=None,
            accept_rate=acc,
            step_size=eps[0],
            inverse_mass=minv,
            mean=unpack_draws(mean, spec),
            variance=unpack_draws(variance, spec),
            final_positions=final_positions,
        )
    (draws,) = collected
    return FusedModelResult(
        samples=unpack_draws(draws, spec),
        accept_rate=acc,
        step_size=eps[0],
        inverse_mass=minv,
        final_positions=final_positions,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "logdensity_fn", "num_warmup", "num_leapfrog", "initial_step_size",
        "per_chain", "target_accept",
    ),
)
def _xla_window_warmup(
    positions, k, *, logdensity_fn, num_warmup, num_leapfrog,
    initial_step_size, per_chain, target_accept=0.8,
):
    """Module-level cached warmup jit (keyed on the log density identity).
    Round-5 fix: inner per-call jits retraced every run -- the dense path
    measured 862.8 ms e2e against 64 ms of device time; caching recovers
    repeat-run latency for every fused_model_hmc warmup mode."""
    from binf_tpu.samplers.adaptation import window_adaptation
    from binf_tpu.samplers.hmc import hmc

    def builder(step_size, inverse_mass):
        return hmc(logdensity_fn, step_size, num_leapfrog, inverse_mass)

    states = jax.vmap(
        builder(
            1.0 if initial_step_size is None else initial_step_size, None
        ).init
    )(positions)
    return window_adaptation(
        builder, states, k, num_steps=num_warmup,
        initial_step_size=initial_step_size,
        target_accept=target_accept,
        per_chain=per_chain,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "logdensity_fn", "num_warmup", "initial_step_size", "max_leapfrog",
    ),
)
def _chees_warmup_cached(
    positions, k, *, logdensity_fn, num_warmup, initial_step_size,
    max_leapfrog,
):
    from binf_tpu.samplers.chees import chees_adaptation

    return chees_adaptation(
        logdensity_fn, positions, k, num_steps=num_warmup,
        initial_step_size=initial_step_size,
        max_leapfrog=max_leapfrog,
    )
