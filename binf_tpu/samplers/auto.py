"""Measured-winner routing between the fused Pallas path and the XLA path.

The framework has two ways to run adaptive HMC on an arbitrary model:

* the FUSED path (``samplers.fused.fused_model_hmc``): the whole run is one
  Pallas kernel -- wins on sequential densities (2.4-2.7x), at small/medium
  chain batches (1.3-1.6x), and structurally (single-dispatch warmup,
  in-kernel moments);
* the XLA path (``parallel.runner.warmup_and_run``): ``scan(vmap(hmc))`` --
  wins on large-batch feed-forward models whose graph XLA fuses globally
  (measured: hierarchical 21-D at 8k chains runs 0.47x on the fused path at
  EVERY tile width, docs/performance.md).

The reference has exactly one way to run anything -- the user's for-loop
(``example_script.py:33-37``) -- so "routing" is a new capability, not a
ported one.  :func:`route_algorithm` is the cheap shape-based cost model
distilled from the measured family table (docs/performance.md:79-104), and
:func:`adaptive_hmc` is the single entry point that runs the winner with
one result contract.  The rules are deliberately simple and fully
deterministic so the chosen path is testable per model/shape.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from binf_tpu.samplers.fused import (
    FusedModelResult,
    _auto_block_chains,
    _cached_tile_potential,
    _contains_loop,
    fused_model_hmc,
)

Array = jax.Array

__all__ = [
    "RoutingDecision", "route_algorithm", "adaptive_hmc",
    "route_trajectory_sampler",
]


class RoutingDecision(NamedTuple):
    """Outcome of the shape-based cost model.

    ``path``: ``"fused"`` or ``"xla"``; ``reason``: the measured rule that
    fired (human-readable, stable prefixes for tests); ``d`` / ``d_pad``:
    flat state dimension and its 8-lane padding; ``n_local_chains``: chains
    per device; ``sequential``: the density's jaxpr contains a
    ``scan``/``while`` loop; ``block_chains``: the VMEM-derived chain-tile
    width the fused kernel would use (None when not tile-compilable)."""

    path: str
    reason: str
    d: int
    d_pad: int
    n_local_chains: int
    sequential: bool
    block_chains: int | None


def route_algorithm(
    logdensity_fn: Callable,
    initial_positions: dict[str, Array],
    mesh=None,
) -> RoutingDecision:
    """Pick fused vs XLA for this (model, shape) from the measured rules.

    Measured basis (docs/performance.md, TPU v5e, 2026-08-21):

    1. density not tile-compilable -> XLA (only choice);
    2. sequential density (``lax.scan``/``while`` in the graph) -> FUSED:
       XLA's scan-inside-scan schedules poorly; measured 2.4-2.7x at every
       batch size (statespace family);
    3. <= 2048 chains per device -> FUSED: one kernel amortizes launch +
       per-step overhead; measured 1.3-1.6x on every family;
    4. large-batch feed-forward: FUSED only when the padded state is one
       lane group (d_pad <= 8) AND the VMEM budget allows a >= 2048-chain
       tile (polynomial reaches 1.0x there and keeps the single-dispatch
       advantages); otherwise XLA (hierarchical d_pad=24 measured 0.47x
       fused at 8k chains at every tile width; mixture's VMEM-bound 1024
       tile measured 0.95x).
    """
    from binf_tpu.ops.pallas.tile_interpreter import UnsupportedPrimitiveError

    n_chains = jax.tree.leaves(initial_positions)[0].shape[0]
    n_dev = mesh.shape["chain"] if mesh is not None else 1
    n_local = n_chains // max(n_dev, 1)
    template = jax.tree.map(lambda x: x[0], initial_positions)

    try:
        _, consts, spec = _cached_tile_potential(logdensity_fn, template)
    except UnsupportedPrimitiveError as e:
        d = sum(
            int(jnp.size(jnp.asarray(template[name]))) for name in template
        )
        return RoutingDecision(
            path="xla",
            reason=f"not tile-compilable: {e}",
            d=d,
            d_pad=((d + 7) // 8) * 8,
            n_local_chains=n_local,
            sequential=False,
            block_chains=None,
        )

    d = sum(size for _, _, size in spec)
    d_pad = ((d + 7) // 8) * 8
    sequential = _contains_loop(jax.make_jaxpr(logdensity_fn)(template).jaxpr)
    bc = _auto_block_chains(spec, consts, sequential=sequential)

    if _data_heavy(d_pad, consts, n_local):
        return RoutingDecision(
            "xla",
            "data-heavy density: the floor chain tile exceeds the "
            "kernel's scoped-VMEM budget (measured: chromatin needs "
            "203MB at 128 lanes vs 128MB available) -> XLA path",
            d, d_pad, n_local, sequential, None,
        )

    if sequential:
        return RoutingDecision(
            "fused",
            "sequential density (scan/while): fused whole-run kernel "
            "measured 2.4-2.7x vs XLA scan-in-scan",
            d, d_pad, n_local, sequential, bc,
        )
    if n_local <= 2048:
        return RoutingDecision(
            "fused",
            "small/medium chain batch (<=2048/device): fused kernel "
            "amortizes dispatch, measured 1.3-1.6x",
            d, d_pad, n_local, sequential, bc,
        )
    if d_pad <= 8:
        return RoutingDecision(
            "fused",
            "large batch, small state (d_pad<=8): measured >=1.0x at every "
            "tile since the canonical lane-level value+grad (polynomial@8k "
            "1.9x, mixture@8k 1.02x) plus single-dispatch warmup",
            d, d_pad, n_local, sequential, bc,
        )
    return RoutingDecision(
        "xla",
        "large-batch feed-forward with d_pad>8: XLA global fusion wins "
        "(hierarchical@8k measured 0.47x fused at every tile width)",
        d, d_pad, n_local, sequential, bc,
    )


def _data_heavy(d_pad: int, consts: dict, n_local: int) -> bool:
    """The router's shared VMEM cost model: does the fused lane kernel's
    FLOOR chain tile exceed its scoped-VMEM budget for this density?

    The floor tile is min(512, n_local) clamped to the 128-lane Mosaic
    f32 tile granularity (narrower tiles still occupy 128 padded lanes of
    VMEM); the 1.45x factor is the measured estimate-to-actual ratio
    (chromatin D=193: 1.1MB/lane estimated vs 1.6MB/lane actual, which
    blew 128MB chip VMEM at a 128-lane tile); the 0.8 margin keeps
    borderline shapes off the path that would fail at compile time
    (ADVICE round 4 + round-5 review)."""
    import numpy as _np

    c_tot = sum(
        int(_np.prod(v.shape)) if getattr(v, "shape", ()) else 1
        for v in consts.values()
    )
    per_lane = 4 * 32 * (d_pad + c_tot)
    floor_tile = min(512, max(n_local, 128))
    return per_lane * 1.45 * floor_tile > 0.8 * 100 * 1024 * 1024


def route_trajectory_sampler(
    requested: str,
    logdensity_fn: Callable,
    initial_positions: dict[str, Array],
) -> tuple[str, str]:
    """Measured-winner protection for trajectory samplers.

    Batched NUTS on TPU pays a large masked-tree overhead that depth
    capping CANNOT remove: on the hierarchical target (2048 chains, 200
    steps, v5e, round 5) the observed doubling depth is q90 = 3, yet NUTS
    runs 39x slower than fixed-L HMC even capped at max_doublings=4 (and
    97-119x at 5-8) -- the cost is per-leaf tree bookkeeping executed in
    lockstep for every chain, not the depth tail.  NUTS is therefore worth
    its overhead only when gradient evaluations are the scarce resource
    (its ESS per gradient is ~10x fixed-L): data-heavy densities in the
    sense of the router's VMEM cost model (chromatin-class restraint
    fields), where a single gradient dwarfs the tree bookkeeping.

    Returns ``(sampler, reason)``: the requested sampler if it survives the
    rules, otherwise the measured winner.  Callers that must honor the
    literal request (benchmarks, diagnostics) simply skip this router.
    """
    if requested != "nuts":
        return requested, f"requested {requested!r} (no reroute rule)"

    template = jax.tree.map(lambda x: x[0], initial_positions)
    n_local = jax.tree.leaves(initial_positions)[0].shape[0]
    try:
        _, consts, spec = _cached_tile_potential(logdensity_fn, template)
        d = sum(size for _, _, size in spec)
    except Exception:
        # not tile-compilable usually means an expensive/structured
        # density -- treat as gradient-scarce and honor the request
        return "nuts", (
            "nuts honored: density not tile-compilable (treated as "
            "gradient-scarce)"
        )
    d_pad = ((d + 7) // 8) * 8
    if _data_heavy(d_pad, consts, n_local):
        return "nuts", (
            "nuts honored: data-heavy density (gradient evaluations are "
            "the scarce resource; NUTS ESS/grad ~10x fixed-L)"
        )
    return "hmc", (
        "nuts rerouted to fixed-L HMC: cheap density, and batched NUTS "
        "pays a 39-119x lockstep masked-tree overhead on TPU at every "
        "max_doublings (depth q90=3 yet D=4 cap still 39x; round-5 "
        "measurement, docs/performance.md); pass --no-reroute to force"
    )


def adaptive_hmc(
    logdensity_fn: Callable,
    initial_positions: dict[str, Array],
    key: Array,
    num_warmup: int = 400,
    num_samples: int = 1000,
    num_leapfrog: int = 10,
    initial_step_size: float | None = 0.05,
    thin: int = 1,
    mesh=None,
    collect: str = "draws",
    algorithm: str = "auto",
    target_accept: float = 0.8,
    **fused_kwargs: Any,
) -> tuple[FusedModelResult, RoutingDecision]:
    """Adaptive HMC routed to the measured winner for this model/shape.

    ``algorithm="auto"`` (default) applies :func:`route_algorithm`;
    ``"fused"``/``"xla"`` force a path.  Both paths share one contract:
    warmup (Stan windows, pooled dual averaging, diagonal metric) then
    ``num_samples`` fixed-trajectory HMC steps, returning a
    :class:`FusedModelResult` in UNCONSTRAINED space plus the routing
    decision.  ``collect="moments"`` returns per-chain mean/variance
    instead of draws (in-kernel Welford on the fused path; a jitted
    reduction over the stored draws on the XLA path).

    Extra keyword arguments (``warmup=``, ``block_chains=``,
    ``trajectory=``, ...) apply to the fused path only and raise if a
    forced/routed XLA run receives them.
    """
    if algorithm == "auto":
        decision = route_algorithm(logdensity_fn, initial_positions, mesh)
    elif algorithm in ("fused", "xla"):
        decision = route_algorithm(logdensity_fn, initial_positions, mesh)
        decision = decision._replace(
            path=algorithm, reason=f"forced algorithm={algorithm!r}"
        )
    else:
        raise ValueError(
            f"unknown {algorithm=}; use 'auto', 'fused', or 'xla'"
        )

    if decision.path == "fused":
        result = fused_model_hmc(
            logdensity_fn,
            initial_positions,
            key,
            num_warmup=num_warmup,
            num_samples=num_samples,
            num_leapfrog=num_leapfrog,
            initial_step_size=initial_step_size,
            thin=thin,
            mesh=mesh,
            collect=collect,
            block_chains=fused_kwargs.pop(
                "block_chains",
                decision.block_chains if decision.block_chains else "auto",
            ),
            **fused_kwargs,
        )
        return result, decision

    if fused_kwargs:
        raise ValueError(
            f"options {sorted(fused_kwargs)} apply to the fused path only, "
            f"but this run routed to XLA ({decision.reason}); drop them or "
            "force algorithm='fused'"
        )
    result = _xla_adaptive_hmc(
        logdensity_fn, initial_positions, key,
        num_warmup=num_warmup, num_samples=num_samples,
        num_leapfrog=num_leapfrog, initial_step_size=initial_step_size,
        thin=thin, mesh=mesh, collect=collect, target_accept=target_accept,
    )
    return result, decision


def _xla_adaptive_hmc(
    logdensity_fn,
    initial_positions,
    key,
    *,
    num_warmup,
    num_samples,
    num_leapfrog,
    initial_step_size,
    thin,
    mesh,
    collect,
    target_accept,
) -> FusedModelResult:
    """XLA-path run shaped into the fused result contract."""
    from binf_tpu.ops.pallas.fused_potential import pack_positions, pack_template
    from binf_tpu.parallel.runner import warmup_and_run
    from binf_tpu.samplers.hmc import hmc

    template = jax.tree.map(lambda x: x[0], initial_positions)
    spec = pack_template(template)

    def builder(step_size, inverse_mass):
        return hmc(logdensity_fn, step_size, num_leapfrog, inverse_mass)

    (samples, accepted), final_states, adapt = warmup_and_run(
        builder,
        initial_positions,
        key,
        num_warmup=num_warmup,
        num_samples=num_samples,
        initial_step_size=initial_step_size,
        target_accept=target_accept,
        thin=thin,
        collect=lambda state, info: (state.position, info.accepted),
        mesh=mesh,
    )

    @jax.jit
    def finalize(samples, accepted, adapt_inverse_mass):
        acc = jnp.mean(accepted)
        im_vec = pack_positions(
            jax.tree.map(
                lambda x: jnp.broadcast_to(x, (1,) + jnp.shape(x)),
                adapt_inverse_mass,
            ),
            spec,
        )[0]
        if collect == "moments":
            # per-chain mean/variance over the draw axis, matching the
            # fused kernel's streaming Welford output shapes (C, ...)
            mean = jax.tree.map(lambda x: jnp.mean(x, axis=0), samples)
            var = jax.tree.map(lambda x: jnp.var(x, axis=0, ddof=1), samples)
            return acc, im_vec, mean, var
        return acc, im_vec, None, None

    acc, im_vec, mean, var = finalize(samples, accepted, adapt.inverse_mass)
    return FusedModelResult(
        samples=None if collect == "moments" else samples,
        accept_rate=acc,
        step_size=adapt.step_size,
        inverse_mass=im_vec,
        mean=mean,
        variance=var,
        final_positions=final_states.position,
    )
