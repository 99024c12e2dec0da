"""Driver for the chain-grid fused kernel (data-heavy densities).

``chain_grid_model_hmc`` mirrors ``samplers.fused.fused_model_hmc`` -- XLA
window-adaptation warmup, then the whole sampling phase in one Pallas
kernel -- but runs the round-5 chain-grid kernel
(``ops/pallas/chain_grid.py``): chains ride the grid, each chain's density
is evaluated at natural per-chain shapes with the data axis in lanes.
This is the fused path for models whose per-chain data blows the
chains-in-lanes kernel's VMEM (chromatin D=193: 203 MB at a 128-lane tile,
docs/performance.md), i.e. the reference's own application class
(``README.rst:9``).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from binf_tpu.ops.pallas.chain_grid import (
    chain_grid_hmc_run,
    chain_grid_potential_from_scalar,
)
from binf_tpu.ops.pallas.fused_potential import pack_positions
from binf_tpu.samplers.fused import FusedModelResult

Array = jax.Array

__all__ = ["chain_grid_model_hmc"]

_CG_CACHE: dict = {}


def _cached_cg_potential(logdensity_fn, template):
    from binf_tpu.samplers.fused import _cached_potential

    return _cached_potential(
        _CG_CACHE, chain_grid_potential_from_scalar, logdensity_fn, template
    )


def chain_grid_model_hmc(
    logdensity_fn: Callable,
    initial_positions: dict[str, Array],  # chain-batched (C, ...) per leaf
    key: Array,
    num_warmup: int = 400,
    num_samples: int = 1000,
    num_leapfrog: int = 10,
    initial_step_size: float | None = 0.05,
    block_chains: int = 8,
    thin: int = 1,
    mesh=None,
    host_noise: bool | None = None,
    interpret: bool | None = None,
    collect: str = "draws",
    target_accept: float = 0.8,
) -> FusedModelResult:
    """Adaptive HMC with the sampling phase in the chain-grid kernel.

    Same contract as ``fused_model_hmc`` (warmup on the XLA path: Stan
    windows, pooled dual averaging, cross-chain diagonal metric; draws in
    UNCONSTRAINED space; ``collect="moments"`` streams Welford moments
    in-kernel).  ``block_chains`` is the kernel's chain UNROLL factor S
    (multiples of 8), not a lane width.

    Hardware supportability: the kernel targets DATA-HEAVY densities whose
    per-chain intermediates are >= 2-D (restraint matrices, design blocks)
    -- those lower cleanly.  Densities dominated by bare 1-D vector math
    can hit residual Mosaic 1-D limitations on real TPUs (1-D dot operands
    are auto-promoted, but e.g. some 1-D reductions still fail with
    "Not implemented" -- interpret mode is unaffected); such models are the
    lane kernel's measured win regime anyway (``--algorithm fused/auto``).
    """
    from binf_tpu.samplers.adaptation import window_adaptation
    from binf_tpu.samplers.hmc import hmc

    template = jax.tree.map(lambda x: x[0], initial_positions)
    potential, consts, spec = _cached_cg_potential(logdensity_fn, template)

    on_cpu = jax.default_backend() == "cpu"
    if host_noise is None:
        host_noise = on_cpu
    if interpret is None:
        interpret = on_cpu

    n_chains = jax.tree.leaves(initial_positions)[0].shape[0]
    n_dev = mesh.shape["chain"] if mesh is not None else 1
    if n_chains % n_dev:
        raise ValueError(f"{n_chains=} not divisible by mesh axis {n_dev}")
    if (n_chains // n_dev) % block_chains:
        raise ValueError(
            f"chains per device {n_chains // n_dev} not divisible by "
            f"{block_chains=}"
        )
    if num_samples % thin:
        raise ValueError(f"{num_samples=} must be divisible by {thin=}")
    spb = min(max(50, thin), num_samples)
    while num_samples % spb or spb % thin:
        spb -= 1

    if mesh is not None:
        from binf_tpu.parallel.mesh import shard_chains

        initial_positions = shard_chains(initial_positions, mesh)

    k_warm, k_run = jax.random.split(key)

    def builder(step_size, inverse_mass):
        return hmc(logdensity_fn, step_size, num_leapfrog, inverse_mass)

    @jax.jit
    def warm(positions, k):
        states = jax.vmap(
            builder(
                1.0 if initial_step_size is None else initial_step_size,
                None,
            ).init
        )(positions)
        return window_adaptation(
            builder, states, k, num_steps=num_warmup,
            initial_step_size=initial_step_size,
            target_accept=target_accept,
        )

    adapt = warm(initial_positions, k_warm)
    q0 = adapt.final_states.position
    im = adapt.inverse_mass  # dict of natural per-variable shapes
    seed = jax.random.randint(k_run, (), 0, 2**31 - 1)

    run_kwargs = dict(
        num_steps=num_samples,
        num_leapfrog=num_leapfrog,
        block_chains=block_chains,
        steps_per_block=spb,
        interpret=interpret,
        host_noise=host_noise,
        thin=thin,
        collect=collect,
    )

    if mesh is None:
        res = chain_grid_hmc_run(
            potential, q0, seed, adapt.step_size, im, consts, **run_kwargs
        )
        draws, mean, var = res.draws, res.mean, res.variance
        acc, qf = res.accept_rate, res.final_positions
    else:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        pos_spec = jax.tree.map(lambda _: P("chain"), q0)

        def device_run(seed_g, q0_l, eps_l, im_g, consts_g):
            seed_l = seed_g + jax.lax.axis_index("chain")
            r = chain_grid_hmc_run(
                potential, q0_l, seed_l, eps_l, im_g, consts_g, **run_kwargs
            )
            a = jax.lax.pmean(r.accept_rate, "chain")
            if collect == "moments":
                return (r.mean, r.variance), a, r.final_positions
            return (r.draws,), a, r.final_positions

        eps_all = jnp.broadcast_to(
            jnp.asarray(adapt.step_size, jnp.float32).reshape(-1),
            (n_chains,),
        )
        if collect == "moments":
            coll_spec = (pos_spec, pos_spec)
        else:
            coll_spec = (jax.tree.map(lambda _: P(None, "chain"), q0),)
        collected, acc, qf = jax.jit(
            shard_map(
                device_run,
                mesh=mesh,
                in_specs=(P(), pos_spec, P("chain"), P(), P()),
                out_specs=(coll_spec, P(), pos_spec),
                check_vma=False,  # pallas_call does not annotate vma
            )
        )(seed, q0, eps_all, im, consts)
        if collect == "moments":
            mean, var = collected
            draws = None
        else:
            (draws,) = collected
            mean = var = None

    im_vec = pack_positions(
        jax.tree.map(lambda x: jnp.broadcast_to(x, (1,) + jnp.shape(x)), im),
        spec,
    )[0]
    return FusedModelResult(
        samples=draws,
        accept_rate=acc,
        step_size=adapt.step_size,
        inverse_mass=im_vec,
        mean=mean,
        variance=var,
        final_positions=qf,
    )
