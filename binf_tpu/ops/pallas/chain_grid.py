"""Chain-grid fused HMC: chains ride the Pallas GRID, data rides the lanes.

The general fused kernel (``fused_potential.py``) puts chains in the LANE
axis: every per-chain intermediate of logical shape ``sh`` becomes an
``(*sh, BC)`` tile, and every closed-over constant is effectively
replicated per lane in the VJP working set.  That layout is the measured
winner for small-state densities (polynomial, statespace), but it is the
measured LOSER for data-heavy densities:

* chromatin (D=193, (64, 64) restraint matrices): the lane-batched body
  needs 203 MB of scoped VMEM at even a 128-lane tile vs the chip's
  128 MB -- it cannot compile at any useful width (round-4 boundary,
  docs/performance.md);
* hierarchical@8k: the (G, n, BC) 3-D tile graph runs 0.47x vs XLA.

This module is the round-5 "data axis in lanes" tiling mode: the grid
iterates over blocks of ``S`` chains; within a block each chain's density
and gradient are evaluated at NATURAL per-chain shapes by tracing
``jax.value_and_grad`` of the scalar log density directly into the kernel
(no lane-batching interpreter).  A per-chain ``(N, N)`` intermediate is
then a well-formed 2-D Mosaic tile with the data axis in lanes, matmuls
hit the MXU in their natural orientation, and VMEM holds ONE copy of the
constants plus one chain-block's intermediates -- O(S * density) instead
of O(BC * density).  The trade: per-grid-step parallelism is only what
one chain's data provides, so the mode pays off exactly where the
chains-in-lanes kernel breaks down -- big per-chain data.

Everything else (whole-run fusion, PRNG streams indexed by absolute step
block for bitwise resume, streaming Welford moments, divergence guards)
mirrors the lane kernel so results are drop-in compatible.

Reference lineage: same replacement target as ``fused_potential.py`` --
the reference's per-sweep Python loop (``example_script.py:33-37``) and
``HMCSampler.sample`` (``binf/samplers/hmc.py:136-164``) -- here for the
reference's actual scientific workload class (chromatin restraint fields,
``README.rst:9``, likelihood shape ``binf/example/likelihood.py:54-57``).
"""

from __future__ import annotations

import functools
import math
import os
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from binf_tpu.ops.pallas.fused_potential import _pad_const
from binf_tpu.ops.pallas.tile_interpreter import UnsupportedPrimitiveError

Array = jax.Array

__all__ = [
    "ChainGridResult",
    "chain_grid_potential_from_scalar",
    "chain_grid_hmc_run",
]

_TWO_PI = 2.0 * math.pi


# -- potential front end ------------------------------------------------------


def chain_grid_potential_from_scalar(logdensity_fn: Callable, template: dict):
    """Compile ``logdensity(position_dict) -> scalar`` for the chain grid.

    Traces ``value_and_grad`` of the scalar density ONCE at the template's
    natural per-chain shapes and hoists every closed-over array into
    kernel operands (Pallas kernels cannot capture constants).  Returns
    ``(potential, consts, spec)`` where ``potential.value_and_grad(pos,
    kernel_consts)`` evaluates one chain's ``(U, grad_dict)`` inside the
    kernel by standard jaxpr evaluation -- data axes stay in lanes.

    ``spec`` is the sorted ``(name, shape, size)`` flattening spec shared
    with the lane kernel (``fused_potential.pack_template``), so draws and
    metrics interoperate.  Variable shapes must be at most 2-D (covers
    every model family; a >2-D variable can be reshaped upstream).
    """
    from binf_tpu.ops.pallas.fused_potential import pack_template

    spec = pack_template(template)
    for name, shape, _ in spec:
        if len(shape) > 2:
            raise UnsupportedPrimitiveError(
                f"chain-grid kernel supports variables up to 2-D; "
                f"{name!r} has shape {shape} (reshape upstream)"
            )

    names = [name for name, _, _ in spec]

    def neg_logdensity(pos):
        return -logdensity_fn(pos)

    tpl = {k: jnp.zeros(s, jnp.float32) for k, s, _ in spec}
    try:
        vag_closed = jax.make_jaxpr(jax.value_and_grad(neg_logdensity))(tpl)
    except ValueError as e:  # e.g. while_loop: not reverse-differentiable
        raise UnsupportedPrimitiveError(
            f"density is not reverse-differentiable: {e}"
        ) from None

    import numpy as _np

    meta_by_name: dict = {}
    consts: dict = {}
    _registry: list = []

    def _register_const(arr):
        arr = jnp.asarray(arr)
        if arr.ndim > 2:
            raise UnsupportedPrimitiveError(
                "closed-over constants must be at most 2-D for the fused "
                f"paths; got shape {arr.shape} (reshape the data upstream)"
            )
        b = _np.asarray(arr).tobytes()
        for cname, shape, dtype, saved in _registry:
            if shape == arr.shape and dtype == arr.dtype and saved == b:
                return cname
        cname = f"__c{len(_registry)}"
        _registry.append((cname, arr.shape, arr.dtype, b))
        meta_by_name[cname] = (arr.shape, arr.dtype)
        consts[cname] = arr
        return cname

    const_names = [_register_const(a) for a in vag_closed.consts]

    def _rebuild(kernel_consts, cname):
        shape, dtype = meta_by_name[cname]
        v = kernel_consts[cname]  # padded (rows8, cols) f32
        if len(shape) == 0:
            r = v[0, 0]
        elif len(shape) == 1:
            r = v[: shape[0], 0]
        else:
            r = v[: shape[0], : shape[1]]
        return r.astype(dtype)

    jaxpr = vag_closed.jaxpr
    flat_tpl, tree = jax.tree.flatten(tpl)
    n_in = len(flat_tpl)

    def value_and_grad(pos: dict, kernel_consts: dict):
        rebuilt = [_rebuild(kernel_consts, c) for c in const_names]
        leaves = [pos[k] for k in sorted(pos)]
        assert len(leaves) == n_in
        outs = jax.core.eval_jaxpr(jaxpr, rebuilt, *leaves)
        u, grads = outs[0], outs[1:]
        return u, dict(zip(names, grads))

    class _Potential:
        pass

    potential = _Potential()
    potential.value_and_grad = value_and_grad
    potential.spec = spec
    return potential, consts, spec


# -- in-kernel helpers --------------------------------------------------------


def _uniform(shape):
    bits = pltpu.prng_random_bits(shape)
    ubits = jnp.bitwise_and(bits, jnp.int32((1 << 23) - 1))
    return ubits.astype(jnp.float32) * (1.0 / (1 << 23)) + (0.5 / (1 << 23))


_BM_PAIRED = os.environ.get("BINF_BM_PAIRED", "0") == "1"


def _normal(shape):
    """Standard normals via Box-Muller (discard-sin form).

    The paired form (each (u1, u2) yielding BOTH the cos and sin normals,
    halving random bits + transcendentals) was MEASURED AND RETIRED in
    round 5: at the headline shape it runs 5-8% SLOWER (150.8/145.9 ms vs
    139.1 ms A/B on v5e) -- the hardware PRNG makes bits nearly free and
    exp is at 0.4% of its ceiling (roofline), so the sublane concatenate
    costs more than the arithmetic it saves.  BINF_BM_PAIRED=1 re-enables
    it for reproduction (changes the device-PRNG draw stream)."""
    if _BM_PAIRED and shape[0] % 2 == 0:
        h = shape[0] // 2
        u1 = jnp.maximum(_uniform((h, shape[1])), 1e-12)
        u2 = _uniform((h, shape[1]))
        r = jnp.sqrt(-2.0 * jnp.log(u1))
        theta = _TWO_PI * u2
        return jnp.concatenate([r * jnp.cos(theta), r * jnp.sin(theta)],
                               axis=0)
    u1 = jnp.maximum(_uniform(shape), 1e-12)
    u2 = _uniform(shape)
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(_TWO_PI * u2)


def _noise_shape(shape):
    """2-D generation shape for a variable: () -> (1, 1); (n,) -> (1, n);
    (n, m) stays.  1-D variables are generated as a lane row and squeezed
    (dropping a leading 1 is a no-op reshape on Mosaic tiles)."""
    if len(shape) == 0:
        return (1, 1)
    if len(shape) == 1:
        return (1, shape[0])
    return shape


def _to_var(z, shape):
    if len(shape) == 0:
        return z[0, 0]
    if len(shape) == 1:
        return z[0]
    return z


# -- the kernel ---------------------------------------------------------------


def _cg_kernel(
    *refs,
    potential,
    const_names,
    var_shapes,  # tuple of (name, shape)
    block_chains: int,
    steps_per_block: int,
    num_leapfrog: int,
    thin: int,
    collect: str,
    host_noise: bool,
):
    nv = len(var_shapes)
    (seed_ref, off_ref, eps_ref), rest = refs[:3], refs[3:]
    q0_refs, rest = rest[:nv], rest[nv:]
    im_refs, rest = rest[:nv], rest[nv:]
    mom_refs, rest = rest[:nv], rest[nv:]
    unif_ref, rest = rest[0], rest[1:]
    const_refs, rest = rest[: len(const_names)], rest[len(const_names):]
    if collect == "moments":
        mean_refs, rest = rest[:nv], rest[nv:]
        m2_refs, rest = rest[:nv], rest[nv:]
        out_refs = None
    else:
        out_refs, rest = rest[:nv], rest[nv:]
        mean_refs = m2_refs = None
    qf_refs, rest = rest[:nv], rest[nv:]
    (acc_ref,), scr_refs = rest[:1], rest[1:]

    i = pl.program_id(0)  # chain block
    j = pl.program_id(1)  # step block
    S = block_chains

    @pl.when(j == 0)
    def _():
        for v in range(nv):
            scr_refs[v][:] = q0_refs[v][:]
            if collect == "moments":
                mean_refs[v][:] = jnp.zeros(mean_refs[v].shape, jnp.float32)
                m2_refs[v][:] = jnp.zeros(m2_refs[v].shape, jnp.float32)

    @pl.when((i == 0) & (j == 0))
    def _():
        acc_ref[0, 0] = jnp.zeros((), jnp.float32)

    if not host_noise:
        # PRNG stream indexed by (chain block, ABSOLUTE step block):
        # consecutive calls with increasing block_offset replay one
        # uninterrupted run bitwise (checkpoint/resume contract, same as
        # the lane kernel)
        pltpu.prng_seed(seed_ref[0, 0], i * (1 << 20) + off_ref[0, 0] + j)

    consts = {c: ref[:] for c, ref in zip(const_names, const_refs)}
    # shared metric, rebuilt to natural per-variable shapes (zero-cost
    # slices of the padded operands)
    im = {
        name: _to_var(im_refs[v][: _noise_shape(shape)[0],
                                 : _noise_shape(shape)[1]], shape)
        for v, (name, shape) in enumerate(var_shapes)
    }

    def chain_state(s):
        # scalar variables load as (1, 1) tiles (Mosaic has no VMEM scalar
        # loads/stores) and are squeezed in-register for the density jaxpr
        return {
            name: scr_refs[v][s]
            if len(shape) > 0 else scr_refs[v][pl.ds(s, 1)].reshape(())
            for v, (name, shape) in enumerate(var_shapes)
        }

    def hmc_step(carry, _=None):
        # one MH-corrected trajectory for each of the block's S chains,
        # unrolled: every op stays at the chain's natural (data-in-lanes)
        # shape -- S is small, the density graph is what fills the VPU/MXU
        accept_sum = jnp.zeros((), jnp.float32)
        for s in range(S):
            q = chain_state(s)
            eps = eps_ref[s, 0]
            p = {}
            ke0 = jnp.zeros((), jnp.float32)
            for v, (name, shape) in enumerate(var_shapes):
                if host_noise:
                    z = mom_refs[v][carry, s]
                    z = z[0, 0] if len(shape) == 0 else (
                        z if len(shape) == 2 else z[0]
                    )
                else:
                    z = _to_var(_normal(_noise_shape(shape)), shape)
                pv = z / jnp.sqrt(jnp.maximum(im[name], 1e-20))
                p[name] = pv
                ke0 = ke0 + 0.5 * jnp.sum(pv * pv * im[name])
            if host_noise:
                u_mh = unif_ref[carry, s, 0]
            else:
                u_mh = _uniform((1, 1))[0, 0]

            U0, g = potential.value_and_grad(q, consts)
            E0 = U0 + ke0
            p = {k: p[k] - 0.5 * eps * g[k] for k in p}

            def leap(_, c):
                q, p, _, _ = c
                q = {k: q[k] + eps * p[k] * im[k] for k in q}
                u_, g = potential.value_and_grad(q, consts)
                p = {k: p[k] - eps * g[k] for k in p}
                return (q, p, u_, g)

            q_new, p, U1, g_end = jax.lax.fori_loop(
                0, num_leapfrog, leap, (q, p, U0, g)
            )
            p = {k: p[k] + 0.5 * eps * g_end[k] for k in p}
            ke1 = jnp.zeros((), jnp.float32)
            for k in p:
                ke1 = ke1 + 0.5 * jnp.sum(p[k] * p[k] * im[k])
            E1 = U1 + ke1

            dE = E0 - E1
            # divergence guard: NaN or |dH| beyond threshold rejects (f32
            # overflow can cancel into spuriously-good energies, same rule
            # as the lane kernel)
            dE = jnp.where(jnp.isnan(dE) | (jnp.abs(dE) > 1000.0),
                           -jnp.inf, dE)
            accept = jnp.log(jnp.maximum(u_mh, 1e-30)) < dE
            accept_sum = accept_sum + accept.astype(jnp.float32)
            for v, (name, shape) in enumerate(var_shapes):
                sel = jnp.where(accept, q_new[name], q[name])
                if len(shape) > 0:
                    scr_refs[v][s] = sel
                else:
                    scr_refs[v][pl.ds(s, 1)] = sel.reshape(1, 1)

        if collect == "moments":
            n = (j * steps_per_block + carry + 1).astype(jnp.float32)
            for v in range(nv):
                cur = scr_refs[v][:]
                delta = cur - mean_refs[v][:]
                mean_refs[v][:] = mean_refs[v][:] + delta / n
                m2_refs[v][:] = m2_refs[v][:] + delta * (cur - mean_refs[v][:])
        elif thin == 1:
            for v in range(nv):
                out_refs[v][carry] = scr_refs[v][:]
        else:
            @pl.when(carry % thin == thin - 1)
            def _():
                for v in range(nv):
                    out_refs[v][carry // thin] = scr_refs[v][:]
        acc_ref[0, 0] += accept_sum / S
        return carry + 1

    jax.lax.fori_loop(0, steps_per_block, hmc_step, 0)
    for v in range(nv):
        qf_refs[v][:] = scr_refs[v][:]


class ChainGridResult(NamedTuple):
    """Same contract as ``FusedRunResult`` but dict-per-variable (natural
    shapes; no flat packing): ``draws[v]`` is ``(num_steps//thin, C, *sh)``,
    moments are ``(C, *sh)``, ``final_positions[v]`` is ``(C, *sh)``."""

    draws: dict | None
    mean: dict | None
    variance: dict | None
    accept_rate: Array
    final_positions: dict


def _block_shape(shape, S):
    return (S,) + (shape if shape else (1,))


@functools.partial(
    jax.jit,
    static_argnames=(
        "potential", "num_steps", "num_leapfrog", "block_chains",
        "steps_per_block", "interpret", "thin", "collect", "host_noise",
    ),
)
def chain_grid_hmc_run(
    potential,
    q0: dict,  # per-variable (C, *sh) unconstrained positions
    seed,
    step_size,  # scalar or per-chain (C,)
    inverse_mass: dict,  # per-variable natural-shape diagonal (shared)
    consts: dict,
    *,
    num_steps: int,
    num_leapfrog: int = 10,
    block_chains: int = 8,
    steps_per_block: int = 50,
    interpret: bool = False,
    thin: int = 1,
    collect: str = "draws",
    host_noise: bool = False,
    block_offset=0,
) -> ChainGridResult:
    """Whole-run HMC with chains on the grid and data in lanes.

    ``block_chains`` here is the UNROLL factor ``S`` (typically 4-16): each
    grid step advances ``S`` chains through ``steps_per_block`` sweeps with
    every density evaluation at natural per-chain shapes.  Use for
    data-heavy densities (big per-chain constants/intermediates) where the
    lane kernel exceeds VMEM or emits 3-D tile graphs; the lane kernel
    remains the winner for small-state models.
    """
    if collect not in ("draws", "moments"):
        raise ValueError(f"unknown {collect=}")
    names = sorted(q0)
    C = q0[names[0]].shape[0]
    S = block_chains
    # Mosaic's block-shape rule: a block dim must divide into the sublane
    # tile (8) or equal the full array dim -- blocks that split the chain
    # axis therefore need S % 8 == 0
    assert S % 8 == 0 or S == C, "block_chains must be a multiple of 8"
    assert C % S == 0 and num_steps % steps_per_block == 0
    assert steps_per_block % thin == 0
    var_shapes = tuple((k, tuple(q0[k].shape[1:])) for k in names)

    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    off_arr = jnp.asarray(block_offset, jnp.int32).reshape(1, 1)
    eps_arr = jnp.broadcast_to(
        jnp.asarray(step_size, jnp.float32).reshape(-1, 1), (C, 1)
    )

    q0_arrs = [
        q0[k].astype(jnp.float32).reshape((C,) + (q0[k].shape[1:] or (1,)))
        for k in names
    ]
    im_arrs = [_pad_const(jnp.asarray(inverse_mass[k], jnp.float32))
               for k in names]
    const_names = tuple(sorted(consts))
    const_arrays = [_pad_const(consts[k]) for k in const_names]

    noise_shapes = [_noise_shape(sh) for _, sh in var_shapes]
    if host_noise:
        # staged noise stream (CPU interpret-mode tests; the in-kernel
        # PRNG is emulated as a constant under interpret)
        kn = jax.random.key(jnp.asarray(seed, jnp.uint32))
        keys = jax.random.split(kn, len(names) + 1)
        mom_arrs = [
            jax.random.normal(keys[v], (num_steps, C) + ns, jnp.float32)
            for v, ns in enumerate(noise_shapes)
        ]
        unif_arr = jax.random.uniform(
            keys[-1], (num_steps, C, 1), jnp.float32
        )
        noise_steps = num_steps
    else:
        mom_arrs = [
            jnp.zeros((1, C) + ns, jnp.float32) for ns in noise_shapes
        ]
        unif_arr = jnp.zeros((1, C, 1), jnp.float32)
        noise_steps = 1

    n_blocks_c = C // S
    n_blocks_s = num_steps // steps_per_block
    fixed = lambda i, j: (0,) * 2
    chain_ix2 = lambda i, j: (i, 0)
    chain_ix3 = lambda i, j: (i, 0, 0)

    def chain_spec(shape):
        blk = _block_shape(shape, S)
        ix = chain_ix2 if len(blk) == 2 else chain_ix3
        return pl.BlockSpec(blk, ix, memory_space=pltpu.VMEM)

    def out_spec(shape):
        blk = (steps_per_block // thin,) + _block_shape(shape, S)
        ix = (lambda i, j: (j, i, 0)) if len(blk) == 3 else (
            lambda i, j: (j, i, 0, 0)
        )
        return pl.BlockSpec(blk, ix, memory_space=pltpu.VMEM)

    fixed_spec = lambda arr: pl.BlockSpec(
        arr.shape, fixed, memory_space=pltpu.VMEM
    )

    if host_noise:
        spb_n = steps_per_block
        noise_ix = lambda nd: lambda i, j: (j, i) + (0,) * nd
    else:
        spb_n = 1
        noise_ix = lambda nd: lambda i, j: (0, i) + (0,) * nd
    mom_specs = [
        pl.BlockSpec((spb_n, S) + ns, noise_ix(len(ns)),
                     memory_space=pltpu.VMEM)
        for ns in noise_shapes
    ]
    unif_spec = pl.BlockSpec((spb_n, S, 1), noise_ix(1),
                             memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, 1), fixed, memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1), fixed, memory_space=pltpu.SMEM),
        pl.BlockSpec((S, 1), chain_ix2, memory_space=pltpu.SMEM),
        *[chain_spec(sh) for _, sh in var_shapes],
        *[fixed_spec(a) for a in im_arrs],
        *mom_specs,
        unif_spec,
        *[fixed_spec(a) for a in const_arrays],
    ]

    if collect == "moments":
        collect_shapes = [
            jax.ShapeDtypeStruct((C,) + (sh or (1,)), jnp.float32)
            for _, sh in var_shapes
        ] * 2
        collect_specs = [chain_spec(sh) for _, sh in var_shapes] * 2
    else:
        collect_shapes = [
            jax.ShapeDtypeStruct(
                (num_steps // thin, C) + (sh or (1,)), jnp.float32
            )
            for _, sh in var_shapes
        ]
        collect_specs = [out_spec(sh) for _, sh in var_shapes]

    out_shapes = collect_shapes + [
        jax.ShapeDtypeStruct((C,) + (sh or (1,)), jnp.float32)
        for _, sh in var_shapes
    ] + [jax.ShapeDtypeStruct((1, 1), jnp.float32)]
    out_specs = collect_specs + [
        chain_spec(sh) for _, sh in var_shapes
    ] + [pl.BlockSpec((1, 1), fixed, memory_space=pltpu.SMEM)]

    kernel = functools.partial(
        _cg_kernel,
        potential=potential,
        const_names=const_names,
        var_shapes=var_shapes,
        block_chains=S,
        steps_per_block=steps_per_block,
        num_leapfrog=num_leapfrog,
        thin=thin,
        collect=collect,
        host_noise=host_noise,
    )

    outs = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid_spec=pl.GridSpec(
            grid=(n_blocks_c, n_blocks_s),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM(_block_shape(sh, S), jnp.float32)
                for _, sh in var_shapes
            ],
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
        # 120MB scoped cap (vs the lane kernels' 100MB): the unrolled
        # S-chain density body is the dominant live set here and N=256
        # chromatin measured 101.4MB at S=8 -- the chip has 128MB
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(
                num_steps * C * (num_leapfrog + 1)
                * 64 * sum(
                    math.prod(a.shape) if a.shape else 1
                    for a in const_arrays
                )
            ),
            bytes_accessed=4 * num_steps * C * 8,
            transcendentals=4 * C * num_steps * 8,
        ),
    )(seed_arr, off_arr, eps_arr, *q0_arrs, *im_arrs, *mom_arrs, unif_arr,
      *const_arrays)

    nv = len(names)
    if collect == "moments":
        means, m2s = outs[:nv], outs[nv: 2 * nv]
        qf, acc = outs[2 * nv: 3 * nv], outs[-1]
        n = jnp.float32(num_steps)
        unsq = lambda a, sh: a if sh else a[..., 0]
        return ChainGridResult(
            draws=None,
            mean={k: unsq(means[v], var_shapes[v][1]) for v, k in enumerate(names)},
            variance={
                k: unsq(m2s[v] / jnp.maximum(n - 1.0, 1.0), var_shapes[v][1])
                for v, k in enumerate(names)
            },
            accept_rate=acc[0, 0] / (num_steps * n_blocks_c),
            final_positions={
                k: unsq(qf[v], var_shapes[v][1]) for v, k in enumerate(names)
            },
        )
    draws, qf, acc = outs[:nv], outs[nv: 2 * nv], outs[-1]
    unsq = lambda a, sh: a if sh else a[..., 0]
    return ChainGridResult(
        draws={k: unsq(draws[v], var_shapes[v][1]) for v, k in enumerate(names)},
        mean=None,
        variance=None,
        accept_rate=acc[0, 0] / (num_steps * n_blocks_c),
        final_positions={
            k: unsq(qf[v], var_shapes[v][1]) for v, k in enumerate(names)
        },
    )
