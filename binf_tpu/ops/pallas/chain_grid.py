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
    n_in = len(jax.tree.leaves(tpl))

    def value_and_grad(pos: dict, kernel_consts: dict):
        rebuilt = [_rebuild(kernel_consts, c) for c in const_names]
        leaves = [pos[k] for k in sorted(pos)]
        assert len(leaves) == n_in
        outs = _eval_jaxpr_mosaic_safe(jaxpr, rebuilt, *leaves)
        u, grads = outs[0], outs[1:]
        return u, dict(zip(names, grads))

    class _Potential:
        pass

    potential = _Potential()
    potential.value_and_grad = value_and_grad
    potential.spec = spec
    return potential, consts, spec


def _promote_1d_dot(lhs, rhs, dimension_numbers, **params):
    """Evaluate a dot_general with 1-D operand(s) in a Mosaic-lowerable
    form: Mosaic's dot lowering cannot parse dimension numbers with an
    empty non-contracting set (matvec/vecmat/vecvec), so 1-D operands are
    promoted to a leading-unit ``(1, n)`` row (a lane-preserving reshape)
    and the unit axis is squeezed from the result."""
    (lc, rc), (lb, rb) = dimension_numbers
    if lb or rb:  # batched 1-D dots don't arise in these densities
        return jax.lax.dot_general(
            lhs, rhs, dimension_numbers, **params
        )
    lhs2, rhs2 = lhs, rhs
    lc2, rc2 = list(lc), list(rc)
    if lhs.ndim == 1:
        lhs2 = lhs.reshape(1, lhs.shape[0])
        lc2 = [c + 1 for c in lc2]
    if rhs.ndim == 1:
        rhs2 = rhs.reshape(1, rhs.shape[0])
        rc2 = [c + 1 for c in rc2]
    out = jax.lax.dot_general(
        lhs2, rhs2, ((tuple(lc2), tuple(rc2)), ((), ())), **params
    )
    # output layout: lhs non-contracting dims then rhs non-contracting
    # dims; each promoted operand contributed one unit dim -- reshape to
    # the ORIGINAL operands' non-contracting shape.  This also covers the
    # outer-product case (empty contracting sets, which reverse-mode AD
    # emits for the VJP of a contraction against a 2-D variable): the
    # result is simply lhs_nc + rhs_nc.
    out_shape = tuple(
        d for i, d in enumerate(lhs.shape) if i not in lc
    ) + tuple(d for i, d in enumerate(rhs.shape) if i not in rc)
    return out.reshape(out_shape)


def _eval_jaxpr_mosaic_safe(jaxpr, consts, *args):
    """``jax.core.eval_jaxpr`` with a dot_general override for 1-D
    operands (see :func:`_promote_1d_dot`); everything else binds
    normally."""
    from jax.extend.core import Literal

    env = {}

    def read(v):
        return v.val if isinstance(v, Literal) else env[v]

    def write(v, val):
        env[v] = val

    for v, c in zip(jaxpr.constvars, consts):
        write(v, c)
    for v, a in zip(jaxpr.invars, args):
        write(v, a)
    for eqn in jaxpr.eqns:
        vals = [read(v) for v in eqn.invars]
        name = eqn.primitive.name
        if name == "dot_general" and any(
            getattr(x, "ndim", 2) == 1 for x in vals
        ):
            params = dict(eqn.params)
            dn = params.pop("dimension_numbers")
            outs = [_promote_1d_dot(vals[0], vals[1], dn, **params)]
        elif name in ("pjit", "closed_call"):
            # inline pure call wrappers so their bodies get the same
            # promotion treatment
            inner = eqn.params["jaxpr"]
            outs = _eval_jaxpr_mosaic_safe(inner.jaxpr, inner.consts, *vals)
        elif name == "scan":
            # rebuild the scan around an interpreter-evaluated body so
            # 1-D dots INSIDE sequential densities are promoted too
            prm = eqn.params
            body = prm["jaxpr"]
            nc, nca = prm["num_consts"], prm["num_carry"]
            consts_v, init, xs = vals[:nc], vals[nc:nc + nca], vals[nc + nca:]

            def body_fn(carry, x, _consts=tuple(consts_v), _b=body, _n=nca):
                o = _eval_jaxpr_mosaic_safe(
                    _b.jaxpr, _b.consts, *_consts, *carry, *x
                )
                return tuple(o[:_n]), tuple(o[_n:])

            carry, ys = jax.lax.scan(
                body_fn, tuple(init), tuple(xs),
                length=prm["length"], reverse=prm["reverse"],
                unroll=prm.get("unroll", 1),
            )
            outs = list(carry) + list(ys)
        elif name == "cond":
            branches = eqn.params["branches"]
            pred, ops = vals[0], vals[1:]
            outs = list(jax.lax.switch(
                pred,
                [
                    (lambda *a, _b=b: tuple(
                        _eval_jaxpr_mosaic_safe(_b.jaxpr, _b.consts, *a)
                    ))
                    for b in branches
                ],
                *ops,
            ))
        else:
            outs = eqn.primitive.bind(*vals, **eqn.params)
            if not eqn.primitive.multiple_results:
                outs = [outs]
        for v, o in zip(eqn.outvars, outs):
            write(v, o)
    return [read(v) for v in jaxpr.outvars]


# -- in-kernel helpers --------------------------------------------------------


from binf_tpu.ops.pallas.prng import _normal, _uniform  # noqa: E402,F401 -- shared in-kernel PRNG (one stream definition for all fused kernels)


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
    # shared metric: operands are staged in _noise_shape (row) layout, so
    # a full read + _to_var squeeze recovers the natural per-variable shape
    im = {
        name: _to_var(im_refs[v][:], shape)
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
    # inverse mass staged in _noise_shape (row) layout -- scalar (1, 1),
    # 1-D (1, n), 2-D (n, m) -- matching the kernel's per-variable slices
    # exactly.  (_pad_const's column layout for 1-D arrays previously
    # collapsed a 1-D variable's metric to its first element in-kernel.)
    im_arrs = [
        jnp.asarray(inverse_mass[k], jnp.float32).reshape(
            _noise_shape(tuple(jnp.shape(inverse_mass[k])))
        )
        for k in names
    ]
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
