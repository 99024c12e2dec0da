"""Lane-batching jaxpr interpreter: per-chain programs -> chains-in-lanes tiles.

The fused whole-run kernels store the sampler state as ``(D, BC)`` tiles --
state coordinates in sublanes, chains in lanes.  Lifting an arbitrary
per-chain log density into that layout with ``jax.vmap`` fails on TPU:
vmap's batching rules move the batch axis to the FRONT, so any per-chain
``reshape``/strided access becomes a lane-splitting shape cast that Mosaic
cannot lower (e.g. ``(512, 16) -> (512, 8, 2)``).

This module is the replacement: a tiny batching interpreter whose invariant
is that the chain axis is always the LAST (lane) axis and is never moved,
split, or merged.  A per-chain intermediate of logical shape ``s`` is
carried as an array of shape ``(*s, BC)``; every rule below rewrites the
corresponding primitive into a lane-preserving form (verified empirically
against Mosaic's lowering):

* reshape/squeeze/expand -> reshape of the leading dims, lanes untouched;
* strided slice -> contiguous slice + reshape + leading-dim index;
* dot_general -> MXU matmul when one operand is an unbatched constant and
  the other a per-chain vector, broadcast-multiply-reduce otherwise;
* reductions/transposes/broadcasts -> same op on leading dims only.

Because the interpreter runs at trace time, its OUTPUT is an ordinary jnp
graph -- ``jax.vjp`` through it yields lane-preserving gradients for free,
and the same code path runs under Pallas interpret mode on CPU.

This is the TPU-idiomatic replacement for the reference's per-variable
Python dispatch (``binf/pdf/posteriors.py:125-145``): the whole model
becomes one vector program over the chain lanes.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Array = jax.Array

__all__ = ["LaneTile", "eval_jaxpr_lanes", "UnsupportedPrimitiveError"]


class UnsupportedPrimitiveError(NotImplementedError):
    """A primitive in the model's jaxpr has no lane-batching rule."""


class LaneTile:
    """A per-chain value batched over the lane axis.

    ``arr`` has shape ``(*logical_shape, BC)``; scalars are ``(BC,)``.
    """

    __slots__ = ("arr",)

    def __init__(self, arr: Array):
        self.arr = arr

    @property
    def logical_shape(self) -> tuple[int, ...]:
        return tuple(self.arr.shape[:-1])

    @property
    def bc(self) -> int:
        return int(self.arr.shape[-1])


def _is_tile(x: Any) -> bool:
    return isinstance(x, LaneTile)


def _to_tile(x: Any, logical_shape: tuple[int, ...], bc: int) -> Array:
    """Broadcast a value (tile or unbatched const) to ``(*logical_shape, BC)``."""
    if _is_tile(x):
        a = x.arr
        s = x.logical_shape
        if s == tuple(logical_shape):
            return a
        # prepend size-1 dims to align from the right, keep lanes last
        a = a.reshape((1,) * (len(logical_shape) - len(s)) + s + (a.shape[-1],))
        return jnp.broadcast_to(a, tuple(logical_shape) + (bc,))
    a = jnp.asarray(x)
    a = jnp.broadcast_to(a, logical_shape)
    return jnp.broadcast_to(a[..., None], tuple(logical_shape) + (bc,))


def _aval_shape(v) -> tuple[int, ...]:
    return tuple(v.aval.shape)


# -- per-primitive rules ------------------------------------------------------
# Each rule receives (invals, params, out_avals, bc) where invals mix LaneTile
# and unbatched arrays, and returns a list of outputs (LaneTile or unbatched).

_ELEMENTWISE = {
    "abs", "add", "and", "atan2", "cbrt", "ceil", "clamp", "cos", "cosh",
    "div", "eq", "erf", "erfc", "exp", "exp2", "expm1", "floor", "ge", "gt",
    "is_finite", "le", "log", "log1p", "logistic", "lt", "max", "min", "mul",
    "ne", "neg", "nextafter", "not", "or", "pow", "rem", "round", "rsqrt",
    "select_n", "sign", "sin", "sinh", "sqrt", "square", "sub", "tan", "tanh",
    "xor",
}


def _elementwise_rule(prim, invals, params, out_avals, bc):
    logical = tuple(out_avals[0].shape)
    args = [_to_tile(x, logical, bc) for x in invals]
    out = prim.bind(*args, **params)
    return [LaneTile(out)]


def _unary_shape_rule(prim, invals, params, out_avals, bc):
    # integer_pow, convert_element_type, reduce_precision: shape-preserving
    (x,) = invals
    return [LaneTile(prim.bind(x.arr, **params))]


def _reshape_rule(prim, invals, params, out_avals, bc):
    (x,) = invals
    dims = params.get("dimensions")
    if dims is not None:
        x = LaneTile(jnp.transpose(x.arr, tuple(dims) + (len(x.logical_shape),)))
    new_sizes = tuple(params["new_sizes"])
    return [LaneTile(x.arr.reshape(new_sizes + (bc,)))]


def _squeeze_rule(prim, invals, params, out_avals, bc):
    (x,) = invals
    return [LaneTile(x.arr.reshape(tuple(out_avals[0].shape) + (bc,)))]


def _expand_dims_rule(prim, invals, params, out_avals, bc):
    (x,) = invals
    return [LaneTile(x.arr.reshape(tuple(out_avals[0].shape) + (bc,)))]


def _broadcast_in_dim_rule(prim, invals, params, out_avals, bc):
    (x,) = invals
    shape = tuple(params["shape"])
    bd = tuple(params["broadcast_dimensions"])
    out = lax.broadcast_in_dim(
        x.arr, shape + (bc,), bd + (len(shape),),
    )
    return [LaneTile(out)]


def _transpose_rule(prim, invals, params, out_avals, bc):
    (x,) = invals
    perm = tuple(params["permutation"])
    return [LaneTile(jnp.transpose(x.arr, perm + (len(perm),)))]


def _strided_dim(a: Array, axis: int, start: int, limit: int, stride: int) -> Array:
    """Strided slice along a leading dim via contiguous slice + reshape +
    leading-dim index (Mosaic rejects strided vector slices near the lanes)."""
    idx = [slice(None)] * a.ndim
    m = -(-(limit - start) // stride)  # ceil
    # contiguous window covering all selected elements, padded to m*stride
    idx[axis] = slice(start, start + (m - 1) * stride + 1)
    a = a[tuple(idx)]
    pad = m * stride - a.shape[axis]
    if pad:
        pads = [(0, 0, 0)] * a.ndim
        pads[axis] = (0, pad, 0)
        a = lax.pad(a, jnp.zeros((), a.dtype), pads)
    new_shape = a.shape[:axis] + (m, stride) + a.shape[axis + 1 :]
    a = a.reshape(new_shape)
    idx = [slice(None)] * a.ndim
    idx[axis + 1] = 0
    return a[tuple(idx)]


def _slice_rule(prim, invals, params, out_avals, bc):
    (x,) = invals
    a = x.arr
    starts = list(params["start_indices"])
    limits = list(params["limit_indices"])
    strides = params["strides"]
    strides = list(strides) if strides is not None else [1] * len(starts)
    # contiguous part first
    idx = tuple(slice(s, l) for s, l in zip(starts, limits)) + (slice(None),)
    a = a[idx]
    for axis, k in enumerate(strides):
        if k != 1:
            a = _strided_dim(a, axis, 0, a.shape[axis], k)
    return [LaneTile(a)]


def _reduce_rule(jnp_fn):
    def rule(prim, invals, params, out_avals, bc):
        (x,) = invals
        axes = tuple(params["axes"])
        return [LaneTile(jnp_fn(x.arr, axis=axes))]

    return rule


def _argminmax_unsupported(prim, invals, params, out_avals, bc):
    raise UnsupportedPrimitiveError(
        f"{prim.name} is not lane-batchable; rewrite the model without it"
    )


def _dot_general_rule(prim, invals, params, out_avals, bc):
    a, b = invals
    ((lc, rc), (lb, rb)) = params["dimension_numbers"]
    a_t, b_t = _is_tile(a), _is_tile(b)
    if lb or rb:
        raise UnsupportedPrimitiveError(
            "dot_general with jaxpr-level batch dims inside a per-chain "
            "density is not lane-batchable"
        )
    # MXU fast paths: unbatched matrix x per-chain vector (and mirror) --
    # exactly (n, k) @ (k, BC), the kernel's native contraction.
    if (not a_t) and b_t and a.ndim == 2 and b.arr.ndim == 2 and lc == (1,) and rc == (0,):
        out = lax.dot_general(a, b.arr, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
        return [LaneTile(out)]
    if a_t and (not b_t) and a.arr.ndim == 2 and b.ndim == 2 and lc == (0,) and rc == (0,):
        # (k,)_chain . (k, n) -> (n,)_chain == (n, k) @ (k, BC) with b.T
        out = lax.dot_general(b.T, a.arr, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
        return [LaneTile(out)]
    if a_t and (not b_t) and a.arr.ndim == 2 and b.ndim == 2 and lc == (0,) and rc == (1,):
        out = lax.dot_general(b, a.arr, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
        return [LaneTile(out)]
    # general: broadcast-multiply-reduce over the contraction dims
    sa = a.logical_shape if a_t else tuple(a.shape)
    sb = b.logical_shape if b_t else tuple(b.shape)
    fa = [d for d in range(len(sa)) if d not in lc]
    fb = [d for d in range(len(sb)) if d not in rc]
    # a -> (*free_a, 1...free_b, *contract); b -> (1...free_a, *free_b, *contract)
    a_arr = a.arr if a_t else jnp.asarray(a)[..., None]
    b_arr = b.arr if b_t else jnp.asarray(b)[..., None]
    a_arr = jnp.transpose(a_arr, tuple(fa) + tuple(lc) + (len(sa),))
    b_arr = jnp.transpose(b_arr, tuple(fb) + tuple(rc) + (len(sb),))
    na, nb, nc = len(fa), len(fb), len(lc)
    a_shape = tuple(a_arr.shape[:na]) + (1,) * nb + tuple(a_arr.shape[na : na + nc])
    b_shape = (1,) * na + tuple(b_arr.shape[: nb + nc])
    a_arr = a_arr.reshape(a_shape + (a_arr.shape[-1],))
    b_arr = b_arr.reshape(b_shape + (b_arr.shape[-1],))
    prod = a_arr * b_arr  # broadcasts over free dims and lanes
    out = jnp.sum(prod, axis=tuple(range(na + nb, na + nb + nc)))
    return [LaneTile(out)]


def _concatenate_rule(prim, invals, params, out_avals, bc):
    dim = params["dimension"]
    logicals = [
        x.logical_shape if _is_tile(x) else tuple(x.shape) for x in invals
    ]
    args = [_to_tile(x, s, bc) for x, s in zip(invals, logicals)]
    return [LaneTile(lax.concatenate(args, dim))]


def _pad_rule(prim, invals, params, out_avals, bc):
    x, pad_value = invals
    cfg = list(params["padding_config"]) + [(0, 0, 0)]
    pv = pad_value.arr if _is_tile(pad_value) else pad_value
    if _is_tile(pad_value):
        raise UnsupportedPrimitiveError("pad with per-chain pad value")
    return [LaneTile(lax.pad(x.arr, pv, cfg))]


def _rev_rule(prim, invals, params, out_avals, bc):
    # Mosaic has no rev; emulate with strided gather via contiguous slices.
    (x,) = invals
    a = x.arr
    for axis in params["dimensions"]:
        n = a.shape[axis]
        pieces = []
        for i in range(n - 1, -1, -1):
            idx = [slice(None)] * a.ndim
            idx[axis] = slice(i, i + 1)
            pieces.append(a[tuple(idx)])
        a = lax.concatenate(pieces, axis)
    return [LaneTile(a)]


def _gather_rule(prim, invals, params, out_avals, bc):
    """Gather with UNBATCHED indices (static fancy indexing, e.g.
    ``x[pairs]``) -> one-hot matmul over the gathered dims.  Rides the MXU
    and keeps lanes untouched; per-chain (traced) indices are unsupported.
    """
    operand, indices = invals
    if _is_tile(indices):
        raise UnsupportedPrimitiveError(
            "gather with per-chain indices is not lane-batchable"
        )
    if not _is_tile(operand):
        return [prim.bind(operand, indices, **params)]
    dn = params["dimension_numbers"]
    slice_sizes = tuple(params["slice_sizes"])
    s = operand.logical_shape
    sim = tuple(dn.start_index_map)
    if (
        tuple(dn.collapsed_slice_dims) != tuple(sorted(sim))
        or dn.operand_batching_dims
        or dn.start_indices_batching_dims
        or any(slice_sizes[d] != 1 for d in sim)
        or any(slice_sizes[d] != s[d] for d in range(len(s)) if d not in sim)
    ):
        raise UnsupportedPrimitiveError(
            "gather pattern not lane-batchable (only whole-element static "
            "indexing is supported in the fused kernel)"
        )
    rest = [d for d in range(len(s)) if d not in sim]
    batch_shape = tuple(indices.shape[:-1])
    n_batch = len(batch_shape)
    if tuple(dn.offset_dims) != tuple(range(n_batch, n_batch + len(rest))):
        raise UnsupportedPrimitiveError("gather offset_dims not trailing")

    # flatten mapped dims to the front
    a = jnp.transpose(operand.arr, tuple(sim) + tuple(rest) + (len(s),))
    n = int(np.prod([s[d] for d in sim])) if sim else 1
    rest_sizes = tuple(s[d] for d in rest)
    r = int(np.prod(rest_sizes)) if rest else 1
    if r > 64:
        raise UnsupportedPrimitiveError(
            f"gather with {r} carried elements per index is too large for "
            "the one-hot lowering"
        )
    a = a.reshape((n,) + rest_sizes + (bc,))

    # scalar-only constants: Pallas kernels cannot capture array constants,
    # so strides multiply-accumulate with python ints and the iota is an op
    idx = indices.reshape(-1, indices.shape[-1])  # (B, k)
    strides = np.cumprod([1] + [s[d] for d in reversed(sim)])[::-1][1:]
    flat_idx = sum(
        idx[:, j] * int(strides[j]) for j in range(idx.shape[-1])
    )
    b_rows = int(flat_idx.shape[0])
    iota = lax.broadcasted_iota(flat_idx.dtype, (b_rows, n), 1)
    onehot = (flat_idx[:, None] == iota).astype(operand.arr.dtype)  # (B, n)

    if rest:
        cols = []
        for j in range(r):
            rest_idx = np.unravel_index(j, rest_sizes)
            piece = a[(slice(None),) + tuple(int(i) for i in rest_idx) + (slice(None),)]
            out_j = lax.dot_general(onehot, piece, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            cols.append(out_j[:, None, :])
        out = lax.concatenate(cols, 1)  # (B, r, BC)
    else:
        out = lax.dot_general(onehot, a, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out = out.reshape(batch_shape + rest_sizes + (bc,))
    return [LaneTile(out.astype(operand.arr.dtype))]


_RULES = {
    "reshape": _reshape_rule,
    "squeeze": _squeeze_rule,
    "expand_dims": _expand_dims_rule,
    "broadcast_in_dim": _broadcast_in_dim_rule,
    "transpose": _transpose_rule,
    "slice": _slice_rule,
    "reduce_sum": _reduce_rule(jnp.sum),
    "reduce_max": _reduce_rule(jnp.max),
    "reduce_min": _reduce_rule(jnp.min),
    "reduce_prod": _reduce_rule(jnp.prod),
    "reduce_and": _reduce_rule(jnp.all),
    "reduce_or": _reduce_rule(jnp.any),
    "argmax": _argminmax_unsupported,
    "argmin": _argminmax_unsupported,
    "dot_general": _dot_general_rule,
    "gather": _gather_rule,
    "concatenate": _concatenate_rule,
    "pad": _pad_rule,
    "rev": _rev_rule,
    "integer_pow": _unary_shape_rule,
    "convert_element_type": _unary_shape_rule,
    "reduce_precision": _unary_shape_rule,
    "copy": _unary_shape_rule,
    "stop_gradient": _unary_shape_rule,
}

# primitives whose params carry a sub-jaxpr to inline
_CALL_PRIMS = ("jit", "pjit", "closed_call", "custom_jvp_call",
               "custom_vjp_call", "custom_vjp_call_jaxpr", "remat", "checkpoint")


def _inline_jaxpr(params):
    for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
        if key in params:
            cj = params[key]
            if hasattr(cj, "jaxpr"):  # ClosedJaxpr
                return cj.jaxpr, cj.consts
            return cj, ()
    return None, None


def eval_jaxpr_lanes(jaxpr, consts, *args):
    """Evaluate a per-chain ``jaxpr`` with chains batched over the lane axis.

    ``consts`` are unbatched arrays (data/hyperparameters); ``args`` are
    ``LaneTile`` values (or unbatched arrays).  Returns a list matching
    ``jaxpr.outvars`` -- per-chain outputs come back as ``LaneTile``.
    """
    env: dict = {}

    def read(v):
        if isinstance(v, jax.extend.core.Literal) or type(v).__name__ == "Literal":
            return np.asarray(v.val, v.aval.dtype)
        return env[v]

    def write(v, val):
        env[v] = val

    for v, c in zip(jaxpr.constvars, consts):
        write(v, c)
    for v, a in zip(jaxpr.invars, args):
        write(v, a)

    bc = None
    for a in args:
        if _is_tile(a):
            bc = a.bc
            break
    assert bc is not None, "at least one argument must be a LaneTile"

    for eqn in jaxpr.eqns:
        invals = [read(v) for v in eqn.invars]
        prim = eqn.primitive
        if not any(_is_tile(x) for x in invals):
            out = prim.bind(*invals, **eqn.params)
            outs = list(out) if prim.multiple_results else [out]
        elif prim.name in _CALL_PRIMS:
            inner, inner_consts = _inline_jaxpr(eqn.params)
            if inner is None:
                raise UnsupportedPrimitiveError(
                    f"call primitive {prim.name} without an inlinable jaxpr"
                )
            n_extra = len(inner.invars) - len(invals)
            if prim.name == "custom_jvp_call" and n_extra < 0:
                invals = invals[-len(inner.invars):]
            outs = eval_jaxpr_lanes(inner, inner_consts, *invals)
        elif prim.name in _ELEMENTWISE:
            outs = _elementwise_rule(prim, invals, eqn.params,
                                     [v.aval for v in eqn.outvars], bc)
        elif prim.name in _RULES:
            outs = _RULES[prim.name](prim, invals, eqn.params,
                                     [v.aval for v in eqn.outvars], bc)
        else:
            raise UnsupportedPrimitiveError(
                f"no lane-batching rule for primitive {prim.name!r}; the "
                "model cannot run in the fused kernel -- use the XLA path"
            )
        for v, val in zip(eqn.outvars, outs):
            write(v, val)

    return [read(v) for v in jaxpr.outvars]
