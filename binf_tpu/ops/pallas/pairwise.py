"""Blockwise pairwise-distance restraint log-likelihood (Pallas TPU kernel).

The reference's scientific application is chromatin structure determination
(reference ``README.rst:9``): given bead coordinates X in R^{N x 3} and a
dense matrix of target log-distances (from Hi-C contact data), the
likelihood sums a restraint penalty over all O(N^2) pairs.  SURVEY.md
section 5 names this the domain analogue of blockwise attention: tile the
N x N computation, stream (BI, BJ) blocks through VMEM, accumulate a scalar.

Loss definition (computed by this kernel):

    loss(X) = sum_{i,j} W_ij * (log d_ij(X) - logD_ij)^2,   d_ij = |x_i - x_j|

summed over ALL ordered pairs; W must be SYMMETRIC with zero diagonal (each
unordered pair counts twice -- fold the factor into the precision).  The
custom VJP uses the same tiling; symmetry supplies the column-force terms
(d loss/d x_i gets a factor 2).

Layout: coordinates are passed as (3, N) so each coordinate plane is a
lane-aligned (BI,)/(BJ,) vector; block distances are formed by three
broadcasted subtractions on the VPU -- no wasteful (N,3) matmul padding.

``pairwise_restraint_loss`` dispatches to the Pallas kernel on TPU and to an
XLA reference implementation elsewhere; both share the custom VJP.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

__all__ = [
    "pairwise_restraint_loss",
    "pairwise_restraint_loss_reference",
    "pairwise_restraint_loss_pallas",
]

_EPS = 1e-12


def pairwise_restraint_loss_reference(X: Array, logD: Array, W: Array) -> Array:
    """XLA reference: full (N, N) materialization (fine for small N)."""
    diff = X[:, None, :] - X[None, :, :]
    d2 = jnp.maximum(jnp.sum(diff * diff, axis=-1), _EPS)
    r = 0.5 * jnp.log(d2) - logD
    return jnp.sum(W * r * r)


def pairwise_restraint_block(
    X_rows: Array, X_all: Array, logD_rows: Array, W_rows: Array
) -> tuple[Array, Array]:
    """Rectangular block: rows of a sharded restraint matrix vs ALL beads.

    Returns (loss_contribution, row_forces) where ``row_forces[i]`` is
    d loss_total / d X_rows[i] ASSUMING the full weight matrix is symmetric
    (the column terms for these rows equal the row terms -> factor 2).
    Used by the sharded evaluation: each device holds (M, N) slabs of
    logD/W and its M rows of forces; the scalar losses are psum-reduced.
    """
    diff = X_rows[:, None, :] - X_all[None, :, :]  # (M, N, 3)
    d2 = jnp.maximum(jnp.sum(diff * diff, axis=-1), _EPS)
    r = 0.5 * jnp.log(d2) - logD_rows
    loss = jnp.sum(W_rows * r * r)
    coef = W_rows * r / d2  # (M, N)
    # chain rule contributes 2 (d r^2/d d2 * d d2/dx), W-symmetry another 2
    forces = 4.0 * jnp.einsum("mn,mnc->mc", coef, diff)
    return loss, forces


# -- forward kernel ---------------------------------------------------------


def _fwd_kernel(xt_i_ref, xt_j_ref, logd_ref, w_ref, out_ref):
    """Block (i, j): xt_* are (8, B) coordinate planes (rows 0..2 used),
    logd/w are (BI, BJ); out is a (1, 1) SMEM accumulator."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        out_ref[0, 0] = jnp.zeros((), jnp.float32)

    d2 = jnp.full(w_ref.shape, _EPS, jnp.float32)
    for c in range(3):
        diff = xt_i_ref[c, :][:, None] - xt_j_ref[c, :][None, :]
        d2 = d2 + diff * diff
    r = 0.5 * jnp.log(d2) - logd_ref[:]
    out_ref[0, 0] += jnp.sum(w_ref[:] * r * r)


def _fwd_pallas(X_t: Array, logD: Array, W: Array, block: int, interpret: bool):
    n = X_t.shape[1]
    grid = (n // block, n // block)
    out = pl.pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((8, block), lambda i, j: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, block), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (block, block), lambda i, j: (i, j), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (block, block), lambda i, j: (i, j), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM
            ),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=12 * n * n,
            bytes_accessed=4 * (2 * n * n + 2 * 8 * n),
            transcendentals=n * n,
        ),
    )(X_t, X_t, logD, W)
    return out[0, 0]


# -- backward kernel --------------------------------------------------------


def _bwd_kernel(xt_i_ref, xt_j_ref, logd_ref, w_ref, f_out):
    """Force rows i accumulated over j blocks: f_out is (8, BI)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        f_out[:] = jnp.zeros_like(f_out)

    d2 = jnp.full(w_ref.shape, _EPS, jnp.float32)
    diffs = []
    for c in range(3):
        diff = xt_i_ref[c, :][:, None] - xt_j_ref[c, :][None, :]
        diffs.append(diff)
        d2 = d2 + diff * diff
    r = 0.5 * jnp.log(d2) - logd_ref[:]
    # d loss_ij / d d2 = w * r / d2 ; d d2/d x_i = 2 diff
    coef = w_ref[:] * r / d2
    for c in range(3):
        f_out[c, :] += 2.0 * jnp.sum(coef * diffs[c], axis=1)


def _bwd_pallas(X_t: Array, logD: Array, W: Array, block: int, interpret: bool):
    n = X_t.shape[1]
    grid = (n // block, n // block)
    forces_t = pl.pallas_call(
        _bwd_kernel,
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((8, block), lambda i, j: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, block), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (block, block), lambda i, j: (i, j), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (block, block), lambda i, j: (i, j), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (8, block), lambda i, j: (0, i), memory_space=pltpu.VMEM
            ),
        ),
        interpret=interpret,
    )(X_t, X_t, logD, W)
    return forces_t


# -- public API with custom VJP ---------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def pairwise_restraint_loss(
    X: Array,
    logD: Array,
    W: Array,
    block: int = 256,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> Array:
    """loss(X) = sum_ij W_ij (log|x_i - x_j| - logD_ij)^2, blockwise.

    X: (N, 3) float32, N a multiple of ``block`` (pad with W=0 rows);
    W symmetric, zero diagonal.  Differentiable w.r.t. X only.
    """
    out, _ = _fwd(X, logD, W, block, use_pallas, interpret)
    return out


def _use_pallas(flag):
    if flag is not None:
        return flag
    return jax.default_backend() == "tpu"


def _fwd(X, logD, W, block, use_pallas, interpret):
    # pack only on the Pallas branch: the (8, N) scatter would otherwise
    # appear (dead) in the XLA trace and block the fused-kernel
    # lane-batching interpreter, which has no windowed-scatter rule
    if _use_pallas(use_pallas):
        loss = _fwd_pallas(_pack(X), logD, W, block, interpret)
    else:
        loss = pairwise_restraint_loss_reference(X, logD, W)
    return loss, (X, logD, W)


def _bwd(block, use_pallas, interpret, res, g):
    X, logD, W = res
    if _use_pallas(use_pallas):
        forces_t = _bwd_pallas(_pack(X), logD, W, block, interpret)
        # symmetry of W supplies the transpose terms: factor 2
        grad = 2.0 * forces_t[:3, :].T
    else:
        grad = jax.grad(pairwise_restraint_loss_reference)(X, logD, W)
    return (g * grad, None, None)


pairwise_restraint_loss.defvjp(_fwd, _bwd)


def pairwise_restraint_loss_pallas(X, logD, W, block=256, interpret=False):
    """Force the Pallas path (testing)."""
    return pairwise_restraint_loss(X, logD, W, block, True, interpret)


def _pack(X: Array) -> Array:
    """(N, 3) -> (8, N) lane-aligned coordinate planes (rows 3..7 zero)."""
    n = X.shape[0]
    out = jnp.zeros((8, n), jnp.float32)
    return out.at[:3, :].set(X.T.astype(jnp.float32))
