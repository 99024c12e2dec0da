"""Whole-run fused HMC for ARBITRARY potentials (the general path).

``fused_hmc.py`` proved the shape of the win: on small models the XLA
scan(vmap(step)) path is latency-bound, and executing the entire sampling
run inside one ``pallas_call`` removes the per-step overhead wholesale.
That kernel is specialized to linear regression; this module generalizes it
into a "potential -> fused sampler" compiler:

    U = potential(q_tile, consts)        # user-supplied, pure jnp
    fused_potential_hmc_run(U, ...)      # whole run in one kernel

The potential is written in TILE FORM against the kernel's native layout --
``q_tile`` is ``(D_pad, BC)`` float32 with state coordinates in sublanes
(rows; rows >= D are zero padding) and chains in lanes (columns) -- so every
elementwise op is lane-parallel across chains and any data contraction is an
MXU matmul ``(n, D_pad) @ (D_pad, BC)``.  ``consts`` is a dict of read-only
arrays (data, hyperparameters) that live VMEM-resident for the whole run.
The gradient is NOT hand-written: ``jax.vjp`` linearizes the potential at
trace time inside the kernel, so the same autodiff that drives the XLA path
drives the fused path (SURVEY.md section 7 design pivot 3).

For potentials expressible per-chain there is an adapter,
:func:`tile_potential_from_scalar`, that lifts an ordinary
``logdensity(position_dict) -> scalar`` into tile form with ``jax.vmap``
over the lane axis.

Reference lineage: replaces the reference's per-sweep Python loop
(``example_script.py:33-37``) + ``HMCSampler.sample``
(``binf/samplers/hmc.py:136-164``) for any model, not just regression.
"""

from __future__ import annotations

import functools
import math
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from binf_tpu.ops.pallas.tile_interpreter import (
    LaneTile,
    UnsupportedPrimitiveError,
    eval_jaxpr_lanes,
)

Array = jax.Array

__all__ = [
    "FusedRunResult",
    "fused_potential_hmc_run",
    "fused_warmup_run",
    "tile_potential_from_scalar",
    "pack_positions",
    "unpack_draws",
    "pack_template",
]

_SEARCH_TRIALS = 20  # doubling budget of the in-kernel step-size search
_HALTON_LEN = 256  # jitter table length for in-kernel ChEES trajectories


# -- position packing ---------------------------------------------------------


def pack_template(template: dict) -> list[tuple[str, tuple, int]]:
    """Flattening spec for a position dict: sorted (name, shape, size).
    Sorted-name order mirrors the reference Gibbs sweep order
    (``binf/samplers/gibbs.py:144``)."""
    spec = []
    for name in sorted(template):
        shape = tuple(jnp.shape(template[name]))
        size = int(jnp.prod(jnp.asarray(shape))) if shape else 1
        spec.append((name, shape, size))
    return spec


def pack_positions(positions: dict, spec=None) -> Array:
    """(chain-batched) position dict -> (C, D) flat matrix."""
    if spec is None:
        spec = pack_template({k: v[0] for k, v in positions.items()})
    cols = []
    for name, shape, size in spec:
        x = positions[name]
        cols.append(x.reshape(x.shape[0], size))
    return jnp.concatenate(cols, axis=1)


def unpack_draws(draws: Array, spec) -> dict:
    """(..., D) flat draws -> dict of (..., *shape) arrays."""
    out = {}
    offset = 0
    for name, shape, size in spec:
        block = draws[..., offset : offset + size]
        out[name] = block.reshape(draws.shape[:-1] + shape)
        offset += size
    return out


# -- scalar-logdensity adapter ------------------------------------------------


def tile_potential_from_scalar(logdensity_fn: Callable, template: dict):
    """Compile ``logdensity(position_dict) -> scalar`` into tile form.

    This is the "model -> fused kernel" front end: any per-chain log density
    built from the model DSL (or by hand) is lifted into the kernel's
    ``(D_pad, BC)`` layout.  Two transformations happen here:

    1. the log density is traced to a jaxpr and every array it closes over
       (data, hyperparameters) is hoisted out of the jaxpr's constant pool
       -- Pallas kernels cannot capture constants, so these become VMEM
       operands and are sliced back to their exact shapes inside the kernel,
       where ``eval_jaxpr`` re-binds them;
    2. the jaxpr is evaluated with the lane-batching interpreter
       (``tile_interpreter.eval_jaxpr_lanes``): chains ride the lane axis
       end to end, so per-chain reshapes/slices/matmuls lower to
       lane-preserving Mosaic ops (``jax.vmap`` would move the batch axis
       to the front and produce lane-splitting shape casts Mosaic rejects).

    Returns ``(potential, consts, spec)`` ready for
    :func:`fused_potential_hmc_run`; ``spec`` is the flattening spec for
    :func:`pack_positions` / :func:`unpack_draws`.  Build ONCE and reuse --
    the potential's identity is a jit static argument of the run.
    """
    spec = pack_template(template)
    D = sum(size for _, _, size in spec)

    def neg_logdensity_flat(q_vec):
        pos = {}
        offset = 0
        for name, shape, size in spec:
            pos[name] = q_vec[offset : offset + size].reshape(shape)
            offset += size
        return -logdensity_fn(pos)

    closed_jaxpr = jax.make_jaxpr(neg_logdensity_flat)(jnp.zeros((D,), jnp.float32))

    # constants are deduplicated across the forward and value_and_grad
    # jaxprs (they close over the same data arrays) into one operand dict
    import numpy as _np

    meta_by_name: dict = {}
    consts: dict = {}
    _registry: list = []  # (name, shape, dtype, bytes)

    def _register_const(arr):
        arr = jnp.asarray(arr)
        if arr.ndim > 2:
            # UnsupportedPrimitiveError (not ValueError) so the auto-router
            # treats ">2-D constant" as "not tile-compilable" and falls back
            # to the XLA path instead of crashing (ADVICE round 4)
            raise UnsupportedPrimitiveError(
                "closed-over constants must be at most 2-D for the fused "
                f"path; got shape {arr.shape} (reshape the data upstream)"
            )
        b = _np.asarray(arr).tobytes()
        for name, shape, dtype, saved in _registry:
            if shape == arr.shape and dtype == arr.dtype and saved == b:
                return name
        name = f"__c{len(_registry)}"
        _registry.append((name, arr.shape, arr.dtype, b))
        meta_by_name[name] = (arr.shape, arr.dtype)
        consts[name] = arr
        return name

    fw_names = [_register_const(a) for a in closed_jaxpr.consts]

    def _rebuild(kernel_consts, name):
        shape, dtype = meta_by_name[name]
        v = kernel_consts[name]  # padded (rows8, cols) f32
        if len(shape) == 0:
            r = v[0, 0]
        elif len(shape) == 1:
            r = v[: shape[0], 0]
        else:
            r = v[: shape[0], : shape[1]]
        return r.astype(dtype)

    def potential(q_tile, kernel_consts):
        rebuilt = [_rebuild(kernel_consts, name) for name in fw_names]
        # rows >= D are padding; the jaxpr was traced at exactly (D,)
        (out,) = eval_jaxpr_lanes(
            closed_jaxpr.jaxpr, rebuilt, LaneTile(q_tile[:D])
        )
        return out.arr.reshape(1, q_tile.shape[1])

    d_pad = ((D + 7) // 8) * 8

    # canonical lane-level value+grad: trace value_and_grad of the SCALAR
    # density and run the WHOLE graph (forward + backward) through the
    # lane rules.  Taking jax.vjp of the already-lane-lowered forward
    # instead emits transposed backward dots -- e.g. (20,BC)x(20,4) ->
    # (BC,4) plus a lane<->sublane transpose, measured 15x slower per
    # leapfrog than the hand kernel's (4,20)@(20,BC) form on v5e.
    try:
        vag_closed = jax.make_jaxpr(jax.value_and_grad(neg_logdensity_flat))(
            jnp.zeros((D,), jnp.float32)
        )
    except ValueError:
        # e.g. while_loop: not reverse-differentiable at all -- let the
        # forward supportability check below produce the actionable error
        vag_closed = None

    def tile_value_and_grad(q_tile, kernel_consts):
        rebuilt = [_rebuild(kernel_consts, name) for name in vag_names]
        u, g = eval_jaxpr_lanes(
            vag_closed.jaxpr, rebuilt, LaneTile(q_tile[:D])
        )
        U = u.arr.reshape(1, q_tile.shape[1])
        G = g.arr  # (D, BC)
        if d_pad != D:
            G = jax.lax.pad(
                G, jnp.float32(0.0), ((0, d_pad - D, 0), (0, 0, 0))
            )
        return U, G

    try:
        if vag_closed is None:
            raise UnsupportedPrimitiveError("density is not reverse-differentiable")
        vag_names = [_register_const(a) for a in vag_closed.consts]
        jax.eval_shape(
            lambda q: tile_value_and_grad(
                q, {k: _pad_const(v) for k, v in consts.items()}
            ),
            jax.ShapeDtypeStruct((d_pad, 8), jnp.float32),
        )
        potential.tile_value_and_grad = tile_value_and_grad
    except (UnsupportedPrimitiveError, ValueError):
        # the BACKWARD graph uses a primitive without a lane rule (or
        # introduces a >2-D constant): the kernels fall back to jax.vjp
        # of the lane-level forward (correct, just slower); the forward
        # support check below still gates use
        potential.tile_value_and_grad = None

    # fail fast at BUILD time (not inside pallas tracing) if the model uses
    # a primitive with no lane-batching rule, with actionable guidance
    try:
        jax.eval_shape(
            lambda q: potential(q, {k: _pad_const(v) for k, v in consts.items()}),
            jax.ShapeDtypeStruct((d_pad, 8), jnp.float32),
        )
    except UnsupportedPrimitiveError as e:
        raise UnsupportedPrimitiveError(
            f"{e}\nThis model cannot run in the fused whole-run kernel; use "
            "the XLA path instead (parallel.runner.warmup_and_run with "
            "samplers.hmc/nuts, or the model's dedicated kernels)."
        ) from None

    return potential, consts, spec


# -- the kernel ---------------------------------------------------------------


from binf_tpu.ops.pallas.prng import _normal, _uniform  # noqa: E402,F401 -- shared in-kernel PRNG (one stream definition for all fused kernels)


def _hmc_transition(q, z, u, eps, im, active, value_and_grad, num_leapfrog,
                    dense=None):
    """One MH-corrected leapfrog trajectory on the (D_pad, BC) tile.

    ``z`` is standard-normal noise, ``u`` the (1, BC) MH uniform, ``eps``
    broadcastable step size(s), ``im`` broadcastable inverse-mass diagonal.
    ``dense=(minv, W)`` switches to a FULL (D_pad, D_pad) metric: momentum
    sampling ``p = W z`` (W W^T = M), velocity ``M^{-1} p``, and the
    kinetic form are then MXU matmuls over the tile; the padded rows of
    minv/W must be zero.
    Returns ``(q_next, accept, dE, q_prop, p_end)`` with ``dE = E0 - E1``
    so callers can derive both the MH decision (sampling) and the
    acceptance probability ``min(1, exp(dE))`` (warmup dual averaging);
    ``q_prop``/``p_end`` are the trajectory endpoint and its final
    momentum (pre-MH), which the ChEES criterion needs.  Carries
    ``(q, p, U(q), grad U(q))`` so a trajectory costs exactly
    ``num_leapfrog + 1`` potential evaluations; ``num_leapfrog`` may be a
    TRACED int (jittered ChEES trajectories -- the loop lowers to a Mosaic
    while loop).
    """
    if dense is None:
        p = z / jnp.sqrt(jnp.maximum(im, 1e-20)) * active
        velocity = lambda p: p * im
        kinetic = lambda p: 0.5 * jnp.sum(p * p * im, axis=0, keepdims=True)
    else:
        minv, W = dense
        mm = lambda A, x: jnp.dot(A, x, preferred_element_type=jnp.float32)
        p = mm(W, z) * active
        velocity = lambda p: mm(minv, p)
        kinetic = lambda p: 0.5 * jnp.sum(p * mm(minv, p), axis=0,
                                          keepdims=True)

    U0, g = value_and_grad(q)
    E0 = U0 + kinetic(p)

    p = p - 0.5 * eps * g

    def leap(_, carry4):
        q, p, _, _ = carry4
        q = q + eps * velocity(p)
        u_, g = value_and_grad(q)
        p = p - eps * g
        return (q, p, u_, g)

    q_new, p, U1, g_end = jax.lax.fori_loop(0, num_leapfrog, leap, (q, p, U0, g))
    p = p + 0.5 * eps * g_end
    E1 = U1 + kinetic(p)

    dE = E0 - E1
    # divergence guard: NaN or |dH| beyond the threshold rejects outright.
    # f32 overflow in a model density at garbage positions can cancel into
    # a spuriously-good energy (dE ~ +1e38) that plain MH would accept,
    # poisoning the chain state (same rule as samplers/dense.py).
    dE = jnp.where(jnp.isnan(dE) | (jnp.abs(dE) > 1000.0), -jnp.inf, dE)
    log_u = jnp.log(jnp.maximum(u, 1e-30))
    accept = log_u < dE
    q = jnp.where(accept, q_new, q)
    return q, accept, dE, q_new, p


def _kernel(
    *refs,
    potential,
    const_names,
    steps_per_block: int,
    num_leapfrog: int,
    d: int,
    host_noise: bool,
    thin: int,
    collect: str,
    dense_metric: bool = False,
    trajectory: str = "fixed",
    max_leapfrog: int = 256,
):
    (seed_ref, off_ref, eps_ref, q0_ref, im_ref), rest = refs[:5], refs[5:]
    if trajectory == "chees":
        # per-tile adapted mean trajectory length T + step size (SMEM
        # scalars) + the halton jitter table: step t integrates
        # L_t = ceil(h_t * 2T / eps) steps (uniform jitter in (0, 2T),
        # Hoffman/Radul/Sountsov 2021); all chains in a tile share one
        # traced loop bound -- no per-chain control flow
        (T_ref, epsL_ref, halton_ref), rest = rest[:3], rest[3:]
    if dense_metric:
        # im_ref then carries the (D_pad, D_pad) inverse mass; the
        # momentum-sampling factor W rides as one extra operand
        w_ref, rest = rest[0], rest[1:]
    n_consts = len(const_names)
    const_refs = rest[:n_consts]
    if collect == "moments":
        mom_ref, unif_ref, mean_ref, m2_ref, qf_ref, acc_ref, q_scr = rest[n_consts:]
        out_ref = None
    else:
        mom_ref, unif_ref, out_ref, qf_ref, acc_ref, q_scr = rest[n_consts:]
        mean_ref = m2_ref = None

    i = pl.program_id(0)  # chain tile
    j = pl.program_id(1)  # step block
    eps = eps_ref[:]  # (1, BC) per-chain step sizes

    @pl.when(j == 0)
    def _():
        q_scr[:] = q0_ref[:]
        if collect == "moments":
            mean_ref[:] = jnp.zeros(mean_ref.shape, jnp.float32)
            m2_ref[:] = jnp.zeros(m2_ref.shape, jnp.float32)

    @pl.when((i == 0) & (j == 0))
    def _():
        acc_ref[0, 0] = jnp.zeros((), jnp.float32)

    if not host_noise:
        # stream indexed by (chain tile, ABSOLUTE block): a run split into
        # consecutive calls with increasing block_offset replays the exact
        # noise of one uninterrupted call (checkpoint/resume contract).
        # Mosaic caps prng_seed at 2 values, so tile and block fold into
        # one index (tiles < 2^11, absolute blocks < 2^20).
        pltpu.prng_seed(seed_ref[0, 0], i * (1 << 20) + off_ref[0, 0] + j)

    consts = {name: ref[:] for name, ref in zip(const_names, const_refs)}
    # (D_pad, BC) per-chain inverse-mass diag, zero on padding rows --
    # or, dense_metric: (D_pad, D_pad) matrix + its sampling factor W
    im = im_ref[:]
    dense = (im, w_ref[:]) if dense_metric else None
    dp = q_scr.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (dp, 1), 0)
    active = (row < d).astype(jnp.float32)

    _vag_tile = getattr(potential, "tile_value_and_grad", None)

    def value_and_grad(q):
        if _vag_tile is not None:
            # canonical lane-level value+grad (backward dots in MXU form;
            # see tile_potential_from_scalar) -- measured 15x faster per
            # leapfrog than vjp-of-the-lowered-forward on v5e
            u, g = _vag_tile(q, consts)
            return u, g * active
        u, vjp = jax.vjp(lambda qq: potential(qq, consts), q)
        (g,) = vjp(jnp.ones_like(u))
        return u, g * active

    def hmc_step(carry, _=None):
        q = q_scr[:]
        if host_noise:
            z = mom_ref[carry]
            u = unif_ref[carry]
        else:
            z = _normal(q.shape)
            u = _uniform((1, q.shape[1]))
        if trajectory == "chees":
            t_abs = j * steps_per_block + carry
            h = halton_ref[0, t_abs % _HALTON_LEN]
            n_leap = jnp.clip(
                jnp.ceil(h * 2.0 * T_ref[0, 0] / epsL_ref[0, 0]).astype(
                    jnp.int32
                ),
                1, max_leapfrog,
            )
        else:
            n_leap = num_leapfrog
        q, accept, _, _, _ = _hmc_transition(
            q, z, u, eps, im, active, value_and_grad, n_leap,
            dense=dense,
        )
        q_scr[:] = q
        if collect == "moments":
            # streaming Welford over steps (numerically stable for runs far
            # beyond f32 plain-sum accuracy); count n spans step blocks
            n = (j * steps_per_block + carry + 1).astype(jnp.float32)
            delta = q - mean_ref[:]
            mean_ref[:] = mean_ref[:] + delta / n
            m2_ref[:] = m2_ref[:] + delta * (q - mean_ref[:])
        elif thin == 1:
            out_ref[carry] = q
        else:
            @pl.when(carry % thin == thin - 1)
            def _():
                out_ref[carry // thin] = q
        acc_ref[0, 0] += jnp.mean(accept.astype(jnp.float32))
        return carry + 1

    jax.lax.fori_loop(0, steps_per_block, hmc_step, 0)
    qf_ref[:] = q_scr[:]


def _pad_const(x: Array) -> Array:
    """Canonicalize a constant to an f32 2D array with sublane-aligned rows.
    0-D -> (1, 1); 1-D (n,) -> (ceil8(n), 1); 2-D (n, m) -> (ceil8(n), m);
    padding rows are ZERO -- potentials must be padding-safe (zero rows must
    contribute zero, e.g. residuals of all-zero data rows)."""
    x = jnp.asarray(x, jnp.float32)
    if x.ndim == 0:
        x = x.reshape(1, 1)
    elif x.ndim == 1:
        x = x[:, None]
    elif x.ndim != 2:
        raise ValueError("consts must be 0-, 1- or 2-D")
    n = x.shape[0]
    n_pad = ((n + 7) // 8) * 8
    if n_pad != n:
        x = jnp.zeros((n_pad, x.shape[1]), jnp.float32).at[:n].set(x)
    return x


# -- fused warmup -------------------------------------------------------------


def _warmup_schedule(num_steps, initial_buffer=75, final_buffer=50, first_window=25):
    """Static Stan window schedule: (initial_buffer, final_buffer, reset
    steps).  Shares ``samplers.adaptation._stan_boundaries`` so the fused
    and XLA warmups see the exact same windows; the last boundary lands at
    ``num_steps - final_buffer`` so the final buffer re-adapts the step size
    under the final metric."""
    from binf_tpu.samplers.adaptation import _stan_boundaries

    return _stan_boundaries(num_steps, initial_buffer, final_buffer, first_window)


def _warmup_kernel(
    *refs,
    potential,
    const_names,
    num_warmup: int,
    num_leapfrog: int,
    d: int,
    host_noise: bool,
    schedule,
    target_accept: float,
    init_search: bool,
    trajectory: str = "fixed",
    max_leapfrog: int = 256,
):
    (seed_ref, eps0_ref, q0_ref), rest = refs[:3], refs[3:]
    n_consts = len(const_names)
    const_refs = rest[:n_consts]
    if trajectory == "chees":
        (halton_ref,), rest = rest[n_consts: n_consts + 1], rest[n_consts + 1:]
        (mom_ref, unif_ref, qf_ref, eps_out_ref, im_out_ref, T_out_ref,
         q_scr) = rest
    else:
        mom_ref, unif_ref, qf_ref, eps_out_ref, im_out_ref, q_scr = (
            rest[n_consts:]
        )
        halton_ref = T_out_ref = None

    i = pl.program_id(0)
    if not host_noise:
        pltpu.prng_seed(seed_ref[0, 0], i)
    # with host_noise the stream's first _SEARCH_TRIALS+1 entries feed the
    # init search (if enabled); warmup steps start after them
    noise_off = (_SEARCH_TRIALS + 1) if (host_noise and init_search) else 0

    consts = {name: ref[:] for name, ref in zip(const_names, const_refs)}
    dp, bc = q_scr.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (dp, 1), 0)
    active = (row < d).astype(jnp.float32)

    _vag_tile = getattr(potential, "tile_value_and_grad", None)

    def value_and_grad(q):
        if _vag_tile is not None:
            # canonical lane-level value+grad (backward dots in MXU form;
            # see tile_potential_from_scalar) -- measured 15x faster per
            # leapfrog than vjp-of-the-lowered-forward on v5e
            u, g = _vag_tile(q, consts)
            return u, g * active
        u, vjp = jax.vjp(lambda qq: potential(qq, consts), q)
        (g,) = vjp(jnp.ones_like(u))
        return u, g * active

    q_scr[:] = q0_ref[:]

    ib, fb, resets = schedule
    one = jnp.ones((1, 1), jnp.float32)
    zero = jnp.zeros((1, 1), jnp.float32)
    col = jnp.zeros((dp, 1), jnp.float32)
    log_eps0 = zero + jnp.log(eps0_ref[0, 0])

    if init_search:
        # Hoffman & Gelman 2011 Algorithm 4 INSIDE the kernel (the fused
        # analogue of samplers.adaptation.find_reasonable_step_size):
        # double/halve eps until the tile-pooled acceptance probability of a
        # full trajectory crosses 0.5, fixed trial budget, positions never
        # advance.  Identity metric, like the XLA search.
        q_start = q_scr[:]

        def pooled_alpha(log_eps, trial):
            if host_noise:
                z = mom_ref[trial]
                u = unif_ref[trial]
            else:
                z = _normal(q_start.shape)
                u = _uniform((1, bc))
            _, _, dE, _, _ = _hmc_transition(
                q_start, z, u, jnp.exp(log_eps), active, active,
                value_and_grad, num_leapfrog,
            )
            a = jnp.minimum(1.0, jnp.exp(jnp.minimum(dE, 0.0)))
            a = jnp.where(jnp.isnan(dE), 0.0, a)
            return jnp.mean(a).reshape(1, 1)

        p_init = pooled_alpha(log_eps0, 0)
        direction = jnp.where(p_init > 0.5, 1.0, -1.0)

        def search_step(t, c):
            # all-float carry: Mosaic rejects selects over i1 vectors
            # (arith.trunci i8->i1), so "done"/"crossed" are 0.0/1.0 masks.
            # crossed <=> direction>0 ? p<=0.5 : p>=0.5, in one comparison.
            log_eps, p, done = c
            crossed = jnp.where(direction * (0.5 - p) >= 0.0, 1.0, 0.0)
            done = jnp.maximum(done, crossed)
            cand = log_eps + direction * jnp.log(2.0)
            p_cand = pooled_alpha(cand, t + 1)
            log_eps = done * log_eps + (1.0 - done) * cand
            p = done * p + (1.0 - done) * p_cand
            return log_eps, p, done

        log_eps0, _, _ = jax.lax.fori_loop(
            0, _SEARCH_TRIALS, search_step,
            (log_eps0, p_init, jnp.zeros((1, 1), jnp.float32)),
        )

    def regularized_variance(n, m2):
        # Stan mass-matrix shrinkage, = ops.math.welford_variance(regularize=True)
        v = m2 / jnp.maximum(n - 1.0, 1.0)
        w = n / (n + 5.0)
        return w * v + (1.0 - w) * 1e-3

    def step(t, carry):
        (log_step, log_step_avg, grad_avg, count, mu,
         wf_n, wf_mean, wf_m2, im, log_T, adam_m, adam_v, t_chees) = carry
        q = q_scr[:]
        if host_noise:
            z = mom_ref[noise_off + t]
            u = unif_ref[noise_off + t]
        else:
            z = _normal(q.shape)
            u = _uniform((1, q.shape[1]))
        eps = jnp.exp(log_step)
        if trajectory == "chees":
            h = halton_ref[0, t % _HALTON_LEN]
            n_leap = jnp.clip(
                jnp.ceil(h * 2.0 * jnp.exp(log_T[0, 0]) / eps[0, 0]).astype(
                    jnp.int32
                ),
                1, max_leapfrog,
            )
        else:
            h = jnp.float32(1.0)
            n_leap = num_leapfrog
        q_old = q
        q, _, dE, q_prop, p_end = _hmc_transition(
            q, z, u, eps, im, active, value_and_grad, n_leap
        )
        q_scr[:] = q

        # pooled dual averaging over the tile's chains (Stan constants,
        # mirrors samplers.adaptation.dual_averaging_update)
        alpha = jnp.minimum(1.0, jnp.exp(jnp.minimum(dE, 0.0)))
        alpha = jnp.where(jnp.isnan(dE), 0.0, alpha)

        if trajectory == "chees":
            # ChEES surrogate gradient pooled over the tile's chains
            # (samplers/chees.py does the same over the full batch):
            # d/dT E[(||q'-mu'||^2 - ||q-mu||^2)^2]/4 via the per-chain
            # proxy  alpha * (sq' - sq) * <q'-mu', v_end> * h
            mu_old = jnp.mean(q_old, axis=1, keepdims=True)
            mu_new = jnp.mean(q_prop, axis=1, keepdims=True)
            qc_new = (q_prop - mu_new) * active
            sq_old = jnp.sum(((q_old - mu_old) * active) ** 2, axis=0,
                             keepdims=True)
            sq_new = jnp.sum(qc_new**2, axis=0, keepdims=True)
            dots = jnp.sum(qc_new * (p_end * im), axis=0, keepdims=True)
            per_chain = alpha * (sq_new - sq_old) * dots * h
            per_chain = jnp.where(jnp.isfinite(per_chain), per_chain, 0.0)
            g_T = jnp.sum(per_chain, axis=1, keepdims=True) / jnp.maximum(
                jnp.sum(alpha, axis=1, keepdims=True), 1e-6
            )
            g_T = g_T / (jnp.abs(g_T) + 1e-10) * jnp.tanh(jnp.abs(g_T))
            g_T = jnp.where(jnp.isfinite(g_T), g_T, 0.0)
            t_chees = t_chees + 1.0
            adam_m = 0.9 * adam_m + 0.1 * g_T
            adam_v = 0.999 * adam_v + 0.001 * g_T**2
            mhat = adam_m / (1.0 - 0.9**t_chees)
            vhat = adam_v / (1.0 - 0.999**t_chees)
            log_T = log_T + 0.025 * mhat / (jnp.sqrt(vhat) + 1e-8)
            # keep T within [eps, max_leapfrog * eps]
            log_T = jnp.clip(
                log_T, log_step, log_step + math.log(max_leapfrog)
            )

        a_mean = jnp.mean(alpha, axis=1, keepdims=True)
        count = count + 1.0
        w = 1.0 / (count + 10.0)
        grad_avg = (1.0 - w) * grad_avg + w * (target_accept - a_mean)
        log_step = mu - jnp.sqrt(count) / 0.05 * grad_avg
        eta = count ** -0.75
        log_step_avg = eta * log_step + (1.0 - eta) * log_step_avg

        # cross-chain Welford fold (Chan combine, n_b = lane count) during
        # slow windows -- the metric pools chains x steps samples per tile
        is_slow = jnp.logical_and(t >= ib, t < num_warmup - fb)
        nb = jnp.float32(bc)
        bm = jnp.mean(q, axis=1, keepdims=True)
        bm2 = jnp.sum((q - bm) ** 2, axis=1, keepdims=True)
        n_new = wf_n + nb
        delta = bm - wf_mean
        mean_new = wf_mean + delta * (nb / n_new)
        m2_new = wf_m2 + bm2 + delta * delta * (wf_n * nb / n_new)
        wf_n = jnp.where(is_slow, n_new, wf_n)
        wf_mean = jnp.where(is_slow, mean_new, wf_mean)
        wf_m2 = jnp.where(is_slow, m2_new, wf_m2)

        # window boundary: harvest the metric, restart Welford + dual
        # averaging at the current step size (Stan window semantics)
        if resets:
            is_reset = functools.reduce(
                jnp.logical_or, [t == b for b in resets]
            )
            v = regularized_variance(wf_n, wf_m2) * active
            im = jnp.where(is_reset, v, im)
            wf_n = jnp.where(is_reset, zero, wf_n)
            wf_mean = jnp.where(is_reset, col, wf_mean)
            wf_m2 = jnp.where(is_reset, col, wf_m2)
            mu = jnp.where(is_reset, jnp.log(10.0) + log_step, mu)
            log_step_avg = jnp.where(is_reset, zero, log_step_avg)
            grad_avg = jnp.where(is_reset, zero, grad_avg)
            count = jnp.where(is_reset, zero, count)
        return (log_step, log_step_avg, grad_avg, count, mu,
                wf_n, wf_mean, wf_m2, im, log_T, adam_m, adam_v, t_chees)

    carry0 = (
        log_eps0,                      # log_step
        zero,                          # log_step_avg
        zero,                          # gradient_avg
        zero,                          # count
        jnp.log(10.0) + log_eps0,      # mu
        zero,                          # welford count
        col,                           # welford mean
        col,                           # welford m2
        active,                        # inverse mass (identity on active rows)
        # ChEES state (unused ballast under trajectory="fixed"):
        jnp.log(10.0) + log_eps0,      # log_T (T0 = 10 * eps0, paper default)
        zero,                          # adam m
        zero,                          # adam v
        zero,                          # chees step counter
    )
    (log_step, log_step_avg, _, _, _, wf_n, _, wf_m2, im, log_T, _, _, _
     ) = jax.lax.fori_loop(0, num_warmup, step, carry0)
    # the last boundary is pinned at num_warmup - fb (_warmup_schedule), so
    # the metric was harvested in-loop and the final buffer re-adapted the
    # step size under it -- no after-loop harvest

    qf_ref[:] = q_scr[:]
    eps_out_ref[:] = jnp.broadcast_to(jnp.exp(log_step_avg), (1, bc))
    im_out_ref[:] = jnp.broadcast_to(im, (dp, bc))
    if trajectory == "chees":
        # clamp T to the FINAL averaged step size's feasible band before
        # freezing (log_T tracked the instantaneous eps during adaptation)
        T_final = jnp.clip(
            jnp.exp(log_T),
            jnp.exp(log_step_avg),
            jnp.exp(log_step_avg) * max_leapfrog,
        )
        T_out_ref[:] = jnp.broadcast_to(T_final, (1, bc))


@functools.partial(
    jax.jit,
    static_argnames=(
        "potential", "num_warmup", "num_leapfrog", "block_chains",
        "interpret", "host_noise", "target_accept", "init_search",
        "trajectory", "max_leapfrog",
    ),
)
def fused_warmup_run(
    potential,
    q0: Array,  # (C, D) flat unconstrained positions
    seed,
    initial_step_size,
    consts: dict[str, Array],
    *,
    num_warmup: int,
    num_leapfrog: int = 10,
    block_chains: int = 512,
    interpret: bool = False,
    host_noise: bool = False,
    target_accept: float = 0.8,
    init_search: bool = False,
    trajectory: str = "fixed",
    max_leapfrog: int = 256,
):
    """Stan-style warmup executed INSIDE one Pallas kernel.

    Runs ``num_warmup`` adaptation sweeps per chain tile with pooled dual
    averaging (step size driven to ``target_accept`` mean acceptance across
    the tile's chains) and windowed cross-chain Welford mass estimation --
    the same schedule and update rules as the XLA
    ``samplers.adaptation.window_adaptation``, with the one difference that
    statistics pool over the ``block_chains`` chains of a tile rather than
    the full chain batch (512+ chains per pool make the estimates
    statistically indistinguishable).

    Returns ``(positions (C, D), step_size (C,), inverse_mass (C, D))``
    ready to feed :func:`fused_potential_hmc_run` -- warmup + sampling is
    then two ``pallas_call``s inside one jit, i.e. ONE host dispatch
    (replaces the reference's in-loop naive adaptation,
    ``binf/samplers/hmc.py:183-191``).

    ``init_search=True`` seeds dual averaging with an in-kernel
    Hoffman-Gelman Algorithm-4 doubling search from ``initial_step_size``
    (the fused analogue of ``find_reasonable_step_size``).

    ``host_noise=True`` stages the entire warmup noise stream
    ``(num_warmup, D_pad, C)`` as a VMEM-resident operand -- fine under
    ``interpret`` (CPU tests, bitwise comparison against host-noise
    references) but it exhausts VMEM on real TPUs for moderate
    ``D * num_warmup``, so it is rejected when compiling for hardware; the
    device-PRNG path streams noise in-kernel and is the TPU path.
    """
    if host_noise and not interpret:
        raise ValueError(
            "fused_warmup_run(host_noise=True) requires interpret=True: the "
            "warmup noise stream must be VMEM-resident for the whole run "
            "(num_warmup * D_pad * block_chains * 4 bytes), which exhausts "
            "VMEM on hardware.  Use the device-PRNG path (host_noise=False) "
            "on TPU."
        )
    C, D = q0.shape
    assert C % block_chains == 0
    d_pad = ((D + 7) // 8) * 8

    q0_t = jnp.zeros((d_pad, C), jnp.float32).at[:D, :].set(q0.T)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    eps0_arr = jnp.asarray(initial_step_size, jnp.float32).reshape(1, 1)

    const_names = tuple(sorted(consts))
    const_arrays = [_pad_const(consts[k]) for k in const_names]

    if host_noise:
        # first _SEARCH_TRIALS+1 entries feed the init search (if enabled)
        n_noise = num_warmup + ((_SEARCH_TRIALS + 1) if init_search else 0)
        kn = jax.random.key(jnp.asarray(seed, jnp.uint32))
        k1, k2 = jax.random.split(kn)
        mom = jax.random.normal(k1, (n_noise, d_pad, C), jnp.float32)
        unif = jax.random.uniform(k2, (n_noise, 1, C), jnp.float32)
        noise_steps = n_noise
    else:
        mom = jnp.zeros((1, d_pad, C), jnp.float32)
        unif = jnp.zeros((1, 1, C), jnp.float32)
        noise_steps = 1

    n_tiles = C // block_chains
    fixed = lambda i: (0, 0)
    tile_ix = lambda i: (0, i)
    noise_ix = lambda i: (0, 0, i)
    const_specs = [
        pl.BlockSpec(arr.shape, fixed, memory_space=pltpu.VMEM)
        for arr in const_arrays
    ]

    kernel = functools.partial(
        _warmup_kernel,
        potential=potential,
        const_names=const_names,
        num_warmup=num_warmup,
        num_leapfrog=num_leapfrog,
        d=D,
        host_noise=host_noise,
        schedule=_warmup_schedule(num_warmup),
        target_accept=target_accept,
        init_search=init_search,
        trajectory=trajectory,
        max_leapfrog=max_leapfrog,
    )

    chees = trajectory == "chees"
    if chees:
        from binf_tpu.samplers.chees import halton_sequence

        halton_ops = [jnp.asarray(
            halton_sequence(_HALTON_LEN), jnp.float32
        ).reshape(1, _HALTON_LEN)]
        halton_specs = [
            pl.BlockSpec((1, _HALTON_LEN), fixed, memory_space=pltpu.SMEM)
        ]
        T_shapes = [jax.ShapeDtypeStruct((1, C), jnp.float32)]
        T_specs = [pl.BlockSpec((1, block_chains), tile_ix,
                                memory_space=pltpu.VMEM)]
    else:
        halton_ops, halton_specs, T_shapes, T_specs = [], [], [], []

    outs = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((d_pad, C), jnp.float32),  # warmed positions
            jax.ShapeDtypeStruct((1, C), jnp.float32),      # step sizes
            jax.ShapeDtypeStruct((d_pad, C), jnp.float32),  # inverse mass
        ] + T_shapes,
        grid_spec=pl.GridSpec(
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, 1), fixed, memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), fixed, memory_space=pltpu.SMEM),
                pl.BlockSpec((d_pad, block_chains), tile_ix,
                             memory_space=pltpu.VMEM),
                *const_specs,
                *halton_specs,
                pl.BlockSpec((noise_steps, d_pad, block_chains),
                             noise_ix, memory_space=pltpu.VMEM),
                pl.BlockSpec((noise_steps, 1, block_chains),
                             noise_ix, memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((d_pad, block_chains), tile_ix,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_chains), tile_ix,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d_pad, block_chains), tile_ix,
                             memory_space=pltpu.VMEM),
            ] + T_specs,
            scratch_shapes=[pltpu.VMEM((d_pad, block_chains), jnp.float32)],
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
        compiler_params=None if interpret else pltpu.CompilerParams(
            # default scoped-VMEM budget is 16MB; models with per-datapoint
            # intermediates (e.g. mixture logsumexp over (n, K, BC)) spill
            # past it at BC=512 while the chip has 128MB -- raise the cap
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * d_pad * block_chains * num_warmup * (num_leapfrog + 3) * 64,
            bytes_accessed=4 * num_warmup * d_pad * C,
            transcendentals=4 * d_pad * C * num_warmup,
        ),
    )(seed_arr, eps0_arr, q0_t, *const_arrays, *halton_ops, mom, unif)

    if chees:
        qf, eps, im, T = outs
        return qf[:D, :].T, eps[0, :], im[:D, :].T, T[0, :]
    qf, eps, im = outs
    return qf[:D, :].T, eps[0, :], im[:D, :].T


class FusedRunResult(NamedTuple):
    """Output of one fused whole-run kernel invocation.

    ``draws`` is ``(num_steps // thin, C, D)`` (``collect="draws"``) or
    ``None``; ``mean``/``variance`` are streaming Welford moments ``(C, D)``
    (``collect="moments"``, O(D) HBM instead of O(steps*D)) or ``None``;
    ``final_positions`` ``(C, D)`` feeds the next block's ``q0`` -- the
    state-out/state-in contract that makes fused runs checkpointable
    (reference failure mode: samples in RAM, ``example_script.py:32-34``).
    """

    draws: Array | None
    mean: Array | None
    variance: Array | None
    accept_rate: Array
    final_positions: Array


@functools.partial(
    jax.jit,
    static_argnames=(
        "potential", "num_steps", "num_leapfrog", "block_chains",
        "steps_per_block", "interpret", "host_noise", "thin", "collect",
        "dense_mass", "trajectory", "max_leapfrog",
    ),
)
def fused_potential_hmc_run(
    potential,  # static: (q_tile (D_pad, BC), consts) -> U (1, BC)
    q0: Array,  # (C, D) flat unconstrained positions
    seed,
    step_size,  # scalar or per-chain (C,)
    inverse_mass: Array,  # (D,)/(C, D) diagonal, or (D, D) with dense_mass
    consts: dict[str, Array],
    *,
    num_steps: int,
    num_leapfrog: int = 10,
    block_chains: int = 512,
    steps_per_block: int = 50,
    interpret: bool = False,
    host_noise: bool = False,
    thin: int = 1,
    collect: str = "draws",
    dense_mass: bool = False,
    trajectory: str = "fixed",
    max_leapfrog: int = 256,
    traj_length=None,  # mean trajectory length T (trajectory="chees")
    block_offset=0,
) -> FusedRunResult:
    """Run ``num_steps`` fused HMC sweeps of ``exp(-potential)``.

    Layout, PRNG, and streaming semantics are identical to
    ``fused_linreg_hmc_run`` -- see the module docstring for the tile
    contract.  ``step_size`` may be per-chain (from
    ``window_adaptation(per_chain=True)``); ``thin`` keeps every thin-th
    draw, bounding HBM for long runs (draws cost
    ``num_steps/thin * D_pad * C * 4`` bytes); ``collect="moments"``
    accumulates Welford mean/variance in-kernel instead of storing draws.

    ``block_offset`` (device-noise path) indexes the PRNG stream by
    ABSOLUTE step block: chaining calls with ``final_positions`` ->
    ``q0`` and ``block_offset += num_steps // steps_per_block`` reproduces
    one uninterrupted run bitwise -- the checkpoint/resume contract
    (SURVEY.md section 5).  With ``host_noise`` the caller supplies
    per-call seeds instead (the block driver folds the key per block).
    """
    if collect not in ("draws", "moments"):
        raise ValueError(f"unknown {collect=}")
    C, D = q0.shape
    assert C % block_chains == 0 and num_steps % steps_per_block == 0
    assert steps_per_block % thin == 0
    d_pad = ((D + 7) // 8) * 8

    q0_t = jnp.zeros((d_pad, C), jnp.float32).at[:D, :].set(q0.T)
    im_in = jnp.asarray(inverse_mass, jnp.float32)
    if dense_mass:
        # full (D, D) metric shared across chains: pad to (d_pad, d_pad)
        # with ZERO rows/cols (padding coordinates carry no momentum) and
        # derive the sampling factor W = C^{-T} (Minv = C C^T) so that
        # p = W z has covariance M = inv(Minv)
        if im_in.shape != (D, D):
            raise ValueError(
                f"dense_mass=True needs a ({D}, {D}) inverse mass, got "
                f"{im_in.shape}"
            )
        chol = jnp.linalg.cholesky(im_in)
        W_d = jax.scipy.linalg.solve_triangular(
            chol.T, jnp.eye(D, dtype=jnp.float32), lower=False
        )
        im = jnp.zeros((d_pad, d_pad), jnp.float32).at[:D, :D].set(im_in)
        W_pad = jnp.zeros((d_pad, d_pad), jnp.float32).at[:D, :D].set(W_d)
    else:
        if im_in.ndim == 1:  # shared across chains
            im_in = jnp.broadcast_to(im_in[None, :], (C, D))
        im = jnp.zeros((d_pad, C), jnp.float32).at[:D, :].set(im_in.T)
        W_pad = None
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    off_arr = jnp.asarray(block_offset, jnp.int32).reshape(1, 1)
    eps_arr = jnp.broadcast_to(
        jnp.asarray(step_size, jnp.float32).reshape(1, -1), (1, C)
    )

    const_names = tuple(sorted(consts))
    const_arrays = [_pad_const(consts[k]) for k in const_names]

    if host_noise:
        kn = jax.random.key(jnp.asarray(seed, jnp.uint32))
        k1, k2 = jax.random.split(kn)
        mom = jax.random.normal(k1, (num_steps, d_pad, C), jnp.float32)
        unif = jax.random.uniform(k2, (num_steps, 1, C), jnp.float32)
    else:
        mom = jnp.zeros((steps_per_block, d_pad, C), jnp.float32)
        unif = jnp.zeros((steps_per_block, 1, C), jnp.float32)

    n_tiles = C // block_chains
    n_blocks = num_steps // steps_per_block

    kernel = functools.partial(
        _kernel,
        potential=potential,
        const_names=const_names,
        steps_per_block=steps_per_block,
        num_leapfrog=num_leapfrog,
        d=D,
        host_noise=host_noise,
        thin=thin,
        collect=collect,
        dense_metric=dense_mass,
        trajectory=trajectory,
        max_leapfrog=max_leapfrog,
    )

    if trajectory == "chees":
        from binf_tpu.samplers.chees import halton_sequence

        if traj_length is None:
            raise ValueError("trajectory='chees' needs traj_length=T")
        # per-TILE T and eps (SMEM scalars; T from the fused ChEES warmup
        # is pooled per tile, eps likewise -- representative first lane)
        T_all = jnp.broadcast_to(
            jnp.asarray(traj_length, jnp.float32).reshape(-1), (C,)
        )
        T_tile = T_all[:: block_chains].reshape(1, n_tiles)
        epsL_tile = eps_arr[0, :: block_chains].reshape(1, n_tiles)
        chees_ops = [
            T_tile,
            epsL_tile,
            jnp.asarray(
                halton_sequence(_HALTON_LEN), jnp.float32
            ).reshape(1, _HALTON_LEN),
        ]
        _t = lambda i, j: (0, i)
        _fx = lambda i, j: (0, 0)
        chees_specs = [
            pl.BlockSpec((1, 1), _t, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), _t, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _HALTON_LEN), _fx, memory_space=pltpu.SMEM),
        ]
    elif trajectory == "fixed":
        chees_ops, chees_specs = [], []
    else:
        raise ValueError(f"unknown {trajectory=}; use 'fixed' or 'chees'")
    if host_noise:
        noise_index = lambda i, j: (j, 0, i)
    else:
        noise_index = lambda i, j: (0, 0, i)

    fixed = lambda i, j: (0, 0)
    tile_ix = lambda i, j: (0, i)
    const_specs = [
        pl.BlockSpec(arr.shape, fixed, memory_space=pltpu.VMEM)
        for arr in const_arrays
    ]

    if collect == "moments":
        collect_shapes = [
            jax.ShapeDtypeStruct((d_pad, C), jnp.float32),  # Welford mean
            jax.ShapeDtypeStruct((d_pad, C), jnp.float32),  # Welford M2
        ]
        collect_specs = [
            pl.BlockSpec((d_pad, block_chains), tile_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((d_pad, block_chains), tile_ix, memory_space=pltpu.VMEM),
        ]
    else:
        collect_shapes = [
            jax.ShapeDtypeStruct((num_steps // thin, d_pad, C), jnp.float32),
        ]
        collect_specs = [
            pl.BlockSpec(
                (steps_per_block // thin, d_pad, block_chains),
                lambda i, j: (j, 0, i),
                memory_space=pltpu.VMEM,
            ),
        ]

    outs = pl.pallas_call(
        kernel,
        out_shape=collect_shapes + [
            jax.ShapeDtypeStruct((d_pad, C), jnp.float32),  # final positions
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        grid_spec=pl.GridSpec(
            grid=(n_tiles, n_blocks),
            in_specs=[
                pl.BlockSpec((1, 1), fixed, memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), fixed, memory_space=pltpu.SMEM),
                pl.BlockSpec((1, block_chains), tile_ix,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d_pad, block_chains), tile_ix,
                             memory_space=pltpu.VMEM),
                (
                    pl.BlockSpec((d_pad, d_pad), fixed,
                                 memory_space=pltpu.VMEM)
                    if dense_mass else
                    pl.BlockSpec((d_pad, block_chains), tile_ix,
                                 memory_space=pltpu.VMEM)
                ),
                *chees_specs,
                *(
                    [pl.BlockSpec((d_pad, d_pad), fixed,
                                  memory_space=pltpu.VMEM)]
                    if dense_mass else []
                ),
                *const_specs,
                pl.BlockSpec((steps_per_block, d_pad, block_chains),
                             noise_index, memory_space=pltpu.VMEM),
                pl.BlockSpec((steps_per_block, 1, block_chains),
                             noise_index, memory_space=pltpu.VMEM),
            ],
            out_specs=collect_specs + [
                pl.BlockSpec((d_pad, block_chains), tile_ix,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), fixed, memory_space=pltpu.SMEM),
            ],
            scratch_shapes=[pltpu.VMEM((d_pad, block_chains), jnp.float32)],
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,  # see fused_warmup_run note
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * d_pad * block_chains * num_steps * (num_leapfrog + 3) * 64,
            bytes_accessed=4 * num_steps * d_pad * C,
            transcendentals=4 * d_pad * C * num_steps,
        ),
    )(seed_arr, off_arr, eps_arr, q0_t, im, *chees_ops,
      *([W_pad] if dense_mass else []), *const_arrays, mom, unif)

    *collected, qf, acc = outs
    accept_rate = acc[0, 0] / (num_steps * n_tiles)
    final_positions = qf[:D, :].T
    if collect == "moments":
        mean_t, m2_t = collected
        n = jnp.float32(num_steps)
        return FusedRunResult(
            draws=None,
            mean=mean_t[:D, :].T,
            variance=(m2_t[:D, :] / jnp.maximum(n - 1.0, 1.0)).T,
            accept_rate=accept_rate,
            final_positions=final_positions,
        )
    (draws,) = collected
    return FusedRunResult(
        draws=jnp.transpose(draws[:, :D, :], (0, 2, 1)),
        mean=None,
        variance=None,
        accept_rate=accept_rate,
        final_positions=final_positions,
    )
