"""No-U-Turn Sampler: iterative, fixed-shape, TPU-friendly.

The reference has no NUTS (its HMC uses a fixed trajectory length,
``binf/samplers/hmc.py:17``); this implements multinomial NUTS (Hoffman &
Gelman 2011, arXiv:1111.4246; Betancourt 2017 multinomial weighting) in the
iterative formulation suitable for XLA: no recursion, no dynamic shapes --
an O(max_doublings) checkpoint stack detects U-turns inside subtrees, the
doubling loop is a ``lax.while_loop``, and the whole kernel vmaps over
chains (batched while: chains that terminate early are masked, cf.
PAPERS.md "Efficiently Vectorized MCMC on Modern Accelerators",
arXiv:2503.17405).

Checkpoint scheme (derived from the binary-counter structure of the tree):
leaves of a depth-d subtree are visited in order i = 0..2^d-1.  A binary
subtree of size 2^k starts at leaf a (a % 2^k == 0) and ends at leaf b
(b+1 % 2^k == 0).  With S_i the cumulative momentum sum through leaf i, the
U-turn test for (a..b) needs rho = S_b - S_{a-1}, p_a, and p_b.  A stack of
at most max_doublings slots therefore stores (p_a, S_{a-1}) when leaf a
opens subtree(s) -- ``open(i) = d if i == 0 else trailing_zeros(i)`` slots --
and leaf b closes/checks ``close(i) = trailing_ones(i)`` of them.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from binf_tpu.ops.tree import tree_axpy, tree_dot, tree_where
from binf_tpu.samplers.base import LogDensityFn, Position, SamplerKernel
from binf_tpu.samplers.hmc import (kinetic_energy, metric_velocity,
                                   sample_momentum)

Array = jax.Array

__all__ = ["NUTSState", "NUTSInfo", "nuts"]

DIVERGENCE_THRESHOLD = 1000.0


class NUTSState(NamedTuple):
    position: Position
    logdensity: Array
    logdensity_grad: Position


class NUTSInfo(NamedTuple):
    acceptance_prob: Array  # mean leaf acceptance statistic (for dual averaging)
    is_divergent: Array
    is_turning: Array
    num_doublings: Array
    num_integration_steps: Array
    energy: Array


def _trailing_zeros(i: Array) -> Array:
    """Number of trailing zero bits of i (i > 0)."""
    return lax.population_count((i & -i) - 1)


def nuts(
    logdensity_fn: LogDensityFn,
    step_size: float | Array = 0.1,
    max_doublings: int = 8,
    inverse_mass: Any = None,
    divergence_threshold: float = DIVERGENCE_THRESHOLD,
) -> SamplerKernel:
    value_and_grad_fn = jax.value_and_grad(logdensity_fn)
    D = max_doublings

    velocity = lambda p: metric_velocity(p, inverse_mass)

    def leapfrog_step(q, p, g, eps):
        p = tree_axpy(0.5 * eps, g, p)
        q = tree_axpy(eps, velocity(p), q)
        ld, g = value_and_grad_fn(q)
        p = tree_axpy(0.5 * eps, g, p)
        return q, p, ld, g

    def is_turning(rho, p_first, p_last) -> Array:
        return (tree_dot(rho, velocity(p_first)) < 0) | (
            tree_dot(rho, velocity(p_last)) < 0
        )

    def _stack_template(tmpl):
        return jax.tree.map(lambda x: jnp.zeros((D,) + x.shape, x.dtype), tmpl)

    def build_subtree(key, q, p, g, depth, eps_signed, h0):
        """Integrate 2^depth leaves from (q, p, g); returns end state,
        multinomial proposal, subtree log-weight, momentum sum, flags."""
        n_leaves = jnp.left_shift(jnp.ones((), jnp.int32), depth)
        slots = jnp.arange(D, dtype=jnp.int32)

        ckpt_p = _stack_template(p)
        ckpt_s = _stack_template(p)
        zeros_p = jax.tree.map(jnp.zeros_like, p)

        # carry: i, (q,p,ld,g), S, top, ckpts, (prop_q, prop_ld, prop_g),
        #        lw_sub, sum_alpha, turning, divergent
        ld0, _ = jnp.zeros(()), None
        init = (
            jnp.zeros((), jnp.int32),
            (q, p, ld0, g),
            zeros_p,
            jnp.zeros((), jnp.int32),
            (ckpt_p, ckpt_s),
            (q, -jnp.inf * jnp.ones(()), g),  # proposal starts void (lw -inf)
            -jnp.inf * jnp.ones(()),
            jnp.zeros(()),
            jnp.zeros((), bool),
            jnp.zeros((), bool),
        )

        def cond(carry):
            i, _, _, _, _, _, _, _, turning, divergent = carry
            return (i < n_leaves) & ~turning & ~divergent

        def body(carry):
            (i, (q, p, _, g), S, top, (ckpt_p, ckpt_s), prop, lw_sub,
             sum_alpha, turning, divergent) = carry

            q, p, ld, g = leapfrog_step(q, p, g, eps_signed)
            h = -ld + kinetic_energy(p, inverse_mass)
            h = jnp.where(jnp.isnan(h), jnp.inf, h)
            dh = h - h0
            divergent = dh > divergence_threshold
            lw_leaf = -dh
            sum_alpha = sum_alpha + jnp.minimum(1.0, jnp.exp(-dh))

            # -- open checkpoints (store p_a and S_{a-1})
            opens = jnp.where(i == 0, depth, _trailing_zeros(jnp.maximum(i, 1)))
            opens = jnp.where(i % 2 == 0, opens, 0)
            wmask = (slots >= top) & (slots < top + opens)

            def mask_write(stack, val):
                return jax.tree.map(
                    lambda st, v: jnp.where(
                        wmask.reshape((D,) + (1,) * v.ndim), v[None], st
                    ),
                    stack,
                    val,
                )

            ckpt_p = mask_write(ckpt_p, p)
            ckpt_s = mask_write(ckpt_s, S)
            top = top + opens

            # -- cumulative momentum sum including this leaf
            S = jax.tree.map(jnp.add, S, p)

            # -- close subtrees ending at this leaf: U-turn checks
            closes = _trailing_zeros(i + 1)
            cmask = (slots >= top - closes) & (slots < top)
            rho_stack = jax.tree.map(lambda s_, cs: s_[None] - cs, S, ckpt_s)
            turn_stack = jax.vmap(
                lambda rho, pa: is_turning(rho, pa, p)
            )(rho_stack, ckpt_p)
            turning = jnp.any(turn_stack & cmask)
            top = top - closes

            # -- streaming multinomial proposal within the subtree
            lw_new = jnp.logaddexp(lw_sub, lw_leaf)
            p_take = jnp.exp(lw_leaf - jnp.where(jnp.isfinite(lw_new), lw_new, 0.0))
            u = jax.random.uniform(jax.random.fold_in(key, i), ())
            take = (u < p_take) & ~divergent
            prop_q, prop_ld, prop_g = prop
            prop = (
                tree_where(take, q, prop_q),
                jnp.where(take, ld, prop_ld),
                tree_where(take, g, prop_g),
            )
            lw_sub = lw_new

            return (
                i + 1, (q, p, ld, g), S, top, (ckpt_p, ckpt_s), prop, lw_sub,
                sum_alpha, turning, divergent,
            )

        (i, end, S, _, _, prop, lw_sub, sum_alpha, turning, divergent) = (
            lax.while_loop(cond, body, init)
        )
        return end, prop, lw_sub, S, sum_alpha, i, turning, divergent

    def init(position: Position) -> NUTSState:
        ld, grad = value_and_grad_fn(position)
        return NUTSState(position, ld, grad)

    def step(key: Array, state: NUTSState) -> tuple[NUTSState, NUTSInfo]:
        key_mom, key_loop = jax.random.split(key)
        p0 = sample_momentum(key_mom, state.position, inverse_mass)
        h0 = -state.logdensity + kinetic_energy(p0, inverse_mass)
        eps = jnp.asarray(step_size)

        q0, g0 = state.position, state.logdensity_grad

        # carry: key, depth, proposal(q,ld,g), lw_total, left(q,p,g),
        #        right(q,p,g), rho, sum_alpha, n_leaves, turning, divergent
        init_carry = (
            key_loop,
            jnp.zeros((), jnp.int32),
            (q0, state.logdensity, g0),
            jnp.zeros(()),
            (q0, p0, g0),
            (q0, p0, g0),
            p0,
            jnp.zeros(()),
            jnp.zeros((), jnp.int32),
            jnp.zeros((), bool),
            jnp.zeros((), bool),
        )

        def cond(carry):
            _, depth, _, _, _, _, _, _, _, turning, divergent = carry
            return (depth < D) & ~turning & ~divergent

        def body(carry):
            (key, depth, prop, lw_total, left, right, rho, sum_alpha,
             n_leaves, turning, divergent) = carry
            key, k_dir, k_sub, k_merge = jax.random.split(key, 4)

            go_right = jax.random.bernoulli(k_dir)
            eps_signed = jnp.where(go_right, eps, -eps)
            ql, pl, gl = left
            qr, pr, gr = right
            q_start = tree_where(go_right, qr, ql)
            p_start = tree_where(go_right, pr, pl)
            g_start = tree_where(go_right, gr, gl)

            (end, sub_prop, lw_sub, rho_sub, sub_alpha, sub_leaves,
             sub_turning, sub_divergent) = build_subtree(
                k_sub, q_start, p_start, g_start, depth, eps_signed, h0
            )
            q_end, p_end, _, g_end = end

            sum_alpha = sum_alpha + sub_alpha
            n_leaves = n_leaves + sub_leaves

            ok = ~sub_turning & ~sub_divergent

            # update the trajectory end we extended (only if subtree valid --
            # on an invalid subtree the whole expansion is discarded)
            left = (
                tree_where(ok & ~go_right, q_end, ql),
                tree_where(ok & ~go_right, p_end, pl),
                tree_where(ok & ~go_right, g_end, gl),
            )
            right = (
                tree_where(ok & go_right, q_end, qr),
                tree_where(ok & go_right, p_end, pr),
                tree_where(ok & go_right, g_end, gr),
            )

            # biased progressive sampling between old trajectory and subtree
            take_new = (
                jax.random.uniform(k_merge, ()) < jnp.exp(lw_sub - lw_total)
            ) & ok
            pq, pld, pg = prop
            sq, sld, sg = sub_prop
            prop = (
                tree_where(take_new, sq, pq),
                jnp.where(take_new, sld, pld),
                tree_where(take_new, sg, pg),
            )
            lw_total = jnp.where(ok, jnp.logaddexp(lw_total, lw_sub), lw_total)

            # full-trajectory U-turn check
            rho_new = jax.tree.map(jnp.add, rho, rho_sub)
            rho = tree_where(ok, rho_new, rho)
            _, p_l, _ = left
            _, p_r, _ = right
            full_turn = is_turning(rho, p_l, p_r)

            turning = sub_turning | (ok & full_turn)
            divergent = sub_divergent

            return (
                key, depth + 1, prop, lw_total, left, right, rho, sum_alpha,
                n_leaves, turning, divergent,
            )

        (_, depth, prop, _, _, _, _, sum_alpha, n_leaves, turning, divergent) = (
            lax.while_loop(cond, body, init_carry)
        )

        q_new, ld_new, g_new = prop
        new_state = NUTSState(q_new, ld_new, g_new)
        accept_stat = sum_alpha / jnp.maximum(n_leaves, 1)
        info = NUTSInfo(
            acceptance_prob=accept_stat,
            is_divergent=divergent,
            is_turning=turning,
            num_doublings=depth,
            num_integration_steps=n_leaves,
            energy=h0,
        )
        return new_state, info

    return SamplerKernel(init=init, step=step)
