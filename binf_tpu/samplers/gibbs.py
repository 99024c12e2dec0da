"""Gibbs sampling over posterior blocks -- static structure, compiled sweeps.

TPU-native redesign of the reference's ``GibbsSampler``
(``binf/samplers/gibbs.py:11-190``).  There, conditionals are mutable PDF
objects built once (``_setup_conditional_pdfs``, ``:40-52``) and refreshed
each sweep by pushing state into bound parameters (``:54-62``).  Here a
*block* is a pure function ``(key, position) -> (position, info)`` closing
over the posterior pytree; the conditional density is partial application of
``posterior.log_prob`` with the other blocks' current values as traced
arguments.  The block structure (which variables move together, in which
order) is static, so one Gibbs SWEEP is a single compiled function --
vmappable over chains and scannable over sweeps.

Block factories cover the reference's menu: Metropolis blocks
(``RWMCSampler``, ``binf/example/samplers.py:54-92``), gradient blocks
(HMC/MALA/NUTS via the kernel modules), and exact conjugate blocks
(``GammaSampler``, ``binf/example/samplers.py:7-51`` -- re-derived in
``binf_tpu.samplers.conjugate``).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax

from binf_tpu.samplers.base import Position, SamplerKernel

Array = jax.Array

# A Gibbs block: (key, full position) -> (full position, info pytree)
BlockFn = Callable[[Array, Position], tuple[Position, Any]]

__all__ = [
    "GibbsState",
    "gibbs",
    "mh_block",
    "hmc_block",
    "mala_block",
    "nuts_block",
    "direct_block",
]


class GibbsState(NamedTuple):
    position: Position


def gibbs(blocks: dict[str, BlockFn]) -> SamplerKernel:
    """Systematic-scan Gibbs kernel over named blocks.

    Blocks execute in the given dict order each sweep (the reference sweeps
    variables in sorted name order, ``binf/samplers/gibbs.py:144``; pass a
    dict with sorted keys for identical semantics).  Info is a dict of the
    blocks' infos -- the analogue of ``last_draw_stats`` merging
    (``binf/samplers/gibbs.py:165-174``).
    """
    names = tuple(blocks)

    def init(position: Position) -> GibbsState:
        return GibbsState(dict(position))

    def step(key: Array, state: GibbsState) -> tuple[GibbsState, dict[str, Any]]:
        position = dict(state.position)
        keys = jax.random.split(key, len(names))
        infos: dict[str, Any] = {}
        for k, name in zip(keys, names):
            position, infos[name] = blocks[name](k, position)
        return GibbsState(position), infos

    return SamplerKernel(init=init, step=step)


def _split_position(position: Position, block_vars: tuple[str, ...]):
    block = {k: position[k] for k in block_vars}
    others = {k: v for k, v in position.items() if k not in block_vars}
    return block, others


def _conditional_fn(posterior, others: Position):
    """log p(block | others): partial application of the joint
    (the functional ``conditional_factory``, reference
    ``binf/pdf/posteriors.py:201-210``)."""

    def fn(block_values: Position) -> Array:
        return posterior.log_prob({**block_values, **others})

    return fn


def mh_block(
    posterior,
    variables: tuple[str, ...] | str,
    step_size,
    proposal: str = "uniform",
) -> BlockFn:
    """Random-walk Metropolis block (reference RWMC block semantics)."""
    from binf_tpu.samplers.rwm import rwm

    block_vars = (variables,) if isinstance(variables, str) else tuple(variables)

    def block(key: Array, position: Position):
        block_pos, others = _split_position(position, block_vars)
        kern = rwm(_conditional_fn(posterior, others), step_size, proposal)
        state, info = kern.step(key, kern.init(block_pos))
        return {**position, **state.position}, info

    return block


def hmc_block(
    posterior,
    variables: tuple[str, ...] | str,
    step_size: float = 0.1,
    num_integration_steps: int = 10,
    inverse_mass: Any = None,
) -> BlockFn:
    from binf_tpu.samplers.hmc import hmc

    block_vars = (variables,) if isinstance(variables, str) else tuple(variables)

    def block(key: Array, position: Position):
        block_pos, others = _split_position(position, block_vars)
        kern = hmc(
            _conditional_fn(posterior, others),
            step_size=step_size,
            num_integration_steps=num_integration_steps,
            inverse_mass=inverse_mass,
        )
        state, info = kern.step(key, kern.init(block_pos))
        return {**position, **state.position}, info

    return block


def mala_block(
    posterior,
    variables: tuple[str, ...] | str,
    step_size: float = 0.1,
) -> BlockFn:
    from binf_tpu.samplers.mala import mala

    block_vars = (variables,) if isinstance(variables, str) else tuple(variables)

    def block(key: Array, position: Position):
        block_pos, others = _split_position(position, block_vars)
        kern = mala(_conditional_fn(posterior, others), step_size)
        state, info = kern.step(key, kern.init(block_pos))
        return {**position, **state.position}, info

    return block


def nuts_block(
    posterior,
    variables: tuple[str, ...] | str,
    step_size: float = 0.1,
    max_doublings: int = 8,
    inverse_mass: Any = None,
) -> BlockFn:
    from binf_tpu.samplers.nuts import nuts

    block_vars = (variables,) if isinstance(variables, str) else tuple(variables)

    def block(key: Array, position: Position):
        block_pos, others = _split_position(position, block_vars)
        kern = nuts(
            _conditional_fn(posterior, others),
            step_size=step_size,
            max_doublings=max_doublings,
            inverse_mass=inverse_mass,
        )
        state, info = kern.step(key, kern.init(block_pos))
        return {**position, **state.position}, info

    return block


def direct_block(
    sample_fn: Callable[[Array, Position], tuple[Position, Any]],
) -> BlockFn:
    """Exact-draw block from a direct sampler (conjugate updates).

    ``sample_fn(key, position) -> (new block values dict, info)``.
    """

    def block(key: Array, position: Position):
        new_vals, info = sample_fn(key, position)
        return {**position, **new_vals}, info

    return block
