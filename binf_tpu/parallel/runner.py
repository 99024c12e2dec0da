"""Vectorized multi-chain execution: vmap over chains, scan over sweeps,
shard over the mesh.

This replaces the reference's entire "runtime" -- a 30,000-iteration Python
for-loop over a single scalar chain (``example_script.py:33-37``) -- with one
jitted program: ``scan(vmap(kernel.step))`` whose chain axis carries a
NamedSharding, so the same code runs 1 chain on CPU or 10k+ chains across a
TPU pod slice with XLA inserting any cross-chain collectives (used by pooled
adaptation and diagnostics).
"""

from __future__ import annotations

from typing import Any, Callable

import jax

from binf_tpu.parallel.mesh import shard_chains
from binf_tpu.samplers.base import Position, SamplerKernel

Array = jax.Array

__all__ = ["init_chains", "run_chains", "warmup_and_run", "per_chain_step_size_kernel"]


def per_chain_step_size_kernel(
    kernel_builder: Callable[[Array, Any], SamplerKernel],
    inverse_mass: Any,
) -> SamplerKernel:
    """Wrap a kernel builder so each chain carries ITS OWN step size.

    State = ``(inner_state, step_size)``; under ``vmap(kernel.step)`` the
    step-size leaf maps with the chain axis, so chain ``c`` integrates with
    ``eps[c]`` (the sampling-phase counterpart of
    ``window_adaptation(per_chain=True)``).  ``init`` takes
    ``(position, step_size)``.
    """

    def init(carry):
        position, eps = carry
        return (kernel_builder(eps, inverse_mass).init(position), eps)

    def step(key, carry):
        inner, eps = carry
        new_inner, info = kernel_builder(eps, inverse_mass).step(key, inner)
        return (new_inner, eps), info

    return SamplerKernel(init=init, step=step)


def init_chains(
    kernel: SamplerKernel,
    initial_positions: Position,
    mesh=None,
) -> Any:
    """vmap the kernel init over a chain-batched position pytree
    (leading axis = chains), optionally sharding the batch over a mesh."""
    if mesh is not None:
        initial_positions = shard_chains(initial_positions, mesh)
    return jax.vmap(kernel.init)(initial_positions)


def run_chains(
    kernel: SamplerKernel,
    key: Array,
    states: Any,
    num_steps: int,
    collect: Callable[[Any, Any], Any] | None = None,
    thin: int = 1,
    mesh=None,
):
    """Run ``num_steps`` sweeps of ``vmap(kernel.step)`` under one scan.

    Returns ``(final_states, collected)`` where collected leaves have shape
    ``(num_steps // thin, n_chains, ...)``.  PRNG discipline: one key per
    (step, chain), split deterministically -- results are independent of
    device count for a fixed chain count (SURVEY.md section 7 "hard parts").
    """
    if collect is None:
        collect = lambda state, info: state.position

    n_chains = jax.tree.leaves(states)[0].shape[0]

    def sweep(states, k):
        keys = jax.random.split(k, n_chains)
        states, infos = jax.vmap(kernel.step)(keys, states)
        return states, infos

    if thin == 1:

        def body(states, k):
            states, infos = sweep(states, k)
            return states, collect(states, infos)

        keys = jax.random.split(key, num_steps)
        return jax.lax.scan(body, states, keys)

    assert num_steps % thin == 0, "num_steps must be a multiple of thin"

    def outer(states, k):
        def inner(states, kk):
            return sweep(states, kk)

        kks = jax.random.split(k, thin)
        states, infos = jax.lax.scan(inner, states, kks)
        last = jax.tree.map(lambda x: x[-1], infos)
        return states, collect(states, last)

    keys = jax.random.split(key, num_steps // thin)
    return jax.lax.scan(outer, states, keys)


def warmup_and_run(
    kernel_builder: Callable[[Array, Any], SamplerKernel],
    initial_positions: Position,
    key: Array,
    num_warmup: int = 500,
    num_samples: int = 1000,
    initial_step_size: float | None = 0.1,
    target_accept: float = 0.8,
    thin: int = 1,
    collect: Callable[[Any, Any], Any] | None = None,
    mesh=None,
    jit: bool = True,
    per_chain_step_size: bool = False,
):
    """End-to-end adaptive sampling: window-adapted warmup, then frozen-kernel
    sampling.  ``kernel_builder(step_size, inverse_mass) -> SamplerKernel``.

    ``per_chain_step_size=True`` adapts and samples with an independent
    step size per chain (see ``window_adaptation(per_chain=True)``).
    ``initial_step_size=None`` seeds the warmup with
    ``find_reasonable_step_size`` (Hoffman & Gelman Algorithm 4).

    Returns ``(samples, final_states, adaptation_result)``.
    """
    from binf_tpu.samplers.adaptation import window_adaptation

    if mesh is not None:
        initial_positions = shard_chains(initial_positions, mesh)

    def _run(initial_positions, key):
        key_warm, key_sample = jax.random.split(key)
        init_kernel = kernel_builder(
            1.0 if initial_step_size is None else initial_step_size, None
        )
        states = jax.vmap(init_kernel.init)(initial_positions)

        adapt = window_adaptation(
            kernel_builder,
            states,
            key_warm,
            num_steps=num_warmup,
            initial_step_size=initial_step_size,
            target_accept=target_accept,
            per_chain=per_chain_step_size,
        )
        if per_chain_step_size:
            kernel = per_chain_step_size_kernel(kernel_builder, adapt.inverse_mass)
            run_states = (adapt.final_states, adapt.step_size)
            inner_collect = collect if collect is not None else (
                lambda state, info: state.position
            )
            wrapped_collect = lambda carry, info: inner_collect(carry[0], info)
            final_states, samples = run_chains(
                kernel,
                key_sample,
                run_states,
                num_samples,
                collect=wrapped_collect,
                thin=thin,
            )
            final_states = final_states[0]
        else:
            kernel = kernel_builder(adapt.step_size, adapt.inverse_mass)
            final_states, samples = run_chains(
                kernel,
                key_sample,
                adapt.final_states,
                num_samples,
                collect=collect,
                thin=thin,
            )
        return samples, final_states, adapt

    if jit:
        _run = jax.jit(_run)
    return _run(initial_positions, key)
