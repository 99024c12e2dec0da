"""Sampler kernel contract: pure ``(key, state) -> (state, info)`` functions.

The reference's samplers are stateful objects with a ``sample()`` method
mutating ``self.state`` (``binf/samplers/hmc.py:136-164``,
``binf/example/samplers.py:76-92``).  The TPU-native contract is functional:

* a *kernel* is built once from a log-density function and static
  hyper-structure: ``kernel = hmc(logdensity_fn, ...)``;
* ``kernel.init(position)`` -> ``State`` (a NamedTuple pytree);
* ``kernel.step(key, state)`` -> ``(State, Info)`` -- pure, jittable,
  vmappable over a chain axis, scannable over steps.

The Info namedtuples are the vectorized analogue of the reference's
``last_draw_stats`` protocol (``binf/samplers/hmc.py:166-181``,
``binf/samplers/gibbs.py:165-174``): per-chain arrays instead of
per-variable namedtuples of Python scalars.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax

Array = jax.Array
Position = Any  # pytree of named arrays (usually dict[str, Array])
LogDensityFn = Callable[[Position], Array]

__all__ = [
    "Position",
    "LogDensityFn",
    "SamplerKernel",
    "make_logdensity",
    "run_kernel",
    "sample_chain",
]


class SamplerKernel(NamedTuple):
    """A sampling algorithm bound to a target density."""

    init: Callable[[Position], Any]
    step: Callable[[Array, Any], tuple[Any, Any]]


def make_logdensity(density) -> LogDensityFn:
    """Close a Density (usually a Posterior) over its free variables.

    ``density`` is captured as a pytree constant: its data leaves become
    compile-time-traced constants of the kernel, and conditioning patterns
    (different free-variable sets) naturally map to different compiled
    kernels (SURVEY.md section 7 design pivot 2).
    """

    def logdensity_fn(position: Position) -> Array:
        return density.log_prob(position)

    return logdensity_fn


def run_kernel(
    kernel: SamplerKernel,
    key: Array,
    initial_state: Any,
    num_steps: int,
    collect: Callable[[Any, Any], Any] | None = None,
    thin: int = 1,
):
    """Run ``num_steps`` kernel steps under one ``lax.scan``.

    Replaces the reference's 30,000-iteration Python hot loop
    (``example_script.py:33-37``) with a single compiled scan.

    collect(state, info) selects what is stored per kept step (default: the
    position).  ``thin > 1`` keeps every thin-th draw, computed in-kernel so
    discarded draws never leave the device.
    """
    if collect is None:
        collect = lambda state, info: state.position

    if thin == 1:

        def body(state, k):
            state, info = kernel.step(k, state)
            return state, collect(state, info)

        keys = jax.random.split(key, num_steps)
        return jax.lax.scan(body, initial_state, keys)

    assert num_steps % thin == 0, "num_steps must be a multiple of thin"

    def outer(state, k):
        def inner(state, kk):
            state, info = kernel.step(kk, state)
            return state, info

        kks = jax.random.split(k, thin)
        state, infos = jax.lax.scan(inner, state, kks)
        last_info = jax.tree.map(lambda x: x[-1], infos)
        return state, collect(state, last_info)

    keys = jax.random.split(key, num_steps // thin)
    return jax.lax.scan(outer, initial_state, keys)


def sample_chain(
    kernel: SamplerKernel,
    key: Array,
    initial_position: Position,
    num_steps: int,
    collect: Callable[[Any, Any], Any] | None = None,
    thin: int = 1,
):
    """init + run, jitted end to end; returns (final_state, collected)."""
    state = kernel.init(initial_position)
    return run_kernel(kernel, key, state, num_steps, collect=collect, thin=thin)
