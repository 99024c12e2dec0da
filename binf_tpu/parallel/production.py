"""Production inference driver: long runs in blocks, with checkpoint/resume,
streaming moments, metrics, and divergence accounting.

This is the operational layer SURVEY.md section 5 calls for (the reference
has a bare Python loop accumulating samples in RAM, ``example_script.py:32``):

* sampling proceeds in jit-compiled BLOCKS (scan of ``block_size`` sweeps);
  the Python loop between blocks does host-side work only: metrics logging,
  checkpointing, early stopping;
* posterior moments accumulate in a streaming Welford state on device --
  memory is O(state), not O(draws) -- while optional thinned draws can be
  collected too;
* per-chain divergence counters quarantine exploding chains statistically
  (they are reported, and their draws can be excluded host-side) without
  ever crashing the batch;
* the full carry (kernel states, RNG key, Welford moments, counters) is a
  pytree checkpointed with Orbax -- a preempted run resumes bitwise.
"""

from __future__ import annotations

import time
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from binf_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from binf_tpu.io.metrics import MetricsLogger
from binf_tpu.ops.math import WelfordState, welford_init, welford_variance
from binf_tpu.samplers.adaptation import welford_batch_update
from binf_tpu.samplers.base import SamplerKernel

Array = jax.Array

__all__ = ["InferenceCarry", "InferenceResult", "run_blocks"]


class InferenceCarry(NamedTuple):
    states: Any
    key: Array
    moments: WelfordState
    n_divergences: Array  # (chains,) cumulative
    step: Array


class InferenceResult(NamedTuple):
    carry: InferenceCarry
    mean: Any
    variance: Any
    draws: Any | None  # (kept, chains, ...) if collect_draws
    divergence_fraction: float
    elapsed: float


def run_blocks(
    kernel: SamplerKernel,
    initial_states: Any,
    key: Array,
    num_steps: int,
    block_size: int = 100,
    thin: int = 1,
    collect_draws: bool = False,
    checkpoint_path: str | None = None,
    checkpoint_every_blocks: int = 0,
    resume: bool = False,
    logger: MetricsLogger | None = None,
) -> InferenceResult:
    """Run ``num_steps`` sweeps in ``block_size`` chunks.

    ``kernel.step`` info may expose ``is_divergent`` (bool per chain); if
    absent, divergences count as zero.  Returns streaming posterior moments
    (+ draws if requested).
    """
    assert num_steps % block_size == 0
    n_chains = jax.tree.leaves(initial_states)[0].shape[0]
    position_template = jax.tree.map(lambda x: x[0], initial_states.position)

    carry = InferenceCarry(
        states=initial_states,
        key=key,
        moments=welford_init(position_template),
        n_divergences=jnp.zeros((n_chains,), jnp.int32),
        step=jnp.zeros((), jnp.int32),
    )

    if resume and checkpoint_path is not None:
        try:
            carry = load_checkpoint(checkpoint_path, carry)
        except Exception:
            pass  # fresh start

    @jax.jit
    def block(carry: InferenceCarry):
        def sweep(inner, k):
            states, moments, ndiv = inner
            keys = jax.random.split(k, n_chains)
            states, infos = jax.vmap(kernel.step)(keys, states)
            moments = welford_batch_update(moments, states.position)
            div = getattr(infos, "is_divergent", None)
            if div is not None:
                ndiv = ndiv + div.astype(jnp.int32)
            return (states, moments, ndiv), (
                states.position if collect_draws else None
            )

        key, sub = jax.random.split(carry.key)
        keys = jax.random.split(sub, block_size)
        (states, moments, ndiv), draws = jax.lax.scan(
            sweep, (carry.states, carry.moments, carry.n_divergences), keys
        )
        if collect_draws and thin > 1:
            draws = jax.tree.map(lambda x: x[thin - 1 :: thin], draws)
        new_carry = InferenceCarry(
            states, key, moments, ndiv, carry.step + block_size
        )
        return new_carry, draws

    all_draws = []
    t0 = time.perf_counter()
    n_blocks = num_steps // block_size
    start_block = int(carry.step) // block_size
    for b in range(start_block, n_blocks):
        carry, draws = block(carry)
        if collect_draws:
            all_draws.append(draws)
        if logger is not None:
            jax.block_until_ready(carry.step)
            logger.log(
                step=int(carry.step),
                n_chains=n_chains,
                divergence_frac=float(jnp.mean(carry.n_divergences > 0)),
            )
        if (
            checkpoint_path is not None
            and checkpoint_every_blocks
            and (b + 1) % checkpoint_every_blocks == 0
        ):
            jax.block_until_ready(carry.step)
            save_checkpoint(checkpoint_path, carry)
    jax.block_until_ready(carry.step)
    elapsed = time.perf_counter() - t0

    draws = None
    if collect_draws and all_draws:
        draws = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *all_draws)

    return InferenceResult(
        carry=carry,
        mean=carry.moments.mean,
        variance=welford_variance(carry.moments, regularize=False),
        draws=draws,
        divergence_fraction=float(jnp.mean(carry.n_divergences > 0)),
        elapsed=elapsed,
    )
