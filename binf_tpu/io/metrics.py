"""Metrics, logging, and profiling hooks.

Vectorized successor of the reference's stats protocol: per-variable
namedtuples from ``last_draw_stats`` (``binf/samplers/hmc.py:166-181``,
``binf/example/samplers.py:64-74``) aggregated by the Gibbs sampler
(``binf/samplers/gibbs.py:165-190``), plus ``print`` progress every 500
sweeps (``example_script.py:35-37``).  Here:

* :func:`aggregate_info` reduces a (steps, chains)-shaped kernel Info pytree
  into scalar run statistics (acceptance rates, divergence counts) --
  device-side reductions that become collectives under sharding;
* :class:`MetricsLogger` emits JSON lines host-side per logging block;
* :func:`trace` wraps ``jax.profiler`` for on-demand Perfetto dumps;
* ``named_scope`` re-exported for annotating kernel regions.
"""

from __future__ import annotations

import contextlib
import json
import sys
import time
from typing import Any, Mapping

import jax
import jax.numpy as jnp

named_scope = jax.named_scope

__all__ = ["aggregate_info", "MetricsLogger", "trace", "named_scope"]


def aggregate_info(info: Any) -> dict[str, float]:
    """Reduce kernel Info pytrees (leading axes = steps and/or chains) to
    host-side scalars.  Handles the standard field names across kernels."""
    out: dict[str, float] = {}

    def visit(prefix: str, node: Any):
        if hasattr(node, "_fields"):  # NamedTuple info
            for field in node._fields:
                visit(f"{prefix}{field}" if not prefix else f"{prefix}.{field}",
                      getattr(node, field))
        elif isinstance(node, Mapping):
            for k, v in node.items():
                visit(f"{prefix}.{k}" if prefix else str(k), v)
        elif isinstance(node, jax.Array):
            x = jnp.asarray(node)
            if x.dtype == jnp.bool_:
                out[f"{prefix}_rate"] = float(jnp.mean(x))
                out[f"{prefix}_count"] = float(jnp.sum(x))
            elif jnp.issubdtype(x.dtype, jnp.floating) or jnp.issubdtype(
                x.dtype, jnp.integer
            ):
                out[f"{prefix}_mean"] = float(jnp.mean(x))

    visit("", info)
    return out


class MetricsLogger:
    """JSON-lines metrics logger with step counters and samples/sec."""

    def __init__(self, stream=None, prefix: str = "binf_tpu"):
        self.stream = stream or sys.stderr
        self.prefix = prefix
        self._t0 = time.perf_counter()
        self._last_t = self._t0
        self._last_steps = 0

    def log(self, step: int, n_chains: int = 1, **metrics: float) -> None:
        now = time.perf_counter()
        dt = now - self._last_t
        dsteps = step - self._last_steps
        rec = {
            "ts": round(now - self._t0, 3),
            "step": step,
            **{k: (round(v, 6) if isinstance(v, float) else v) for k, v in metrics.items()},
        }
        if dsteps > 0 and dt > 0:
            rec["steps_per_sec"] = round(dsteps / dt, 2)
            rec["chain_steps_per_sec"] = round(dsteps * n_chains / dt, 1)
        self._last_t, self._last_steps = now, step
        self.stream.write(json.dumps({self.prefix: rec}) + "\n")
        self.stream.flush()


@contextlib.contextmanager
def trace(log_dir: str | None = None):
    """Profile the enclosed block with jax.profiler (Perfetto/XPlane dump)."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
