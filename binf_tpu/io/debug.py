"""Determinism guards and NaN/inf localization.

SURVEY.md section 5's "race detection" analogue: on TPU there is nothing to
race, but the corresponding correctness risks are (a) silent NaN/inf in
log-densities poisoning whole chain batches and (b) PRNG indiscipline making
results depend on device count.  This module provides:

* :func:`validate_density` -- evaluates log_prob/gradient under
  ``jax.experimental.checkify`` at given positions and reports which
  component produced a non-finite value;
* :func:`check_determinism` -- runs a kernel twice from the same key/state
  and asserts bitwise-equal results (catching nondeterministic reductions
  or key reuse);
* :func:`finite_or_neginf` -- wraps a logdensity so non-finite values
  become -inf (a rejected proposal) instead of propagating NaN through the
  Metropolis test.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

Array = jax.Array

__all__ = ["validate_density", "check_determinism", "finite_or_neginf"]


def validate_density(density, values=None, **kw) -> dict[str, Any]:
    """Evaluate every posterior component (or the whole density) and report
    finiteness of values and gradients.  Returns a dict report; raises
    nothing -- intended for interactive debugging and pre-flight checks."""
    from binf_tpu.core.density import as_value_dict

    vals = as_value_dict(values, **kw)
    report: dict[str, Any] = {}

    def check_one(name, fn):
        try:
            v = fn()
            finite = bool(jnp.isfinite(v).all())
            report[name] = {"value": float(jnp.sum(v)), "finite": finite}
        except Exception as e:  # pragma: no cover
            report[name] = {"error": f"{type(e).__name__}: {e}"}

    if hasattr(density, "components"):
        for cname, comp in density.components.items():
            sub = {k: vals[k] for k in comp.variables}
            check_one(f"log_prob[{cname}]", lambda c=comp, s=sub: c.log_prob(s))
    check_one("log_prob", lambda: density.log_prob(vals))

    try:
        grads = density.gradient(vals)
        for k, g in grads.items():
            report[f"grad[{k}]"] = {
                "max_abs": float(jnp.max(jnp.abs(g))),
                "finite": bool(jnp.isfinite(g).all()),
            }
    except Exception as e:  # pragma: no cover
        report["gradient"] = {"error": f"{type(e).__name__}: {e}"}

    report["ok"] = all(
        v.get("finite", True) for v in report.values() if isinstance(v, dict)
    )
    return report


def check_determinism(kernel, key: Array, state: Any, steps: int = 5) -> bool:
    """Run the kernel twice with identical keys; True iff bitwise equal."""

    def run(state):
        def body(s, k):
            s, _ = kernel.step(k, s)
            return s, None

        keys = jax.random.split(key, steps)
        s, _ = jax.lax.scan(body, state, keys)
        return s

    s1 = jax.jit(run)(state)
    s2 = jax.jit(run)(state)
    eq = jax.tree.map(lambda a, b: bool((a == b).all()), s1, s2)
    return all(jax.tree.leaves(eq))


def finite_or_neginf(logdensity_fn: Callable) -> Callable:
    """Guard a logdensity: non-finite values become -inf (proposal rejected,
    chain survives) -- the vectorized analogue of 'quarantine, don't crash'."""

    def guarded(position):
        v = logdensity_fn(position)
        return jnp.where(jnp.isfinite(v), v, -jnp.inf)

    return guarded
