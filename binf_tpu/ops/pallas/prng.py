"""In-kernel PRNG helpers shared by every fused Pallas kernel.

One definition keeps the device-PRNG draw streams of all whole-run
kernels in sync with each other and with the bitwise-resume contracts
(a PRNG change applied to one kernel but not another would silently
diverge their streams).
"""

from __future__ import annotations

import math
import os

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

_TWO_PI = 2.0 * math.pi
_BM_PAIRED = os.environ.get("BINF_BM_PAIRED", "0") == "1"

__all__ = ["_uniform", "_normal"]


def _uniform(shape):
    """Uniforms in (0, 1) from the hardware PRNG: 23 mantissa-grade bits
    per value, offset by half an ulp so 0 is excluded."""
    bits = pltpu.prng_random_bits(shape)
    ubits = jnp.bitwise_and(bits, jnp.int32((1 << 23) - 1))
    return ubits.astype(jnp.float32) * (1.0 / (1 << 23)) + (0.5 / (1 << 23))


def _normal(shape):
    """Standard normals via Box-Muller (discard-sin form).

    The paired form (each (u1, u2) yielding BOTH the cos and sin normals,
    halving random bits + transcendentals) was MEASURED AND RETIRED in
    round 5: at the headline shape it runs 5-8% SLOWER (150.8/145.9 ms vs
    139.1 ms A/B on v5e) -- the hardware PRNG makes bits nearly free and
    exp is at 0.4% of its ceiling (roofline), so the sublane concatenate
    costs more than the arithmetic it saves.  BINF_BM_PAIRED=1 re-enables
    it for reproduction (changes the device-PRNG draw stream)."""
    if _BM_PAIRED and shape[0] % 2 == 0:
        h = shape[0] // 2
        u1 = jnp.maximum(_uniform((h, shape[1])), 1e-12)
        u2 = _uniform((h, shape[1]))
        r = jnp.sqrt(-2.0 * jnp.log(u1))
        theta = _TWO_PI * u2
        return jnp.concatenate([r * jnp.cos(theta), r * jnp.sin(theta)],
                               axis=0)
    u1 = jnp.maximum(_uniform(shape), 1e-12)
    u2 = _uniform(shape)
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(_TWO_PI * u2)
