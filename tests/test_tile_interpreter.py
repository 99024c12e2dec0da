"""Lane-batching interpreter: equivalence with vmap on real model densities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from binf_tpu.ops.pallas.fused_potential import (
    pack_positions,
    tile_potential_from_scalar,
)
from binf_tpu.ops.pallas.tile_interpreter import (
    LaneTile,
    UnsupportedPrimitiveError,
    eval_jaxpr_lanes,
)
from binf_tpu.pdf.transforms import LogTransform, transform_logdensity

BC = 16


def _check_potential_matches_vmap(logdensity, template, key, atol=1e-4):
    """Build the tile potential; compare value AND gradient against a direct
    per-chain vmap evaluation for random positions."""
    potential, consts, spec = tile_potential_from_scalar(logdensity, template)
    from binf_tpu.ops.pallas.fused_potential import _pad_const

    padded = {k: _pad_const(v) for k, v in consts.items()}

    D = sum(size for _, _, size in spec)
    d_pad = ((D + 7) // 8) * 8
    qs = jax.random.normal(key, (BC, D), jnp.float32)
    q_tile = jnp.zeros((d_pad, BC), jnp.float32).at[:D, :].set(qs.T)

    u_tile = potential(q_tile, padded)  # (1, BC)

    def per_chain_neg(q_vec):
        pos = {}
        offset = 0
        for name, shape, size in spec:
            pos[name] = q_vec[offset : offset + size].reshape(shape)
            offset += size
        return -logdensity(pos)

    u_ref = jax.vmap(per_chain_neg)(qs)
    np.testing.assert_allclose(np.asarray(u_tile[0]), np.asarray(u_ref),
                               rtol=1e-4, atol=atol)

    # gradients through the tile graph match vmapped jax.grad
    g_tile = jax.grad(lambda q: jnp.sum(potential(q, padded)))(q_tile)
    g_ref = jax.vmap(jax.grad(per_chain_neg))(qs)
    np.testing.assert_allclose(np.asarray(g_tile[:D].T), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-3)


def test_polynomial_model():
    from binf_tpu.example.polynomial import make_data, make_posterior

    xs, ys = make_data(jax.random.key(1))
    post = make_posterior(xs, ys)
    ld = transform_logdensity(lambda p: post.log_prob(p), {"precision": LogTransform})
    template = {"coefficients": jnp.zeros(4), "precision": jnp.zeros(())}
    _check_potential_matches_vmap(ld, template, jax.random.key(0))


def test_logistic_model():
    from binf_tpu.example.logistic import (
        make_logistic_posterior,
        synthetic_logistic_data,
    )

    X, y = synthetic_logistic_data(jax.random.key(0))
    post = make_logistic_posterior(X, y)
    template = {"weights": jnp.zeros(X.shape[1])}
    _check_potential_matches_vmap(
        lambda p: post.log_prob(p), template, jax.random.key(2)
    )


def test_hierarchical_model_matrix_variables():
    """The case vmap-based tiling cannot lower on TPU: (G, 2) matrix
    variables with model-internal reshapes."""
    from binf_tpu.example.hierarchical import (
        make_hierarchical_posterior,
        synthetic_hierarchical_data,
    )

    x, y, counts, _ = synthetic_hierarchical_data(jax.random.key(0), 8)
    post = make_hierarchical_posterior(x, y, counts, 8)
    ld = transform_logdensity(lambda p: post.log_prob(p), {"precision": LogTransform})
    template = {
        "group_params": jnp.zeros((8, 2)),
        "mu": jnp.zeros(2),
        "log_tau": jnp.zeros(2),
        "precision": jnp.zeros(()),
    }
    _check_potential_matches_vmap(ld, template, jax.random.key(3), atol=1e-3)


def test_interpreter_basic_ops():
    """Synthetic density exercising transpose, strided slicing, matmul,
    concatenate, reductions."""
    A = jnp.arange(12.0).reshape(4, 3) / 10.0

    def f(q):  # q: (6,)
        m = q.reshape(3, 2)
        t = m.T  # transpose
        v = t[0, ::2]  # strided slice -> (2,)
        w = A @ m[:, 0]  # const matmul -> (4,)
        s = jnp.concatenate([v, w])
        return jnp.sum(s**2) + jnp.max(m) + jnp.sum(jnp.sin(q[1::3]))

    jaxpr = jax.make_jaxpr(f)(jnp.zeros(6))
    qs = jax.random.normal(jax.random.key(0), (BC, 6), jnp.float32)
    (out,) = eval_jaxpr_lanes(jaxpr.jaxpr, jaxpr.consts, LaneTile(qs.T))
    ref = jax.vmap(f)(qs)
    np.testing.assert_allclose(np.asarray(out.arr), np.asarray(ref), rtol=1e-5)


def test_unsupported_primitive_raises():
    def f(q):
        return jnp.sum(jnp.sort(q))  # sort has no lane rule

    jaxpr = jax.make_jaxpr(f)(jnp.zeros(4))
    with pytest.raises(UnsupportedPrimitiveError):
        eval_jaxpr_lanes(
            jaxpr.jaxpr, jaxpr.consts, LaneTile(jnp.zeros((4, BC)))
        )


def test_interpreter_extra_rules():
    """pad, rev, reduce_max, per-chain dot_general (mul+sum path)."""
    def f(q):  # (6,)
        m = q.reshape(2, 3)
        padded = jnp.pad(q, (1, 1))                # pad
        rev = q[::-1]                              # rev
        dot = m @ m.T                              # batched x batched matmul
        return (jnp.sum(padded) + jnp.sum(rev * q) + jnp.sum(dot)
                + jnp.max(m) + jnp.min(q))

    jaxpr = jax.make_jaxpr(f)(jnp.zeros(6))
    qs = jax.random.normal(jax.random.key(1), (BC, 6), jnp.float32)
    (out,) = eval_jaxpr_lanes(jaxpr.jaxpr, jaxpr.consts, LaneTile(qs.T))
    ref = jax.vmap(f)(qs)
    np.testing.assert_allclose(np.asarray(out.arr), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_build_time_unsupported_error_is_actionable():
    """Models with un-batchable primitives fail at BUILD time with guidance."""
    def logdensity(pos):
        return jnp.sum(jnp.sort(pos["x"]))

    with pytest.raises(UnsupportedPrimitiveError, match="XLA path"):
        tile_potential_from_scalar(logdensity, {"x": jnp.zeros(4)})
