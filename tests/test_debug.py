"""Determinism guard + NaN localization tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from binf_tpu.io.debug import check_determinism, finite_or_neginf, validate_density


def test_validate_density_healthy():
    from binf_tpu.example.polynomial import make_data, make_posterior

    xses, ys = make_data(jax.random.key(1))
    post = make_posterior(xses, ys)
    rep = validate_density(
        post, coefficients=jnp.ones(4), precision=jnp.asarray(2.0)
    )
    assert rep["ok"]
    assert rep["log_prob[points]"]["finite"]


def test_validate_density_flags_bad_value():
    from binf_tpu.example.polynomial import make_data, make_posterior

    xses, ys = make_data(jax.random.key(1))
    post = make_posterior(xses, ys)
    # negative precision -> NaN in the Gaussian error model's log(precision)
    rep = validate_density(
        post, coefficients=jnp.ones(4), precision=jnp.asarray(-1.0)
    )
    assert not rep["ok"]


def test_check_determinism(key):
    from binf_tpu.samplers import rwm

    kernel = rwm(lambda p: -0.5 * p["x"] ** 2, 0.5)
    state = kernel.init({"x": jnp.zeros(8)})
    state = jax.vmap(kernel.init)({"x": jnp.zeros(8)})
    # vmapped kernel wrapper
    from binf_tpu.samplers.base import SamplerKernel

    vk = SamplerKernel(
        init=jax.vmap(kernel.init),
        step=lambda k, s: jax.vmap(kernel.step)(jax.random.split(k, 8), s),
    )
    assert check_determinism(vk, key, state)


def test_finite_or_neginf(key):
    from binf_tpu.samplers import rwm

    def bad_logp(pos):
        # NaN whenever x < 0
        return jnp.log(pos["x"])

    kernel = rwm(finite_or_neginf(bad_logp), 0.5, proposal="normal")
    state = kernel.init({"x": jnp.asarray(1.0)})

    def run(state, k):
        def body(s, kk):
            s, _ = kernel.step(kk, s)
            return s, s.position["x"]

        return jax.lax.scan(body, state, jax.random.split(k, 200))

    _, xs = jax.jit(run)(state, key)
    xs = np.asarray(xs)
    assert np.isfinite(xs).all()
    assert (xs > 0).all()  # never accepted an invalid state
