"""Within-model (data-axis) parallelism tests on the 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from binf_tpu.example.polynomial import make_likelihood, make_posterior
from binf_tpu.ops.math import polyval
from binf_tpu.parallel.data_parallel import (
    DataShardedLikelihood,
    shard_data,
    sharded_sum,
)


@pytest.fixture
def data_mesh():
    return Mesh(np.asarray(jax.devices()), ("data",))


@pytest.fixture
def lik():
    # 64 data points -> 8 per device
    xses = jnp.linspace(-2, 2, 64)
    ys = polyval(xses, jnp.asarray([2.0, -4.0, 1.0, 1.5]))
    ys = ys + 0.1 * jax.random.normal(jax.random.key(0), ys.shape)
    return make_likelihood(xses, ys)


def test_sharded_sum_primitive(data_mesh):
    data = jnp.arange(64.0)
    fn = sharded_sum(lambda p, local: jnp.sum(p * local), data_mesh)
    out = fn(jnp.asarray(2.0), data)
    assert float(out) == pytest.approx(2.0 * 64 * 63 / 2)


def test_sharded_likelihood_matches_unsharded(data_mesh, lik):
    sharded = DataShardedLikelihood.create(
        lik, data_mesh, fwm_data_fields=("vandermonde",)
    )
    assert sharded.variables == lik.variables

    c = jnp.asarray([1.0, -2.0, 0.5, 1.0])
    prec = jnp.asarray(1.7)
    lp_ref = lik.log_prob(coefficients=c, precision=prec)
    lp_sh = sharded.log_prob(coefficients=c, precision=prec)
    np.testing.assert_allclose(float(lp_sh), float(lp_ref), rtol=1e-5)


def test_gradient_through_sharding(data_mesh, lik):
    sharded = DataShardedLikelihood.create(
        lik, data_mesh, fwm_data_fields=("vandermonde",)
    )
    c = jnp.asarray([1.0, -2.0, 0.5, 1.0])
    g_ref = lik.gradient(coefficients=c, precision=1.7)
    g_sh = sharded.gradient(coefficients=c, precision=1.7)
    np.testing.assert_allclose(
        np.asarray(g_sh["coefficients"]), np.asarray(g_ref["coefficients"]),
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        float(g_sh["precision"]), float(g_ref["precision"]), rtol=1e-4
    )


@pytest.mark.slow
def test_sharded_likelihood_in_posterior_hmc(data_mesh, lik):
    """The sharded likelihood composes into a Posterior and samples."""
    from binf_tpu.example.polynomial import make_priors
    from binf_tpu.pdf import Posterior
    from binf_tpu.pdf.transforms import LogTransform, transform_logdensity
    from binf_tpu.samplers.hmc import hmc

    sharded = DataShardedLikelihood.create(
        lik, data_mesh, fwm_data_fields=("vandermonde",)
    )
    post = Posterior.create({"points": sharded}, make_priors())
    logdensity = transform_logdensity(
        lambda p: post.log_prob(p), {"precision": LogTransform}
    )
    kernel = hmc(logdensity, step_size=0.01, num_integration_steps=5)
    state = kernel.init({"coefficients": jnp.ones(4), "precision": jnp.zeros(())})

    @jax.jit
    def run(state, k):
        def body(s, kk):
            s, info = kernel.step(kk, s)
            return s, info.acceptance_prob

        return jax.lax.scan(body, state, jax.random.split(k, 50))

    final, accs = run(state, jax.random.key(1))
    assert np.isfinite(float(final.logdensity))
    assert float(jnp.mean(accs)) > 0.3
