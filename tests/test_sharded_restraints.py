"""Row-sharded O(N^2) restraint evaluation tests (8-device mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from binf_tpu.example.chromatin import (
    make_sharded_restraint_loss,
    synthetic_restraints,
)
from binf_tpu.ops.pallas.pairwise import (
    pairwise_restraint_block,
    pairwise_restraint_loss_reference,
)


@pytest.fixture
def mesh():
    return Mesh(np.asarray(jax.devices()), ("data",))


@pytest.fixture
def problem():
    key = jax.random.key(0)
    n = 64  # 8 rows per device
    X, logD, W = synthetic_restraints(key, n, observe_frac=0.5)
    return X, logD, W


def test_block_function_matches_reference(problem):
    X, logD, W = problem
    loss_ref = pairwise_restraint_loss_reference(X, logD, W)
    g_ref = jax.grad(pairwise_restraint_loss_reference)(X, logD, W)

    loss_b, forces = pairwise_restraint_block(X, X, logD, W)
    np.testing.assert_allclose(float(loss_b), float(loss_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(forces), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_sharded_loss_and_grad_match(mesh, problem):
    X, logD, W = problem
    shard = NamedSharding(mesh, P("data", None))
    logD_s = jax.device_put(logD, shard)
    W_s = jax.device_put(W, shard)

    loss_fn = make_sharded_restraint_loss(mesh)
    loss = jax.jit(loss_fn)(X, logD_s, W_s)
    loss_ref = pairwise_restraint_loss_reference(X, logD, W)
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)

    g = jax.jit(jax.grad(loss_fn))(X, logD_s, W_s)
    g_ref = jax.grad(pairwise_restraint_loss_reference)(X, logD, W)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)
    # gradient comes back sharded by rows
    assert g.sharding.num_devices == 8 or g.sharding.is_fully_replicated is False


def test_sharded_hmc_on_structure(mesh, problem):
    """HMC over the structure with the restraint field sharded across the
    mesh: the full multi-chip chromatin compute path."""
    X, logD, W = problem
    shard = NamedSharding(mesh, P("data", None))
    logD_s = jax.device_put(logD, shard)
    W_s = jax.device_put(W, shard)
    loss_fn = make_sharded_restraint_loss(mesh)
    k_obs = float(np.asarray(W).sum())

    def logdensity(pos):
        prec = 25.0
        return -0.5 * prec * loss_fn(pos["structure"], logD_s, W_s) \
            + 0.5 * k_obs * jnp.log(prec) \
            - 0.005 * jnp.sum(pos["structure"] ** 2)

    from binf_tpu.samplers.hmc import hmc

    kernel = hmc(logdensity, step_size=2e-3, num_integration_steps=5)
    state = kernel.init({"structure": X})

    @jax.jit
    def run(state, k):
        def body(s, kk):
            s, info = kernel.step(kk, s)
            return s, info.acceptance_prob

        return jax.lax.scan(body, state, jax.random.split(k, 30))

    final, accs = run(state, jax.random.key(3))
    assert np.isfinite(float(final.logdensity))
    assert float(jnp.mean(accs)) > 0.5
