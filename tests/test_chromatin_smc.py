"""BASELINE config 5: SMC with sharded particles + distributed resampling on
the chromatin distance-restraint posterior, on the 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from binf_tpu.example.chromatin import (
    make_chromatin_posterior,
    synthetic_restraints,
)
from binf_tpu.parallel.mesh import make_chain_mesh, shard_chains
from binf_tpu.smc import tempered_smc


pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def problem():
    key = jax.random.key(0)
    n_beads = 16
    X_true, log_target, W = synthetic_restraints(key, n_beads, observe_frac=0.6)
    post = make_chromatin_posterior(log_target, W, use_pallas=False)
    return n_beads, X_true, post


def test_sharded_smc_on_chromatin(problem):
    n_beads, X_true, post = problem
    mesh = make_chain_mesh()
    n_particles = 256

    keys = jax.random.split(jax.random.key(1), n_particles)
    particles = jax.vmap(post.sample_prior)(keys)
    particles = shard_chains(particles, mesh)

    result = jax.jit(
        lambda k, p: tempered_smc(
            post,
            k,
            initial_particles=p,
            mutation="hmc",
            num_mutation_steps=5,
            initial_step_size=0.05,
            hmc_integration_steps=5,
            max_stages=60,
            mesh=mesh,
        )
    )(jax.random.key(2), particles)

    assert float(result.final_beta) == 1.0
    X = np.asarray(result.particles["structure"])
    assert np.isfinite(X).all()
    prec = np.asarray(result.particles["precision"])
    assert (prec > 0).all()

    # posterior structures reproduce the observed pairwise distances much
    # better than prior draws do
    def med_restraint_err(Xs):
        lik = post.likelihoods["restraints"]
        logd = np.asarray(lik.log_target)
        W = np.asarray(lik.weights)
        errs = []
        for x in Xs[:32]:
            diff = x[:, None, :] - x[None, :, :]
            d = np.sqrt(np.maximum((diff**2).sum(-1), 1e-12))
            r = (np.log(d + 1e-12) - logd) ** 2
            errs.append(np.sum(W * r) / np.sum(W))
        return float(np.median(errs))

    prior_X = np.asarray(jax.device_get(particles["structure"]))
    assert med_restraint_err(X) < 0.25 * med_restraint_err(prior_X)


def test_distributed_matches_single_device(problem):
    """Same seed: mesh-sharded SMC must equal the unsharded run exactly
    (the distributed resampler is semantically identical)."""
    n_beads, X_true, post = problem
    mesh = make_chain_mesh()
    n_particles = 64

    keys = jax.random.split(jax.random.key(5), n_particles)
    particles = jax.vmap(post.sample_prior)(keys)

    kwargs = dict(
        mutation="rwm", num_mutation_steps=2, max_stages=12, target_ess=0.6
    )
    r_plain = jax.jit(
        lambda k, p: tempered_smc(post, k, initial_particles=p, **kwargs)
    )(jax.random.key(6), particles)

    sharded = shard_chains(particles, mesh)
    r_dist = jax.jit(
        lambda k, p: tempered_smc(post, k, initial_particles=p, mesh=mesh, **kwargs)
    )(jax.random.key(6), sharded)

    np.testing.assert_allclose(
        float(r_plain.log_evidence), float(r_dist.log_evidence), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(r_plain.particles["structure"]),
        np.asarray(r_dist.particles["structure"]),
        rtol=1e-4, atol=1e-5,
    )
