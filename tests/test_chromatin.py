"""Chromatin distance-restraint workload tests (CPU reference path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from binf_tpu.example.chromatin import (
    BackbonePrior,
    DistanceRestraintLikelihood,
    make_chromatin_posterior,
    restraint_precision_block,
    synthetic_restraints,
)


@pytest.fixture(scope="module")
def problem():
    key = jax.random.key(0)
    n_beads = 32
    X_true, log_target, W = synthetic_restraints(key, n_beads, observe_frac=0.5)
    post = make_chromatin_posterior(log_target, W, use_pallas=False)
    return n_beads, X_true, log_target, W, post


def test_posterior_structure(problem):
    n_beads, X_true, log_target, W, post = problem
    assert post.variables == ("precision", "structure")
    lp = post.log_prob(structure=X_true, precision=25.0)
    assert np.isfinite(float(lp))


def test_gradient_points_toward_truth(problem):
    """From a perturbed structure, the likelihood gradient must decrease the
    restraint loss (ascent on log-prob)."""
    n_beads, X_true, log_target, W, post = problem
    key = jax.random.key(3)
    X0 = X_true + 0.3 * jax.random.normal(key, X_true.shape)
    g = post.gradient(structure=X0, precision=25.0)
    step = 1e-3
    lp0 = post.log_prob(structure=X0, precision=25.0)
    lp1 = post.log_prob(structure=X0 + step * g["structure"], precision=25.0)
    assert float(lp1) > float(lp0)


def test_map_recovers_structure(problem):
    """Gradient ascent on the posterior recovers pairwise distances of the
    ground truth (up to rigid motions, so compare distance matrices)."""
    n_beads, X_true, log_target, W, post = problem
    cond = post.conditional_factory(precision=25.0)

    X = X_true + 0.2 * jax.random.normal(jax.random.key(7), X_true.shape)

    @jax.jit
    def ascend(X, lr=2e-3):
        def body(X, _):
            g = cond.gradient(structure=X)["structure"]
            return X + lr * g, None

        X, _ = jax.lax.scan(body, X, None, length=300)
        return X

    X = ascend(X)

    def dists(A):
        diff = A[:, None, :] - A[None, :, :]
        return np.sqrt(np.maximum(np.asarray(jnp.sum(diff**2, -1)), 1e-12))

    d_true, d_map = dists(X_true), dists(np.asarray(X))
    mask = np.asarray(W) > 0
    rel_err = np.abs(d_map - d_true)[mask] / np.maximum(d_true[mask], 0.1)
    assert np.median(rel_err) < 0.15


def test_hmc_samples_structure(problem):
    """HMC over (structure, log-precision) runs and improves the fit."""
    from binf_tpu.pdf.transforms import LogTransform, transform_logdensity
    from binf_tpu.samplers.hmc import hmc

    n_beads, X_true, log_target, W, post = problem
    logdensity = transform_logdensity(
        lambda p: post.log_prob(p), {"precision": LogTransform}
    )
    kernel = hmc(logdensity, step_size=5e-3, num_integration_steps=10)
    X0 = X_true + 0.3 * jax.random.normal(jax.random.key(1), X_true.shape)
    state = kernel.init({"structure": X0, "precision": jnp.zeros(())})

    @jax.jit
    def run(state, key):
        def body(state, k):
            state, info = kernel.step(k, state)
            return state, (state.logdensity, info.acceptance_prob)

        keys = jax.random.split(key, 100)
        return jax.lax.scan(body, state, keys)

    final, (lds, accs) = run(state, jax.random.key(2))
    assert float(jnp.mean(accs)) > 0.5
    assert float(lds[-10:].mean()) > float(lds[0])


def test_conjugate_precision_block(problem):
    """Precision draws match the analytic Gamma conditional moments."""
    n_beads, X_true, log_target, W, post = problem
    block = restraint_precision_block(post)
    from binf_tpu.ops.pallas.pairwise import pairwise_restraint_loss_reference

    loss = float(pairwise_restraint_loss_reference(X_true, log_target, W))
    k_obs = float(jnp.sum(W))
    shape, rate = 2.0 + k_obs / 2, 0.1 + loss / 2

    pos = {"structure": X_true, "precision": jnp.ones(())}
    keys = jax.random.split(jax.random.key(9), 2000)
    draws = jax.vmap(lambda k: block(k, pos)[0]["precision"])(keys)
    np.testing.assert_allclose(float(draws.mean()), shape / rate, rtol=0.05)


def test_backbone_prior_sampling():
    prior = BackbonePrior.create(64)
    X = prior.sample(jax.random.key(0))["structure"]
    seg = np.asarray(jnp.linalg.norm(X[1:] - X[:-1], axis=-1))
    np.testing.assert_allclose(seg, 1.0, atol=1e-5)  # unit steps
    assert np.abs(np.asarray(X).mean(0)).max() < 1e-5  # centered


def test_tempering_applies_to_restraints(problem):
    n_beads, X_true, log_target, W, post = problem
    half = post.tempered(0.5)
    full_ll = post.log_likelihood(structure=X_true, precision=25.0)
    half_ll = half.log_likelihood(structure=X_true, precision=25.0)
    assert float(half_ll) == pytest.approx(0.5 * float(full_ll), rel=1e-5)
