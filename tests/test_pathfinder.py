"""Pathfinder VI (vi/pathfinder.py): Gaussian recovery + HMC init use."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from binf_tpu.vi.pathfinder import pathfinder, pathfinder_init


def _correlated_gaussian(d=5, rho=0.8, seed=0):
    rng = np.random.default_rng(seed)
    scales = np.exp(np.linspace(-0.5, 0.8, d))
    corr = np.full((d, d), rho) + (1 - rho) * np.eye(d)
    S = np.diag(scales) @ corr @ np.diag(scales)
    mu = rng.normal(size=d)
    P = np.linalg.inv(S)
    mu_j, P_j = jnp.asarray(mu, jnp.float32), jnp.asarray(P, jnp.float32)

    def logdensity(pos):
        x = pos["x"] - mu_j
        return -0.5 * x @ (P_j @ x)

    return logdensity, mu, S


def test_pathfinder_recovers_gaussian():
    """On an exactly-Gaussian target the L-BFGS inverse Hessian IS the
    covariance: draws must match mean and marginal scales."""
    logdensity, mu, S = _correlated_gaussian()
    init = {"x": 4.0 * jax.random.normal(jax.random.key(0), (4, 5))}

    fit = jax.jit(
        lambda k: pathfinder(logdensity, init, k, num_draws=2000)
    )(jax.random.key(1))

    assert bool(jnp.any(jnp.isfinite(fit.elbo)))
    X = np.asarray(fit.samples["x"])
    np.testing.assert_allclose(X.mean(0), mu, atol=0.25)
    np.testing.assert_allclose(X.std(0), np.sqrt(np.diag(S)), rtol=0.3)
    # ELBO of a Gaussian fit to a Gaussian approaches the entropy gap ~ 0
    assert float(jnp.max(fit.elbo)) > -1.0
    assert float(fit.pareto_k) < 0.7


def test_pathfinder_multimodal_paths_disagree_gracefully():
    """Paths started in different basins return finite per-path ELBOs and
    pooled draws that stay in high-density regions."""
    mus = jnp.asarray([-3.0, 3.0])

    def logdensity(pos):
        x = pos["x"]
        return jax.scipy.special.logsumexp(
            -0.5 * (x - mus) ** 2, axis=-1
        ).sum()

    init = {"x": jnp.asarray([[-4.0], [4.0], [-2.5], [2.5]])}
    fit = pathfinder(logdensity, init, jax.random.key(0), num_draws=500)
    X = np.asarray(fit.samples["x"]).ravel()
    # every pooled draw should be near one of the modes
    dist = np.minimum(np.abs(X + 3.0), np.abs(X - 3.0))
    assert np.quantile(dist, 0.9) < 2.0


def test_bfgs_secant_condition_newest_pair():
    """BFGS guarantees H y = s exactly for the LAST applied pair, so a
    chronologically-ordered history must satisfy the secant condition for
    the newest pair (regression: the circular buffer used to be applied in
    slot order, inverting recency once the path wrapped)."""
    from binf_tpu.vi.pathfinder import _bfgs_inverse_hessian

    rng = np.random.default_rng(0)
    d, j = 6, 4
    A = rng.normal(size=(d, d))
    A = A @ A.T + d * np.eye(d)  # SPD Hessian of a quadratic
    S = jnp.asarray(rng.normal(size=(j, d)), jnp.float32)
    Y = S @ jnp.asarray(A, jnp.float32)  # y = A s for a quadratic
    valid = jnp.ones((j,), bool)

    H = _bfgs_inverse_hessian(S, Y, valid, jnp.float32(1.0), jitter=0.0)
    np.testing.assert_allclose(H @ Y[-1], S[-1], rtol=1e-4, atol=1e-4)
    # and NOT (generically) for the oldest pair -- order matters
    assert not np.allclose(H @ Y[0], S[0], rtol=1e-3, atol=1e-3)


def test_pathfinder_wrapped_history_still_recovers():
    """A path longer than the history buffer (t >= history wraps the
    circular buffer) must still recover the target covariance."""
    logdensity, mu, S = _correlated_gaussian()
    init = {"x": 4.0 * jax.random.normal(jax.random.key(5), (4, 5))}
    fit = pathfinder(
        logdensity, init, jax.random.key(6), num_draws=2000,
        max_iters=25, history=3,
    )
    X = np.asarray(fit.samples["x"])
    np.testing.assert_allclose(X.mean(0), mu, atol=0.3)
    np.testing.assert_allclose(X.std(0), np.sqrt(np.diag(S)), rtol=0.35)


def test_pathfinder_degenerate_weights_fallback():
    """If every path fails (non-finite density), resampling must not feed
    NaN probabilities to random.choice; failure is surfaced as
    pareto_k = inf instead of garbage indices."""

    def bad_logdensity(pos):
        return jnp.nan * jnp.sum(pos["x"])

    init = {"x": jax.random.normal(jax.random.key(0), (4, 3))}
    fit = pathfinder(bad_logdensity, init, jax.random.key(1),
                     num_draws=64, max_iters=5)
    assert bool(jnp.isinf(fit.pareto_k))
    assert not bool(jnp.any(jnp.isfinite(fit.elbo)))
    assert fit.samples["x"].shape == (64, 3)


@pytest.mark.slow
def test_pathfinder_init_accelerates_polynomial_hmc():
    """pathfinder_init on the reference posterior: starting positions land
    in the typical set (log density close to the posterior mode's)."""
    from binf_tpu.example.polynomial import make_data, make_posterior
    from binf_tpu.pdf.transforms import LogTransform, transform_logdensity

    xses, ys = make_data(jax.random.key(1))
    post = make_posterior(xses, ys)
    ld = transform_logdensity(lambda p: post.log_prob(p),
                              {"precision": LogTransform})

    seeds = {
        "coefficients": 3.0 * jax.random.normal(jax.random.key(2), (4, 4)),
        "precision": jnp.zeros((4,)),
    }
    starts = pathfinder_init(ld, seeds, jax.random.key(3), n_chains=64)
    assert starts["coefficients"].shape == (64, 4)

    lps = jax.vmap(ld)(starts)
    # the far-dispersed seeds score catastrophically; pathfinder's draws
    # must be within a few nats of the mode region
    lp_seed = jax.vmap(ld)(seeds)
    assert float(jnp.median(lps)) > float(jnp.max(lp_seed))
    assert float(jnp.median(lps)) > -50.0
    coeffs = np.asarray(starts["coefficients"])
    assert np.abs(coeffs.mean(0) - np.array([2.0, -4.0, 1.0, 1.5])).max() < 1.5
