"""Pallas kernel tests (interpret mode on CPU; real compilation is exercised
on TPU by bench_kernels.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from binf_tpu.ops.pallas.leapfrog import (
    quadratic_leapfrog,
    quadratic_leapfrog_reference,
)
from binf_tpu.ops.pallas.pairwise import (
    pairwise_restraint_loss_pallas,
    pairwise_restraint_loss_reference,
)


class TestQuadraticLeapfrog:
    def setup_method(self):
        key = jax.random.key(0)
        k1, k2, k3 = jax.random.split(key, 3)
        self.D = 16
        self.C = 64
        M = jax.random.normal(k1, (self.D, self.D)) * 0.2
        self.A = M @ M.T + jnp.eye(self.D)  # SPD
        self.b = jax.random.normal(k2, (self.D,))
        self.q = jax.random.normal(k3, (self.C, self.D))
        self.p = jax.random.normal(jax.random.key(4), (self.C, self.D))

    def test_matches_reference(self):
        q1, p1 = quadratic_leapfrog_reference(
            self.q, self.p, self.A, self.b, 0.05, 10
        )
        q2, p2 = quadratic_leapfrog(
            self.q, self.p, self.A, self.b, 0.05, 10,
            block_chains=32, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=2e-4, atol=2e-4)

    def test_padding_of_chain_axis(self):
        # C=50 not a multiple of the 32-chain block
        q, p = self.q[:50], self.p[:50]
        q1, p1 = quadratic_leapfrog_reference(q, p, self.A, self.b, 0.05, 5)
        q2, p2 = quadratic_leapfrog(
            q, p, self.A, self.b, 0.05, 5, block_chains=32, interpret=True
        )
        assert q2.shape == (50, self.D)
        np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), rtol=2e-4, atol=2e-4)

    def test_energy_conservation(self):
        """Symplectic integrator: energy drift stays tiny for small steps."""
        q, p = quadratic_leapfrog_reference(self.q, self.p, self.A, self.b, 0.01, 50)

        def energy(q, p):
            U = 0.5 * jnp.einsum("cd,de,ce->c", q, self.A, q) - q @ self.b
            return U + 0.5 * jnp.sum(p * p, axis=-1)

        e0 = energy(self.q, self.p)
        e1 = energy(q, p)
        assert float(jnp.max(jnp.abs(e1 - e0))) < 1e-2

    def test_inv_mass(self):
        im = jnp.linspace(0.5, 2.0, self.D)
        q1, p1 = quadratic_leapfrog_reference(
            self.q, self.p, self.A, self.b, 0.05, 10, inv_mass=im
        )
        q2, p2 = quadratic_leapfrog(
            self.q, self.p, self.A, self.b, 0.05, 10,
            inv_mass=im, block_chains=32, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), rtol=2e-4, atol=2e-4)


class TestPairwiseRestraint:
    def setup_method(self):
        key = jax.random.key(1)
        self.N = 256
        self.X = jax.random.normal(key, (self.N, 3)) * 2.0
        # symmetric weights, zero diagonal; ~20% observed pairs
        raw = jax.random.uniform(jax.random.key(2), (self.N, self.N))
        W = (raw < 0.2).astype(jnp.float32)
        W = 0.5 * (W + W.T)
        self.W = W * (1.0 - jnp.eye(self.N))
        diff = self.X[:, None, :] - self.X[None, :, :]
        d = jnp.sqrt(jnp.maximum(jnp.sum(diff**2, -1), 1e-12))
        self.logD = jnp.log(d + 0.3)  # slightly-off targets

    def test_forward_matches_reference(self):
        ref = pairwise_restraint_loss_reference(self.X, self.logD, self.W)
        out = pairwise_restraint_loss_pallas(
            self.X, self.logD, self.W, block=128, interpret=True
        )
        np.testing.assert_allclose(float(out), float(ref), rtol=1e-4)

    def test_gradient_matches_autodiff(self):
        g_ref = jax.grad(pairwise_restraint_loss_reference)(self.X, self.logD, self.W)
        g_pal = jax.grad(
            lambda X: pairwise_restraint_loss_pallas(
                X, self.logD, self.W, block=128, interpret=True
            )
        )(self.X)
        np.testing.assert_allclose(
            np.asarray(g_pal), np.asarray(g_ref), rtol=1e-3, atol=1e-4
        )

    def test_zero_at_exact_targets(self):
        diff = self.X[:, None, :] - self.X[None, :, :]
        d = jnp.sqrt(jnp.maximum(jnp.sum(diff**2, -1), 1e-12))
        logD = jnp.log(jnp.maximum(d, 1e-6))
        out = pairwise_restraint_loss_pallas(
            self.X, logD, self.W, block=128, interpret=True
        )
        assert float(out) < 1e-4
