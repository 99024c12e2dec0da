"""Chromatin-structure-style distance-restraint posterior.

The reference framework's scientific purpose is Bayesian chromatin structure
determination from Hi-C style contact/distance data (reference
``README.rst:9``, Carstens et al. 2016): infer bead coordinates
X in R^{N x 3} from noisy pairwise distance restraints.  The reference never
ships that model (it lives in the author's downstream project); here it is a
first-class workload (BASELINE.json config 5) built on the blockwise Pallas
restraint kernel:

* log-normal distance restraints over a dense symmetric weight matrix
  (``binf_tpu.ops.pallas.pairwise``; O(N^2) tiled through VMEM);
* harmonic backbone (polymer-chain) prior between consecutive beads;
* Gamma prior on the restraint precision;
* HMC/NUTS over the (N, 3) structure -- gradients flow through the kernel's
  custom VJP.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from binf_tpu.core.density import Density, ValueDict, VariableSpec
from binf_tpu.core.modules import pytree_dataclass, static_field
from binf_tpu.ops.pallas.pairwise import pairwise_restraint_loss
from binf_tpu.pdf import GammaPrior, Posterior
from binf_tpu.pdf.priors import Prior

Array = jax.Array

__all__ = [
    "DistanceRestraintLikelihood",
    "BackbonePrior",
    "make_chromatin_posterior",
    "make_gram_logdensity",
    "synthetic_restraints",
]


@pytree_dataclass
class DistanceRestraintLikelihood(Density):
    """p(logD | X, precision): log-normal restraints over all weighted pairs.

    log p = -0.5 * precision * loss(X) + 0.5 * K * log(precision) + const,
    loss(X) = sum_ij W_ij (log|x_i - x_j| - logD_ij)^2, K = sum_ij W_ij.

    (Each unordered pair appears twice in the symmetric sum; K counts the
    same way, so the density is consistent.)
    """

    log_target: Array  # (N, N) target log-distances
    weights: Array  # (N, N) symmetric, zero diagonal
    fixed: ValueDict
    n_beads: int = static_field()
    block: int = static_field(default=256)
    use_pallas: bool | None = static_field(default=None)
    name: str = static_field(default="restraints")
    temper: float | Array = 1.0

    @classmethod
    def create(cls, log_target, weights, block: int = 256, use_pallas=None):
        log_target = jnp.asarray(log_target, jnp.float32)
        weights = jnp.asarray(weights, jnp.float32)
        return cls(
            log_target=log_target,
            weights=weights,
            fixed={},
            n_beads=int(log_target.shape[0]),
            block=block,
            use_pallas=use_pallas,
        )

    @property
    def variable_specs(self) -> tuple[VariableSpec, ...]:
        return (
            VariableSpec("structure", shape=(self.n_beads, 3), differentiable=True),
            VariableSpec("precision", shape=(), differentiable=True),
        )

    def _log_prob(self, values: ValueDict) -> Array:
        X = values["structure"]
        prec = values["precision"]
        loss = pairwise_restraint_loss(
            X, self.log_target, self.weights, self.block, self.use_pallas
        )
        k = jnp.sum(self.weights)
        return self.temper * (-0.5 * prec * loss + 0.5 * k * jnp.log(prec))


@pytree_dataclass
class BackbonePrior(Prior):
    """Harmonic polymer-backbone prior: consecutive beads at distance d0.

    log p = -0.5 * k_spring * sum_i (|x_{i+1} - x_i| - d0)^2
    plus a weak centering term pinning the center of mass at the origin
    (removes the translational null space that would otherwise make the
    posterior improper).
    """

    fixed: ValueDict
    n_beads: int = static_field()
    d0: float = static_field(default=1.0)
    k_spring: float = static_field(default=10.0)
    k_center: float = static_field(default=0.01)
    name: str = static_field(default="backbone")

    @classmethod
    def create(cls, n_beads: int, d0: float = 1.0, k_spring: float = 10.0):
        return cls(fixed={}, n_beads=n_beads, d0=d0, k_spring=k_spring)

    @property
    def variable_specs(self) -> tuple[VariableSpec, ...]:
        return (
            VariableSpec("structure", shape=(self.n_beads, 3), differentiable=True),
        )

    def _log_prob(self, values: ValueDict) -> Array:
        X = values["structure"]
        seg = X[1:] - X[:-1]
        d = jnp.sqrt(jnp.maximum(jnp.sum(seg * seg, axis=-1), 1e-12))
        backbone = -0.5 * self.k_spring * jnp.sum((d - self.d0) ** 2)
        center = -0.5 * self.k_center * jnp.sum(jnp.mean(X, axis=0) ** 2) * self.n_beads
        return backbone + center

    def sample(self, key: Array) -> ValueDict:
        """A random-walk polymer draw (consecutive steps of length ~ d0)."""
        steps = jax.random.normal(key, (self.n_beads, 3))
        steps = steps / jnp.linalg.norm(steps, axis=-1, keepdims=True) * self.d0
        X = jnp.cumsum(steps, axis=0)
        return {"structure": X - jnp.mean(X, axis=0, keepdims=True)}


def synthetic_restraints(
    key: Array, n_beads: int, observe_frac: float = 0.2, noise_prec: float = 25.0
):
    """Ground-truth random-walk polymer + noisy log-distance observations.

    Returns (true structure, log_target, weights).
    """
    k1, k2, k3 = jax.random.split(key, 3)
    prior = BackbonePrior.create(n_beads)
    X_true = prior.sample(k1)["structure"]

    diff = X_true[:, None, :] - X_true[None, :, :]
    d = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, -1), 1e-12))
    noise = jax.random.normal(k2, (n_beads, n_beads)) / jnp.sqrt(noise_prec)
    noise = 0.5 * (noise + noise.T)
    log_target = jnp.log(jnp.maximum(d, 1e-6)) + noise

    raw = jax.random.uniform(k3, (n_beads, n_beads))
    W = (0.5 * (raw + raw.T) < observe_frac).astype(jnp.float32)
    W = W * (1.0 - jnp.eye(n_beads))
    return X_true, log_target, W


def make_gram_logdensity(
    log_target: Array,
    weights: Array,
    gamma_shape: float = 2.0,
    gamma_rate: float = 0.1,
    d0: float = 1.0,
    k_spring: float = 10.0,
    k_center: float = 0.01,
):
    """Unconstrained chromatin log density in GRAM form (the TPU-native
    shape of the restraint field, built for the chain-grid fused kernel).

    Mathematically identical (up to a constant) to
    ``transform_logdensity(make_chromatin_posterior(...).log_prob,
    {"precision": LogTransform})`` -- verified gradient-exactly in
    ``tests/test_chain_grid.py`` -- but the pairwise squared distances are
    computed as ``d2_ij = |x_i|^2 + |x_j|^2 - 2 (X X^T)_ij``: ONE
    (N, 3) @ (3, N) MXU matmul and 2-D (N, N) elementwise tiles instead of
    the (N, N, 3) difference tensor the broadcast form materializes.
    Inside the chain-grid kernel every intermediate is then a well-shaped
    2-D Mosaic tile with the bead axis in lanes, and the backward pass is
    an (N, N) @ (N, 3) matmul -- this is what makes the reference's own
    application workload (restraint fields, ``README.rst:9``, likelihood
    shape ``binf/example/likelihood.py:54-57``) fusible on hardware.

    Position dict: ``{"structure": (N, 3), "precision": ()}`` with
    precision in LOG space (matching the CLI's ``LogTransform``).
    """
    logD = jnp.asarray(log_target, jnp.float32)
    W = jnp.asarray(weights, jnp.float32)
    k_obs = float(jnp.sum(W))
    n = logD.shape[0]

    def logdensity(pos):
        X = pos["structure"]  # (N, 3)
        u = pos["precision"]  # log precision
        prec = jnp.exp(u)

        sq = jnp.sum(X * X, axis=1, keepdims=True)  # (N, 1)
        gram = jnp.dot(X, X.T, preferred_element_type=jnp.float32)
        d2 = jnp.maximum(sq + sq.T - 2.0 * gram, 1e-12)
        r = 0.5 * jnp.log(d2) - logD
        loss = jnp.sum(W * r * r)
        restraint = -0.5 * prec * loss + 0.5 * k_obs * u

        # keepdims: 1-D (N-1,)/(3,) intermediates trigger a Mosaic relayout
        # bug in-kernel ("non-singleton dim replicated in destination");
        # 2-D (N-1, 1)/(1, 3) tiles lower cleanly
        seg = X[1:] - X[:-1]
        d = jnp.sqrt(
            jnp.maximum(jnp.sum(seg * seg, axis=-1, keepdims=True), 1e-12)
        )
        backbone = -0.5 * k_spring * jnp.sum((d - d0) ** 2)
        center = -0.5 * k_center * jnp.sum(
            jnp.mean(X, axis=0, keepdims=True) ** 2
        ) * n

        # Gamma(shape, rate) on precision + log-Jacobian of exp
        gamma = (gamma_shape - 1.0) * u - gamma_rate * prec + u
        return restraint + backbone + center + gamma

    return logdensity


def make_sharded_restraint_loss(mesh, axis: str = "data"):
    """Row-sharded O(N^2) restraint evaluation (SURVEY.md section 5's
    "blockwise ... over shards": the domain analogue of sequence parallelism).

    The (N, N) target/weight matrices are sharded by ROWS over ``axis``; the
    small (N, 3) structure is replicated.  Forward: each device evaluates its
    (N/D, N) slab and the scalar losses are psum-reduced.  Backward: each
    device computes the forces for ITS rows (symmetric-W factor 2), so the
    gradient comes back row-sharded with zero extra communication.

    Memory and compute are O(N^2 / D) per device -- the path to
    chromosome-scale (N ~ 10^5) restraint fields.
    """
    from functools import partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from binf_tpu.ops.pallas.pairwise import pairwise_restraint_block

    @partial(jax.custom_vjp, nondiff_argnums=())
    def loss_fn(X, logD, W):
        return _fwd(X, logD, W)[0]

    @partial(shard_map, mesh=mesh, in_specs=(P(), P(axis), P(axis)),
             out_specs=(P(), P(axis)))
    def _eval(X, logD_local, W_local):
        m = logD_local.shape[0]
        dev = jax.lax.axis_index(axis)
        X_rows = jax.lax.dynamic_slice_in_dim(X, dev * m, m, axis=0)
        loss, forces = pairwise_restraint_block(X_rows, X, logD_local, W_local)
        return jax.lax.psum(loss, axis), forces

    def _fwd(X, logD, W):
        loss, forces = _eval(X, logD, W)
        return loss, forces

    def _bwd(forces, g):
        return (g * forces, None, None)

    loss_fn.defvjp(_fwd, _bwd)
    return loss_fn


def restraint_precision_block(posterior, likelihood_name: str = "restraints",
                              prior_name: str = "precision_prior"):
    """Exact conjugate Gibbs draw of the restraint precision:
    lambda | X ~ Gamma(alpha + K/2, beta + loss(X)/2)."""
    from binf_tpu.samplers.conjugate import ConjugateInfo
    from binf_tpu.samplers.gibbs import direct_block

    lik = posterior.likelihoods[likelihood_name]
    prior = posterior.priors[prior_name]
    k_obs = jnp.sum(lik.weights)

    def sample_fn(key, position):
        loss = pairwise_restraint_loss(
            position["structure"], lik.log_target, lik.weights, lik.block,
            lik.use_pallas,
        )
        shape = prior.shape_param + 0.5 * k_obs
        rate = prior.rate + 0.5 * loss
        draw = jax.random.gamma(key, shape) / rate
        return {"precision": draw}, ConjugateInfo(jnp.asarray(True), jnp.ones(()))

    return direct_block(sample_fn)


def make_chromatin_posterior(
    log_target: Array,
    weights: Array,
    gamma_shape: float = 2.0,
    gamma_rate: float = 0.1,
    block: int = 256,
    use_pallas=None,
) -> Posterior:
    n_beads = int(log_target.shape[0])
    lik = DistanceRestraintLikelihood.create(
        log_target, weights, block=block, use_pallas=use_pallas
    )
    priors = {
        "backbone": BackbonePrior.create(n_beads),
        "precision_prior": GammaPrior.create(
            gamma_shape, gamma_rate, variable="precision"
        ),
    }
    return Posterior.create({"restraints": lik}, priors)
