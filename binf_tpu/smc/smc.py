"""Adaptive tempered Sequential Monte Carlo.

New capability (the reference has no SMC; BASELINE.json's config list and
SURVEY.md section 2.3 make sharded-particle SMC a first-class component).

Anneals from the prior (beta = 0) to the posterior (beta = 1) through
p_beta ~ prior * likelihood^beta:

1. **Adaptive schedule**: the next beta is found by bisection so the
   incremental-weight ESS hits ``target_ess * N`` (fixed-iteration bisection,
   jit-safe).
2. **Resampling**: systematic / stratified / multinomial over the particle
   axis; with a sharded axis the weight normalization and ancestor gather
   become XLA collectives.
3. **Mutation**: K MCMC steps per stage targeting the current tempered
   posterior (RWM / MALA / HMC kernels from :mod:`binf_tpu.samplers`),
   run in unconstrained space (per-variable transforms) and preconditioned
   by the current particle moments, with acceptance-driven step-size
   rescaling between stages (a light version of the ChEES-style adaptation
   of PAPERS.md arXiv:2504.02627).
4. **Evidence**: accumulates log Z = sum of stage log-mean incremental
   weights -- available because our densities are fully normalized (the
   reference's are not).

The whole run is one ``lax.while_loop`` -- no Python in the loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from binf_tpu.ops.math import log_sum_exp
from binf_tpu.pdf.transforms import (
    Transform,
    constrain,
    default_transforms,
    transform_logdensity,
    unconstrain,
)
from binf_tpu.samplers.base import Position
from binf_tpu.smc.resampling import RESAMPLERS, effective_sample_size

Array = jax.Array

__all__ = ["SMCResult", "tempered_smc"]


class SMCResult(NamedTuple):
    particles: Position  # (N, ...) final equally-weighted particles
    log_evidence: Array
    num_stages: Array
    final_beta: Array
    final_step_size: Array
    mean_acceptance: Array


def _find_next_beta(
    loglik: Array, beta: Array, target_ess: float, n_bisect: int = 30
) -> Array:
    """Largest beta' in (beta, 1] with ESS((beta'-beta) loglik) >= target."""
    n = loglik.shape[0]
    target = target_ess * n

    def ess_at(delta):
        return effective_sample_size(delta * loglik, axis=0)

    full = 1.0 - beta
    ok_full = ess_at(full) >= target

    def bisect(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        good = ess_at(mid) >= target
        return jnp.where(good, mid, lo), jnp.where(good, hi, mid)

    lo, hi = lax.fori_loop(0, n_bisect, bisect, (jnp.zeros(()), full))
    delta = jnp.where(ok_full, full, lo)
    # always make progress even if ESS is terrible
    delta = jnp.maximum(delta, 1e-5)
    return jnp.minimum(beta + delta, 1.0)


def _particle_scales(u_particles: Position) -> Position:
    """Per-leaf std over the particle axis (floored) -- the preconditioner."""
    return jax.tree.map(
        lambda x: jnp.maximum(jnp.std(x, axis=0), 1e-4), u_particles
    )


def tempered_smc(
    posterior,
    key: Array,
    num_particles: int = 1024,
    mutation: str = "rwm",
    num_mutation_steps: int = 5,
    initial_step_size: float = 0.5,
    hmc_integration_steps: int = 10,
    resampling: str = "systematic",
    target_ess: float = 0.5,
    max_stages: int = 100,
    target_accept: float | None = None,
    initial_particles: Position | None = None,
    transforms: dict[str, Transform] | None = None,
    mesh=None,
) -> SMCResult:
    """Run adaptive tempered SMC targeting ``posterior``.

    ``initial_particles`` overrides prior sampling (required if some
    variable has no prior sampler).  ``transforms`` maps constrained
    variables to unconstrained space for mutation (default: heuristic
    log-transform for positive-looking names).  Call under ``jax.jit``.

    ``mesh``: a :class:`jax.sharding.Mesh` with the particle axis sharded --
    switches systematic resampling to the explicitly-scheduled shard_map
    implementation (weights-only collective in the index phase; see
    ``binf_tpu.parallel.collectives``) for multi-host runs.
    """
    if mesh is not None and resampling == "systematic":
        from binf_tpu.parallel.collectives import distributed_systematic_indices

        def resampler(k, lw):
            return distributed_systematic_indices(k, lw, mesh)

    else:
        resampler = RESAMPLERS[resampling]
    if target_accept is None:
        target_accept = 0.3 if mutation == "rwm" else 0.7
    if transforms is None:
        transforms = default_transforms(posterior)

    key, key_init = jax.random.split(key)
    if initial_particles is None:
        keys = jax.random.split(key_init, num_particles)
        particles = jax.vmap(posterior.sample_prior)(keys)
    else:
        particles = initial_particles
        num_particles = jax.tree.leaves(particles)[0].shape[0]

    loglik_fn = jax.vmap(lambda p: posterior.log_likelihood(p))

    def make_kernel(beta, step_size, scales):
        tempered = posterior.tempered(beta)
        logdensity = transform_logdensity(
            lambda pos: tempered.log_prob(pos), transforms
        )
        if mutation == "rwm":
            from binf_tpu.samplers.rwm import rwm

            leaf_steps = jax.tree.map(lambda s: step_size * s, scales)
            return rwm(logdensity, leaf_steps, proposal="normal")
        elif mutation == "hmc":
            from binf_tpu.samplers.hmc import hmc

            inverse_mass = jax.tree.map(lambda s: s * s, scales)
            return hmc(
                logdensity,
                step_size=step_size,
                num_integration_steps=hmc_integration_steps,
                inverse_mass=inverse_mass,
            )
        elif mutation == "mala":
            from binf_tpu.samplers.mala import mala

            return mala(logdensity, step_size)
        raise ValueError(mutation)

    # carry: key, particles (constrained), beta, logZ, stage, step_size, accept
    init_carry = (
        key,
        particles,
        jnp.zeros(()),
        jnp.zeros(()),
        jnp.zeros((), jnp.int32),
        jnp.asarray(initial_step_size),
        jnp.asarray(target_accept),
    )

    def cond(carry):
        _, _, beta, _, stage, _, _ = carry
        return (beta < 1.0) & (stage < max_stages)

    def body(carry):
        key, particles, beta, logZ, stage, step_size, _ = carry
        key, k_resample, k_mutate = jax.random.split(key, 3)

        loglik = loglik_fn(particles)
        new_beta = _find_next_beta(loglik, beta, target_ess)
        inc_lw = (new_beta - beta) * loglik

        # evidence increment: log mean of incremental weights
        logZ = logZ + log_sum_exp(inc_lw) - jnp.log(float(num_particles))

        # resample to equal weights
        ancestors = resampler(k_resample, inc_lw)
        particles = jax.tree.map(lambda x: x[ancestors], particles)

        # mutate in unconstrained space, preconditioned by particle moments
        u_particles = jax.vmap(lambda p: unconstrain(transforms, p))(particles)
        scales = _particle_scales(u_particles)
        kernel = make_kernel(new_beta, step_size, scales)
        states = jax.vmap(kernel.init)(u_particles)

        def mcmc_step(states, k):
            ks = jax.random.split(k, num_particles)
            states, infos = jax.vmap(kernel.step)(ks, states)
            return states, jnp.mean(infos.acceptance_prob)

        mkeys = jax.random.split(k_mutate, num_mutation_steps)
        states, accepts = lax.scan(mcmc_step, states, mkeys)
        particles = jax.vmap(lambda u: constrain(transforms, u))(states.position)
        mean_accept = jnp.mean(accepts)

        # Robbins-Monro step-size rescale toward the target acceptance
        step_size = step_size * jnp.exp(mean_accept - target_accept)

        return (key, particles, new_beta, logZ, stage + 1, step_size, mean_accept)

    (key, particles, beta, logZ, stage, step_size, mean_accept) = lax.while_loop(
        cond, body, init_carry
    )
    return SMCResult(
        particles=particles,
        log_evidence=logZ,
        num_stages=stage,
        final_beta=beta,
        final_step_size=step_size,
        mean_acceptance=mean_accept,
    )
