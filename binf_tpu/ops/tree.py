"""Pytree vector-space utilities for samplers.

Sampler states are dicts of named arrays with heterogeneous shapes (scalar
precision + vector coefficients + (N,3) structures).  These helpers treat
such pytrees as flat vectors without ever concatenating them -- the
generalization SURVEY.md section 7 calls out over the reference's flat-vector
gradient layout (``binf/pdf/posteriors.py:177-186``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

__all__ = [
    "tree_add",
    "tree_sub",
    "tree_scale",
    "tree_axpy",
    "tree_dot",
    "tree_normal_like",
    "tree_uniform_like",
    "tree_zeros_like",
    "tree_size",
    "tree_where",
    "tree_split_keys",
]


def tree_add(a, b):
    return jax.tree.map(jnp.add, a, b)


def tree_sub(a, b):
    return jax.tree.map(jnp.subtract, a, b)


def tree_scale(c, a):
    return jax.tree.map(lambda x: c * x, a)


def tree_axpy(c, x, y):
    """y + c * x, leafwise."""
    return jax.tree.map(lambda xi, yi: yi + c * xi, x, y)


def tree_dot(a, b) -> Array:
    leaves = jax.tree.leaves(jax.tree.map(lambda x, y: jnp.sum(x * y), a, b))
    return jnp.sum(jnp.stack(leaves)) if leaves else jnp.zeros(())


def tree_size(a) -> int:
    return sum(x.size for x in jax.tree.leaves(a))


def tree_split_keys(key: Array, template) -> "jax.tree_util.PyTreeDef":
    """One PRNG key per leaf, as a pytree shaped like ``template``."""
    leaves, treedef = jax.tree.flatten(template)
    keys = jax.random.split(key, len(leaves))
    return jax.tree.unflatten(treedef, list(keys))


def tree_normal_like(key: Array, template):
    keys = tree_split_keys(key, template)
    return jax.tree.map(
        lambda k, x: jax.random.normal(k, x.shape, x.dtype), keys, template
    )


def tree_uniform_like(key: Array, template, low: float = -1.0, high: float = 1.0):
    keys = tree_split_keys(key, template)
    return jax.tree.map(
        lambda k, x: jax.random.uniform(k, x.shape, x.dtype, low, high),
        keys,
        template,
    )


def tree_zeros_like(a):
    return jax.tree.map(jnp.zeros_like, a)


def tree_where(pred: Array, a, b):
    """Select whole pytree a or b on a scalar predicate (accept/reject)."""
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)
