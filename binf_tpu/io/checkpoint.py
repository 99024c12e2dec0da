"""Checkpoint / resume of full sampler state.

The reference has no checkpointing -- samples accumulate in a Python list
and a crash at sweep 29,999 loses everything (``example_script.py:32-34``;
SURVEY.md section 5).  Here the complete sampler state is a pytree
(positions, cached log-densities/grads, adaptation state, PRNG keys), saved
with Orbax (async-capable, multi-host-aware) so a preempted run resumes
mid-chain and reproduces the exact same draws (keys are part of the state).

A dependency-light numpy fallback (``save_npz``/``load_npz``) covers
environments without Orbax.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

__all__ = ["save_checkpoint", "load_checkpoint", "save_npz", "load_npz"]


def _orbax():
    import orbax.checkpoint as ocp

    return ocp


def save_checkpoint(path: str, state: Any, force: bool = True) -> None:
    """Save a pytree state with Orbax (keys converted to key-data arrays)."""
    ocp = _orbax()
    path = os.path.abspath(path)
    state = _encode_keys(state)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=force)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, template: Any) -> Any:
    """Restore a pytree state saved by :func:`save_checkpoint`.

    ``template`` is a matching pytree of arrays (e.g. the freshly-built
    initial state) providing structure/shape/dtype.
    """
    ocp = _orbax()
    path = os.path.abspath(path)
    tmpl = _encode_keys(template)
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path, target=tmpl)
    return _decode_keys(restored, template)


def _encode_keys(tree: Any) -> Any:
    """PRNG typed keys -> raw uint32 key data (serializable)."""

    def enc(x):
        if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jax.dtypes.prng_key):
            return jax.random.key_data(x)
        return x

    return jax.tree.map(enc, tree)


def _decode_keys(tree: Any, template: Any) -> Any:
    """Raw key data -> typed keys, guided by the template's dtypes."""

    def dec(x, t):
        if isinstance(t, jax.Array) and jnp.issubdtype(t.dtype, jax.dtypes.prng_key):
            return jax.random.wrap_key_data(jnp.asarray(x))
        return jnp.asarray(x) if not isinstance(x, jax.Array) else x

    return jax.tree.map(dec, tree, template)


# -- numpy fallback ---------------------------------------------------------


def save_npz(path: str, state: Any) -> None:
    leaves, treedef = jax.tree.flatten(_encode_keys(state))
    np.savez(
        path,
        __treedef__=np.frombuffer(str(treedef).encode(), dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )


def load_npz(path: str, template: Any) -> Any:
    data = np.load(path)
    tmpl_leaves, treedef = jax.tree.flatten(template)
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(len(tmpl_leaves))]
    restored = jax.tree.unflatten(treedef, leaves)
    return _decode_keys(restored, template)
