"""Pytree-registered dataclass infrastructure.

Every model/density/sampler-state object in binf_tpu is an immutable,
pytree-registered dataclass: array-valued fields are pytree *data* leaves
(traced under ``jax.jit``/``vmap``/``grad``), while names, shapes, callables
and other configuration are *meta* (static) fields that become part of the
pytree structure.  Structural changes -- e.g. conditioning a density on a
variable, which changes the set of free variables -- therefore trigger a
retrace/recompile, while pure value changes never do.

This replaces the reference framework's mutable parameter-binding web
(CSB ``Parameter.bind_to``, see reference ``binf/pdf/likelihoods.py:79-100``)
with immutable structure + explicit values, which is the only way to play
nicely with XLA's trace-once compilation model.
"""

from __future__ import annotations

import dataclasses
from typing import Any, TypeVar

import jax

T = TypeVar("T")

__all__ = ["pytree_dataclass", "static_field", "field", "replace"]


def static_field(**kwargs: Any) -> Any:
    """A dataclass field treated as static pytree metadata (not traced)."""
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def field(**kwargs: Any) -> Any:
    """A regular (traced, data) dataclass field."""
    return dataclasses.field(**kwargs)


def pytree_dataclass(cls: type[T] | None = None, *, meta_fields: tuple[str, ...] = ()):
    """Decorator: frozen dataclass registered as a JAX pytree node.

    Fields are data (traced) by default; fields listed in ``meta_fields`` or
    declared with :func:`static_field` are static metadata.
    """

    def wrap(c: type[T]) -> type[T]:
        c = dataclasses.dataclass(frozen=True, eq=False)(c)
        metas = set(meta_fields)
        for f in dataclasses.fields(c):
            if f.metadata.get("static", False):
                metas.add(f.name)
        data = [f.name for f in dataclasses.fields(c) if f.name not in metas]
        meta = [f.name for f in dataclasses.fields(c) if f.name in metas]
        jax.tree_util.register_dataclass(c, data_fields=data, meta_fields=meta)
        return c

    if cls is not None:
        return wrap(cls)
    return wrap


def replace(obj: T, **changes: Any) -> T:
    """Functional update of a pytree dataclass (alias of dataclasses.replace)."""
    return dataclasses.replace(obj, **changes)
