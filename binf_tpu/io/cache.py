"""Persistent XLA compilation cache (big win under remote TPU compile)."""

from __future__ import annotations

import os

import jax

__all__ = ["enable_persistent_cache"]


def enable_persistent_cache(path: str | None = None) -> None:
    path = path or os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
