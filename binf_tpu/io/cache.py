"""Persistent XLA compilation cache (big win under remote TPU compile)."""

from __future__ import annotations

import hashlib
import os
import platform

import jax

__all__ = ["enable_persistent_cache"]


def _host_fingerprint() -> str:
    """Stable fingerprint of the host CPU's feature set.

    AOT CPU artifacts are compiled for the exact CPU features of the
    compiling machine; loading them on a machine with different features
    makes the loader log machine-feature-mismatch errors on every entry.
    The /proc/cpuinfo flags hash distinguishes such machines while staying
    stable across container restarts (a hostname would not).
    """
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:8]
    except OSError:
        pass
    return platform.node() or "unknown"


def enable_persistent_cache(path: str | None = None, cpu: bool = False) -> None:
    """Enable the on-disk XLA compile cache, keyed by backend + host CPU.

    Each (backend, host-CPU-features) population gets its own directory so
    TPU programs, this host's CPU programs, and another host's CPU programs
    never collide (cf. the round-1 MULTICHIP log full of cpu_aot_loader
    machine-feature-mismatch errors from a shared flat cache).

    On the CPU backend this is a NO-OP unless ``cpu=True``: CPU compiles are
    fast, and XLA's CPU AOT loader logs feature-mismatch errors even for
    same-host reloads (tuning flags like +prefer-no-gather are compared
    against the hardware feature list).  The cache pays off only where
    compiles are expensive -- the remote-TPU path.
    """
    if jax.default_backend() == "cpu" and not cpu:
        return
    if path is None:
        root = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
        tag = f"{jax.default_backend()}-{platform.machine()}-{_host_fingerprint()}"
        path = os.path.join(root, tag)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
