"""Device meshes and chain sharding.

The reference has no parallelism of any kind (SURVEY.md section 2.3); this
module is the new first-class "communication backend": a logical mesh with a
``chain`` axis (and optionally ``host`` / ``data`` axes), NamedShardings for
chain batches, and nothing else -- all collectives are inserted by XLA from
sharding annotations (the scaling-book recipe: pick a mesh, annotate, let
XLA insert collectives).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

Array = jax.Array

CHAIN_AXIS = "chain"
HOST_AXIS = "host"
DATA_AXIS = "data"

__all__ = [
    "CHAIN_AXIS",
    "HOST_AXIS",
    "DATA_AXIS",
    "initialize_distributed",
    "make_chain_mesh",
    "chain_sharding",
    "shard_chains",
    "replicate",
]


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> int:
    """Multi-host bring-up: ``jax.distributed.initialize`` with defaults
    from the TPU environment (a no-op on a single host).  Returns the
    process count.  Call before any jax computation; afterwards
    ``make_chain_mesh(host_axis=True)`` lays the host axis over DCN and the
    chain axis over ICI."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address)
    return max(jax.process_count(), 1)


def make_chain_mesh(
    devices: list | None = None,
    host_axis: bool = False,
) -> Mesh:
    """1-D ``('chain',)`` mesh over all devices, or 2-D ``('host','chain')``
    when ``host_axis`` is set (multi-host: the host axis maps to DCN, the
    chain axis to ICI within a slice)."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if host_axis:
        n_hosts = max(jax.process_count(), 1)
        devices = devices.reshape(n_hosts, -1)
        return Mesh(devices, (HOST_AXIS, CHAIN_AXIS))
    return Mesh(devices, (CHAIN_AXIS,))


def chain_sharding(mesh: Mesh, ndim_extra: int = 0) -> NamedSharding:
    """Sharding for a chain-batched array: leading axis split over every mesh
    axis, remaining axes replicated."""
    axes = tuple(mesh.axis_names)
    spec = P(axes if len(axes) > 1 else axes[0], *([None] * ndim_extra))
    return NamedSharding(mesh, spec)


def shard_chains(tree: Any, mesh: Mesh) -> Any:
    """Place a chain-batched pytree (leading axis = chains) on the mesh with
    the chain axis sharded across all devices."""

    def put(x: Array) -> Array:
        return jax.device_put(x, chain_sharding(mesh, x.ndim - 1))

    return jax.tree.map(put, tree)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree over the mesh (model constants)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
