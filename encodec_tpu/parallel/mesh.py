"""Mesh construction and sharding specs."""

from __future__ import annotations

import typing as tp

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: tp.Optional[int] = None,
              axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first `n_devices` devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh_2d(data: int, seq: int,
                 axis_names: tp.Tuple[str, str] = ("data", "seq")) -> Mesh:
    """2-D mesh: batch sharded over `data`, time sharded over `seq`.

    Time sharding of the conv trunk is handled by XLA's SPMD partitioner
    (it inserts the conv halo exchanges); the token-rate LSTM scan gathers
    the (hop-times smaller) sequence implicitly — the same compute split
    `parallel.sp` implements manually for inference.
    """
    devices = np.asarray(jax.devices()[:data * seq]).reshape(data, seq)
    return Mesh(devices, axis_names)


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis_name: str = "data"):
    """Place a host array onto the mesh, batch-sharded along axis 0."""
    return jax.device_put(batch, batch_sharding(mesh, axis_name))
