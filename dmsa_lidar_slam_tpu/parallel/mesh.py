"""Device mesh construction and sharding helpers."""

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_name: str = "data", devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over all (or the given) devices."""
    devs = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devs), (axis_name,))

def make_mesh_2d(
    n_data: int, n_model: int, devices: Optional[Sequence] = None
) -> Mesh:
    """2-D (data x model) mesh — data shards points/keyframes, model shards
    the Jacobian tangent blocks."""
    devs = list(devices) if devices is not None else jax.devices()
    assert len(devs) >= n_data * n_model
    grid = np.array(devs[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def shard_leading(mesh: Mesh, axis_name: str = "data"):
    """NamedSharding that splits the leading array axis over `axis_name`."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
