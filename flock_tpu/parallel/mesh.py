"""Device mesh helpers.

The engine shards relations row-wise over a 1-D ``shards`` axis — the
TPU-native replacement for Flock's function groups + consistent-hash ring
(flock-function/src/aws/cloud_context.rs): partition id == device id, so no
addressing layer exists at all.  Multi-host pods extend the same axis over
DCN; ICI carries the all_to_all/all_gather traffic inside a slice.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "shards"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (AXIS,))


def shard_spec(extra_dims: int = 0) -> P:
    return P(AXIS, *([None] * extra_dims))


def put_sharded(mesh: Mesh, arr) -> jax.Array:
    """Place a host array with leading shard dimension onto the mesh."""
    return jax.device_put(arr, NamedSharding(mesh, shard_spec(arr.ndim - 1)))
