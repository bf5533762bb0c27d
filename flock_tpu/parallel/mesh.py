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
    if n > len(devs):
        raise ValueError(
            f"mesh needs {n} devices but the backend exposes {len(devs)} "
            f"({devs[0].platform}); for CPU tests set JAX_PLATFORMS=cpu and "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n} before "
            "importing jax (see tests/conftest.py)")
    return Mesh(np.array(devs[:n]), (AXIS,))


def make_multihost_mesh() -> Mesh:
    """Pod-slice mesh spanning all hosts.

    jax.devices() on a multi-host deployment (jax.distributed.initialize on
    each host) enumerates every chip in the slice; a single flat ``shards``
    axis lets XLA route intra-slice exchange over ICI and cross-host segments
    over DCN automatically.  Per-host generator partitions map to that host's
    local chips (p % n == device index), mirroring the reference's
    per-partition thread model (SURVEY §7.2 step 6).  All collectives in
    parallel/shuffle.py are axis-name based and work unchanged.
    """
    return Mesh(np.array(jax.devices()), (AXIS,))


def shard_spec(extra_dims: int = 0) -> P:
    return P(AXIS, *([None] * extra_dims))


def put_sharded(mesh: Mesh, arr) -> jax.Array:
    """Place a host array with leading shard dimension onto the mesh."""
    return jax.device_put(arr, NamedSharding(mesh, shard_spec(arr.ndim - 1)))
