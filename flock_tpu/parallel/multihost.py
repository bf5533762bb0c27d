"""Multi-host execution: N processes × local devices, one global mesh.

Reference counterpart: the reference scales by deploying more Lambda
instances and splitting the generator into per-partition threads
(flock/src/datasource/nexmark/nexmark.rs:357-389); here a pod slice runs one
SPMD program over every chip, each host generating and feeding ONLY the
partitions that map to its local devices.

Usage on a real pod (same command on every host — jax.distributed reads the
TPU metadata; on CPU/GPU pass coordinator/num_processes/process_id or the
standard env vars):

    python -m flock_tpu.cli nexmark run -q 4 --distributed --multihost ...
    # or from code:
    init_distributed()
    ex = MultiHostExecutor(spec, mesh=make_multihost_mesh())
    host = ex.execute_window(local_shard_tables)   # local shards only

Data placement uses ``jax.make_array_from_process_local_data``: every process
contributes its addressable shards of each input; XLA routes stage-boundary
collectives over ICI within a slice and DCN across hosts.  A 2-process CPU
smoke test drives this exact path (tests/test_multihost.py).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from flock_tpu.parallel.mesh import AXIS, make_multihost_mesh  # noqa: F401
from flock_tpu.parallel.executor import DistributedExecutor
from flock_tpu.runtime.executor import OverflowError


_INITIALIZED = False


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> tuple[int, int]:
    """jax.distributed.initialize wrapper — call BEFORE any other JAX use.

    On TPU pods all arguments come from the runtime metadata — call with no
    arguments on every host.  For CPU/GPU multi-process runs pass them (or
    set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).
    Returns (process_index, process_count).  Idempotent within a process.
    """
    global _INITIALIZED
    if not _INITIALIZED:
        explicit = (coordinator or num_processes
                    or os.environ.get("JAX_COORDINATOR_ADDRESS"))
        try:
            if explicit:
                jax.distributed.initialize(
                    coordinator_address=coordinator,
                    num_processes=num_processes,
                    process_id=process_id)
            else:
                # pod metadata path; single-host runs fall through
                jax.distributed.initialize()
            _INITIALIZED = True
        except (RuntimeError, ValueError):
            if explicit:
                raise
    return jax.process_index(), jax.process_count()


def local_partition_ids(generators: int, mesh=None) -> list[int]:
    """Generator partitions THIS host must generate: partition p feeds mesh
    shard p % n_shards (the same mapping the single-host driver uses,
    parallel/stream.py), so a host owns the partitions landing on its
    addressable devices.  Mirrors the reference's per-partition generator
    threads pinned to their function instances (nexmark.rs:357-389)."""
    mesh = mesh if mesh is not None else make_multihost_mesh()
    devs = list(mesh.devices.flat)
    n = len(devs)
    me = jax.process_index()
    local_shards = {i for i, d in enumerate(devs) if d.process_index == me}
    return [p for p in range(generators) if p % n in local_shards]


@dataclass
class MultiHostExecutor:
    """DistributedExecutor over a multi-host mesh: every process supplies the
    shards of its OWN devices; inputs assemble into global arrays, the same
    compiled SPMD program runs everywhere, and each process reads back its
    addressable slice of the output (merge across hosts is the sink's job,
    exactly as each reference Lambda writes its own partition)."""

    spec: object
    mesh: object = None
    agg_capacity: int | None = None

    def __post_init__(self):
        if self.mesh is None:
            self.mesh = make_multihost_mesh()
        self.n_shards = len(list(self.mesh.devices.flat))
        self._inner = DistributedExecutor(
            self.spec, self.n_shards, mesh=self.mesh,
            agg_capacity=self.agg_capacity)
        devs = list(self.mesh.devices.flat)
        me = jax.process_index()
        self.local_shards = [i for i, d in enumerate(devs)
                             if d.process_index == me]

    def _global(self, arr_local: np.ndarray) -> jax.Array:
        sharding = NamedSharding(self.mesh, P(AXIS, *([None] * (arr_local.ndim - 1))))
        return jax.make_array_from_process_local_data(sharding, arr_local)

    def execute_window(self, local_shard_tables: list[dict],
                       capacities: dict[str, int] | None = None,
                       gather: bool = True):
        """``local_shard_tables[i]`` = host columns for this process's i-th
        local shard (len == len(self.local_shards)).  With ``gather`` every
        process returns the full merged output (process_allgather);
        otherwise each returns only its local shards' rows."""
        from flock_tpu.batch import Batch, round_up

        assert len(local_shard_tables) == len(self.local_shards), \
            (len(local_shard_tables), self.local_shards)
        rels = sorted({r for st in local_shard_tables for r in st})
        capacities = capacities or {}

        # capacities must agree across processes: derive from local maxima,
        # then max-reduce over hosts
        from jax.experimental import multihost_utils

        local_caps = []
        for rel in rels:
            m = max((len(next(iter(st[rel].values())))
                     for st in local_shard_tables if rel in st and st[rel]),
                    default=1)
            local_caps.append(m)
        if jax.process_count() > 1:
            global_caps = multihost_utils.process_allgather(
                np.array(local_caps, np.int64)).max(axis=0)
        else:
            global_caps = np.array(local_caps, np.int64)

        col_names = []
        flat_inputs = []
        cap_sig = []
        for ri, rel in enumerate(rels):
            names = sorted({c for st in local_shard_tables
                            for c in st.get(rel, {})})
            cap = capacities.get(rel) or max(round_up(int(global_caps[ri])), 128)
            cap_sig.append((rel, cap))
            stacked = {nm: [] for nm in names}
            valids = []
            for st in local_shard_tables:
                cols = st.get(rel, {nm: np.array([], np.int64) for nm in names})
                b = Batch.from_numpy({nm: cols[nm] for nm in names}, cap)
                for nm in names:
                    stacked[nm].append(np.asarray(b.columns[nm]))
                valids.append(np.asarray(b.valid))
            col_names.append((rel, tuple(names), cap))
            for nm in names:
                flat_inputs.append(self._global(np.stack(stacked[nm])))
            flat_inputs.append(self._global(np.stack(valids)))

        from flock_tpu.config import CONFIG

        agg_cap = self.agg_capacity or (
            max(c for _, c in cap_sig) + CONFIG.agg_span_margin)
        fm, names_box = self._inner._fn(tuple(cap_sig), agg_cap,
                                        tuple(col_names))
        outs = fm(*flat_inputs)
        out_names = names_box["names"]
        *col_arrays, valid, ovf = outs

        def fetch(a):
            if gather and jax.process_count() > 1:
                return np.asarray(multihost_utils.process_allgather(
                    a, tiled=True))
            return np.concatenate(
                [np.asarray(s.data) for s in a.addressable_shards])

        ovf_host = fetch(ovf)
        if bool(np.asarray(ovf_host).any()):
            raise OverflowError(f"{self.spec.number} multihost overflow")
        valid = fetch(valid).reshape(-1)
        host = {}
        for nm, arr in zip(out_names, col_arrays):
            a = fetch(arr)
            host[nm] = a.reshape(valid.shape[0], *a.shape[2:])[valid]
        return host
