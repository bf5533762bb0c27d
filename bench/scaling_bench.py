"""Scaling-efficiency harness: rows/s at 1 → N shards (BASELINE.md: ≥80%).

On a real pod this measures chips; without multi-chip hardware it runs the
same SPMD program over N virtual CPU devices
(``--xla_force_host_platform_device_count``), which validates the collective
structure and the parallel fraction, not absolute TPU throughput.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \\
      python bench/scaling_bench.py [--query 4] [--eps 200000] [--seconds 2]

Multi-host mode (run the SAME command on every host; on a TPU pod no
coordinator flags are needed — jax.distributed reads the pod metadata):

  python bench/scaling_bench.py --multihost \\
      [--coordinator HOST:PORT --num-processes N --process-id I]

Each host generates only its own partitions, the window executes as one
SPMD program over every chip in the slice, and process 0 prints rows/s over
the global row count.  Prints one JSON line per shard count (single-host
mode) or one line for the whole slice (multi-host mode) with rows/s and
efficiency vs 1 shard.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def multihost_main(args):
    """One measurement over the whole slice — the N-process scaling mode.
    Pair runs at different process counts to compute host-scaling
    efficiency (BASELINE.md: ≥80% at 1 host → N hosts)."""
    import jax

    if args.coordinator:  # CPU/GPU clusters; TPU pods self-configure
        jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from flock_tpu.parallel.multihost import (MultiHostExecutor,
                                              init_distributed,
                                              make_multihost_mesh)

    init_distributed(args.coordinator, args.num_processes, args.process_id)

    from flock_tpu.queries.nexmark import get_query
    from flock_tpu.runtime.stream import generate_epoch_parts
    from flock_tpu.runtime.tables import concat_relations

    spec = get_query(args.query)
    rels = tuple(r for r in spec.relations if r != "side_input")
    mesh = make_multihost_mesh()
    n_shards = len(list(mesh.devices.flat))
    gens = max(n_shards, 8)
    parts = generate_epoch_parts(args.seconds, args.eps, gens)

    ex = MultiHostExecutor(spec, mesh=mesh)
    local_tables = []
    for shard in ex.local_shards:
        owned = [parts[t][p] for t in range(args.seconds)
                 for p in range(gens) if p % n_shards == shard]
        local_tables.append(dict(concat_relations(owned, rels)))
    total_rows = sum(len(next(iter(parts[t][p][r].values())))
                     for t in range(args.seconds) for p in range(gens)
                     for r in rels if parts[t][p].get(r))

    ex.execute_window(local_tables, gather=False)  # warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        ex.execute_window(local_tables, gather=False)
        best = min(best, time.perf_counter() - t0)
    if jax.process_index() == 0:
        print(json.dumps({
            "query": args.query, "mode": "multihost",
            "processes": jax.process_count(), "shards": n_shards,
            "rows": total_rows, "time_s": round(best, 4),
            "rows_per_s": round(total_rows / best, 1),
        }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--query", type=int, default=4)
    ap.add_argument("--eps", type=int, default=200_000)
    ap.add_argument("--seconds", type=int, default=2)
    ap.add_argument("--shards", type=int, nargs="*", default=[1, 2, 4, 8])
    ap.add_argument("--multihost", action="store_true",
                    help="one SPMD measurement over all processes' devices")
    ap.add_argument("--coordinator", type=str, default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args()

    import jax

    if args.multihost:
        multihost_main(args)
        return

    jax.config.update("jax_platforms", "cpu")

    from flock_tpu.parallel.executor import DistributedExecutor
    from flock_tpu.queries.nexmark import get_query
    from flock_tpu.runtime.stream import generate_epoch_parts
    from flock_tpu.runtime.tables import concat_relations

    max_shards = max(args.shards)
    spec = get_query(args.query)
    rels = tuple(r for r in spec.relations if r != "side_input")
    parts = generate_epoch_parts(args.seconds, args.eps, max_shards)

    base_rate = None
    for n in args.shards:
        shards = [[] for _ in range(n)]
        for t in range(args.seconds):
            for p, part in enumerate(parts[t]):
                shards[p % n].append(part)
        shard_tables = [dict(concat_relations(ps, rels)) for ps in shards]
        rows = sum(len(next(iter(st[r].values())))
                   for st in shard_tables for r in rels if st.get(r))
        ex = DistributedExecutor(spec, n)
        ex.execute_window(shard_tables)  # warm-up/compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            ex.execute_window(shard_tables)
            best = min(best, time.perf_counter() - t0)
        rate = rows / best
        if base_rate is None:
            base_rate = rate
        print(json.dumps({
            "query": args.query, "shards": n, "rows": rows,
            "time_s": round(best, 4), "rows_per_s": round(rate, 1),
            "efficiency_vs_1": round(rate / (base_rate * n / args.shards[0]), 3),
        }))


if __name__ == "__main__":
    main()
