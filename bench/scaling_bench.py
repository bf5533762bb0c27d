"""Scaling-efficiency harness: rows/s at 1 → N shards (BASELINE.md: ≥80%).

On a real pod this measures chips; without multi-chip hardware it runs the
same SPMD program over N virtual CPU devices
(``--xla_force_host_platform_device_count``), which validates the collective
structure and the parallel fraction, not absolute TPU throughput.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \\
      python bench/scaling_bench.py [--query 4] [--eps 200000] [--seconds 2]

Prints one JSON line per shard count with rows/s and efficiency vs 1 shard.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--query", type=int, default=4)
    ap.add_argument("--eps", type=int, default=200_000)
    ap.add_argument("--seconds", type=int, default=2)
    ap.add_argument("--shards", type=int, nargs="*", default=[1, 2, 4, 8])
    args = ap.parse_args()

    import jax

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
