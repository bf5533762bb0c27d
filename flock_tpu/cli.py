"""Command-line driver — the flock-cli analogue.

Reference: flock-cli/src/{main,nexmark,ysb}.rs (clap REPL running
``nexmark run -q N -s S -e E -g G``).  Subcommands:

  nexmark run  -q N [-s SECONDS] [-e EVENTS_PER_SEC] [-g GENERATORS]
               [--distributed] [--shards N] [--show N]
  ysb run      [-s SECONDS] [-e EVENTS_PER_SEC] [-g GENERATORS]
  bench        [--query N] [--seconds N] [--eps N]

Outputs per-window row counts and (with --show) decoded result rows.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def _print_window(tag, cols, schema, show: int):
    n = len(next(iter(cols.values()))) if cols else 0
    print(f"window {tag}: {n} rows")
    if show and n:
        decoded = schema.decode(cols)
        names = schema.names
        head = {k: decoded[k][:show] for k in names}
        for i in range(min(show, n)):
            print("  ", {k: head[k][i] for k in names})


def cmd_nexmark(args) -> int:
    from flock_tpu.queries.nexmark import QUERIES, get_query
    from flock_tpu.runtime.sink import make_sink
    from flock_tpu.runtime.stream import run_nexmark

    if args.query not in QUERIES:
        print(f"error: unknown query q{args.query} "
              f"(available: {sorted(QUERIES)})", file=sys.stderr)
        return 2
    sink = make_sink(args.sink) if args.sink else None
    t0 = time.perf_counter()
    spec = get_query(args.query)
    if getattr(args, "trace", False):
        # jax.profiler trace around the whole run (TensorBoard/xprof dir)
        import contextlib

        from flock_tpu.utils.metrics import device_trace

        stack = contextlib.ExitStack()
        stack.enter_context(
            device_trace(f"nexmark_q{args.query}", enabled=True))
        print("profiler trace → /tmp/flock_tpu_trace/"
              f"nexmark_q{args.query}")
    else:
        stack = None
    if getattr(args, "multihost", False):
        rc = _run_nexmark_multihost(args, spec, sink)
        if stack is not None:
            stack.close()
        print(f"elapsed: {time.perf_counter() - t0:.2f}s")
        if args.metrics:
            from flock_tpu.utils.metrics import METRICS
            print(METRICS.report())
        return rc
    if args.distributed:
        from flock_tpu.parallel.stream import DistStreamDriver
        from flock_tpu.runtime.stream import generate_epoch_parts

        parts = generate_epoch_parts(args.seconds, args.eps, args.generators)
        driver = DistStreamDriver(spec, args.seconds, args.shards)
        results = driver.run(parts)
        total = 0
        for r in results:
            total += len(next(iter(r.columns.values()))) if r.columns else 0
            _print_window(r.tag, r.columns, spec.schema, args.show)
            if sink:
                sink.write(r.tag, r.columns, spec.schema)
        print(f"q{args.query} distributed×{args.shards}: {len(results)} "
              f"windows, {total} output rows")
    else:
        results = run_nexmark(args.query, args.seconds, args.eps,
                              args.generators)
        total = 0
        for r in results:
            total += len(next(iter(r.columns.values()))) if r.columns else 0
            _print_window(r.tag, r.columns, spec.schema, args.show)
            if sink:
                sink.write(r.tag, r.columns, spec.schema)
        print(f"q{args.query}: {len(results)} windows, {total} output rows")
        if sink:
            print(f"sink[{args.sink}]: {sink.read()}")
    if stack is not None:
        stack.close()
    print(f"elapsed: {time.perf_counter() - t0:.2f}s")
    if args.metrics:
        from flock_tpu.utils.metrics import METRICS
        print(METRICS.report())
    return 0


def _run_nexmark_multihost(args, spec, sink) -> int:
    """One SPMD window over every chip of the slice; each host generates ONLY
    the generator partitions owned by its local devices (the
    one-command-per-host pod deployment documented in parallel/multihost.py —
    the analogue of the reference's per-host source functions,
    flock-cli/src/nexmark.rs).  The whole run executes as one global window."""
    import jax

    if spec.window[0] in ("session", "global"):
        print("error: --multihost supports range/elementwise windows "
              "(session/processing-time bookkeeping is single-host for now)",
              file=sys.stderr)
        return 2
    if args.coordinator:  # CPU/GPU clusters; TPU pods self-configure
        jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from flock_tpu.parallel.multihost import (MultiHostExecutor,
                                              init_distributed,
                                              local_partition_ids,
                                              make_multihost_mesh)

    init_distributed(args.coordinator, args.num_processes, args.process_id)

    from flock_tpu.datagen.native_gen import nexmark_generate_partition
    from flock_tpu.datagen.nexmark import NexmarkConfig
    from flock_tpu.runtime.executor import materialize_columns
    from flock_tpu.runtime.tables import (concat_relations,
                                          default_side_input,
                                          epoch_to_relations)

    mesh = make_multihost_mesh()
    n_shards = len(list(mesh.devices.flat))
    gens = max(args.generators, n_shards)
    cfg = NexmarkConfig(events_per_second=args.eps,
                        num_event_generators=gens)
    rels = tuple(r for r in spec.relations if r != "side_input")
    ex = MultiHostExecutor(spec, mesh=mesh)
    per_shard = {s: [] for s in ex.local_shards}
    for p in local_partition_ids(gens, mesh):
        for e in nexmark_generate_partition(cfg, args.seconds, p):
            if e.epoch < args.seconds:
                per_shard[p % n_shards].append(epoch_to_relations(e))
    local_tables = []
    for s in ex.local_shards:
        st = dict(concat_relations(per_shard[s], rels))
        if "side_input" in spec.relations:
            si = default_side_input()
            st["side_input"] = si if s == 0 else \
                {k: v[:0] for k, v in si.items()}
        local_tables.append(st)
    cols = materialize_columns(spec, ex.execute_window(local_tables))
    n = len(next(iter(cols.values()))) if cols else 0
    if jax.process_index() == 0:
        _print_window(("multihost", 0, args.seconds), cols, spec.schema,
                      args.show)
        if sink:
            sink.write(("multihost", 0, args.seconds), cols, spec.schema)
        print(f"q{args.query} multihost: {jax.process_count()} process(es) × "
              f"{n_shards} shards, {n} output rows")
    return 0


def cmd_ysb(args) -> int:
    from flock_tpu.datagen.ysb import YsbConfig
    from flock_tpu.queries.ysb import run_ysb, ysb_query

    t0 = time.perf_counter()
    cfg = YsbConfig(seconds=args.seconds, events_per_second=args.eps,
                    threads=args.generators)
    results = run_ysb(cfg)
    spec = ysb_query()
    for r in results:
        _print_window(r.tag, r.columns, spec.schema, args.show)
    print(f"ysb: {len(results)} windows; elapsed {time.perf_counter()-t0:.2f}s")
    return 0


def cmd_ingest(args) -> int:
    """Run a query over an EXTERNAL fragment stream (the kafka-trigger
    ingestion analogue, datasource/kafka.rs): fragments arrive as line JSON
    over a TCP socket or an append-only file, reassemble through the arena,
    and the windowed driver executes epochs as they complete."""
    from flock_tpu.datagen.ingest import (FileTailSource, IngestDriver,
                                          SocketIngestServer)
    from flock_tpu.queries.nexmark import get_query

    if (args.file is None) == (args.listen is None):
        print("error: pass exactly one of --file or --listen",
              file=sys.stderr)
        return 2
    spec = get_query(args.query)
    t0 = time.perf_counter()
    if args.listen is not None:
        srv = SocketIngestServer(port=args.listen)
        host, port = srv.address
        print(f"listening on {host}:{port} for {args.lines} fragments",
              flush=True)
        lines = srv.lines(args.lines, timeout_s=args.timeout)
    else:
        lines = FileTailSource(args.file, n_lines=args.lines,
                               timeout_s=args.timeout)
    results = IngestDriver(spec, args.seconds, f"q{args.query}").run(lines)
    if args.listen is not None:
        srv.close()
    total = 0
    for r in results:
        total += len(next(iter(r.columns.values()))) if r.columns else 0
        _print_window(r.tag, r.columns, spec.schema, args.show)
    print(f"q{args.query} ingest: {len(results)} windows, {total} output "
          f"rows; elapsed {time.perf_counter() - t0:.2f}s")
    return 0


def cmd_produce(args) -> int:
    """Produce a fragment stream from the generator (the source-function
    side): write line-JSON fragments to a file or a socket endpoint."""
    from flock_tpu.datagen.ingest import fragment_lines, send_fragments
    from flock_tpu.queries.nexmark import get_query
    from flock_tpu.runtime.stream import generate_epochs

    spec = get_query(args.query)
    rels = tuple(r for r in spec.relations if r != "side_input")
    epochs = generate_epochs(args.seconds, args.eps, args.generators)
    lines = fragment_lines(epochs, f"q{args.query}", granule=args.granule,
                           relations=rels)
    if args.connect:
        host, _, port = args.connect.rpartition(":")
        send_fragments((host or "127.0.0.1", int(port)), lines)
        print(f"sent {len(lines)} fragments to {args.connect}")
    else:
        with open(args.file, "a") as f:
            for line in lines:
                f.write(line + "\n")
        print(f"appended {len(lines)} fragments to {args.file}")
    return 0


def cmd_explain(args) -> int:
    """Show a query's stage DAG (EXPLAIN analogue of the reference's
    graphviz dumps, benchmarks/src/nexmark/main.rs:467-601)."""
    from flock_tpu.planner import plan_query_stages

    if args.sql:
        from flock_tpu.sql.catalog import nexmark_catalog, ysb_catalog
        from flock_tpu.sql.lower import sql_to_spec
        cat = ysb_catalog() if args.dataset == "ysb" else nexmark_catalog()
        spec = sql_to_spec(args.sql, cat)
        print(f"-- SQL plan ({args.dataset})")
    else:
        from flock_tpu.queries.nexmark import QUERIES, get_query
        if args.query not in QUERIES:
            print(f"error: unknown query q{args.query}", file=sys.stderr)
            return 2
        spec = get_query(args.query)
        print(f"-- q{args.query} (window={spec.window})")
    print(plan_query_stages(spec.plan).explain())
    return 0


def cmd_fsql(args) -> int:
    """Run SQL over generated NEXMark (or YSB) data — the fsql REPL analogue
    (flock-cli/src/fsql.rs, which is a stub in the reference; here it works)."""
    from flock_tpu.runtime.executor import LocalExecutor
    from flock_tpu.runtime.stream import generate_epochs
    from flock_tpu.runtime.tables import concat_relations, default_side_input
    from flock_tpu.sql.catalog import nexmark_catalog, ysb_catalog
    from flock_tpu.sql.lower import sql_to_spec

    if args.dataset == "nexmark":
        catalog = nexmark_catalog()
        epochs = generate_epochs(args.seconds, args.eps, args.generators)
        window = concat_relations(epochs, ("person", "auction", "bid"))
        window["side_input"] = default_side_input()
    else:
        from flock_tpu.datagen.ysb import YsbConfig
        from flock_tpu.queries.ysb import campaign_table, generate_ysb_epochs
        import numpy as np

        catalog = ysb_catalog()
        cfg = YsbConfig(seconds=args.seconds, events_per_second=args.eps,
                        threads=args.generators)
        ys = generate_ysb_epochs(cfg)
        window = {
            "ad_event": {k: np.concatenate([e["ad_event"][k] for e in ys])
                         for k in ys[0]["ad_event"]},
            "campaign": campaign_table(cfg),
        }

    def run_one(sql: str):
        t0 = time.perf_counter()
        spec = sql_to_spec(sql, catalog)
        ex = LocalExecutor(spec)
        tables = {r: window[r] for r in spec.relations}
        out = ex.materialize(ex.execute_window(tables))
        n = len(next(iter(out.values()))) if out else 0
        _print_window(("sql",), out, spec.schema, args.show or 10)
        print(f"{n} rows in {time.perf_counter() - t0:.2f}s")

    if args.query:
        run_one(args.query)
        return 0
    import readline  # noqa: F401  (history/line editing)

    print(f"fsql — {args.dataset} tables loaded "
          f"({args.seconds}s × {args.eps} events/s). Ctrl-D to exit.")
    while True:
        try:
            line = input("fsql> ").strip()
        except EOFError:
            print()
            return 0
        if not line:
            continue
        try:
            run_one(line)
        except Exception as e:  # noqa: BLE001
            print(f"error: {e}")


def cmd_bench(args) -> int:
    import bench  # repo-root harness

    sys.argv = ["bench.py", "--query", str(args.query),
                "--seconds", str(args.seconds), "--eps", str(args.eps)]
    bench.main()
    return 0


def main(argv=None) -> int:
    # honor JAX_PLATFORMS even when a platform plugin force-selects itself
    # (the axon TPU tunnel does); must happen before backend initialization
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            import jax

            jax.config.update("jax_platforms", plat)
        except Exception:  # noqa: BLE001 — backend already up: keep it
            pass

    ap = argparse.ArgumentParser(prog="flock-tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    nm = sub.add_parser("nexmark")
    nm_sub = nm.add_subparsers(dest="sub", required=True)
    nr = nm_sub.add_parser("run")
    nr.add_argument("-q", "--query", type=int, required=True)
    nr.add_argument("-s", "--seconds", type=int, default=4)
    nr.add_argument("-e", "--eps", type=int, default=10_000)
    nr.add_argument("-g", "--generators", type=int, default=1)
    nr.add_argument("--distributed", action="store_true")
    nr.add_argument("--multihost", action="store_true",
                    help="run ONE SPMD window over every process's devices "
                    "(same command on every host; pod metadata or "
                    "--coordinator flags wire the processes together)")
    nr.add_argument("--coordinator", default=None,
                    help="host:port for CPU/GPU clusters (TPU pods "
                    "self-configure)")
    nr.add_argument("--num-processes", type=int, default=None)
    nr.add_argument("--process-id", type=int, default=None)
    from flock_tpu.config import CONFIG
    nr.add_argument("--shards", type=int, default=CONFIG.target_partitions)
    nr.add_argument("--show", type=int, default=0)
    nr.add_argument("--metrics", action="store_true",
                    help="print the per-query metrics registry after the run")
    nr.add_argument("--trace", action="store_true",
                    help="write a jax.profiler trace of the run to "
                    "/tmp/flock_tpu_trace/ (TensorBoard/xprof format)")
    nr.add_argument("--sink", choices=["blackhole", "memory", "file"],
                    default=None)
    nr.set_defaults(fn=cmd_nexmark)

    yb = sub.add_parser("ysb")
    yb_sub = yb.add_subparsers(dest="sub", required=True)
    yr = yb_sub.add_parser("run")
    yr.add_argument("-s", "--seconds", type=int, default=20)
    yr.add_argument("-e", "--eps", type=int, default=10_000)
    yr.add_argument("-g", "--generators", type=int, default=1)
    yr.add_argument("--show", type=int, default=0)
    yr.set_defaults(fn=cmd_ysb)

    ex = sub.add_parser("explain")
    ex.add_argument("-q", "--query", type=int, default=4)
    ex.add_argument("--sql", default=None)
    ex.add_argument("--dataset", choices=["nexmark", "ysb"], default="nexmark")
    ex.set_defaults(fn=cmd_explain)

    fq = sub.add_parser("fsql")
    fq.add_argument("query", nargs="?", default=None,
                    help="one-shot SQL; omit for a REPL")
    fq.add_argument("--dataset", choices=["nexmark", "ysb"], default="nexmark")
    fq.add_argument("-s", "--seconds", type=int, default=2)
    fq.add_argument("-e", "--eps", type=int, default=5_000)
    fq.add_argument("-g", "--generators", type=int, default=1)
    fq.add_argument("--show", type=int, default=0)
    fq.set_defaults(fn=cmd_fsql)

    be = sub.add_parser("bench")
    be.add_argument("--query", type=int, default=4)
    be.add_argument("--seconds", type=int, default=4)
    be.add_argument("--eps", type=int, default=1_000_000)
    be.set_defaults(fn=cmd_bench)

    ig = sub.add_parser("ingest", help="run a query over an external "
                        "fragment stream (socket or tailed file)")
    ig.add_argument("-q", "--query", type=int, default=2)
    ig.add_argument("-s", "--seconds", type=int, default=2)
    ig.add_argument("--file", default=None, help="tail this fragment log")
    ig.add_argument("--listen", type=int, default=None,
                    help="TCP port to listen on (0 = ephemeral)")
    ig.add_argument("--lines", type=int, required=True,
                    help="number of fragment lines to consume")
    ig.add_argument("--timeout", type=float, default=60.0)
    ig.add_argument("--show", type=int, default=0)
    ig.set_defaults(fn=cmd_ingest)

    pr = sub.add_parser("produce", help="emit generator fragments to a "
                        "file or socket (the source-function side)")
    pr.add_argument("-q", "--query", type=int, default=2)
    pr.add_argument("-s", "--seconds", type=int, default=2)
    pr.add_argument("-e", "--eps", type=int, default=1_000)
    pr.add_argument("-g", "--generators", type=int, default=1)
    pr.add_argument("--granule", type=int, default=1024)
    pr.add_argument("--file", default=None)
    pr.add_argument("--connect", default=None, help="HOST:PORT to send to")
    pr.set_defaults(fn=cmd_produce)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
