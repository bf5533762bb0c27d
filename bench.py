"""Benchmark harness: NEXMark q4 (join + two-level agg) rows/s on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference repo publishes no result tables (BASELINE.md); the
only quantitative run it pins is the README q5 demo — a 128 MB Lambda source
function sustaining ~8,490 events/s (10k events in 1,177.85 ms billed).
``vs_baseline`` is engine rows/s-per-chip over that per-function events/s.

Usage: python bench.py [--seconds N] [--eps N] [--query N] [--all]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

def _set_bench_env(no_fallback: bool) -> None:
    # The runtime scatter fallback doubles compiled program size (slow remote
    # compiles).  The default q4 bench never escapes, so it strips the
    # fallback; --all keeps it (q3/q6/q8 contain ascending-key aggregations
    # that legitimately use the scatter path).  Must run before flock_tpu
    # imports.
    if no_fallback:
        os.environ.setdefault("FLOCK_TPU_NO_FALLBACK", "1")

REFERENCE_EVENTS_PER_SEC = 10_000 / 1.17785  # README q5 demo REPORT line


def _enable_compile_cache() -> None:
    """Persistent XLA compile cache: repeat runs (and retries after remote
    tunnel wedges) skip the 30-60s remote compiles.  No-op when the backend
    can't serialize executables or a cache dir is already configured."""
    import jax

    if jax.config.jax_compilation_cache_dir is None:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/flock_tpu_xla"))
        try:
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1.0)
        except Exception:  # noqa: BLE001 — older jax: default threshold
            pass


_EPOCH_CACHE: dict = {}


def _gen_epochs(seconds: int, eps: int):
    """Generate (or reuse) the deterministic event stream for one config —
    q0–q13 share identical inputs at equal (seconds, eps), so the 2-vCPU
    host's generation cost is paid once per config across an --all sweep."""
    from flock_tpu.runtime.stream import generate_epochs

    key = (seconds, eps)
    if key not in _EPOCH_CACHE:
        t0 = time.perf_counter()
        epochs = generate_epochs(seconds, eps)
        _EPOCH_CACHE[key] = (epochs, time.perf_counter() - t0)
    return _EPOCH_CACHE[key]


def bench_query(qnum: int, seconds: int, eps: int, repeats: int = 3):
    import jax

    from flock_tpu.queries.nexmark import get_query
    from flock_tpu.runtime.executor import LocalExecutor
    from flock_tpu.runtime.stream import StreamDriver

    spec = get_query(qnum)
    epochs, gen_dt = _gen_epochs(seconds, eps)

    driver = StreamDriver(spec, seconds)
    # build window tables once (host-side slicing excluded from device timing)
    ranges = driver._window_epoch_ranges()
    from flock_tpu.runtime.tables import concat_relations, default_side_input

    windows = []
    for tag, rng in ranges:
        tables = dict(concat_relations([epochs[t] for t in rng if t < seconds],
                                       spec.relations))
        if "side_input" in spec.relations:
            tables["side_input"] = default_side_input()
        windows.append(tables)

    executor = LocalExecutor(spec)
    caps = driver._fixed_caps([(None, t) for t in windows],
                              list(spec.relations))

    # stage all windows onto the device first (in production the stream is
    # generated/ingested device-side; the host→device feed is reported
    # separately as feed_time_s)
    t0 = time.perf_counter()
    staged = [executor.prepare_window(t, caps) for t in windows]
    staged = jax.block_until_ready(jax.device_put(staged))
    feed_dt = time.perf_counter() - t0

    # warm-up (compile); host readback forces real completion (the remote
    # tunnel's block_until_ready can return early)
    out = executor.execute_batches(staged[0])
    import numpy as _np
    _np.asarray(out.valid[:1])

    rows_in = sum(
        len(next(iter(t[r].values())))
        for t in windows for r in spec.relations if r in t and t[r])

    # Windows dispatch sequentially with one host readback at the end (the
    # device stream is ordered).  Through the remote tunnel each dispatch
    # costs ~tens of ms of control latency; windows are sized large (millions
    # of rows) so compute dominates.  The one-dispatch lax.map pipeline
    # (executor.execute_stacked) excludes control latency entirely but its
    # remote compile is prohibitively slow through the tunnel — on a local
    # TPU deployment prefer it.
    tiny = jax.jit(lambda x: x + 1)
    x0 = jax.device_put(_np.zeros(8, _np.int32))
    _np.asarray(tiny(x0)[:1])
    t0 = time.perf_counter()
    for _ in range(3):
        _np.asarray(tiny(x0)[:1])
    rtt = (time.perf_counter() - t0) / 3

    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        outs = [executor.execute_batches(b, check_overflow=False)
                for b in staged]
        _np.asarray(outs[-1].valid[:1])
        best = min(best, time.perf_counter() - t0)

    # feed-INCLUSIVE pipelined rate: host→device staging of window k+1 is
    # issued (async device_put) BEFORE window k executes, so transfer rides
    # under compute — the double-buffered production shape (SURVEY §7.2
    # step 5).  Wall ≈ max(feed, compute) when the transport overlaps; the
    # remote tunnel serializes transfers, so there this is an upper bound
    # on feed cost, reported next to the compute-only number.
    best_incl = float("inf")
    for _ in range(min(repeats, 3)):
        t0 = time.perf_counter()
        prev = None
        outs = []
        for t in windows:
            nxt = jax.device_put(executor.prepare_window(t, caps))
            if prev is not None:
                outs.append(executor.execute_batches(prev,
                                                     check_overflow=False))
            prev = nxt
        outs.append(executor.execute_batches(prev, check_overflow=False))
        _np.asarray(outs[-1].valid[:1])
        best_incl = min(best_incl, time.perf_counter() - t0)

    r = {
        "query": qnum,
        "rows_in": rows_in,
        "wall_time_s": best,
        "rtt_s": round(rtt, 4),
        "rows_per_s": rows_in / best,
        "feed_incl_wall_s": best_incl,
        "rows_per_s_feed_inclusive": rows_in / best_incl,
        "gen_time_s": gen_dt,
        "feed_time_s": feed_dt,
        "windows": len(windows),
    }
    if os.environ.get("FLOCK_TPU_STACKED") and len(staged) > 1:
        # ONE dispatch drives every window via lax.map — control latency is
        # paid once for the whole stream segment (the production pipeline
        # form; opt-in because the first remote compile is slow, amortized
        # by the persistent compile cache)
        try:
            sout, _ = executor.execute_stacked(staged, check_overflow=False)
            _np.asarray(sout.valid[:1, :1])
            bs = float("inf")
            for _ in range(repeats):
                t0 = time.perf_counter()
                sout, _ = executor.execute_stacked(staged,
                                                   check_overflow=False)
                _np.asarray(sout.valid[:1, :1])
                bs = min(bs, time.perf_counter() - t0)
            r["stacked_wall_time_s"] = bs
            r["rows_per_s_stacked"] = rows_in / bs
        except Exception as e:  # noqa: BLE001
            r["stacked_error"] = str(e)[:120]
    return r


def bench_stream_query(qnum: int, seconds: int, eps: int, repeats: int = 3):
    """q11/q12 (session/processing-time): the windows are data-dependent, so
    the honest number is the FULL streaming driver — host sessionization +
    device execution — not a pre-sliced window loop.  Epoch staging follows
    the same convention as bench_query: prestaged to HBM OUTSIDE the timed
    loop and reported separately as feed_time_s (production drivers stage
    each epoch as it arrives, so staging is the stream transport's cost)."""
    from flock_tpu.queries.nexmark import get_query
    from flock_tpu.runtime.stream import StreamDriver

    import jax

    spec = get_query(qnum)
    epochs, gen_dt = _gen_epochs(seconds, eps)
    rows_in = sum(len(next(iter(e["bid"].values()))) for e in epochs)

    driver = StreamDriver(spec, seconds)
    # stage epochs in HBM once, outside the timed loop (the same feed
    # convention as bench_query; production drivers stage epochs as they
    # arrive and the staging cost is the stream transport's)
    t0 = time.perf_counter()
    staged = jax.block_until_ready(driver.prestage(epochs))
    feed_dt = time.perf_counter() - t0
    driver.run(epochs, prestaged=staged)  # warm (compile)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        results = driver.run(epochs, prestaged=staged)
        best = min(best, time.perf_counter() - t0)
    # feed-inclusive: the driver stages each epoch as it arrives (async
    # device_put inside the run loop) — transfer overlaps the host
    # sessionization + device execution of earlier epochs
    best_incl = float("inf")
    for _ in range(min(repeats, 2)):
        t0 = time.perf_counter()
        driver.run(epochs)
        best_incl = min(best_incl, time.perf_counter() - t0)
    return {
        "query": qnum, "rows_in": rows_in, "wall_time_s": best,
        "rows_per_s": rows_in / best,
        "feed_incl_wall_s": best_incl,
        "rows_per_s_feed_inclusive": rows_in / best_incl,
        "gen_time_s": gen_dt,
        "feed_time_s": feed_dt, "windows": len(results),
        "mode": "streaming_driver",
    }


def bench_ysb(seconds: int, eps: int, repeats: int = 3):
    """YSB full pipeline (filter → campaign join → tumbling count).

    The campaign table is a named relation (the reference ships it as the 2nd
    relation of every payload, ysb.rs:55-328), so windows are built directly
    (run_ysb's slicing) and staged like bench_query."""
    import numpy as _np
    import jax

    from flock_tpu.batch import round_up
    from flock_tpu.datagen.ysb import YsbConfig
    from flock_tpu.queries.ysb import (campaign_table, generate_ysb_epochs,
                                       ysb_query)
    from flock_tpu.runtime.executor import LocalExecutor

    cfg = YsbConfig(seconds=seconds, events_per_second=eps)
    gen_t0 = time.perf_counter()
    epochs = generate_ysb_epochs(cfg)
    gen_dt = time.perf_counter() - gen_t0
    spec = ysb_query()
    camp = campaign_table(cfg)
    executor = LocalExecutor(spec)
    w = spec.window[1]
    caps = {"ad_event": max(round_up(w * eps + 64), 128),
            "campaign": max(round_up(cfg.num_ads), 128)}
    windows = []
    for k in range(max(seconds // w, 1)):
        chunk = epochs[k * w:(k + 1) * w]
        cols = {key: _np.concatenate([c["ad_event"][key] for c in chunk])
                for key in chunk[0]["ad_event"]}
        windows.append({"ad_event": cols, "campaign": camp})
    rows_in = sum(len(next(iter(t["ad_event"].values()))) for t in windows)

    t0 = time.perf_counter()
    staged = [executor.prepare_window(t, caps) for t in windows]
    staged = jax.block_until_ready(jax.device_put(staged))
    feed_dt = time.perf_counter() - t0

    # warm (compile) + validate capacities on EVERY window once — a
    # later-window overflow must fail loudly, not corrupt the timed repeats
    for b in staged:
        out = executor.execute_batches(b, check_overflow=True)
    _np.asarray(out.valid[:1])
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        outs = [executor.execute_batches(b, check_overflow=False)
                for b in staged]
        _np.asarray(outs[-1].valid[:1])
        best = min(best, time.perf_counter() - t0)
    # feed-inclusive double-buffered pipeline (same shape as bench_query)
    best_incl = float("inf")
    for _ in range(min(repeats, 3)):
        t0 = time.perf_counter()
        prev = None
        outs = []
        for t in windows:
            nxt = jax.device_put(executor.prepare_window(t, caps))
            if prev is not None:
                outs.append(executor.execute_batches(prev,
                                                     check_overflow=False))
            prev = nxt
        outs.append(executor.execute_batches(prev, check_overflow=False))
        _np.asarray(outs[-1].valid[:1])
        best_incl = min(best_incl, time.perf_counter() - t0)
    return {
        "query": "ysb", "rows_in": rows_in, "wall_time_s": best,
        "rows_per_s": rows_in / best,
        "feed_incl_wall_s": best_incl,
        "rows_per_s_feed_inclusive": rows_in / best_incl,
        "gen_time_s": gen_dt,
        "feed_time_s": feed_dt, "windows": len(windows),
    }


def _run_one(which: str, args):
    """One --all entry (query sizing rules included) → its result record."""
    if which == "ysb":
        secs = max(args.seconds, 10)
        if secs != args.seconds:
            print(f"ysb: seconds raised to {secs} (tumbling window)",
                  file=sys.stderr)
        r = bench_ysb(secs, args.eps, repeats=args.repeats)
        r["seconds"], r["eps"] = secs, args.eps
        return r
    q = int(which)
    secs = max(args.seconds, 10) if q in (5, 7, 8) else args.seconds
    eps = args.eps
    if q == 3:
        eps = max(eps, 4 * args.eps)
    if q == 8:
        eps = max(eps, 5_000_000)
    if q in (11, 12):
        r = bench_stream_query(q, secs, eps, repeats=args.repeats)
    else:
        r = bench_query(q, secs, eps, repeats=args.repeats)
    r["seconds"], r["eps"] = secs, eps
    return r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=int, default=4)
    ap.add_argument("--eps", type=int, default=4_000_000)
    ap.add_argument("--query", type=int, default=4)
    ap.add_argument("--repeats", type=int, default=7,
                    help="timing repeats; min is reported (the 2-vCPU host "
                    "contends with the tunnel — more repeats filter it)")
    ap.add_argument("--all", action="store_true",
                    help="run q0..q13 + YSB and WRITE the per-query artifact")
    ap.add_argument("--only", default=None,
                    help="run ONE --all entry ('0'..'13' or 'ysb') and print "
                    "its record to stdout (bench/sweep.py isolates queries "
                    "in subprocesses so a wedged device tunnel can't hang "
                    "the whole sweep)")
    ap.add_argument("--out", default="BENCH_QUERIES.json",
                    help="artifact path for --all (written by the harness "
                    "itself so the recorded table cannot drift from the run)")
    args = ap.parse_args()
    _set_bench_env(no_fallback=not (args.all or args.only is not None))
    _enable_compile_cache()

    if args.only is not None:
        r = _run_one(args.only, args)
        import jax

        r["device"] = str(jax.devices()[0])
        print(json.dumps(r), flush=True)
        return

    if args.all:
        results = []

        def record(r):
            results.append(r)
            print(json.dumps(r), file=sys.stderr)

        # sizing notes: windowed queries (q5/q7/q8) need ≥10s; q3
        # (persons+auctions = 8% of events) and q8 (one tumbling window)
        # need larger driving inputs so compute, not dispatch round-trips,
        # dominates the measurement — see _run_one
        for which in [str(q) for q in range(14)] + ["ysb"]:
            try:
                record(_run_one(which, args))
            except Exception as e:  # noqa: BLE001
                record({"query": which, "error": str(e)[:200]})

        import jax

        doc = {
            "hardware": str(jax.devices()[0]),
            "config": {
                "seconds": args.seconds, "events_per_second": args.eps,
                "repeats": args.repeats,
                "note": ("windowed queries (q5/q7/q8, ysb) run at >=10s; "
                         "q3 at 4x eps and q8 at >=5M eps so compute "
                         "dominates dispatch RTT; q11/q12 use the full "
                         "streaming driver (host sessionization inside the "
                         "timed loop; epochs prestaged to HBM outside it, "
                         "reported as feed_time_s — same convention as "
                         "bench_query)"),
            },
            "results": results,
        }
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=1)
            f.write("\n")

    r = bench_query(args.query, args.seconds, args.eps, repeats=args.repeats)
    print(json.dumps(r), file=sys.stderr)
    best = max(r["rows_per_s"], r.get("rows_per_s_stacked", 0))
    print(json.dumps({
        "metric": f"nexmark_q{args.query}_rows_per_s_per_chip",
        "value": round(best, 1),
        "unit": "rows/s",
        "vs_baseline": round(best / REFERENCE_EVENTS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
