"""Wedge-tolerant full-suite bench: one subprocess per query.

The remote device tunnel occasionally wedges for many minutes; a single
in-process sweep then hangs on whichever query hit the wedge.  This wrapper
runs each --all entry (q0..q13 + ysb) as ``python bench.py --only <q>`` with
its own timeout, retries failures once (a later attempt usually lands after
the tunnel recovers), and writes the same BENCH_QUERIES.json artifact the
in-process --all path does.

Usage: python bench/sweep.py [--seconds 4] [--eps 4000000] [--repeats 3]
       [--timeout 900] [--out BENCH_QUERIES.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(which: str, args) -> dict:
    cmd = [sys.executable, os.path.join(ROOT, "bench.py"),
           "--only", which, "--seconds", str(args.seconds),
           "--eps", str(args.eps), "--repeats", str(args.repeats)]
    t0 = time.time()
    try:
        p = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=args.timeout, cwd=ROOT)
    except subprocess.TimeoutExpired:
        return {"query": which, "error": f"timeout after {args.timeout}s "
                "(device tunnel wedge?)"}
    sys.stderr.write(p.stderr)
    for line in reversed(p.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            rec = json.loads(line)
            rec["bench_wall_s"] = round(time.time() - t0, 1)
            return rec
    return {"query": which, "error":
            f"exit={p.returncode}: {p.stdout[-200:]!r}"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=int, default=4)
    ap.add_argument("--eps", type=int, default=4_000_000)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--timeout", type=int, default=900,
                    help="per-query subprocess timeout (seconds)")
    ap.add_argument("--out", default=os.path.join(ROOT, "BENCH_QUERIES.json"))
    ap.add_argument("--retries", type=int, default=1)
    ap.add_argument("--entries", nargs="*", default=None,
                    help="re-run only these entries, merging the rest from "
                    "the existing artifact (still harness-written)")
    args = ap.parse_args()

    entries = [str(q) for q in range(14)] + ["ysb"]
    results: dict[str, dict] = {}
    if args.entries:
        if os.path.exists(args.out):
            with open(args.out) as f:
                for rec in json.load(f).get("results", []):
                    results[str(rec.get("query"))] = rec
        for w in args.entries:
            results.pop(w, None)
    for attempt in range(args.retries + 1):
        todo = [w for w in entries if "error" in results.get(w, {"error": 1})]
        if not todo:
            break
        if attempt:
            print(f"retry pass {attempt}: {todo}", file=sys.stderr)
        for which in todo:
            rec = run_one(which, args)
            results[which] = rec
            print(json.dumps(rec), file=sys.stderr, flush=True)

    devices = {r.get("device") for r in results.values() if r.get("device")}
    doc = {
        "hardware": (sorted(devices)[0] if devices
                     else "TPU (per-query subprocesses)"),
        "config": {
            "seconds": args.seconds, "events_per_second": args.eps,
            "repeats": args.repeats,
            "note": ("windowed queries (q5/q7/q8, ysb) run at >=10s; q3 at "
                     "4x eps and q8 at >=5M eps so compute dominates "
                     "dispatch RTT; q11/q12 use the full streaming driver "
                     "(host sessionization inside the timed loop, epoch "
                     "staging reported as feed_time_s); each query ran in "
                     "its own process (bench/sweep.py)"),
        },
        "results": [results[w] for w in entries],
    }
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    bad = [w for w in entries if "error" in results[w]]
    print(f"wrote {args.out}; {len(entries) - len(bad)}/{len(entries)} ok"
          + (f"; failed: {bad}" if bad else ""))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
