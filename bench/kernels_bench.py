"""Per-operator roofline microbenchmarks.

Times each core kernel on device-resident data and reports achieved GB/s
against the chip's HBM-bandwidth roofline (BASELINE.md target: ≥70% per
operator).  Byte models count the mandatory HBM traffic of each op (reads of
live columns + writes of outputs); achieved = model_bytes / measured time.

Usage: python bench/kernels_bench.py [--rows 4194304] [--hbm-gbps 819]
(819 GB/s = TPU v5e HBM).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _first_leaf(out):
    import jax

    return jax.tree.leaves(out)[0]


def _time(fn, *args, iters=10):
    """Times fn including a host readback of one output element.

    block_until_ready alone is not trustworthy through the remote-device
    tunnel (it can resolve before execution completes, yielding >1.0 roofline
    fractions); materializing a scalar to host forces real completion.
    """
    import numpy as np

    np.asarray(_first_leaf(fn(*args)))
    # amortize the tunnel round-trip: queue `iters` executions (ordered on the
    # device stream), force completion once, divide.
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    np.asarray(_first_leaf(out)[:1])
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4 * 1024 * 1024)
    ap.add_argument("--span", type=int, default=256 * 1024)
    ap.add_argument("--hbm-gbps", type=float, default=819.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from flock_tpu.ops import kernels

    n, span = args.rows, args.span
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, span - 600, n).astype(np.int32))
    val = jnp.asarray(rng.integers(100, 10**8, n).astype(np.int32))
    ts = jnp.asarray(rng.integers(0, 10**9, n).astype(np.int32))
    valid = jnp.asarray(np.ones(n, bool))
    bkey = jnp.asarray(np.arange(span - 512, dtype=np.int32))
    bval = jnp.asarray(rng.integers(0, 100, span - 512).astype(np.int32))
    bvalid = jnp.asarray(np.ones(span - 512, bool))

    results = []

    def report(name, secs, model_bytes):
        gbps = model_bytes / secs / 1e9
        results.append({
            "kernel": name,
            "rows": n,
            "time_s": round(secs, 6),
            "model_GB": round(model_bytes / 1e9, 3),
            "achieved_GBps": round(gbps, 1),
            "roofline_frac": round(gbps / args.hbm_gbps, 3),
        })

    # filter: read key (4B), write mask (1B)
    f = jax.jit(lambda k, v: v & (k % 123 == 0))
    report("filter", _time(f, key, valid), n * 5)

    # project: read 2×4B, write 4B (f32 multiply)
    p = jax.jit(lambda v: jnp.float32(0.908) * v.astype(jnp.float32))
    report("project_mul", _time(p, val), n * 8)

    # dense group aggregate: read key+val (8B) + valid (1B); scatter add i32
    # count + max i32 + key/valid outputs (span ~ negligible)
    agg = jax.jit(lambda c, v: kernels.dense_group_aggregate(
        {"k": c["k"], "v": c["v"]}, v, "k",
        [(None, "count", "cnt"), ("v", "max", "mx")], span))
    report("dense_agg_count_max",
           _time(agg, {"k": key, "v": val}, valid), n * 9 + span * 12)

    # dense lookup join: build scatter (span idx writes) + probe: read key
    # (4B) + gather idx (4B) + gather 1 build col (4B) + write hit (1B)
    jn = jax.jit(lambda b, bv, p_, pv: kernels.lookup_join(
        b, bv, "k", p_, pv, "k", {"v": "bv"}, span_margin=512))
    report("dense_lookup_join",
           _time(jn, {"k": bkey, "v": bval}, bvalid, {"k": key}, valid),
           n * 13 + span * 8)

    # sort (2 keys + 1 payload): comparison sort, model = logn passes is not
    # HBM-roofline-able; report bytes as 3 cols r/w once for reference
    srt = jax.jit(lambda c, v: kernels.sort_rows(c, v, ["k", "v"]))
    report("sort_2key", _time(srt, {"k": key, "v": val, "t": ts}, valid),
           n * 24)

    # compact: read 3 cols + write 3 cols + cumsum
    cp = jax.jit(lambda c, v: kernels.compact(c, v, n))
    report("compact", _time(cp, {"k": key, "v": val, "t": ts}, valid),
           n * 26)

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
