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


_RTT = None


def _measure_rtt():
    """One-dispatch round-trip latency through the device control path (the
    remote tunnel costs ~tens of ms per dispatch; subtracted from timings)."""
    global _RTT
    if _RTT is not None:
        return _RTT
    import jax
    import jax.numpy as jnp

    tiny = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8,), jnp.int32)
    np.asarray(tiny(x)[:1])
    t0 = time.perf_counter()
    for _ in range(5):
        np.asarray(tiny(x)[:1])
    _RTT = (time.perf_counter() - t0) / 5
    return _RTT


def _time(fn, *args, iters=16):
    """Device time per application, measured as ONE dispatch running the
    kernel ``iters`` times inside lax.fori_loop with a data dependency
    (per-dispatch wall timing is round-trip-latency-bound through the remote
    tunnel, and its async completion lies to block_until_ready).

    The loop carry depends on EVERY output leaf — depending on just one lets
    XLA dead-code-eliminate the rest of the kernel (a grouped aggregation
    whose first dict leaf is the cheap ``__key`` arange measured as 0s).
    Kernels faster than the tunnel round-trip re-measure with enough
    iterations that device time dominates."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    # inputs are jit ARGUMENTS, never closure captures: a captured device
    # array lowers as an HLO constant, forcing a device→host readback of the
    # whole buffer at trace time (which crawls/hangs through the tunnel)
    flat, treedef = jax.tree.flatten(args)

    def chained(*leaves):
        args2 = jax.tree.unflatten(treedef, leaves)

        def body(i, carry):
            out = fn(*_perturb(args2, carry))
            dep = jnp.int32(0)
            for leaf in jax.tree.leaves(out):
                dep = dep + leaf.reshape(-1)[0].astype(jnp.int32)
            return carry + dep

        return lax.fori_loop(0, iters, body, jnp.int32(0))

    cf = jax.jit(chained)
    np.asarray(cf(*flat))       # compile + warm
    rtt = _measure_rtt()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(cf(*flat))
        best = min(best, time.perf_counter() - t0)
    if best - rtt >= rtt:
        return (best - rtt) / iters, False
    # RTT-bound: the kernel is faster than the tunnel round-trip at this
    # iteration count.  Re-measure with iters scaled so device time ≥ 4×RTT
    # (round-3 artifacts reported such cases as upper bounds; the rescale
    # makes them honest measurements instead)
    need = max(iters * 2, int(iters * 6 * rtt / max(best, 1e-9)))
    need = min(need, 8192)

    def chained_n(*leaves):
        args2 = jax.tree.unflatten(treedef, leaves)

        def body(i, carry):
            out = fn(*_perturb(args2, carry))
            dep = jnp.int32(0)
            for leaf in jax.tree.leaves(out):
                dep = dep + leaf.reshape(-1)[0].astype(jnp.int32)
            return carry + dep

        return lax.fori_loop(0, need, body, jnp.int32(0))

    cfn = jax.jit(chained_n)
    np.asarray(cfn(*flat))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(cfn(*flat))
        best = min(best, time.perf_counter() - t0)
    if best - rtt < rtt:
        # still RTT-bound even at the iteration cap: the value is an UPPER
        # bound on device time, and the record says so explicitly (a silent
        # upper bound is indistinguishable from an honest measurement in the
        # committed artifact — round-4 verdict item)
        return best / need, True
    return (best - rtt) / need, False


def _perturb(args, carry):
    """Thread the loop carry into the first argument through an
    optimization barrier: runtime values are UNCHANGED (the kernel measures
    its real data distribution — key locality intact), but the barrier's
    operand depends on the carry, so XLA can neither hoist the body out of
    the loop nor CSE iterations.  The previous ``x ^ (carry & 1)`` trick was
    escapable: the compiler can precompute both variants once and select,
    which measured as physically impossible >1 roofline fractions
    (project_mul at "8,506 GB/s" on an 819 GB/s chip — round-4 verdict)."""
    import jax

    first, *rest = args
    leaves, td = jax.tree.flatten(first)
    barred = []
    for x in leaves:
        x2, _ = jax.lax.optimization_barrier((x, carry))
        barred.append(x2)
    return (jax.tree.unflatten(td, barred), *rest)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4 * 1024 * 1024)
    ap.add_argument("--span", type=int, default=256 * 1024)
    ap.add_argument("--hbm-gbps", type=float, default=819.0)
    ap.add_argument("--out", type=str, default=None,
                    help="also write the result records to this JSON file")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from flock_tpu.ops import kernels

    n, span = args.rows, args.span
    rng = np.random.default_rng(0)
    # keys advance like the generated stream (auction frontier + hot-key
    # lookback ≤ ~120 ids): exercises the blocked fast path, not the escape
    # fallback (random keys would measure the scatter safety net instead)
    frontier = (np.arange(n, dtype=np.int64) * (span - 4096) // n).astype(np.int32)
    key = jnp.asarray((frontier + rng.integers(-120, 10, n)).clip(0).astype(np.int32))
    val = jnp.asarray(rng.integers(100, 10**8, n).astype(np.int32))
    ts = jnp.asarray(rng.integers(0, 10**9, n).astype(np.int32))
    valid = jnp.asarray(np.ones(n, bool))
    bkey = jnp.asarray(np.arange(span - 512, dtype=np.int32))
    bval = jnp.asarray(rng.integers(0, 100, span - 512).astype(np.int32))
    bvalid = jnp.asarray(np.ones(span - 512, bool))

    results = []

    def report(name, timed, model_bytes, ops=None, rows=None):
        """model_bytes = MANDATORY HBM traffic (inputs once + outputs once);
        roofline_frac = achieved/HBM-peak on that model.  ``ops`` (when
        given) is the kernel's arithmetic volume — the blocked one-hot
        kernels deliberately spend n·s_loc VPU/MXU ops to avoid scatter, so
        they are COMPUTE-bound and their HBM fraction is the wrong lens;
        achieved_Tops is the right one (see BENCH_NOTES).  ``timed`` is
        (seconds, rtt_bound): an RTT-bound entry is an upper bound on device
        time and is marked as such in the record."""
        secs, rtt_bound = timed
        gbps = model_bytes / secs / 1e9
        rec = {
            "kernel": name,
            "rows": rows or n,
            "time_s": round(secs, 6),
            "model_GB": round(model_bytes / 1e9, 3),
            "achieved_GBps": round(gbps, 1),
            "roofline_frac": round(gbps / args.hbm_gbps, 3),
        }
        if rtt_bound:
            rec["rtt_bound"] = True
        if ops is not None:
            rec["op_count"] = ops
            rec["achieved_Tops"] = round(ops / secs / 1e12, 2)
        results.append(rec)
        print(json.dumps(rec), flush=True)

    # HBM-lens elementwise ops (filter/project).  Measuring these honestly
    # needs THREE properties the generic _time harness cannot give an
    # elementwise op (each was a round of fictitious >1.0 fractions):
    #   1. a working set larger than VMEM, so iterations stream HBM
    #      (at 4M rows the 16-21 MB set stayed resident → "8,506 GB/s");
    #   2. a loop carry that IS the full output array — an elementwise op
    #      whose output is consumed only through a scalar gets sliced to one
    #      lane by dead-code elimination (a 256 MB "copy" loop measured 0 ms
    #      per iteration);
    #   3. a full-array reduction folded into the carry, so no lane is dead
    #      backward through the loop (the reduction fuses with the write
    #      pass — no extra HBM traffic).
    n_big = max(args.rows, 128 * 1024 * 1024)
    key_big = jnp.asarray(rng.integers(0, 2**30, n_big).astype(np.int32))
    from jax import lax as _lax

    def _stream_time(step, state0, iters=96):
        def chained(k, s0):
            def body(i, carry):
                s, acc = carry
                k2, _ = _lax.optimization_barrier((k, acc))
                s2, a2 = step(k2, s)
                return s2, acc + a2
            return _lax.fori_loop(0, iters, body,
                                  (s0, jnp.zeros((), jnp.float32)))[1]
        cf = jax.jit(chained)
        np.asarray(cf(key_big, state0))
        rtt = _measure_rtt()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(cf(key_big, state0))
            best = min(best, time.perf_counter() - t0)
        return max(best - rtt, 1e-9) / iters, best - rtt < rtt

    # filter: read key (4B) + mask state (1B), write mask (1B); the carried
    # mask is the filter's output column
    def f_step(k, s):
        s2 = s & (k % 123 == 0)
        return s2, jnp.sum(s2, dtype=jnp.float32)

    report("filter", _stream_time(f_step, jnp.ones((n_big,), bool)),
           n_big * 6, rows=n_big)

    # project: read f32 (4B), write f32 (4B) — the money-column multiply
    def p_step(_k, s):
        s2 = jnp.float32(0.998) * s
        return s2, jnp.sum(s2)  # full-array reduction: no dead lanes

    report("project_mul",
           _stream_time(p_step, jnp.ones((n_big,), jnp.float32)),
           n_big * 8, rows=n_big)
    del key_big

    # dense group aggregate: read key+val (8B) + valid (1B); scatter add i32
    # count + max i32 + key/valid outputs (span ~ negligible)
    agg = jax.jit(lambda c, v: kernels.dense_group_aggregate(
        {"k": c["k"], "v": c["v"]}, v, "k",
        [(None, "count", "cnt"), ("v", "max", "mx")], span))
    report("dense_agg_count_max",
           _time(agg, {"k": key, "v": val}, valid), n * 9 + span * 12,
           ops=n * 1024 * 3)

    # dense lookup join: build scatter (span idx writes) + probe: read key
    # (4B) + gather idx (4B) + gather 1 build col (4B) + write hit (1B)
    jn = jax.jit(lambda b, bv, p_, pv: kernels.lookup_join(
        b, bv, "k", p_, pv, "k", {"v": "bv"}, span_margin=512))
    report("dense_lookup_join",
           _time(jn, {"k": bkey, "v": bval}, bvalid, {"k": key}, valid),
           n * 13 + span * 8)

    # pallas blocked agg (VMEM-resident span accumulator) vs the XLA version
    try:
        from flock_tpu.pallas.agg import pallas_count_max_agg
        m = jnp.int32(0)
        pk = jax.jit(lambda k, v, vals: pallas_count_max_agg(
            k, v, vals, jnp.int32(0), span))
        report("pallas_agg_count_max",
               _time(pk, key, valid, val), n * 9 + span * 12,
               ops=n * 2048 * 3)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"kernel": "pallas_agg_count_max", "error": str(e)[:120]}))

    # the XLA blocked scan at the same shapes (what pallas replaces)
    from flock_tpu.ops import blocked
    xb = jax.jit(lambda c, v: blocked.blocked_local_agg(
        c["k"], v, {"v": c["v"]}, [(None, "count", "cnt"), ("v", "max", "mx")],
        span, block=4096, s_loc=1024))
    report("xla_blocked_agg_count_max",
           _time(xb, {"k": key, "v": val}, valid), n * 9 + span * 12,
           ops=n * 1024 * 3)

    # XLA blocked agg with the SAME rich agg set (sum+count+max) — the
    # dispatch-policy comparison point for pallas_agg_sum_count_max
    xbs = jax.jit(lambda c, v: blocked.blocked_local_agg(
        c["k"], v, {"v": c["v"]},
        [("v", "sum", "s"), (None, "count", "cnt"), ("v", "max", "mx")],
        span, block=4096, s_loc=1024))
    report("xla_blocked_agg_sum_count_max",
           _time(xbs, {"k": key, "v": val}, valid), n * 9 + span * 20,
           ops=n * 1024 * 7)

    # general pallas agg incl. exact limb SUM (the production dense_agg path)
    try:
        from flock_tpu.pallas.agg import pallas_local_agg
        pg = jax.jit(lambda c, v: pallas_local_agg(
            c["k"], v, {"v": c["v"]},
            [("v", "sum", "s"), (None, "count", "cnt"), ("v", "max", "mx")],
            span, s_loc=1024))
        # read key+val+valid, write i64 sum + i32 cnt + i32 max spans
        report("pallas_agg_sum_count_max",
               _time(pg, {"k": key, "v": val}, valid), n * 9 + span * 20,
               ops=n * 2048 * 7)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"kernel": "pallas_agg_sum_count_max",
                          "error": str(e)[:120]}))

    # FACTORED hi⊗lo pallas kernels (pallas/factored.py, round 4): count/sum
    # collapse to MXU matmuls of two small one-hots; min/max keep a tight-
    # window masked reduce.  ops model: build n·(128+nhi) + matmul n·R·W_a
    # (counted as MXU MACs) + minmax 3·n·W_t when present
    try:
        from flock_tpu.pallas import factored as fct
        fc = jax.jit(lambda c, v: fct.pallas_factored_agg(
            c["k"], v, {"v": c["v"]},
            [(None, "count", "cnt"), ("v", "sum", "s")], span,
            block=8192, s_loc=1024))
        report("factored_agg_count_sum",
               _time(fc, {"k": key, "v": val}, valid, iters=64),
               n * 9 + span * 16, ops=n * (128 + 24 * 5) + n * 5 * 3072)
        fcm = jax.jit(lambda c, v: fct.pallas_factored_agg(
            c["k"], v, {"v": c["v"]},
            [(None, "count", "cnt"), ("v", "max", "mx")], span,
            block=8192, s_loc=1024))
        report("factored_agg_count_max",
               _time(fcm, {"k": key, "v": val}, valid, iters=32),
               n * 9 + span * 12, ops=n * 2048 * 3)
        # block 4096: the gather's [B, planes·128] f32 matmul output must
        # fit VMEM (8192 blocks exceed it)
        fg = jax.jit(lambda b, bp, p_, pv: fct.pallas_factored_gather(
            b, bp, jnp.int32(0), p_["k"], pv, ["v"], block=4096, s_loc=512))
        report("factored_gather_1col",
               _time(fg, {"v": bval}, jnp.asarray(np.ones(span, bool)),
                     {"k": key}, valid, iters=32),
               n * 13 + span * 8)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"kernel": "factored_agg", "error": str(e)[:120]}))

    # fused join+aggregate (q4/q9 core): pallas vs XLA at identical shapes.
    # bytes: probe key+price+ts (12B) + valid (1B) once; span-side slots
    # negligible next to n
    slot_ts = jnp.asarray(rng.integers(0, 10**6, span).astype(np.int32))
    slot_exp = slot_ts + jnp.int32(10**6)
    present = jnp.asarray(np.ones(span, bool))
    fused_aggs = [("v", "max", "final"), ("v", "sum", "total")]

    def fused_replay(bc, pair):
        return bc, pair & (bc["t"] >= bc["ats"]) & (bc["t"] <= bc["exp"])

    slots = {"ats": slot_ts, "exp": slot_exp}
    try:
        from flock_tpu.pallas import join_agg
        pf = jax.jit(lambda pc, pv: join_agg.fused_join_aggregate(
            slots, present, jnp.int32(0), pc, pv, "k", fused_replay,
            fused_aggs))
        report("pallas_fused_join_agg",
               _time(pf, {"k": key, "v": val, "t": ts}, valid),
               n * 13 + span * 24, ops=n * 2048 * 9)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"kernel": "pallas_fused_join_agg",
                          "error": str(e)[:120]}))
    xf = jax.jit(lambda pc, pv: blocked.blocked_join_aggregate(
        slots, present, jnp.int32(0), pc, pv, "k", fused_replay,
        fused_aggs, span, block=4096, s_loc=1024))
    report("xla_fused_join_agg",
           _time(xf, {"k": key, "v": val, "t": ts}, valid),
           n * 13 + span * 24, ops=n * 1024 * 9)

    # sort (2 keys + 1 payload): comparison sort, model = logn passes is not
    # HBM-roofline-able; report bytes as 3 cols r/w once for reference
    srt = jax.jit(lambda c, v: kernels.sort_rows(c, v, ["k", "v"]))
    report("sort_2key", _time(srt, {"k": key, "v": val, "t": ts}, valid),
           n * 24)

    # compact: read 3 cols + write 3 cols + cumsum
    cp = jax.jit(lambda c, v: kernels.compact(c, v, n))
    report("compact", _time(cp, {"k": key, "v": val, "t": ts}, valid),
           n * 26)

    # rank: ROW_NUMBER per group = 2-key sort + segmented cummax; bytes as
    # 3 cols + valid read, 3 cols + rank + valid written (sort passes make
    # this a lower bound, same caveat as sort_2key)
    rk = jax.jit(lambda c, v: kernels.rank_in_group(c, v, "k", "v", True,
                                                    "rank"))
    report("rank_in_group", _time(rk, {"k": key, "v": val, "t": ts}, valid),
           n * 30)

    # memory-bound grouped aggregation over key-SORTED rows (the q3/q6/q8
    # post-Rank path, kernels.sorted_segment_aggregate): segmented scans —
    # no one-hot compute, HBM-roofline-able.  bytes: read k+v+valid (9B),
    # write key(4)+sum i64(8)+cnt i32(4)+valid(1).  Measured at <=1M rows
    # and LAST: the associative_scan's log-n slicing makes its remote AOT
    # compile minutes-long at 4M rows (production windows are <=1M and the
    # persistent cache amortizes)
    ns = min(n, 1 << 20)
    skey = jnp.sort(key[:ns])
    try:
        sg = jax.jit(lambda c, v: kernels.sorted_segment_aggregate(
            c, v, "k", [("v", "sum", "s"), (None, "count", "cnt")]))
        secs = _time(sg, {"k": skey, "v": val[:ns]}, valid[:ns])
        saved = n
        n = ns
        report("sorted_segment_agg_sum_count", secs, ns * 26)
        n = saved
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"kernel": "sorted_segment_agg_sum_count",
                          "error": str(e)[:120]}))

    if args.out:
        import jax as _jax

        doc = {
            "device": str(_jax.devices()[0]),
            "rows": n,
            "span": span,
            "hbm_gbps_roofline": args.hbm_gbps,
            "rtt_s": round(_measure_rtt(), 4),
            "kernels": results,
        }
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main()
