"""Pallas TPU kernel: fused lookup-join + filter + grouped aggregation.

The production XLA formulation (ops/blocked.blocked_join_aggregate) scans
4096-row blocks whose [block, s_loc] pair-mask temporaries exceed VMEM — XLA
streams them through HBM, and every block step round-trips the span
accumulators via dynamic_slice/dynamic_update_slice.  This kernel keeps

* the WHOLE span accumulator set in VMEM scratch across the sequential grid
  (accumulator traffic never touches HBM), and
* per-block temporaries at [1024, s_loc] so the pair mask, the replayed
  filter columns, and the one-hot all stay resident;

HBM traffic reduces to one streaming read of the probe columns + one final
accumulator writeback — the speed-of-light for this op.

Same contract as the XLA version: ``replay`` re-executes the plan nodes
between Join and Aggregate on a broadcast column dict (probe cols [B, 1],
build slot-window cols [1, s_loc]) — arbitrary jnp filter/project lambdas
trace into the kernel unchanged.  Escapes (in-span keys outside their block's
window) raise a flag; callers fall back.  int32 columns;
count/min/max/sum/count_sum aggregations — integer sums accumulate as four
8-bit-limb int32 VMEM accumulators (block partials ride MXU f32 dots,
≤ block·255 < 2²⁴ exact) combined to int64 after the kernel.  Aggregations
whose accumulator itself must be int64 (q6's packed order key) stay on the
XLA fused path.

Reference counterpart: the DataFusion HashJoin+HashAggregate pipeline Flock
executes per stage (flock/src/runtime/context.rs:172-216); here the join
never materializes and the aggregation rides the join's pair masks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32_MAX = np.int32(2**31 - 1)
I32_MIN = np.int32(-(2**31))

_SENTINEL = {"min": I32_MAX, "max": I32_MIN}


def _acc_width(fn: str) -> int:
    """Span accumulators per agg: integer sums hold four 8-bit-limb int32
    accumulators (combined to int64/int32 outside the kernel); everything
    else holds one."""
    return 4 if fn in ("sum", "count_sum") else 1


def _kernel(m_ref, *refs, probe_names, slot_names, replay, aggs,
            block, s_loc, span):
    np_, ns = len(probe_names), len(slot_names)
    widths = [_acc_width(fn) for _, fn, _ in aggs]
    nacc = sum(widths)
    probe_refs = dict(zip(probe_names, refs[:np_]))
    valid_ref = refs[np_]
    slot_refs = dict(zip(slot_names, refs[np_ + 1:np_ + 1 + ns]))
    present_ref = refs[np_ + 1 + ns]
    out_refs = refs[np_ + 2 + ns:np_ + 2 + ns + nacc]
    cnt_out, esc_out = refs[np_ + 2 + ns + nacc:np_ + 4 + ns + nacc]
    accs = refs[np_ + 4 + ns + nacc:np_ + 4 + ns + 2 * nacc]
    acc_cnt, esc_acc = refs[np_ + 4 + ns + 2 * nacc:]

    i = pl.program_id(0)
    n_i = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        off = 0
        for (_, fn, _o), w in zip(aggs, widths):
            for j in range(w):
                accs[off + j][:] = jnp.full(
                    (span,), _SENTINEL.get(fn, 0), jnp.int32)
            off += w
        acc_cnt[:] = jnp.zeros((span,), jnp.int32)
        esc_acc[0] = jnp.int32(0)

    keys = probe_refs[probe_names[0]][:]  # probe key is passed first
    valid = valid_ref[:] != 0
    rel_all = keys - m_ref[0]
    candidate = valid & (rel_all >= 0) & (rel_all < span)
    # Mosaic can only prove alignment of dynamic 1D VMEM loads when the index
    # is a multiple of the loaded vector length: align the window base DOWN
    # to s_loc and cover a 2·s_loc window as two s_loc-aligned halves.  A
    # block whose in-span keys span ≤ s_loc+1 slots always fits.
    base = jnp.min(jnp.where(candidate, rel_all, I32_MAX))
    base = jnp.clip(base, 0, max(span - 2 * s_loc, 0))
    base = pl.multiple_of((base // s_loc) * s_loc, s_loc)
    base2 = pl.multiple_of(base + s_loc, s_loc)
    w2 = 2 * s_loc

    rel = rel_all - base
    ok = candidate & (rel >= 0) & (rel < w2)

    # jnp.any lowers via a float proxy whose weak literals go f64
    # under x64 → Mosaic scalar error; int32 reduce_max is native
    @pl.when(jnp.max(jnp.where(candidate & ~ok, 1, 0)) > 0)
    def _():
        esc_acc[0] = jnp.int32(1)

    rel_c = jnp.where(ok, rel, w2)
    iota = jax.lax.broadcasted_iota(jnp.int32, (block, w2), 1)
    onehot = rel_c[:, None] == iota

    def window(ref):
        return jnp.concatenate([ref[pl.ds(base, s_loc)],
                                ref[pl.ds(base2, s_loc)]])

    pair = onehot & (window(present_ref) != 0)[None, :]

    bcast = {k: r[:][:, None] for k, r in probe_refs.items()}
    for k, r in slot_refs.items():
        bcast[k] = window(r)[None, :]
    bcast, pair = replay(bcast, pair)

    pair_f = pair.astype(jnp.float32)
    cnt_w = jnp.sum(pair.astype(jnp.int32), axis=0)

    def acc_update(acc, upd, merge):
        acc[pl.ds(base, s_loc)] = merge(acc[pl.ds(base, s_loc)], upd[:s_loc])
        acc[pl.ds(base2, s_loc)] = merge(acc[pl.ds(base2, s_loc)],
                                         upd[s_loc:])

    acc_update(acc_cnt, cnt_w, jnp.add)
    off = 0
    for (in_col, fn, _out), w in zip(aggs, widths):
        if fn == "count":
            acc_update(accs[off], cnt_w, jnp.add)
        elif fn in ("sum", "count_sum"):
            # exact integer sum: per-limb f32 partials (≤ block·255 < 2²⁴)
            # accumulated into int32 limb accumulators
            src = bcast[in_col]
            if src.shape == (block, 1):
                # probe-side column: one (4, block) × (block, w2) MXU matmul
                # contracts all four limbs against the pair mask (Mosaic
                # needs 2-D operands — a 1-D lhs does not lower)
                limbs = jnp.stack(
                    [((src[:, 0] >> (8 * j)) & 0xFF).astype(jnp.float32)
                     for j in range(4)])
                parts = jnp.dot(limbs, pair_f,
                                preferred_element_type=jnp.float32)
                for j in range(4):
                    acc_update(accs[off + j], parts[j].astype(jnp.int32),
                               jnp.add)
            else:
                for j in range(4):
                    limb2d = ((jnp.broadcast_to(src, (block, w2))
                               >> (8 * j)) & 0xFF).astype(jnp.float32)
                    part = jnp.sum(limb2d * pair_f, axis=0)
                    acc_update(accs[off + j], part.astype(jnp.int32),
                               jnp.add)
        else:
            v = jnp.broadcast_to(bcast[in_col], (block, w2))
            v = jnp.where(pair, v, _SENTINEL[fn])
            red = jnp.min if fn == "min" else jnp.max
            mrg = jnp.minimum if fn == "min" else jnp.maximum
            acc_update(accs[off], red(v, axis=0), mrg)
        off += w

    @pl.when(i == n_i - 1)
    def _():
        for o, acc in zip(out_refs, accs):
            o[:] = acc[:]
        cnt_out[:] = acc_cnt[:]
        esc_out[0] = esc_acc[0]


def supported(probe_cols, slot_cols, aggs) -> bool:
    """Static eligibility for the Pallas path: int32 columns only,
    count/min/max/sum/count_sum aggregations."""
    if not all(fn in ("count", "min", "max", "sum", "count_sum")
               for _, fn, _ in aggs):
        return False
    cols = list(probe_cols.values()) + list(slot_cols.values())
    return all(c.dtype == jnp.int32 for c in cols)


def enabled() -> bool:
    """Pallas kernels available: on for the TPU backend, overridable with
    FLOCK_TPU_PALLAS=0/1/2 (tests force-enable via interpret mode)."""
    import os

    v = os.environ.get("FLOCK_TPU_PALLAS")
    if v is not None:
        return v != "0"
    return jax.default_backend() == "tpu"


def fused_preferred() -> bool:
    """Whether the FUSED join-aggregate should take the Pallas kernel.

    Measured on v5e (BENCH_KERNELS.json): the Mosaic kernel's 1024-aligned
    double window doubles its op count, and at q4 shapes the XLA fused scan
    wins (22.6 ms vs 39.2 ms / 4M rows) — so the fused path defaults to XLA
    and Pallas is opt-in with FLOCK_TPU_PALLAS=2.  (The standalone blocked
    aggregation is the opposite: Pallas wins 1.65× on sum-bearing agg sets —
    see pallas/agg.local_preferred.)"""
    import os

    return enabled() and os.environ.get("FLOCK_TPU_PALLAS") == "2"


MAX_SUM_ROWS = (2**31 - 1) // 255  # int32 limb-accumulator bound


def eligible(slot_cols, probe_cols, replay, aggs) -> bool:
    """Static eligibility for ``fused_join_aggregate_rebased``:
    count/min/max/sum/count_sum aggregations whose aggregated values are
    int32 (checked by replaying the plan segment on abstract inputs), over
    int32/int64 columns.

    int64 columns are rebased to window-relative int32 offsets before the
    kernel, which preserves comparisons and differences — the only uses the
    engine's plan segments make of timestamps (interval predicates like
    q4/q9's ``b_date_time BETWEEN a_date_time AND expires``).  Aggregated
    values must already be int32 on the *original* dtypes, so no rebased
    quantity is ever aggregated.  Integer sums accumulate in four 8-bit-limb
    int32 accumulators — exact while rows·255 < 2³¹ (≤ 8.4M probe rows per
    window, checked statically) and values are non-negative (prices/counts;
    the XLA limb path shares this contract, ops/blocked._limbs8).

    Aggregations whose accumulators must be int64 (e.g. q6's packed
    price<<32|time order key) stay on the XLA fused path by design.
    """
    if not all(fn in ("count", "min", "max", "sum", "count_sum")
               for _, fn, _ in aggs):
        return False
    cols = list(slot_cols.values()) + list(probe_cols.values())
    if not all(c.dtype in (jnp.int32, jnp.int64) for c in cols):
        return False
    n = next(iter(probe_cols.values())).shape[0]
    if any(fn in ("sum", "count_sum") for _, fn, _ in aggs) \
            and n > MAX_SUM_ROWS:
        return False
    from flock_tpu.ops import blocked

    try:
        dts = blocked.fused_acc_dtypes(slot_cols, probe_cols, replay,
                                       list(aggs))
    except Exception:  # noqa: BLE001 — any trace failure ⇒ take the XLA path
        return False
    return all(dt == jnp.dtype(jnp.int32) for dt in dts.values())


def fused_join_aggregate_rebased(
    slot_cols, present, m, probe_cols, probe_valid, probe_key, replay, aggs,
    block: int = 1024, s_loc: int = 1024, interpret: bool = False,
):
    """``fused_join_aggregate`` with automatic int64→int32 rebasing.

    All int64 columns (timestamps) are shifted by one shared base — the
    minimum over the window's live values — so comparisons/differences
    between them are exact in int32.  A window whose int64 values span ≥2³¹
    (never happens for stream timestamps inside one window) raises the escape
    flag instead, routing callers to their existing fallback.
    """
    import functools as _ft

    i64_probe = [k for k, v in probe_cols.items() if v.dtype == jnp.int64]
    i64_slot = [k for k, v in slot_cols.items() if v.dtype == jnp.int64]
    if not i64_probe and not i64_slot:
        return fused_join_aggregate(
            slot_cols, present, m, probe_cols, probe_valid, probe_key,
            replay, aggs, block=block, s_loc=s_loc, interpret=interpret)

    I64_MAX = np.int64(2**63 - 1)
    I64_MIN = np.int64(-(2**63))
    los = [jnp.min(jnp.where(probe_valid, probe_cols[k], I64_MAX))
           for k in i64_probe]
    los += [jnp.min(jnp.where(present, slot_cols[k], I64_MAX))
            for k in i64_slot]
    his = [jnp.max(jnp.where(probe_valid, probe_cols[k], I64_MIN))
           for k in i64_probe]
    his += [jnp.max(jnp.where(present, slot_cols[k], I64_MIN))
            for k in i64_slot]
    base = _ft.reduce(jnp.minimum, los)
    hi = _ft.reduce(jnp.maximum, his)
    # empty window: hi - base wraps negative → unsigned compare stays safe
    ok64 = (hi <= base + np.int64(2**31 - 2)) | (hi < base)

    def rb(v):
        return jnp.clip(v - base, 0, np.int64(2**31 - 2)).astype(jnp.int32)

    pc = {k: (rb(v) if k in i64_probe else v) for k, v in probe_cols.items()}
    sc = {k: (rb(v) if k in i64_slot else v) for k, v in slot_cols.items()}
    out, valid, esc = fused_join_aggregate(
        sc, present, m, pc, probe_valid, probe_key, replay, aggs,
        block=block, s_loc=s_loc, interpret=interpret)
    return out, valid, esc | ~ok64


def fused_join_aggregate(
    slot_cols: dict[str, jax.Array],    # [span] build columns, slot-dense
    present: jax.Array,                 # bool [span]
    m: jax.Array,                       # scalar int32: key of slot 0
    probe_cols: dict[str, jax.Array],   # [n] int32 each
    probe_valid: jax.Array,             # bool [n]
    probe_key: str,
    replay,                             # fn(bcast, pair) -> (bcast, pair)
    aggs: list[tuple[str, str, str]],   # (in_col, fn∈count/min/max, out)
    block: int = 1024,
    s_loc: int = 1024,
    interpret: bool = False,
):
    """Drop-in for ops/blocked.blocked_join_aggregate
    (count/min/max/sum/count_sum over int32 values).

    Returns (out_cols with __key, out_valid, escape) — slot i holds key m+i.
    """
    span0 = present.shape[0]
    n = probe_valid.shape[0]
    # 1D VMEM arrays tile as (8 sublanes × 128 lanes) = 1024 elements; any
    # dynamic slice index must be provably 1024-aligned
    assert s_loc % 1024 == 0, s_loc
    # span must be a multiple of the window alignment unit and ≥ one double
    # window (see _kernel's aligned-halves scheme)
    span = max(-(-span0 // s_loc) * s_loc, 2 * s_loc)
    spad = span - span0
    slot_cols = {k: jnp.pad(v, (0, spad)) for k, v in slot_cols.items()}
    present = jnp.pad(present, (0, spad))
    pad = (-n) % block
    pcols = {k: jnp.pad(v, (0, pad)) for k, v in probe_cols.items()}
    pvalid = jnp.pad(probe_valid, (0, pad)).astype(jnp.int32)
    npad = n + pad

    probe_names = [probe_key] + [k for k in sorted(pcols) if k != probe_key]
    slot_names = sorted(slot_cols)
    grid = (npad // block,)

    kernel = functools.partial(
        _kernel, probe_names=tuple(probe_names), slot_names=tuple(slot_names),
        replay=replay, aggs=tuple(aggs), block=block, s_loc=s_loc, span=span)

    blockspec = pl.BlockSpec((block,), lambda i, *_: (i,))
    spanspec = pl.BlockSpec((span,), lambda i, *_: (0,))
    widths = [_acc_width(fn) for _, fn, _ in aggs]
    nacc = sum(widths)
    # trace under 32-bit semantics: the engine runs with jax_enable_x64 (for
    # exact integer sums at sinks), but weak-int64 scalars from index maps /
    # literals hit an infinite _convert_helper recursion in Mosaic (int64
    # scalar → int32); everything in this kernel is int32 anyway
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=([blockspec] * (len(probe_names) + 1)
                          + [spanspec] * (len(slot_names) + 1)),
                out_specs=([spanspec] * (nacc + 1)
                           + [pl.BlockSpec(memory_space=pltpu.SMEM)]),
                scratch_shapes=([pltpu.VMEM((span,), jnp.int32)] * (nacc + 1)
                                + [pltpu.SMEM((1,), jnp.int32)]),
            ),
            out_shape=([jax.ShapeDtypeStruct((span,), jnp.int32)] * (nacc + 1)
                       + [jax.ShapeDtypeStruct((1,), jnp.int32)]),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(m.reshape(1).astype(jnp.int32),
          *[pcols[k] for k in probe_names], pvalid,
          *[slot_cols[k] for k in slot_names], present.astype(jnp.int32))

    # combine limb accumulators (outside the 32-bit kernel context)
    out_cols = {}
    idx = 0
    for (in_col, fn, out), w in zip(aggs, widths):
        arrs = outs[idx:idx + w]
        idx += w
        if w == 1:
            out_cols[out] = arrs[0][:span0]
        else:
            dt = jnp.int64 if fn == "sum" else jnp.int32
            comb = arrs[0].astype(dt)
            for j in range(1, 4):
                comb = comb + (arrs[j].astype(dt) << (8 * j))
            out_cols[out] = comb[:span0]
    cnt, esc = outs[nacc][:span0], outs[nacc + 1]
    out_cols["__key"] = m + jnp.arange(span0, dtype=jnp.int32)
    return out_cols, cnt > 0, esc[0] > 0
