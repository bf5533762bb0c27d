"""Core masked-columnar operator kernels (single device, XLA-first).

These are the TPU-native equivalents of the vectorized operator set Flock
inherits from DataFusion/Arrow (filter, projection, hash aggregate, hash join,
sort, window-rank, repartition/coalesce — SURVEY.md §2 "native components").

Design rules (see batch.py):
* every kernel is fixed-shape: inputs/outputs are [capacity] arrays + validity
  masks; live row counts are traced scalars;
* kernels that can overflow a static output capacity return an ``overflow``
  flag the host can check (the analogue of Flock's payload-size guards);
* the XLA baselines here are sort/scan/scatter based — deterministic and
  shape-static.  Pallas kernels (flock_tpu/pallas/) override the hot paths.

All joins in the NEXMark/YSB suite are N-to-1 lookups into a unique-key build
side (auction ids, person ids, campaign ids, side-input keys are unique —
verified against reference generator semantics), and all group/join keys are
*densely generated* integers.  The primary paths exploit that: ``lookup_join``
direct-indexes a key-span array (one scatter + one gather, no sort/search) and
``dense_group_aggregate`` scatter-adds into key-span slots — both pure
HBM-bandwidth ops.  Sort-based fallbacks (``sorted_lookup_join``, the
multi-key branch of ``group_aggregate``) cover general keys; both are
deterministic and skew-proof (hot keys collapse into one slot/segment).
"""

from __future__ import annotations

from functools import reduce

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

I32_MAX = np.int32(2**31 - 1)  # np scalar: inlines as a literal (a jnp
# scalar constant becomes a hidden executable parameter and breaks dispatch)


def _shift_ne(k: jax.Array) -> jax.Array:
    """True where row differs from previous row (row 0 → True)."""
    return jnp.concatenate([jnp.ones((1,), bool), k[1:] != k[:-1]])


def sort_rows(cols: dict[str, jax.Array], valid: jax.Array, keys: list[str],
              descending: tuple[bool, ...] | None = None):
    """Stable multi-key sort; invalid rows sort last.  Returns (cols, valid)."""
    descending = descending or (False,) * len(keys)
    key_arrays = [~valid]
    for k, d in zip(keys, descending):
        arr = cols[k]
        key_arrays.append(-arr if d else arr)
    names = list(cols)
    operands = tuple(key_arrays) + tuple(cols[n] for n in names) + (valid,)
    out = lax.sort(operands, num_keys=len(key_arrays), is_stable=True)
    out_cols = dict(zip(names, out[len(key_arrays):-1]))
    return out_cols, out[-1]


def compact(cols: dict[str, jax.Array], valid: jax.Array, out_capacity: int):
    """Move live rows to the front of a [out_capacity] buffer, preserving
    order.  A stable 1-key sort on the validity flag moves every column in
    one fused multi-operand pass — ~4× faster on TPU than the equivalent
    per-column scatter, whose updates serialize.

    Returns (cols, valid, overflow).  The reference analogue is
    CoalesceBatchesExec (flock/src/transmute.rs:38-72).
    """
    n_in = valid.shape[0]
    names = list(cols)
    operands = ((~valid).astype(jnp.int8),) \
        + tuple(cols[n] for n in names) + (valid,)
    s = lax.sort(operands, num_keys=1, is_stable=True)
    take = min(out_capacity, n_in)
    out = {}
    for name, arr in zip(names, s[1:-1]):
        a = arr[:take]
        if take < out_capacity:
            a = jnp.pad(a, (0, out_capacity - take))
        out[name] = a
    n = jnp.sum(valid)
    out_valid = jnp.arange(out_capacity) < jnp.minimum(n, out_capacity)
    return out, out_valid, n > out_capacity


def _dinfo(v: jax.Array):
    return (jnp.finfo(v.dtype) if jnp.issubdtype(v.dtype, jnp.floating)
            else jnp.iinfo(v.dtype))


def _scatter_aggs(seg: jax.Array, svalid: jax.Array, scols: dict,
                  aggs, out_capacity: int) -> dict[str, jax.Array]:
    """Scatter-based aggregation into ``out_capacity`` segments.

    ``seg`` must be ``out_capacity`` (dropped) for rows that contribute
    nothing.  Integer sums accumulate in int64 (TPU emulates i64 as i32
    pairs); exactness matters for AVG parity — the f64 division happens at
    the sink from the exact integer sum.
    """
    out = {}
    for in_col, fn, out_name in aggs:
        if fn == "count":
            ones = jnp.ones_like(svalid, dtype=jnp.int32)
            out[out_name] = jnp.zeros((out_capacity,), jnp.int32).at[seg].add(
                ones, mode="drop")
        elif fn == "count_sum":
            # re-aggregation of partial counts: int32 sum (stays int32, unlike
            # general integer "sum" which widens to int64)
            out[out_name] = jnp.zeros((out_capacity,), jnp.int32).at[seg].add(
                scols[in_col].astype(jnp.int32), mode="drop")
        elif fn == "sum":
            v = scols[in_col]
            acc = jnp.float32 if jnp.issubdtype(v.dtype, jnp.floating) else jnp.int64
            out[out_name] = jnp.zeros((out_capacity,), acc).at[seg].add(
                v.astype(acc), mode="drop")
        elif fn == "min":
            v = scols[in_col]
            init = jnp.full((out_capacity,), _dinfo(v).max, v.dtype)
            out[out_name] = init.at[seg].min(v, mode="drop")
        elif fn == "max":
            v = scols[in_col]
            init = jnp.full((out_capacity,), _dinfo(v).min, v.dtype)
            out[out_name] = init.at[seg].max(v, mode="drop")
        elif fn.startswith("wmin:"):
            # winner-carry: min(in_col) over the rows attaining the group MAX
            # of the order column named after the colon (q6's "seller of the
            # winning bid" under duplicate-auction join fan-out — the SQL
            # ROW_NUMBER()=1 carry with ties broken toward the smaller carry).
            # Two scatter passes: group-max of the order column, then min of
            # the carry over rows equal to it.  Re-aggregation of partials
            # with the same fn is exact: min over shards attaining the global
            # max.  Collapses to plain min when the carry is functionally
            # dependent on the group key (unique build rows).
            ov = scols[fn[5:]]
            omax = jnp.full((out_capacity,), _dinfo(ov).min, ov.dtype
                            ).at[seg].max(ov, mode="drop")
            segc = jnp.clip(seg, 0, out_capacity - 1)
            attain = svalid & (seg < out_capacity) & (ov == omax[segc])
            v = scols[in_col]
            seg2 = jnp.where(attain, seg, out_capacity)
            out[out_name] = jnp.full((out_capacity,), _dinfo(v).max, v.dtype
                                     ).at[seg2].min(v, mode="drop")
        else:
            raise ValueError(fn)
    return out


FULL_ONEHOT_MAX = 4096   # spans up to this use full one-hot (no locality need)
AGG_BLOCK = 4096
AGG_S_LOC = 1024

# Locality presets: expected key span of one AGG_BLOCK-row block, derived from
# the generator semantics (event.rs:171-184 / datagen/nexmark.py).  A non-hot
# seller/bidder is drawn from the last ``active_people=1000`` ids behind the
# person frontier (+10 lead); the frontier itself advances by
# rows·persons_per_row.  Rounded up to a lane multiple.
#   person ids over person rows: frontier advances 1/row        → 4096+1010
#   person ids over auction rows (seller): 1/3 per row          → 1366+1010
#   person ids over bid rows (bidder): 1/46 per row             → 90+1010
S_LOC_DENSE_IDS = 4608       # group key ≡ the relation's own id column
S_LOC_PERSON_OVER_AUCTION = 2560
S_LOC_PERSON_OVER_BID = 1280
#   auction ids over bid rows (q4/q6/q9 probe): frontier advances 3/46 per
#   bid row (267/block) + in_flight_auctions=100 lookback + hot-id rounding
#   ≤ hot_auction_ratio_2=100 (event.rs:171-184, config.rs:119-133) → 512
S_LOC_AUCTION_OVER_BID = 512


def dense_group_aggregate(
    cols: dict[str, jax.Array],
    valid: jax.Array,
    key: str,
    aggs: list[tuple[str, str, str]],
    out_capacity: int,
    allow_blocked: bool = True,
    s_loc: int | None = None,
):
    """Dense-key grouped aggregation: segment id = key − min(valid keys).

    NEXMark/YSB group keys (auction/person/campaign/session ids) are generated
    consecutively, so a window's key range fits a static span.  Dispatch:

    * span ≤ FULL_ONEHOT_MAX → full one-hot MXU/VPU contraction (no locality
      assumption; ops/blocked.full_onehot_agg);
    * larger spans with ``allow_blocked`` → blocked local one-hot exploiting
      stream key locality (ops/blocked.blocked_local_agg); escaping rows set
      the overflow flag and callers fall back here with
      ``allow_blocked=False``;
    * otherwise → XLA scatter (correct for any distribution, ~25ns/row).

    Rows whose key falls outside ``out_capacity`` slots above the minimum
    raise the overflow flag (the caller widens, exactly like Flock's payload
    guards).  Output slot i holds key ``min + i`` (gaps stay invalid).
    """
    from flock_tpu.ops import blocked

    def scatter_path():
        k = cols[key]
        m = jnp.min(jnp.where(valid, k, I32_MAX))
        pos = (k - m).astype(jnp.int32)
        in_range = valid & (pos >= 0) & (pos < out_capacity)
        overflow = jnp.any(valid & ~in_range).astype(bool).reshape(())
        seg = jnp.where(in_range, pos, out_capacity)
        out = _scatter_aggs(seg, valid, cols,
                            list(aggs) or [(None, "count", "__dense_occ")],
                            out_capacity)
        counts = out.get("__dense_occ")
        if counts is None:
            ones = jnp.ones_like(valid, dtype=jnp.int32)
            counts = jnp.zeros((out_capacity,), jnp.int32).at[seg].add(
                ones, mode="drop")
        out.pop("__dense_occ", None)
        out[key] = m.astype(k.dtype) + jnp.arange(out_capacity, dtype=k.dtype)
        return out, counts > 0, overflow

    int32_only = all(
        (c is None or cols[c].dtype == jnp.int32) for c, fn, _ in aggs
    ) and cols[key].dtype == jnp.int32

    # int64 aggregation columns (timestamps) REBASE to window-relative int32
    # so the blocked/factored integer paths apply (the q11/q12 session plans
    # take min/max over b_date_time/p_time; the scatter path costs ~25 ns/row
    # — measured 3× ~0.4 s per 15M-row session flush before this).  min/max
    # shift back exactly; sum adds count·base (exact in int64).  A window
    # whose int64 range exceeds int32 falls back to the scatter path via the
    # overflow flag of an impossible capacity — never wrong, only slower.
    i64_cols = sorted({c for c, f, _ in aggs
                       if c is not None and cols[c].dtype == jnp.int64
                       and f in ("min", "max", "sum")})
    i64_ok_dtypes = all(
        (c is None or cols[c].dtype == jnp.int32 or c in i64_cols)
        for c, fn, _ in aggs)
    if i64_cols and i64_ok_dtypes and cols[key].dtype == jnp.int32:
        I64_MAX = np.int64(2**63 - 1)
        I64_MIN = np.int64(-(2**63))
        cols2 = dict(cols)
        bases = {}
        ok64 = jnp.asarray(True)
        for c in i64_cols:
            v = cols[c]
            lo = jnp.min(jnp.where(valid, v, I64_MAX))
            hi = jnp.max(jnp.where(valid, v, I64_MIN))
            ok64 = ok64 & ((hi <= lo + np.int64(2**31 - 2)) | (hi < lo))
            bases[c] = lo
            cols2[c] = jnp.clip(v - lo, 0, np.int64(2**31 - 2)).astype(
                jnp.int32)
        aggs2 = list(aggs)
        need_cnt = any(f == "sum" and c in i64_cols for c, f, _ in aggs)
        if need_cnt:
            aggs2 = aggs2 + [(None, "count", "__rb_cnt")]
        out, ovalid, ovf = dense_group_aggregate(
            cols2, valid, key, aggs2, out_capacity, allow_blocked, s_loc)
        for c, f, name in aggs:
            if c not in i64_cols:
                continue
            if f in ("min", "max"):
                out[name] = out[name].astype(jnp.int64) + bases[c]
            elif f == "sum":
                out[name] = out[name].astype(jnp.int64) \
                    + out["__rb_cnt"].astype(jnp.int64) * bases[c]
        out.pop("__rb_cnt", None)
        # range overflow → re-run via the general scatter path (lax.cond
        # keeps it off the hot path; shapes agree by construction)
        names = sorted(out)

        def slow_branch():
            o, v2, f2 = scatter_path()
            return tuple(o[nm].astype(out[nm].dtype) for nm in names) \
                + (v2, f2)

        def fast_branch():
            return tuple(out[nm] for nm in names) + (ovalid, ovf)

        picked = lax.cond(ok64, fast_branch, slow_branch)
        return dict(zip(names, picked[:-2])), picked[-2], picked[-1]

    if not int32_only or any(f.startswith("wmin:") for _, f, _ in aggs):
        # winner-carry aggregation is two dependent scatter passes — the
        # one-hot/blocked kernels don't express it (correctness path only)
        return scatter_path()

    agg_cols = {c: cols[c] for c, f, _ in aggs if c is not None}
    n = valid.shape[0]
    if out_capacity <= FULL_ONEHOT_MAX:
        # the unchunked one-hot materializes [n, span]: budget-gate it (XLA
        # CPU does not stream the operand — a 4.6M-row session flush at span
        # 4096 tried to allocate 137 GB, round 4); over budget, the blocked
        # machinery below runs the SAME math chunked (window = whole span ⇒
        # no locality assumption, rows never escape)
        budget = (1 << 31) if jax.default_backend() == "tpu" else (1 << 27)
        if n * out_capacity <= budget:
            out, ovalid, ovf = blocked.full_onehot_agg(
                cols[key], valid, agg_cols, list(aggs), out_capacity)
            out[key] = out.pop("__key")
            return out, ovalid, ovf
        s_loc = out_capacity
        allow_blocked = True
    if not allow_blocked:
        return scatter_path()

    s_loc = min(s_loc or AGG_S_LOC, out_capacity)
    import os as _os

    from flock_tpu.pallas import agg as pallas_agg
    from flock_tpu.pallas import factored
    from flock_tpu.pallas import join_agg as _pj

    if factored.enabled() and factored.agg_preferred(list(aggs)) \
            and factored.agg_eligible(list(aggs), n, s_loc, out_capacity):
        # factored hi⊗lo kernel: count/sum ride ONE MXU matmul of two small
        # one-hots; min/max use a tight-window masked reduce (pallas/factored)
        b_out, b_valid, escape = factored.pallas_factored_agg(
            cols[key], valid, agg_cols, list(aggs), out_capacity,
            s_loc=s_loc)
    elif _pj.enabled() and pallas_agg.local_preferred(list(aggs)) \
            and pallas_agg.local_eligible(list(aggs), n, s_loc):
        # Pallas path: span accumulators live in VMEM across the grid
        # instead of round-tripping HBM per block; integer sums use 8-bit
        # limb accumulators (pallas/agg.py)
        b_out, b_valid, escape = pallas_agg.pallas_local_agg(
            cols[key], valid, agg_cols, list(aggs), out_capacity,
            s_loc=s_loc)
    else:
        pad = (-n) % AGG_BLOCK
        k = jnp.pad(cols[key], (0, pad))
        v = jnp.pad(valid, (0, pad))
        ac = {c: jnp.pad(a, (0, pad)) for c, a in agg_cols.items()}
        b_out, b_valid, escape = blocked.blocked_local_agg(
            k, v, ac, list(aggs), out_capacity,
            block=min(AGG_BLOCK, k.shape[0]), s_loc=s_loc)
    b_out[key] = b_out.pop("__key")

    import os
    if os.environ.get("FLOCK_TPU_NO_FALLBACK"):
        # bench mode: no runtime safety net (halves compiled program size);
        # escapes surface as overflow
        return b_out, b_valid, escape

    # locality broke (e.g. post-hash-shuffle keys): fall back to the scatter
    # path at runtime via lax.cond — blocked is the fast path and always
    # runs; the scatter safety net only executes when rows escaped.
    names = sorted(b_out)

    def esc_branch():
        o, v2, f2 = scatter_path()
        return tuple(o[nm] for nm in names) + (v2, f2)

    def ok_branch():
        # escape-derived False keeps the varying-axis type aligned with the
        # scatter branch under shard_map
        return (tuple(b_out[nm] for nm in names)
                + (b_valid, escape & False))

    picked = lax.cond(escape, esc_branch, ok_branch)
    out = dict(zip(names, picked[:-2]))
    return out, picked[-2], picked[-1]


def group_aggregate(
    cols: dict[str, jax.Array],
    valid: jax.Array,
    group_keys: list[str],
    aggs: list[tuple[str, str, str]],  # (in_col, fn, out_name); fn ∈ sum/count/min/max
    out_capacity: int,
    allow_blocked: bool = True,
    s_loc: int | None = None,
):
    """Grouped aggregation.  Single integer key → dense scatter path
    (``dense_group_aggregate``); multi-key → sort-based fallback.

    Sort-based output rows are sorted by group key (one row per distinct
    key), padded to ``out_capacity``.  Returns (out_cols, out_valid,
    overflow).  ``count`` ignores in_col.  ``avg`` is expressed by callers as
    sum+count (two-phase friendly, like DataFusion's partial/final
    HashAggregate split that Flock shuffles between stages,
    stage.rs:269-367).
    """
    if len(group_keys) == 1 and not jnp.issubdtype(
            cols[group_keys[0]].dtype, jnp.floating):
        return dense_group_aggregate(cols, valid, group_keys[0], aggs,
                                     out_capacity, allow_blocked, s_loc)
    needed = list(dict.fromkeys(
        group_keys + [c for c, f, _ in aggs if f != "count" and c is not None]
        + [f[5:] for _, f, _ in aggs if f.startswith("wmin:")]))
    sub = {k: cols[k] for k in needed}
    if group_keys:
        scols, svalid = sort_rows(sub, valid, group_keys)
        boundary = reduce(jnp.logical_or,
                          [_shift_ne(scols[k]) for k in group_keys])
        boundary = boundary & svalid
    else:
        # global aggregate: one segment spanning every live row
        scols, svalid = sub, valid
        boundary = svalid & (jnp.cumsum(svalid) == 1)
    seg = jnp.cumsum(boundary) - 1            # segment id per row (valid rows)
    seg = jnp.where(svalid, seg, out_capacity)  # invalid → dropped by scatter
    n_seg = jnp.sum(boundary)

    out: dict[str, jax.Array] = {}
    for k in group_keys:
        out[k] = jnp.zeros((out_capacity,), scols[k].dtype).at[seg].set(
            scols[k], mode="drop")
    out.update(_scatter_aggs(seg, svalid, scols, aggs, out_capacity))
    out_valid = jnp.arange(out_capacity) < jnp.minimum(n_seg, out_capacity)
    return out, out_valid, n_seg > out_capacity


def build_lookup(build_cols: dict[str, jax.Array], build_valid: jax.Array,
                 key: str):
    """Sort the build side by key for binary-search probing.

    Invalid rows get the I32_MAX sentinel so they sort past any live key.
    Returns (sorted_key, sorted_cols, sorted_valid).
    """
    k = jnp.where(build_valid, build_cols[key], I32_MAX)
    names = list(build_cols)
    operands = (k,) + tuple(build_cols[n] for n in names) + (build_valid,)
    out = lax.sort(operands, num_keys=1, is_stable=True)
    return out[0], dict(zip(names, out[1:-1])), out[-1]


def sorted_lookup_join(
    build_cols: dict[str, jax.Array],
    build_valid: jax.Array,
    build_key: str,
    probe_cols: dict[str, jax.Array],
    probe_valid: jax.Array,
    probe_key: str,
    take: dict[str, str],  # build col → output name
):
    """General-key N-to-1 join: sort build, binary-search probes."""
    bk, bcols, bvalid = build_lookup(build_cols, build_valid, build_key)
    pk = probe_cols[probe_key]
    idx = jnp.searchsorted(bk, pk, method="sort")
    idx = jnp.minimum(idx, bk.shape[0] - 1)
    hit = (bk[idx] == pk) & bvalid[idx] & probe_valid
    out = dict(probe_cols)
    for src, dst in take.items():
        out[dst] = bcols[src][idx]
    return out, hit


def lookup_join(
    build_cols: dict[str, jax.Array],
    build_valid: jax.Array,
    build_key: str,
    probe_cols: dict[str, jax.Array],
    probe_valid: jax.Array,
    probe_key: str,
    take: dict[str, str],  # build col → output name
    span_margin: int | None = None,
    probe_s_loc: int | None = None,
    build_s_loc: int | None = None,
    build_slotted: bool = False,
    take_limbs: dict | None = None,
    dup_expand: bool = True,
    out_capacity: int | None = None,
):
    """Inner hash join: probe rows keep their slots; matched build columns
    are gathered alongside.  Unmatched probe rows become invalid.

    Unique build keys (every primary NEXMark/YSB join; see module docstring)
    take the N-to-1 fast path.  Duplicate build keys — real reference
    behavior when the generator id striping misaligns (100_000/G not a
    multiple of the 50-event proportion denominator, event.rs:86-88 +
    Auction::last_id) — are detected at runtime from a per-slot count and
    execute a *fan-out* expansion (``lax.cond``, so clean windows pay only
    the count): each duplicate build row beyond the first emits an extra
    joined row into the free slots of the ``out_capacity`` output buffer,
    matching DataFusion's duplicate-faithful hash join (the reference executes
    q4.sql's INNER JOIN through it, distributed_plan/stage.rs:307).
    Multiplicity is unbounded (sort-merge ranges); extras beyond the free
    slots raise the overflow flag (callers widen and retry).  With
    ``dup_expand=False`` (declared-unique build, e.g. q13's side input)
    duplicates raise the overflow flag instead of expanding.

    Returns (out_cols, out_valid, overflow) at ``out_capacity`` rows
    (defaults to the probe capacity).

    Fast path: build keys are *dense* integers (consecutively generated ids),
    so the "hash table" is a per-key-slot array over the key span.  Both
    sides avoid random access: the build side is *slotted* with the one-hot
    aggregation (max over a unique key ≡ the value) and the probe side
    gathers via blocked one-hot MXU contractions over a sliding build window
    (ops/blocked.blocked_local_join) — measured far faster than the XLA
    scatter/gather formulation on TPU (bench/kernels_bench.py).

    Build keys falling outside ``build_capacity + span_margin`` slots above
    the minimum raise the overflow flag; callers can widen or fall back to
    ``sorted_lookup_join``.  The default margin covers the generator id
    striping: ≤6000 slots for auctions, ≤2000 for persons.
    """
    import os

    from flock_tpu.config import CONFIG
    from flock_tpu.ops import blocked
    from flock_tpu.pallas import factored

    if span_margin is None:
        span_margin = CONFIG.join_span_margin
    bk = build_cols[build_key]
    take_list = list(take)
    if build_slotted:
        # build side is already a dense-slot aggregate output (slot i holds
        # key col[0]+i, one row per slot by construction): reuse it directly,
        # no re-slotting pass and no duplicate machinery at all
        span = bk.shape[0]
        slots = {src: build_cols[src] for src in take}
        present = build_valid
        ovf_b = jnp.asarray(False)
        m = bk[0]
        has_dups = None
    else:
        span = bk.shape[0] + span_margin
        # slot the build side: unique keys ⇒ max() over each take-col == the
        # value; the count column detects duplicates.  Default path is the
        # scatter (build keys are usually slot-ordered/ascending, which
        # escapes the default blocked window); a ``build_s_loc`` hint sized
        # to the ascending span enables the blocked one-hot instead.
        slot_aggs = [(src, "max", src) for src in take] \
            + [(None, "count", "__dupcnt")]
        slots, present, ovf_b = dense_group_aggregate(
            {build_key: bk, **{src: build_cols[src] for src in take}},
            build_valid, build_key, slot_aggs, span,
            allow_blocked=build_s_loc is not None, s_loc=build_s_loc)
        has_dups = jnp.any(slots.pop("__dupcnt") > 1)
        m = jnp.min(jnp.where(build_valid, bk, I32_MAX))

    pk = probe_cols[probe_key]
    n = pk.shape[0]
    pad = (-n) % AGG_BLOCK
    slot_arrays = {src: slots[src] for src in take_list}
    pnames = list(probe_cols)
    E = n if (build_slotted or not dup_expand or out_capacity is None) \
        else max(out_capacity, n)

    def clean_path():
        """Unique-key gather at [n]: take values + hit + residual overflow."""
        eff_s_loc = min(probe_s_loc or AGG_S_LOC, span)
        # limb hints keyed by OUTPUT name on the Join node; the gather works
        # on build-source names
        limbs_src = {src: take_limbs[take[src]] for src in take_list
                     if take_limbs and take[src] in take_limbs} or None
        if factored.enabled() and factored.join_preferred() \
                and eff_s_loc <= 2048 \
                and factored.gather_planes(take_list, limbs_src) \
                <= factored.MAX_GATHER_PLANES \
                and all(a.dtype == jnp.int32 for a in slot_arrays.values()) \
                and pk.dtype == jnp.int32:
            # factored matmul gather (pallas/factored): build cols reach probe
            # rows through oh_hi @ window matmuls instead of [B, s_loc]
            # one-hots; returns [n] directly
            gathered, hit, escape = factored.pallas_factored_gather(
                slot_arrays, present, m, pk, probe_valid, take_list,
                s_loc=eff_s_loc, limbs=limbs_src)
        else:
            gathered, hit, escape = blocked.blocked_local_join(
                slot_arrays, present, m,
                jnp.pad(pk, (0, pad)), jnp.pad(probe_valid, (0, pad)),
                take_list, block=min(AGG_BLOCK, n + pad), s_loc=eff_s_loc)
        if os.environ.get("FLOCK_TPU_NO_FALLBACK"):
            # bench mode: no runtime safety net; escapes surface as overflow
            return (tuple(gathered[src][:n] for src in take_list)
                    + (hit[:n], escape))

        # probe-locality safety net: per-row gather (slow but general),
        # executed only when a block escaped its window (lax.cond)
        def esc_branch():
            q = (pk - m).astype(jnp.int32)
            ok = probe_valid & (q >= 0) & (q < span)
            qc = jnp.where(ok, q, 0)
            h = ok & present[qc]
            return tuple(slot_arrays[src][qc] for src in take_list) + (h,)

        def ok_branch():
            return tuple(gathered[src][:n] for src in take_list) + (hit[:n],)

        picked = lax.cond(escape, esc_branch, ok_branch)
        # escape-derived False keeps the varying-axis type aligned with the
        # dup branch's data-derived overflow under shard_map
        return picked + (escape & False,)

    if build_slotted or not dup_expand \
            or os.environ.get("FLOCK_TPU_NO_FALLBACK"):
        # declared-unique build (or bench mode, which strips every runtime
        # safety net): duplicates surface as overflow instead of expanding
        picked = clean_path()
        out = dict(probe_cols)
        for i, src in enumerate(take_list):
            out[take[src]] = picked[i]
        extra_ovf = picked[-1] if has_dups is None else picked[-1] | has_dups
        return out, picked[-2], ovf_b | extra_ovf

    def _padE(a, fill=False):
        if E == n:
            return a
        if a.dtype == jnp.bool_:
            return jnp.pad(a, (0, E - n), constant_values=fill)
        return jnp.pad(a, (0, E - n))

    def clean_branch():
        picked = clean_path()
        vals = tuple(_padE(v) for v in picked[:-2])
        pvals = tuple(_padE(probe_cols[c]) for c in pnames)
        return vals + pvals + (_padE(picked[-2]), picked[-1])

    def dup_branch():
        # unbounded sort-merge fan-out: sort the build side by key, locate
        # each probe key's duplicate range with two binary searches, emit the
        # FIRST duplicate in the probe's own output slot and every further
        # duplicate into the free slots of the [E] buffer (enumerated with
        # cumsums + a rank→probe-row binary search — static shapes, no
        # multiplicity bound; NEXMark id wraparound reaches multiplicity ≥15
        # at production rates with misaligned generator counts).  Order among
        # duplicates is irrelevant: every duplicate row is emitted, exactly
        # like the reference's hash join.
        nb = bk.shape[0]
        ops = (jnp.where(build_valid, bk, I32_MAX),) \
            + tuple(build_cols[s] for s in take_list) + (build_valid,)
        srt = lax.sort(ops, num_keys=1, is_stable=True)
        sk, svb = srt[0], srt[-1]
        sb = dict(zip(take_list, srt[1:-1]))
        # method='sort' (vectorized co-sort): the default 'scan' method
        # lowers to a sequential loop on TPU
        lo = jnp.searchsorted(sk, pk, method="sort").astype(jnp.int32)
        hi = jnp.searchsorted(sk, pk, side="right",
                              method="sort").astype(jnp.int32)
        loc = jnp.minimum(lo, nb - 1)
        hit0 = probe_valid & (sk[loc] == pk) & svb[loc]
        hit0E = _padE(hit0)
        extras_i = jnp.where(hit0, hi - lo - 1, 0).astype(jnp.int32)
        r_inc = jnp.cumsum(extras_i)              # inclusive extras cumsum
        n_extras = r_inc[-1]
        excl = r_inc - extras_i                   # exclusive start per row
        freerank = jnp.cumsum((~hit0E).astype(jnp.int32)) - 1
        is_extra = (~hit0E) & (freerank < n_extras)
        f = jnp.where(is_extra, freerank, 0)
        # extra f belongs to the probe row whose extras range covers f
        src = jnp.minimum(jnp.searchsorted(r_inc, f, side="right",
                                           method="sort"),
                          n - 1).astype(jnp.int32)
        d = f - excl[src] + 1                     # duplicate ordinal ≥ 1
        bsrc = jnp.clip(lo[src] + d, 0, nb - 1)
        vals = []
        for s in take_list:
            base = _padE(sb[s][loc])
            vals.append(jnp.where(is_extra, sb[s][bsrc], base))
        pvals = []
        for c in pnames:
            col = probe_cols[c]
            pvals.append(jnp.where(is_extra, col[src], _padE(col)))
        ex_ovf = n_extras > jnp.sum((~hit0E).astype(jnp.int32))
        return tuple(vals) + tuple(pvals) + (hit0E | is_extra, ex_ovf)

    picked = lax.cond(has_dups, dup_branch, clean_branch)
    nt = len(take_list)
    out = {c: picked[nt + j] for j, c in enumerate(pnames)}
    for i, src in enumerate(take_list):
        out[take[src]] = picked[i]
    return out, picked[-2], ovf_b | picked[-1]


def rank_in_group(cols: dict[str, jax.Array], valid: jax.Array,
                  group_key: str, order_col: str, descending: bool,
                  rank_name: str, tiebreak: str | None = None):
    """ROW_NUMBER() OVER (PARTITION BY group_key ORDER BY order_col) — 1-based.

    Sorts rows by (group, order) and emits the rank column; output stays
    sorted.  Returns (cols, valid) with ``rank_name`` added.
    """
    keys = [group_key, order_col] + ([tiebreak] if tiebreak else [])
    desc = (False, descending) + ((False,) if tiebreak else ())
    scols, svalid = sort_rows(cols, valid, keys, desc)
    n = svalid.shape[0]
    boundary = _shift_ne(scols[group_key]) & svalid
    idx = jnp.arange(n, dtype=jnp.int32)
    start = jnp.where(boundary, idx, 0)
    start = lax.cummax(start)                   # segment start index per row
    scols = dict(scols)
    scols[rank_name] = idx - start + 1
    return scols, svalid


def distinct(cols: dict[str, jax.Array], valid: jax.Array,
             keys: list[str], out_capacity: int):
    """SELECT DISTINCT keys (a GROUP BY with no aggregates)."""
    return group_aggregate(cols, valid, keys, [], out_capacity)


def _segmented_scan(start: jax.Array, vals: jax.Array, combine):
    """Inclusive segmented scan: restarts ``combine`` at rows where ``start``
    is True.  The classic associative formulation — fully parallel (log n
    passes), no scatter/gather."""
    def op(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb, vb, combine(va, vb))
    return lax.associative_scan(op, (start, vals))[1]


def sorted_segment_aggregate(
    cols: dict[str, jax.Array],
    valid: jax.Array,
    key: str,
    aggs: list[tuple[str, str, str]],
):
    """Grouped aggregation over rows already SORTED by ``key`` (e.g. the
    output of Rank/Sort): segmented scans instead of scatters or one-hots.

    Interspersed invalid rows (post-Filter) contribute the identity.  The
    output keeps the input's capacity: each group's aggregate lands on its
    run's LAST row; all other rows are invalid.  Output columns are ``key`` +
    the agg outputs (same contract as the sort-based group_aggregate, minus
    compaction — downstream kernels are mask-aware so compaction is wasted
    work).  Never overflows.
    """
    k = cols[key]
    n = k.shape[0]
    change = k[1:] != k[:-1]
    start = jnp.concatenate([jnp.ones((1,), bool), change])
    end = jnp.concatenate([change, jnp.ones((1,), bool)])

    cnt = _segmented_scan(start, valid.astype(jnp.int32), jnp.add)
    out: dict[str, jax.Array] = {key: k}
    for in_col, fn, out_name in aggs:
        if fn == "count":
            out[out_name] = cnt
            continue
        v = cols[in_col]
        if fn == "count_sum":
            vv = jnp.where(valid, v.astype(jnp.int32), 0)
            out[out_name] = _segmented_scan(start, vv, jnp.add)
        elif fn == "sum":
            acc = (jnp.float32 if jnp.issubdtype(v.dtype, jnp.floating)
                   else jnp.int64)
            vv = jnp.where(valid, v.astype(acc), jnp.zeros((), acc))
            out[out_name] = _segmented_scan(start, vv, jnp.add)
        elif fn in ("min", "max"):
            info = (jnp.finfo(v.dtype) if jnp.issubdtype(v.dtype, jnp.floating)
                    else jnp.iinfo(v.dtype))
            sent = info.max if fn == "min" else info.min
            vv = jnp.where(valid, v, jnp.asarray(sent, v.dtype))
            out[out_name] = _segmented_scan(
                start, vv, jnp.minimum if fn == "min" else jnp.maximum)
        else:
            raise ValueError(fn)
    out_valid = end & (cnt > 0)
    return out, out_valid, jnp.asarray(False)


def slot_join(
    build_cols: dict[str, jax.Array],
    build_valid: jax.Array,
    build_key: str,
    probe_cols: dict[str, jax.Array],
    probe_valid: jax.Array,
    probe_key: str,
    take: dict[str, str],
):
    """Join two SLOT-DENSE relations (both sides are dense_group_aggregate
    outputs: slot i holds key ``col[0] + i``, gaps invalid) over the same key
    domain.  The whole join collapses to one contiguous shifted copy per
    column (dynamic_slice) + a mask AND — no probing, no hashing, zero random
    access.  Covers aggregate⋈aggregate joins like q8 (new persons ⋈ distinct
    sellers: both slotted over person ids).
    """
    pcap = probe_valid.shape[0]
    m_b = build_cols[build_key][0]
    m_p = probe_cols[probe_key][0]
    # probe slot i ↔ build slot i + offset; out-of-range offsets clamp into
    # the zero padding (no overlap ⇒ all misses)
    offset = (m_p.astype(jnp.int64) - m_b.astype(jnp.int64)).astype(jnp.int32)
    start = jnp.clip(offset + pcap, 0, build_valid.shape[0] + pcap)

    def shifted(arr, fill=0):
        padded = jnp.pad(arr, (pcap, pcap), constant_values=fill)
        return lax.dynamic_slice(padded, (start,), (pcap,))

    hit = probe_valid & shifted(build_valid, False)
    out = dict(probe_cols)
    for src, dst in take.items():
        out[dst] = shifted(build_cols[src])
    return out, hit, jnp.asarray(False)
