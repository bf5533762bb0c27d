"""Blocked one-hot aggregation/join kernels — the TPU-shaped hot path.

Why: XLA's general scatter/gather on TPU costs ~25ns *per row* (measured:
4M-row scatter-add 91ms, random gather 106ms on v5e — bench/kernels_bench.py),
because arbitrary per-lane random access doesn't map to the VPU.  TPUs are
fast at *dense block* compute, so these kernels restructure the random access
into block-local one-hot contractions:

* rows are processed in blocks of ``B``;
* each block's keys are localized to a window of ``S_loc`` consecutive key
  slots (NEXMark/YSB ids are generated in time order, so a block's keys span
  a narrow, advancing range — hot keys sit ≤ ~120 ids behind the frontier,
  generator striping ≤ ~750·shards: SURVEY §3.4);
* the block builds a ``[B, S_loc]`` one-hot match matrix and reduces it:
  counts/sums ride the MXU as ONE stacked bf16 matmul per block (8-bit limbs
  ≤255 and 0/1 mask entries are bf16-exact; the MXU accumulates in f32 and
  block partials stay < 2^24, so integer results are exact — and bf16 is the
  MXU's native rate, f32 matmuls are multi-pass emulated), min/max ride the
  VPU;
* per-block results merge into the span accumulator with *contiguous*
  dynamic-slice updates (fast), never scattered.

Rows that escape their block's window (possible only if key locality breaks)
raise the overflow flag, and callers fall back to the general scatter path —
semantics never depend on locality, only speed does.

Total work is n·S_loc VPU ops + n·S_loc MXU MACs instead of n serialized
scatters: ~40× faster at S_loc=1024 on paper, measured in
bench/kernels_bench.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

I32_MAX = np.int32(2**31 - 1)  # np scalar: inlines as a literal (a jnp
# scalar constant becomes a hidden executable parameter and breaks dispatch)
I32_MIN = np.int32(-(2**31))


def _limbs8(v: jax.Array):
    """8-bit limbs (4 for ≤int32, 8 for int64): block sums stay ≤ 4096·255 ≈
    2^20 < 2^24 (f32-exact under MXU accumulation)."""
    n = 8 if v.dtype == jnp.int64 else 4
    if v.dtype != jnp.int64:
        v = v.astype(jnp.int32)
    return [((v >> (8 * i)) & 0xFF).astype(jnp.float32) for i in range(n)]


def blocked_local_agg(
    keys: jax.Array,            # int32 [n]
    valid: jax.Array,           # bool [n]
    agg_cols: dict[str, jax.Array],
    aggs: list[tuple[str, str, str]],   # (in_col, fn, out) fn∈count/sum/min/max
    out_capacity: int,
    block: int = 4096,
    s_loc: int = 1024,
    margin: int = 0,
):
    """Grouped aggregation over a dense key span via blocked one-hot compute.

    Returns (out_cols, out_valid, overflow) with the same contract as
    kernels.dense_group_aggregate: slot i holds key ``min_valid_key + i``.
    """
    n = keys.shape[0]
    assert n % block == 0, (n, block)
    nb = n // block
    m = jnp.min(jnp.where(valid, keys, I32_MAX))

    kb = keys.reshape(nb, block)
    vb = valid.reshape(nb, block)
    cols_b = {}
    needed = {c for c, f, _ in aggs if f != "count" and c is not None}
    for c in needed:
        cols_b[c] = agg_cols[c].reshape(nb, block)

    iota = jnp.arange(s_loc, dtype=jnp.int32)

    # Accumulators: initialized *from a data-derived zero* so that under
    # shard_map the scan carry inherits the input's varying-axis type
    # (a plain constant init is "unvarying" and fails scan type checking).
    z32 = (m * 0).astype(jnp.int32)
    outs = {}
    for in_col, fn, out in aggs:
        if fn in ("count", "count_sum"):
            outs[out] = jnp.zeros((out_capacity,), jnp.int32) + z32
        elif fn == "sum":
            outs[out] = jnp.zeros((out_capacity,), jnp.int64) + z32.astype(jnp.int64)
        elif fn == "min":
            outs[out] = jnp.full((out_capacity,), I32_MAX, jnp.int32) + z32
        elif fn == "max":
            outs[out] = jnp.full((out_capacity,), I32_MIN, jnp.int32) + z32
        else:
            raise ValueError(fn)
    outs["__cnt"] = jnp.zeros((out_capacity,), jnp.int32) + z32

    def step(carry, xs):
        outs, escape = carry
        kblk, vblk = xs[0], xs[1]
        colvals = xs[2]
        rel_all = kblk - m
        # window anchored at the block's min VALID key: no key can fall
        # below it, so the full s_loc span is usable headroom above (margin
        # kept as a knob for non-min anchoring experiments; default 0)
        base = jnp.min(jnp.where(vblk, rel_all, I32_MAX))
        base = jnp.clip(base - margin, 0, max(out_capacity - s_loc, 0))
        rel = rel_all - base
        ok = vblk & (rel >= 0) & (rel < s_loc)
        escape = escape | jnp.any(vblk & ~ok)
        rel = jnp.where(ok, rel, s_loc)  # out of one-hot range
        onehot = (rel[:, None] == iota[None, :])            # [B, S_loc] bool
        oh_bf = onehot.astype(jnp.bfloat16)

        # Stack the count row + every sum column's 8-bit limbs into ONE bf16
        # MXU matmul (exact: limbs ≤255 and 0/1 entries are bf16-exact, f32
        # accumulation, block partials ≤ 4096·255 < 2^24), instead of one f32
        # matvec per limb (f32 matmuls are multi-pass-emulated on the MXU).
        sum_rows = [jnp.ones((block,), jnp.bfloat16)]
        row_of: dict[str, tuple[int, int]] = {}
        for in_col, fn, out in aggs:
            if fn in ("sum", "count_sum") and in_col not in row_of:
                limbs = _limbs8(colvals[in_col])
                row_of[in_col] = (len(sum_rows), len(limbs))
                sum_rows.extend(l.astype(jnp.bfloat16) for l in limbs)
        stacked = jnp.dot(jnp.stack(sum_rows), oh_bf,
                          preferred_element_type=jnp.float32)  # [R, S_loc]
        cnt = stacked[0].astype(jnp.int32)

        new = {}
        for in_col, fn, out in aggs + [(None, "count", "__cnt")]:
            win = lax.dynamic_slice(outs[out], (base,), (s_loc,))
            if fn == "count":
                upd = win + cnt
            elif fn in ("count_sum", "sum"):
                r0, nl = row_of[in_col]
                acc_dt = jnp.int64 if fn == "sum" else jnp.int32
                upd = win + sum(stacked[r0 + i].astype(acc_dt) << (8 * i)
                                for i in range(nl))
            elif fn == "min":
                v = jnp.where(onehot, colvals[in_col][:, None], I32_MAX)
                upd = jnp.minimum(win, jnp.min(v, axis=0))
            elif fn == "max":
                v = jnp.where(onehot, colvals[in_col][:, None], I32_MIN)
                upd = jnp.maximum(win, jnp.max(v, axis=0))
            new[out] = lax.dynamic_update_slice(outs[out], upd, (base,))
        return (new, escape), None

    xs = (kb, vb, cols_b)
    (outs, escape), _ = lax.scan(step, (outs, m != m), xs)

    cnt = outs.pop("__cnt")
    out_cols = {k: v for k, v in outs.items()}
    out_cols["__key"] = m + jnp.arange(out_capacity, dtype=keys.dtype)
    return out_cols, cnt > 0, escape


def _chunked_limb_sum(v: jax.Array, onehot: jax.Array, acc_dtype):
    """Exact integer sum per one-hot column: 8-bit limb MXU contractions over
    ≤4096-row chunks (keeps every f32 partial below 2^24), accumulated in
    integer dtype."""
    n = v.shape[0]
    span = onehot.shape[1]
    chunk = 4096
    total = jnp.zeros((span,), acc_dtype)
    for start in range(0, n, chunk):
        oh = onehot[start:start + chunk].astype(jnp.bfloat16)
        limbs = _limbs8(v[start:start + chunk])
        stacked = jnp.dot(
            jnp.stack([l.astype(jnp.bfloat16) for l in limbs]), oh,
            preferred_element_type=jnp.float32)  # [L, span], exact (<2^24)
        total = total + sum(stacked[i].astype(acc_dtype) << (8 * i)
                            for i in range(len(limbs)))
    return total


def full_onehot_agg(
    keys: jax.Array,
    valid: jax.Array,
    agg_cols: dict[str, jax.Array],
    aggs: list[tuple[str, str, str]],
    out_capacity: int,
):
    """Small-span aggregation: one-hot over the full span, no blocking.

    For spans ≤ a few thousand slots (q4's categories, maxn, YSB campaigns)
    n·span compute is trivial and needs no locality assumption at all.
    """
    n = keys.shape[0]
    m = jnp.min(jnp.where(valid, keys, I32_MAX))
    rel = keys - m
    ok = valid & (rel >= 0) & (rel < out_capacity)
    overflow = jnp.any(valid & ~ok)
    rel = jnp.where(ok, rel, out_capacity)
    iota = jnp.arange(out_capacity, dtype=jnp.int32)
    onehot = rel[:, None] == iota[None, :]

    out_cols = {}
    cnt = jnp.dot(jnp.ones((n,), jnp.bfloat16), onehot.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32).astype(jnp.int32)
    for in_col, fn, out in aggs:
        if fn == "count":
            out_cols[out] = cnt
        elif fn == "count_sum":
            out_cols[out] = _chunked_limb_sum(
                agg_cols[in_col], onehot, jnp.int32)
        elif fn == "sum":
            out_cols[out] = _chunked_limb_sum(
                agg_cols[in_col], onehot, jnp.int64)
        elif fn == "min":
            out_cols[out] = jnp.min(
                jnp.where(onehot, agg_cols[in_col][:, None], I32_MAX), axis=0)
        elif fn == "max":
            out_cols[out] = jnp.max(
                jnp.where(onehot, agg_cols[in_col][:, None], I32_MIN), axis=0)
        else:
            raise ValueError(fn)
    out_cols["__key"] = m + jnp.arange(out_capacity, dtype=keys.dtype)
    return out_cols, cnt > 0, overflow


def blocked_local_join(
    build_slot_cols: dict[str, jax.Array],   # [span] per-slot build columns
    build_present: jax.Array,                # bool [span]
    build_min_key: jax.Array,                # scalar int32
    probe_keys: jax.Array,                   # int32 [n]
    probe_valid: jax.Array,
    take: list[str],                         # build col names to gather
    block: int = 4096,
    s_loc: int = 1024,
    margin: int = 0,
):
    """Probe-side of the dense lookup join via blocked one-hot contraction.

    The build side is pre-slotted by key (one cheap small scatter, see
    kernels.lookup_join); probing gathers build columns with MXU matmuls over
    a sliding build window instead of per-row random gathers.

    Returns (gathered: dict col → [n], hit: bool [n], escape_overflow).
    """
    span = build_present.shape[0]
    n = probe_keys.shape[0]
    assert n % block == 0
    nb = n // block
    kb = probe_keys.reshape(nb, block)
    vb = probe_valid.reshape(nb, block)
    iota = jnp.arange(s_loc, dtype=jnp.int32)

    # Per-column 8-bit limbs, bf16-exact (≤255; top limb UNMASKED so the
    # arithmetic-shift reconstruction preserves negative int32 values, like
    # the old 16-bit split).  All limbs of all columns + the presence row ride
    # ONE bf16 MXU matmul per block: each one-hot row has ≤1 nonzero, so every
    # gathered product is a single exact bf16·bf16 term.
    present_bf = build_present.astype(jnp.bfloat16)
    limb_cols: dict[str, list[jax.Array]] = {}
    for c in take:
        v = build_slot_cols[c].astype(jnp.int32)
        limb_cols[c] = [((v >> (8 * i)) & 0xFF).astype(jnp.bfloat16)
                        for i in range(3)] + [(v >> 24).astype(jnp.bfloat16)]

    def step(escape, xs):
        kblk, vblk = xs
        rel_all = kblk - build_min_key
        # keys outside the whole build span can never match — they are join
        # MISSES, not locality escapes (e.g. bids referencing auctions from
        # an earlier window); only in-span keys outside the block's window
        # trigger the fallback
        candidate = vblk & (rel_all >= 0) & (rel_all < span)
        base = jnp.min(jnp.where(candidate, rel_all, I32_MAX))
        base = jnp.clip(base - margin, 0, max(span - s_loc, 0))
        rel = rel_all - base
        ok = candidate & (rel >= 0) & (rel < s_loc)
        escape = escape | jnp.any(candidate & ~ok)
        rel_c = jnp.where(ok, rel, s_loc)
        onehot = rel_c[:, None] == iota[None, :]
        oh_bf = onehot.astype(jnp.bfloat16)

        win_rows = [lax.dynamic_slice(present_bf, (base,), (s_loc,))]
        for c in take:
            win_rows.extend(lax.dynamic_slice(l, (base,), (s_loc,))
                            for l in limb_cols[c])
        win_mat = jnp.stack(win_rows, axis=1)               # [S_loc, 1+4C]
        res = jnp.dot(oh_bf, win_mat,
                      preferred_element_type=jnp.float32)   # [B, 1+4C]
        hit = (res[:, 0] > 0.5) & ok
        gathered = []
        for j, c in enumerate(take):
            limbs = res[:, 1 + 4 * j: 5 + 4 * j].astype(jnp.int32)
            gathered.append(limbs[:, 0] + (limbs[:, 1] << 8)
                            + (limbs[:, 2] << 16) + (limbs[:, 3] << 24))
        return escape, (hit, tuple(gathered))

    escape, (hits, gathered) = lax.scan(
        step, build_min_key != build_min_key, (kb, vb))
    out = {c: g.reshape(n) for c, g in zip(take, gathered)}
    return out, hits.reshape(n), escape


def fused_acc_dtypes(build_slot_cols, probe_cols, replay, aggs) -> dict:
    """Accumulator dtypes per agg output, via jax.eval_shape over the replay
    chain on abstract 1×1 inputs (no execution, no exposure to pad/sentinel
    values)."""
    sample = {k: jax.ShapeDtypeStruct((1, 1), v.dtype)
              for k, v in probe_cols.items()}
    for c, arr in build_slot_cols.items():
        sample[c] = jax.ShapeDtypeStruct((1, 1), arr.dtype)
    scols_out, _ = jax.eval_shape(
        replay, sample, jax.ShapeDtypeStruct((1, 1), jnp.bool_))
    out = {}
    for in_col, fn, name in aggs:
        if in_col is not None and in_col in scols_out:
            out[name] = scols_out[in_col].dtype
        else:
            out[name] = jnp.dtype(jnp.int32)
    return out


def blocked_join_aggregate(
    build_slot_cols: dict[str, jax.Array],   # [span] per-slot build columns
    build_present: jax.Array,                # bool [span]
    build_min_key: jax.Array,                # scalar int32
    probe_cols: dict[str, jax.Array],
    probe_valid: jax.Array,
    probe_key: str,
    replay,            # fn(bcast_cols, pair [B,S_loc]) -> (cols, pair)
    aggs: list[tuple[str, str, str]],        # over replayed (broadcast) cols
    out_capacity: int,
    block: int = 4096,
    s_loc: int = 1024,
    margin: int = 0,
):
    """Fused lookup-join + filter + grouped aggregation in one pass.

    The join's matched pairs are never materialized: each probe block forms a
    ``[B, S_loc]`` pair mask (one-hot key match ∧ replayed filters, e.g. the
    q4/q9 interval predicate) and aggregates directly into span-slot
    accumulators.  ``replay`` re-executes the plan nodes between the Join and
    the Aggregate on a *broadcast* column dict — probe columns shaped [B, 1],
    build slot-window columns shaped [1, S_loc] — so arbitrary filter/project
    lambdas apply unchanged via numpy broadcasting.

    Aggregated columns may come from either side (probe cols broadcast down
    columns, build cols down rows).  Returns (out_cols, out_valid, escape);
    slot i holds key ``build_min_key + i``.
    """
    span = build_present.shape[0]
    n = probe_valid.shape[0]
    assert n % block == 0
    nb = n // block
    iota = jnp.arange(s_loc, dtype=jnp.int32)
    z32 = (build_min_key * 0).astype(jnp.int32)

    pk_b = probe_cols[probe_key].reshape(nb, block)
    pv_b = probe_valid.reshape(nb, block)
    pcols_b = {k: v.reshape(nb, block) for k, v in probe_cols.items()}

    acc_dtype = fused_acc_dtypes(build_slot_cols, probe_cols, replay, aggs)

    def _minmax_init(dt, lo):
        info = jnp.iinfo(dt)
        return jnp.full((out_capacity,), info.min if lo else info.max, dt)

    outs: dict[str, jax.Array] = {}
    for in_col, fn, out in aggs:
        dt = acc_dtype[out]
        if fn in ("count", "count_sum"):
            outs[out] = jnp.zeros((out_capacity,), jnp.int32) + z32
        elif fn == "sum":
            outs[out] = jnp.zeros((out_capacity,), jnp.int64) + z32.astype(jnp.int64)
        elif fn == "min":
            outs[out] = _minmax_init(dt, lo=False) + z32.astype(dt)
        elif fn == "max":
            outs[out] = _minmax_init(dt, lo=True) + z32.astype(dt)
        else:
            raise ValueError(fn)
    outs["__cnt"] = jnp.zeros((out_capacity,), jnp.int32) + z32

    def step(carry, xs):
        outs, escape = carry
        kblk, vblk, pcolblk = xs
        rel_all = kblk - build_min_key
        # out-of-span keys are join misses, not escapes (see
        # blocked_local_join)
        candidate = vblk & (rel_all >= 0) & (rel_all < span)
        base = jnp.min(jnp.where(candidate, rel_all, I32_MAX))
        base = jnp.clip(base - margin, 0, max(span - s_loc, 0))
        rel = rel_all - base
        ok = candidate & (rel >= 0) & (rel < s_loc)
        escape = escape | jnp.any(candidate & ~ok)
        rel_c = jnp.where(ok, rel, s_loc)
        onehot = rel_c[:, None] == iota[None, :]

        pres_w = lax.dynamic_slice(build_present, (base,), (s_loc,))
        pair = onehot & pres_w[None, :]

        # broadcast dict: probe cols [B,1], build window cols [1,S_loc]
        bcast = {k: v[:, None] for k, v in pcolblk.items()}
        for c, arr in build_slot_cols.items():
            bcast[c] = lax.dynamic_slice(arr, (base,), (s_loc,))[None, :]
        bcast, pair = replay(bcast, pair)

        new = {}
        pair_bf = pair.astype(jnp.bfloat16)
        # One stacked bf16 MXU matmul computes the count row plus every
        # probe-side integer sum: sum_b col[b]·pair[b,s] = limbs(col) @ pair.
        # Exact: 8-bit limbs (0..255) and 0/1 mask entries are bf16-exact,
        # the MXU accumulates in f32, and partials stay ≤ 4096·255 < 2^24.
        # (The old path materialized 8 [B,S_loc] limb·mask products on the
        # VPU per block — ~8× n·S_loc elementwise ops; this is n·S_loc MACs.)
        sum_rows = [jnp.ones((block,), jnp.bfloat16)]   # row 0 → count
        row_of: dict[str, tuple[int, int]] = {}
        for in_col, fn, out in aggs:
            if fn == "sum" and in_col not in row_of \
                    and bcast[in_col].shape == (block, 1):
                limbs = _limbs8(bcast[in_col].reshape(block))
                row_of[in_col] = (len(sum_rows), len(limbs))
                sum_rows.extend(l.astype(jnp.bfloat16) for l in limbs)
        stacked = jnp.dot(jnp.stack(sum_rows), pair_bf,
                          preferred_element_type=jnp.float32)  # [R, S_loc]
        cnt = stacked[0].astype(jnp.int32)
        for in_col, fn, out in aggs + [(None, "count", "__cnt")]:
            win = lax.dynamic_slice(outs[out], (base,), (s_loc,))
            if fn in ("count", "count_sum"):
                upd = win + cnt
            elif fn == "sum":
                if in_col in row_of:            # probe-side: MXU rows above
                    r0, nl = row_of[in_col]
                    acc = sum(stacked[r0 + i].astype(jnp.int64) << (8 * i)
                              for i in range(nl))
                elif bcast[in_col].shape == (1, s_loc):
                    # build-side: constant down rows ⇒ sum = col · pair-count
                    acc = (bcast[in_col].reshape(s_loc).astype(jnp.int64)
                           * cnt.astype(jnp.int64))
                else:                           # true 2-D replay output
                    col = jnp.broadcast_to(bcast[in_col], (block, s_loc))
                    pair_f = pair.astype(jnp.float32)
                    acc = jnp.zeros((s_loc,), jnp.int64)
                    for i, limb2d in enumerate(_limbs8(col)):
                        p = jnp.sum(limb2d * pair_f, axis=0,
                                    dtype=jnp.float32)
                        acc = acc + (p.astype(jnp.int64) << (8 * i))
                upd = win + acc
            elif fn == "min":
                dt = win.dtype
                v = jnp.where(pair, bcast[in_col].astype(dt),
                              jnp.iinfo(dt).max)
                upd = jnp.minimum(win, jnp.min(v, axis=0))
            elif fn == "max":
                dt = win.dtype
                v = jnp.where(pair, bcast[in_col].astype(dt),
                              jnp.iinfo(dt).min)
                upd = jnp.maximum(win, jnp.max(v, axis=0))
            new[out] = lax.dynamic_update_slice(outs[out], upd, (base,))
        return (new, escape), None

    (outs, escape), _ = lax.scan(
        step, (outs, build_min_key != build_min_key), (pk_b, pv_b, pcols_b))

    cnt = outs.pop("__cnt")
    outs["__key"] = build_min_key + jnp.arange(out_capacity, dtype=jnp.int32)
    return outs, cnt > 0, escape
