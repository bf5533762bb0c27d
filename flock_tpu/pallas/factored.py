"""Pallas TPU kernels: FACTORED one-hot aggregation, gather and join-agg.

The blocked one-hot formulation (ops/blocked.py, pallas/agg.py) builds a
``[block, s_loc]`` one-hot per block — n·s_loc VPU work just to construct the
mask, which caps grouped aggregation at ~1-2 Tops (BENCH_KERNELS round 3).
These kernels factor the slot index instead:

    rel = hi·128 + lo       ⇒      onehot(rel) = onehot(hi) ⊗ onehot(lo)

so every count/sum/gather collapses to an MXU matmul of two SMALL one-hots:

* grouped count:   cnt[hi,lo]  = Σ_b oh_hi[b,hi]·oh_lo[b,lo]   = oh_hiᵀ @ oh_lo
* grouped sum:     sum[hi,lo]  = Σ_b w[b]·oh_hi·oh_lo          (w = 8-bit limbs)
* join gather:     g[b]        = Σ_lo oh_lo[b,lo]·(oh_hi @ win)[b,lo]

One-hot build cost drops from n·s_loc to n·(128 + nhi) VPU ops; the matmuls
ride the MXU at its native bf16 rate.  Exactness: one-hot entries and 8-bit
limbs (0..255) are bf16-exact, the MXU accumulates in f32, and block partials
stay ≤ 4096·255 < 2²⁴.  min/max do not distribute over the outer product, so
they keep a masked VPU reduction — but over a TIGHT window of s_loc+128 slots
(128-aligned base) whose result is rolled into the 1024-aligned accumulator
frame, instead of the old 2·s_loc double window.

All accumulators live in VMEM across the sequential grid (HBM traffic = one
streaming read of the rows + one final writeback) — this is why the factored
formulation must be Pallas: in XLA the one-hot matmul operands round-trip HBM
at every block (~3 GB per 4M rows, measured round 4, /tmp probe).

Escape semantics match ops/blocked.py: valid (for joins: in-span) rows whose
key falls outside the block's tight window — or beyond the output capacity —
raise a flag and callers fall back to the scatter/general path; locality
affects speed, never semantics.

Reference counterpart being replaced: DataFusion's hash-aggregate /
repartition kernels that Flock executes per stage
(flock/src/transmute.rs:77-109, runtime/context.rs:172-216).
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
MAX_SUM_ROWS = (2**31 - 1) // 255   # int32 limb-accumulator bound
_ROWCHUNK = 1024    # min/max masked-reduce row tile (1-D value slices must
                    # stay 1024-granular — Mosaic constraint, probed round 4)


def _acc_width(fn: str) -> int:
    return 4 if fn in ("sum", "count_sum") else 1


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _cparams():
    """Raise the Mosaic scoped-VMEM budget: the 16 MB default is a COMPILER
    limit, not the hardware's (v5e VMEM is far larger).  Round 4's long tail
    of opaque remote-compile failures all turned out to be scoped-VMEM OOMs
    (the tunnel usually swallows the diagnostic; one surfaced: 'Scoped
    allocation ... exceeded scoped vmem limit').  100 MB covers every kernel
    here with headroom; real over-subscription still fails loudly."""
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def enabled() -> bool:
    import os

    v = os.environ.get("FLOCK_TPU_PALLAS")
    if v is not None:
        return v != "0"
    return jax.default_backend() == "tpu"


def agg_preferred(aggs) -> bool:
    """Evidence-based default (measured v5e, round 4, RTT-amortized):
    count/sum aggregations run ~2.6 ms per 4M rows vs 13-22 ms for the XLA
    blocked scan (5-8×), and sum+count+max is 1.6× ahead; but each min/max
    adds a masked VPU reduce over the FULL aligned window, so with ≥2
    min/max aggs and no sum the factored kernel LOSES to the XLA blocked
    scan (q12's count+min+max regressed 31→17.5M rows/s in the sweep before
    this gate).  FLOCK_TPU_FACTORED=1 forces it; FLOCK_TPU_NO_FACTORED=1
    restores the previous dispatch entirely."""
    import os

    if os.environ.get("FLOCK_TPU_FACTORED") == "1":
        return True
    if os.environ.get("FLOCK_TPU_NO_FACTORED"):
        return False
    fns = [fn for _, fn, _ in aggs]
    if any(f in ("sum", "count_sum") for f in fns):
        return True
    return sum(f in ("min", "max") for f in fns) <= 1


def join_preferred() -> bool:
    """Factored gather / join-agg kernels: opt-in (FLOCK_TPU_FACTORED=1)
    until the backend compile crash is resolved (see agg_preferred)."""
    import os

    return os.environ.get("FLOCK_TPU_FACTORED") == "1"


def agg_eligible(aggs, n_rows: int, s_loc: int,
                 out_capacity: int | None = None) -> bool:
    """Static eligibility for ``pallas_factored_agg`` (int32 columns are the
    caller's precondition).  VMEM budget: nacc+1 span accumulators (each
    span_pad·4 bytes, VMEM-resident across the grid) plus ~24 MB of block
    temporaries must fit the raised 100 MB scoped limit (_cparams)."""
    fns = [fn for _, fn, _ in aggs]
    if not set(fns) <= {"count", "count_sum", "sum", "min", "max"}:
        return False
    if set(fns) & {"sum", "count_sum"} and n_rows > MAX_SUM_ROWS:
        return False
    if s_loc > 2048:
        return False
    nacc = sum(_acc_width(f) for f in fns)
    if nacc > 10:
        return False
    if out_capacity is not None:
        span_pad = _round_up(out_capacity, 1024)
        if (nacc + 1) * span_pad * 4 + 24 * 2**20 > 96 * 2**20:
            return False
    return True


def _windows(s_loc: int):
    """(tight window, aligned window) sizes.  Mosaic constraint (probed on
    v5e, round 4): 1-D VMEM values/slices must stay 1024-element-granular,
    and dynamic rotates lower only row-granular on [*, 128] — so the tight
    window W_t (covering [base_t128, base_t128+s_loc+128) from a 128-aligned
    base) rounds up to a 1024 multiple, and the aligned window W_a adds one
    full 1024 unit so the worst base offset (896) never wraps the roll."""
    w_t = _round_up(s_loc + 128, 1024)
    w_a = w_t + 1024
    return w_t, w_a


def _factor_block(keys, member, m0, s_loc, span_pad):
    """Shared per-block factorization.

    ``member`` marks rows that MUST land in the window (valid rows for
    aggregation; valid in-span rows for joins).  Returns
    (ok, base_a, base_t128, rel_t, lo, hi, escape_pred)."""
    w_t, w_a = _windows(s_loc)
    rel_all = keys - m0
    base_t = jnp.min(jnp.where(member, rel_all, I32_MAX))
    base_t128 = jnp.clip(base_t & ~jnp.int32(127), 0, span_pad - w_a)
    base_a = base_t128 & ~jnp.int32(1023)
    rel_t = rel_all - base_t128
    ok = member & (rel_t >= 0) & (rel_t < w_t)
    esc = jnp.max(jnp.where(member & ~ok, 1, 0)) > 0
    rel_a = rel_all - base_a
    lo = jnp.where(ok, rel_a & 127, 128)      # sentinel → zero oh_lo row
    hi = rel_a >> 7                           # non-ok rows zeroed via lo
    return ok, base_a, base_t128, rel_t, lo, hi, esc


def _oh_lo(lo, block):
    iota = jax.lax.broadcasted_iota(jnp.int32, (block, 128), 1)
    return (lo[:, None] == iota).astype(jnp.bfloat16)            # [B, 128]


def _oh_hi_t(hi, nhi, block):
    iota = jax.lax.broadcasted_iota(jnp.int32, (nhi, block), 0)
    return (hi[None, :] == iota).astype(jnp.bfloat16)            # [nhi, B]


def _oh_hi(hi, nhi, block):
    iota = jax.lax.broadcasted_iota(jnp.int32, (block, nhi), 1)
    return (hi[:, None] == iota).astype(jnp.bfloat16)            # [B, nhi]


def _masked_minmax(rel_t, ok, vals, w_t, fn):
    """Tight-window masked reduction, tiled over row chunks (bounds the
    [rows, W_t] int32 temporary to _ROWCHUNK·W_t·4 bytes).

    The row mask folds into the index as a sentinel BEFORE the broadcast
    compare: a [N,1] bool broadcast against [N,W] crashes the backend
    Mosaic compiler (probed round 4), a plain == compare does not."""
    block = rel_t.shape[0]
    sent = _SENTINEL[fn]
    red = jnp.min if fn == "min" else jnp.max
    mrg = jnp.minimum if fn == "min" else jnp.maximum
    rel_c = jnp.where(ok, rel_t, w_t)          # w_t → matches no window slot
    out = jnp.full((w_t,), sent, jnp.int32)
    iota_t = jax.lax.broadcasted_iota(jnp.int32, (_ROWCHUNK, w_t), 1)
    for c in range(0, block, _ROWCHUNK):
        r = rel_c[c:c + _ROWCHUNK]
        v = vals[c:c + _ROWCHUNK]
        hit = r[:, None] == iota_t
        out = mrg(out, red(jnp.where(hit, v[:, None], sent), axis=0))
    return out


def _place_aligned(win_t, shift128, w_a, fill, interpret):
    """Rotate a tight-window vector into the aligned [W_a] frame at its
    dynamic offset (shift128 ∈ {0,128,…,896}; no wraparound: W_t+1024 = W_a).
    The shift is a 128-multiple, so the rotate moves whole (sublane, lane)
    rows of the [W/128, 128] view — the only dynamic-rotate form Mosaic
    lowers (probed round 4); interpret mode uses jnp.roll."""
    w_t = win_t.shape[0]
    w2d = win_t.reshape(w_t // 128, 128)
    padded = jnp.concatenate(
        [w2d, jnp.full(((w_a - w_t) // 128, 128), fill, win_t.dtype)],
        axis=0)
    if interpret:
        return jnp.roll(padded, shift128 >> 7, axis=0).reshape(w_a)
    return pltpu.roll(padded, shift128 >> 7, 0).reshape(w_a)


def _load_window(ref, base_a, w_a):
    """1024-chunked aligned window load (see _accumulate's alignment rule)."""
    chunks = []
    for k in range(w_a // 1024):
        b = pl.multiple_of(base_a + k * 1024, 1024)
        chunks.append(ref[pl.ds(b, 1024)])
    return jnp.concatenate(chunks)


MAX_GATHER_PLANES = 8   # one [nhi, planes·128] dot; a second LIVE dot in a
                        # gather kernel crashes the backend (probed round 4)


def _limb_plan(slot_names, limbs: dict | None):
    """Per-column limb counts (default 4 = full int32).  Columns hinted with
    fewer limbs (3 ⇒ values in [0, 2²⁴), 1 ⇒ [0, 2⁸)) keep the total window
    plane count within MAX_GATHER_PLANES; callers verify the hinted ranges
    at runtime and escape when violated (slot_range_ok)."""
    limbs = limbs or {}
    return {c: int(limbs.get(c, 4)) for c in slot_names}


def gather_planes(slot_names, limbs: dict | None) -> int:
    lp = _limb_plan(slot_names, limbs)
    return 1 + sum(lp.values())


def slot_range_ok(slot_cols, present, limbs: dict | None):
    """Runtime verification of limb-count hints: every present slot value of
    a <4-limb column must lie in [0, 2^(8·limbs)).  Returns a bool scalar;
    callers OR its negation into the escape flag (results are discarded on
    escape, so in-range arithmetic never depends on the check)."""
    lp = _limb_plan(slot_cols, limbs)
    ok = jnp.asarray(True)
    for c, nl in lp.items():
        if nl >= 4:
            continue
        v = slot_cols[c].astype(jnp.int64)
        lim = np.int64(1) << (8 * nl)
        bad = present & ((v < 0) | (v >= lim))
        ok = ok & ~jnp.any(bad)
    return ok


def _gather_rows(hi, oh_lo, base_a, w_a, packed_ref, span_pad, slot_names,
                 block, limbs=None):
    """Gather presence + slot columns to rows: ONE [B,nhi] @ [nhi, C·128]
    MXU matmul over 8-bit limb windows, then an oh_lo-weighted row sum.

    ``packed_ref`` holds present + every slot column FLATTENED into one
    [(1+C)·span_pad] int32 ref — a kernel with two or more span-shaped input
    refs crashes the backend Mosaic compiler (probed round 4), one packed
    ref with 1024-aligned per-plane offsets lowers fine.
    Returns (g: list of [B] f32, limb_idx)."""
    lp = _limb_plan(slot_names, limbs)
    nhi = w_a // 128
    wins = [_load_window(packed_ref, base_a, w_a).astype(jnp.bfloat16)]
    limb_idx = []
    for ci, c in enumerate(slot_names):
        v = _load_window(packed_ref, (ci + 1) * span_pad + base_a, w_a)
        nl = lp[c]
        for j in range(nl):
            # the top FULL-WIDTH limb stays signed so the shift
            # reconstruction preserves negative int32 values (bf16-exact:
            # −128..255); hinted columns are verified non-negative
            limb = ((v >> (8 * j)) & 0xFF) if j < nl - 1 or nl < 4 \
                else (v >> 24)
            wins.append(limb.astype(jnp.bfloat16))
            limb_idx.append((c, j))
    assert len(wins) <= MAX_GATHER_PLANES, (slot_names, lp)
    # ONE dot: minor dim = planes·128 ≤ 1024 (Mosaic constraint set, round 4)
    oh_hi = _oh_hi(hi, nhi, block)
    rhs = jnp.concatenate([w.reshape(nhi, 128) for w in wins], axis=1)
    m2 = jnp.dot(oh_hi, rhs, preferred_element_type=jnp.float32)
    # limbs combine in the f32 LANE domain first (exact: ≤3 8-bit limbs stay
    # < 2²⁴), so at most TWO lane reductions run per gathered column (+1 for
    # presence) — kernels with more than ~5 consumed lane reductions crash
    # the backend compiler (probed round 4); only the multiply+reduce forms
    # proven there are used (bool wheres / int shifts on [B,128] also crash)
    oh_lo_f = oh_lo.astype(jnp.float32)
    hit = jnp.sum(m2[:, 0:128] * oh_lo_f, axis=1)
    gathered = {}
    plane = 1
    for c in slot_names:
        nl = lp[c]
        low = m2[:, plane * 128:(plane + 1) * 128]
        for j in range(1, min(nl, 3)):
            low = low + m2[:, (plane + j) * 128:(plane + j + 1) * 128] \
                * jnp.float32(1 << (8 * j))
        acc = jnp.sum(low * oh_lo_f, axis=1).astype(jnp.int32)
        if nl == 4:
            top = jnp.sum(m2[:, (plane + 3) * 128:(plane + 4) * 128]
                          * oh_lo_f, axis=1)
            acc = acc + (top.astype(jnp.int32) << 24)
        gathered[c] = acc
        plane += nl
    return hit, gathered


def _stacked_agg_matmul(oh_hi_t, oh_lo, cols, aggs, widths, weight_bf):
    """Build the stacked lhs (count row block + sum-limb row blocks, each
    weighted) and run ONE MXU matmul.  Returns (parts [R, W_a], row_of,
    minmax list[(in_col, fn, acc offset)])."""
    rows = [oh_hi_t if weight_bf is None
            else oh_hi_t * weight_bf[None, :]]
    minmax = []
    row_of: dict[str, int] = {}
    off = 0
    for (in_col, fn, _out), w in zip(aggs, widths):
        if fn in ("sum", "count_sum") and in_col not in row_of:
            v = cols[in_col]
            row_of[in_col] = len(rows)
            for j in range(4):
                # top limb stays SIGNED (arithmetic v>>24, range [-128,127] —
                # exact in bf16) so sums over negative int32 values
                # reconstruct exactly: v = (v>>24)·2²⁴ + unsigned low limbs.
                # A masked top limb would be wrong by +2³² per negative row
                # (matches _gather_rows' signed-top-limb convention).
                sh = v >> (8 * j)
                limb = (sh if j == 3 else (sh & 0xFF)).astype(jnp.bfloat16)
                wrow = limb if weight_bf is None else limb * weight_bf
                rows.append(oh_hi_t * wrow[None, :])
        elif fn in ("min", "max"):
            minmax.append((in_col, fn, off))
        off += w
    lhs = jnp.concatenate(rows, axis=0)                  # [R·nhi, B]
    parts = jnp.dot(lhs, oh_lo, preferred_element_type=jnp.float32)
    nhi = oh_hi_t.shape[0]
    return parts.reshape(len(rows), nhi * 128), row_of, minmax


def _accumulate(parts, row_of, minmax, cols, aggs, widths, accs, acc_cnt,
                base_a, base_t128, rel_t, mask, w_t, w_a, interpret):
    def upd(acc, win, merge):
        # 1024-element chunks: Mosaic proves alignment of 1-D dynamic VMEM
        # slices only when the index is a multiple of the slice length
        for k in range(w_a // 1024):
            b = pl.multiple_of(base_a + k * 1024, 1024)
            acc[pl.ds(b, 1024)] = merge(acc[pl.ds(b, 1024)],
                                        win[k * 1024:(k + 1) * 1024])

    cnt_w = parts[0].astype(jnp.int32)
    upd(acc_cnt, cnt_w, jnp.add)
    off = 0
    for (in_col, fn, _out), w in zip(aggs, widths):
        if fn == "count":
            upd(accs[off], cnt_w, jnp.add)
        elif fn in ("sum", "count_sum"):
            r0 = row_of[in_col]
            for j in range(4):
                upd(accs[off + j], parts[r0 + j].astype(jnp.int32), jnp.add)
        off += w
    shift = base_t128 - base_a
    for in_col, fn, off in minmax:
        win_t = _masked_minmax(rel_t, mask, cols[in_col], w_t, fn)
        win_a = _place_aligned(win_t, shift, w_a, _SENTINEL[fn], interpret)
        mrg = jnp.minimum if fn == "min" else jnp.maximum
        upd(accs[off], win_a, mrg)


def _combine_outputs(outs, aggs, widths, span0, m, key_dtype):
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
    nacc = sum(widths)
    cnt, esc = outs[nacc][:span0], outs[nacc + 1]
    out_cols["__key"] = m + jnp.arange(span0, dtype=key_dtype)
    return out_cols, cnt > 0, esc[0] > 0


# -- grouped aggregation ------------------------------------------------------


def _agg_kernel(m_ref, keys_ref, valid_ref, *refs, col_names, aggs,
                s_loc, span_pad, block, interpret):
    w_t, w_a = _windows(s_loc)
    widths = [_acc_width(fn) for _, fn, _ in aggs]
    ncols = len(col_names)
    nacc = sum(widths)
    col_refs = dict(zip(col_names, refs[:ncols]))
    out_refs = refs[ncols:ncols + nacc]
    cnt_out, esc_out = refs[ncols + nacc:ncols + nacc + 2]
    accs = refs[ncols + nacc + 2:ncols + 2 * nacc + 2]
    acc_cnt, esc_acc = refs[ncols + 2 * nacc + 2:]

    i = pl.program_id(0)
    n_i = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        off = 0
        for (_, fn, _o), w in zip(aggs, widths):
            for j in range(w):
                accs[off + j][:] = jnp.full(
                    (span_pad,), _SENTINEL.get(fn, 0), jnp.int32)
            off += w
        acc_cnt[:] = jnp.zeros((span_pad,), jnp.int32)
        esc_acc[0] = jnp.int32(0)

    keys = keys_ref[:]
    valid = valid_ref[:] != 0
    rel_all = keys - m_ref[0]
    # rows beyond the declared capacity are overflow, not silent pad drops
    over = jnp.max(jnp.where(valid, rel_all, 0)) >= m_ref[1]
    ok, base_a, base_t128, rel_t, lo, hi, esc = _factor_block(
        keys, valid, m_ref[0], s_loc, span_pad)

    @pl.when(esc | over)
    def _():
        esc_acc[0] = jnp.int32(1)

    nhi = w_a // 128
    oh_lo = _oh_lo(lo, block)
    oh_hi_t = _oh_hi_t(hi, nhi, block)
    cols = {c: col_refs[c][:] for c in col_names}
    parts, row_of, minmax = _stacked_agg_matmul(
        oh_hi_t, oh_lo, cols, aggs, widths, None)
    _accumulate(parts, row_of, minmax, cols, aggs, widths, accs, acc_cnt,
                base_a, base_t128, rel_t, ok, w_t, w_a, interpret)

    @pl.when(i == n_i - 1)
    def _():
        for o, acc in zip(out_refs, accs):
            o[:] = acc[:]
        cnt_out[:] = acc_cnt[:]
        esc_out[0] = esc_acc[0]


def pallas_factored_agg(keys, valid, agg_cols, aggs, out_capacity: int,
                        block: int = 4096, s_loc: int = 1024,
                        interpret: bool = False):
    """Grouped aggregation over a dense key span, factored one-hot form.
    Same contract as ops/blocked.blocked_local_agg: returns (out_cols with
    __key, out_valid, escape); slot i holds key min+i."""
    n = keys.shape[0]
    _, w_a = _windows(s_loc)
    span_pad = max(_round_up(out_capacity, 1024), w_a)
    pad = (-n) % block
    kp = jnp.pad(keys, (0, pad))
    vp = jnp.pad(valid, (0, pad)).astype(jnp.int32)
    m = jnp.min(jnp.where(valid, keys, I32_MAX))

    col_names = tuple(sorted({c for c, f, _ in aggs
                              if f != "count" and c is not None}))
    cols = [jnp.pad(agg_cols[c], (0, pad)) for c in col_names]
    widths = [_acc_width(fn) for _, fn, _ in aggs]
    nacc = sum(widths)
    grid = ((n + pad) // block,)

    kernel = functools.partial(
        _agg_kernel, col_names=col_names, aggs=tuple(aggs),
        s_loc=s_loc, span_pad=span_pad, block=block, interpret=interpret)
    blockspec = pl.BlockSpec((block,), lambda i, *_: (i,))
    spanspec = pl.BlockSpec((span_pad,), lambda i, *_: (0,))
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[blockspec] * (2 + len(col_names)),
                out_specs=([spanspec] * (nacc + 1)
                           + [pl.BlockSpec(memory_space=pltpu.SMEM)]),
                scratch_shapes=([pltpu.VMEM((span_pad,), jnp.int32)]
                                * (nacc + 1)
                                + [pltpu.SMEM((1,), jnp.int32)]),
            ),
            out_shape=([jax.ShapeDtypeStruct((span_pad,), jnp.int32)]
                       * (nacc + 1)
                       + [jax.ShapeDtypeStruct((1,), jnp.int32)]),
            interpret=interpret,
            compiler_params=_cparams(),
        )(jnp.stack([m.astype(jnp.int32),
                     jnp.asarray(out_capacity, jnp.int32) + m * 0]),
          kp, vp, *cols)

    return _combine_outputs(outs, aggs, widths, out_capacity, m, keys.dtype)


# -- join gather --------------------------------------------------------------


def _gather_kernel(m_ref, keys_ref, valid_ref, *refs, slot_names,
                   s_loc, span_pad, block, limbs):
    ns = len(slot_names)
    packed_ref = refs[0]
    # gathered cols + hit PACK into one moving output ref: more than two
    # block-indexed (moving) output refs crash the backend compiler
    # (probed round 4; span-shaped constant-index outputs are unaffected)
    out_ref, esc_out = refs[1:3]
    esc_acc = refs[3]

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        esc_acc[0] = jnp.int32(0)

    keys = keys_ref[:]
    valid = valid_ref[:] != 0
    _, w_a = _windows(s_loc)
    # keys outside the whole span are join MISSES, not locality escapes
    rel_all = keys - m_ref[0]
    candidate = valid & (rel_all >= 0) & (rel_all < m_ref[1])
    ok, base_a, _bt, _rt, lo, hi, esc = _factor_block(
        keys, candidate, m_ref[0], s_loc, span_pad)

    @pl.when(esc)
    def _():
        esc_acc[0] = jnp.int32(1)

    oh_lo = _oh_lo(lo, block)
    hit_f, gathered = _gather_rows(hi, oh_lo, base_a, w_a, packed_ref,
                                   span_pad, slot_names, block, limbs)
    for ci, c in enumerate(slot_names):
        out_ref[pl.ds(ci * block, block)] = gathered[c]
    out_ref[pl.ds(ns * block, block)] = ((hit_f > 0.5) & ok).astype(jnp.int32)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        esc_out[0] = esc_acc[0]


def pallas_factored_gather(slot_cols, present, m, probe_keys, probe_valid,
                           take: list[str], block: int = 4096,
                           s_loc: int = 512, interpret: bool = False,
                           limbs: dict | None = None):
    """Drop-in for ops/blocked.blocked_local_join: gathers build slot columns
    to probe rows.  ``limbs`` hints per-column limb counts (see _limb_plan);
    hinted ranges are verified at runtime into the escape flag.
    Returns (gathered dict, hit, escape)."""
    span = present.shape[0]
    n = probe_keys.shape[0]
    _, w_a = _windows(s_loc)
    span_pad = max(_round_up(span, 1024), w_a)
    spad = span_pad - span
    pad = (-n) % block
    kp = jnp.pad(probe_keys, (0, pad))
    vp = jnp.pad(probe_valid, (0, pad)).astype(jnp.int32)
    slot_names = tuple(take)
    range_ok = slot_range_ok(slot_cols, present, limbs)
    # present + slot columns flattened into ONE span input (≥2 span-shaped
    # input refs crash the backend compiler — see _gather_rows)
    packed = jnp.concatenate(
        [jnp.pad(present, (0, spad)).astype(jnp.int32)]
        + [jnp.pad(slot_cols[c].astype(jnp.int32), (0, spad))
           for c in slot_names])
    grid = ((n + pad) // block,)
    npk = len(slot_names) + 1   # gathered planes + hit in one moving output

    kernel = functools.partial(
        _gather_kernel, slot_names=slot_names, s_loc=s_loc,
        span_pad=span_pad, block=block, limbs=limbs)
    blockspec = pl.BlockSpec((block,), lambda i, *_: (i,))
    packspec = pl.BlockSpec(((len(slot_names) + 1) * span_pad,),
                            lambda i, *_: (0,))
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[blockspec] * 2 + [packspec],
                out_specs=([pl.BlockSpec((npk * block,), lambda i, *_: (i,))]
                           + [pl.BlockSpec(memory_space=pltpu.SMEM)]),
                scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
            ),
            out_shape=([jax.ShapeDtypeStruct((npk * (n + pad),), jnp.int32)]
                       + [jax.ShapeDtypeStruct((1,), jnp.int32)]),
            interpret=interpret,
            compiler_params=_cparams(),
        )(jnp.stack([m.astype(jnp.int32),
                     jnp.asarray(span, jnp.int32) + m * 0]),
          kp, vp, packed)

    packed_out = outs[0].reshape((n + pad) // block, npk, block)
    out = {c: packed_out[:, i, :].reshape(-1)[:n]
           for i, c in enumerate(slot_names)}
    hit = packed_out[:, len(slot_names), :].reshape(-1)[:n] > 0
    esc = outs[1]
    return out, hit, (esc[0] > 0) | ~range_ok


# -- fused join + filter + aggregate ------------------------------------------


def _join_agg_kernel(m_ref, *refs, probe_names, slot_names, replay, aggs,
                     s_loc, span_pad, block, interpret, limbs):
    np_, ns = len(probe_names), len(slot_names)
    widths = [_acc_width(fn) for _, fn, _ in aggs]
    nacc = sum(widths)
    probe_refs = dict(zip(probe_names, refs[:np_]))
    valid_ref = refs[np_]
    packed_ref = refs[np_ + 1]
    base = np_ + 2
    out_refs = refs[base:base + nacc]
    cnt_out, esc_out = refs[base + nacc:base + nacc + 2]
    accs = refs[base + nacc + 2:base + 2 * nacc + 2]
    acc_cnt, esc_acc = refs[base + 2 * nacc + 2:]
    keys_ref = probe_refs[probe_names[0]]

    i = pl.program_id(0)
    n_i = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        off = 0
        for (_, fn, _o), w in zip(aggs, widths):
            for j in range(w):
                accs[off + j][:] = jnp.full(
                    (span_pad,), _SENTINEL.get(fn, 0), jnp.int32)
            off += w
        acc_cnt[:] = jnp.zeros((span_pad,), jnp.int32)
        esc_acc[0] = jnp.int32(0)

    keys = keys_ref[:]
    valid = valid_ref[:] != 0
    w_t, w_a = _windows(s_loc)
    rel_all = keys - m_ref[0]
    candidate = valid & (rel_all >= 0) & (rel_all < m_ref[1])
    ok, base_a, base_t128, rel_t, lo, hi, esc = _factor_block(
        keys, candidate, m_ref[0], s_loc, span_pad)

    @pl.when(esc)
    def _():
        esc_acc[0] = jnp.int32(1)

    # 1) gather presence + every taken build column to the probe rows
    oh_lo = _oh_lo(lo, block)
    hit_f, gathered = _gather_rows(hi, oh_lo, base_a, w_a, packed_ref,
                                   span_pad, slot_names, block, limbs)
    hit = (hit_f > 0.5) & ok
    cols = {k: r[:] for k, r in probe_refs.items()}
    cols.update(gathered)

    # 2) replay the Filter/Project chain per-row (flat [block] arrays; the
    #    same closures the broadcast formulation uses — elementwise ops on
    #    same-shape arrays)
    cols, pair = replay(cols, hit)
    pair = pair & hit

    # 3) factored aggregation keyed by the probe key, weighted by ``pair``
    nhi = w_a // 128
    oh_hi_t = _oh_hi_t(hi, nhi, block)
    parts, row_of, minmax = _stacked_agg_matmul(
        oh_hi_t, oh_lo, cols, aggs, widths, pair.astype(jnp.bfloat16))
    _accumulate(parts, row_of, minmax, cols, aggs, widths, accs, acc_cnt,
                base_a, base_t128, rel_t, pair, w_t, w_a, interpret)

    @pl.when(i == n_i - 1)
    def _():
        for o, acc in zip(out_refs, accs):
            o[:] = acc[:]
        cnt_out[:] = acc_cnt[:]
        esc_out[0] = esc_acc[0]


def pallas_factored_join_agg(slot_cols, present, m, probe_cols, probe_valid,
                             probe_key, replay, aggs, block: int = 4096,
                             s_loc: int = 512, interpret: bool = False,
                             limbs: dict | None = None):
    """Drop-in for ops/blocked.blocked_join_aggregate with ROW-WISE replay:
    build columns are gathered to probe rows first (factored matmul gather),
    then the Filter/Project chain replays on flat [block] arrays, then the
    aggregation runs weighted by the joined+filtered pair mask.

    Returns (out_cols with __key, out_valid, escape); slot i holds key m+i.
    """
    span0 = present.shape[0]
    n = probe_valid.shape[0]
    _, w_a = _windows(s_loc)
    span_pad = max(_round_up(span0, 1024), w_a)
    spad = span_pad - span0
    slot_names = tuple(sorted(slot_cols))
    packed = jnp.concatenate(
        [jnp.pad(present, (0, spad)).astype(jnp.int32)]
        + [jnp.pad(slot_cols[c].astype(jnp.int32), (0, spad))
           for c in slot_names])
    pad = (-n) % block
    pcols = {k: jnp.pad(v, (0, pad)) for k, v in probe_cols.items()}
    pvalid = jnp.pad(probe_valid, (0, pad)).astype(jnp.int32)
    probe_names = [probe_key] + [k for k in sorted(pcols) if k != probe_key]
    widths = [_acc_width(fn) for _, fn, _ in aggs]
    nacc = sum(widths)
    grid = ((n + pad) // block,)

    range_ok = slot_range_ok(slot_cols, present, limbs)
    kernel = functools.partial(
        _join_agg_kernel, probe_names=tuple(probe_names),
        slot_names=slot_names, replay=replay, aggs=tuple(aggs),
        s_loc=s_loc, span_pad=span_pad, block=block, interpret=interpret,
        limbs=limbs)
    blockspec = pl.BlockSpec((block,), lambda i, *_: (i,))
    spanspec = pl.BlockSpec((span_pad,), lambda i, *_: (0,))
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=([blockspec] * (len(probe_names) + 1)
                          + [pl.BlockSpec(
                              ((len(slot_names) + 1) * span_pad,),
                              lambda i, *_: (0,))]),
                out_specs=([spanspec] * (nacc + 1)
                           + [pl.BlockSpec(memory_space=pltpu.SMEM)]),
                scratch_shapes=([pltpu.VMEM((span_pad,), jnp.int32)]
                                * (nacc + 1)
                                + [pltpu.SMEM((1,), jnp.int32)]),
            ),
            out_shape=([jax.ShapeDtypeStruct((span_pad,), jnp.int32)]
                       * (nacc + 1)
                       + [jax.ShapeDtypeStruct((1,), jnp.int32)]),
            interpret=interpret,
            compiler_params=_cparams(),
        )(jnp.stack([m.astype(jnp.int32),
                     jnp.asarray(span0, jnp.int32) + m * 0]),
          *[pcols[k] for k in probe_names], pvalid, packed)

    out_cols, ovalid, esc = _combine_outputs(outs, aggs, widths, span0, m,
                                             jnp.int32)
    return out_cols, ovalid, esc | ~range_ok


def join_agg_eligible(slot_cols, probe_cols, replay, aggs,
                      limbs: dict | None = None) -> bool:
    """Static eligibility for ``factored_join_agg_rebased``: same contract as
    pallas/join_agg.eligible — int32/int64 columns (int64 rebased), int32
    accumulated values, limb-safe row counts — plus the single-dot window
    plane budget (gather_planes ≤ MAX_GATHER_PLANES; limb hints shrink
    wide column sets under it, verified at runtime)."""
    if gather_planes(tuple(slot_cols), limbs) > MAX_GATHER_PLANES:
        return False
    fns = [fn for _, fn, _ in aggs]
    if not set(fns) <= {"count", "count_sum", "sum", "min", "max"}:
        return False
    if sum(_acc_width(f) for f in fns) > 10:
        return False
    cols = list(slot_cols.values()) + list(probe_cols.values())
    if not all(c.dtype in (jnp.int32, jnp.int64) for c in cols):
        return False
    n = next(iter(probe_cols.values())).shape[0]
    if set(fns) & {"sum", "count_sum"} and n > MAX_SUM_ROWS:
        return False
    from flock_tpu.ops import blocked

    try:
        dts = blocked.fused_acc_dtypes(slot_cols, probe_cols, replay,
                                       list(aggs))
    except Exception:  # noqa: BLE001 — any trace failure ⇒ take the XLA path
        return False
    return all(dt == jnp.dtype(jnp.int32) for dt in dts.values())


def factored_join_agg_rebased(slot_cols, present, m, probe_cols, probe_valid,
                              probe_key, replay, aggs, block: int = 4096,
                              s_loc: int = 512, interpret: bool = False,
                              limbs: dict | None = None):
    """``pallas_factored_join_agg`` with automatic int64→int32 rebasing (the
    same scheme as pallas/join_agg.fused_join_aggregate_rebased: all int64
    columns shift by one shared window minimum, preserving comparisons and
    differences — the only uses the engine's plan segments make of
    timestamps).  A window whose int64 values span ≥ 2³¹ raises the escape
    flag instead."""
    import functools as _ft

    i64_probe = [k for k, v in probe_cols.items() if v.dtype == jnp.int64]
    i64_slot = [k for k, v in slot_cols.items() if v.dtype == jnp.int64]
    if not i64_probe and not i64_slot:
        return pallas_factored_join_agg(
            slot_cols, present, m, probe_cols, probe_valid, probe_key,
            replay, aggs, block=block, s_loc=s_loc, interpret=interpret,
            limbs=limbs)

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
    ok64 = (hi <= base + np.int64(2**31 - 2)) | (hi < base)

    def rb(v):
        return jnp.clip(v - base, 0, np.int64(2**31 - 2)).astype(jnp.int32)

    pc = {k: (rb(v) if k in i64_probe else v) for k, v in probe_cols.items()}
    sc = {k: (rb(v) if k in i64_slot else v) for k, v in slot_cols.items()}
    out, valid, esc = pallas_factored_join_agg(
        sc, present, m, pc, probe_valid, probe_key, replay, aggs,
        block=block, s_loc=s_loc, interpret=interpret, limbs=limbs)
    return out, valid, esc | ~ok64


# -- broadcast fused join + filter + aggregate (tight window) -----------------


def _bcast_windows(s_loc: int):
    """(effective window, frame, aligned frame) for the broadcast kernel.
    The effective window equals the 1024-granular frame: every 1-D window
    value must stay 1024-granular (a 640-wide variant would need sub-frame
    slices that do not lower), so the win over the old double-window kernel
    is the HALVED width (1024 vs 2048 for q4's s_loc=512) plus zero HBM
    accumulator traffic."""
    w_t = _round_up(s_loc + 128, 1024)
    return w_t, w_t, w_t + 1024


def _bcast_kernel(m_ref, *refs, probe_names, slot_names, replay, aggs,
                  s_loc, span_pad, block, interpret):
    np_, ns = len(probe_names), len(slot_names)
    widths = [_acc_width(fn) for _, fn, _ in aggs]
    nacc = sum(widths)
    probe_refs = dict(zip(probe_names, refs[:np_]))
    valid_ref = refs[np_]
    packed_ref = refs[np_ + 1]
    base = np_ + 2
    out_refs = refs[base:base + nacc]
    cnt_out, esc_out = refs[base + nacc:base + nacc + 2]
    accs = refs[base + nacc + 2:base + 2 * nacc + 2]
    acc_cnt, esc_acc = refs[base + 2 * nacc + 2:]
    keys_ref = probe_refs[probe_names[0]]

    i = pl.program_id(0)
    n_i = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        off = 0
        for (_, fn, _o), w in zip(aggs, widths):
            for j in range(w):
                accs[off + j][:] = jnp.full(
                    (span_pad,), _SENTINEL.get(fn, 0), jnp.int32)
            off += w
        acc_cnt[:] = jnp.zeros((span_pad,), jnp.int32)
        esc_acc[0] = jnp.int32(0)

    w_eff, w_t, w_a = _bcast_windows(s_loc)
    keys = keys_ref[:]
    valid = valid_ref[:] != 0
    rel_all = keys - m_ref[0]
    candidate = valid & (rel_all >= 0) & (rel_all < m_ref[1])
    base_t = jnp.min(jnp.where(candidate, rel_all, I32_MAX))
    base_t128 = jnp.clip(base_t & ~jnp.int32(127), 0, span_pad - w_a)
    base_a = base_t128 & ~jnp.int32(1023)
    rel_t = rel_all - base_t128
    ok = candidate & (rel_t >= 0) & (rel_t < w_eff)

    @pl.when(jnp.max(jnp.where(candidate & ~(
        (rel_t >= 0) & (rel_t < w_eff)), 1, 0)) > 0)
    def _():
        esc_acc[0] = jnp.int32(1)

    # one-hot over the TIGHT window (pair mask lives at [B, w_eff])
    rel_c = jnp.where(ok, rel_t, w_eff)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (block, w_eff), 1)
    onehot = rel_c[:, None] == iota_w

    # windows load from the 1024-aligned base (legal), then the tight
    # window view is rows [shift128 : shift128+w_eff) — taken by rolling
    # the frame so the tight window starts at 0
    shift = base_t128 - base_a

    def load_tight(plane):
        fr = _load_window(packed_ref, plane * span_pad + base_a, w_a)
        f2d = fr.reshape(w_a // 128, 128)
        # rotate UP by shift rows expressed as a positive rotation (a
        # negative dynamic shift may not lower)
        up = (w_a >> 7) - (shift >> 7)
        rolled = (jnp.roll(f2d, up, axis=0) if interpret
                  else pltpu.roll(f2d, up, 0))
        return rolled.reshape(w_a)[:w_t]

    pres_w = load_tight(0)
    pair = onehot & (pres_w > 0)[None, :]

    bcast = {k: r[:][:, None] for k, r in probe_refs.items()}
    win_cols = {}
    for ci, c in enumerate(slot_names):
        win_cols[c] = load_tight(ci + 1)
        bcast[c] = win_cols[c][None, :]
    bcast, pair = replay(bcast, pair)

    pair_bf = pair.astype(jnp.bfloat16)
    # stacked MXU matmul: count row + probe-side integer-sum limbs
    sum_rows = [jnp.ones((block,), jnp.bfloat16)]
    row_of = {}
    for in_col, fn, _out in aggs:
        if fn in ("sum", "count_sum") and in_col in probe_refs \
                and in_col not in row_of:
            v = probe_refs[in_col][:]
            row_of[in_col] = len(sum_rows)
            for j in range(4):
                sum_rows.append(((v >> (8 * j)) & 0xFF).astype(jnp.bfloat16))
    stacked = jnp.dot(jnp.stack(sum_rows), pair_bf,
                      preferred_element_type=jnp.float32)   # [R, w_eff]
    cnt_w = stacked[0].astype(jnp.int32)

    def place(vec_eff, fill):
        # [w_eff] → [w_a] frame at the window's aligned offset (1-D concat
        # at 1024 granularity + row-granular rotate — the proven forms)
        padded = jnp.concatenate(
            [vec_eff, jnp.full((w_a - w_eff,), fill, vec_eff.dtype)])
        p2 = padded.reshape(w_a // 128, 128)
        rolled = (jnp.roll(p2, shift >> 7, axis=0) if interpret
                  else pltpu.roll(p2, shift >> 7, 0))
        return rolled.reshape(w_a)

    def upd(acc, win, merge):
        for kk in range(w_a // 1024):
            b = pl.multiple_of(base_a + kk * 1024, 1024)
            acc[pl.ds(b, 1024)] = merge(acc[pl.ds(b, 1024)],
                                        win[kk * 1024:(kk + 1) * 1024])

    upd(acc_cnt, place(cnt_w, 0), jnp.add)
    off = 0
    for (in_col, fn, _out), w in zip(aggs, widths):
        if fn == "count":
            upd(accs[off], place(cnt_w, 0), jnp.add)
        elif fn in ("sum", "count_sum"):
            if in_col in row_of:
                r0 = row_of[in_col]
                for j in range(4):
                    upd(accs[off + j],
                        place(stacked[r0 + j].astype(jnp.int32), 0), jnp.add)
            else:   # build-side: constant down rows ⇒ sum = col · count
                v = bcast[in_col].reshape(w_eff)
                for j in range(4):
                    limb = ((v >> (8 * j)) & 0xFF) if j < 3 else (v >> 24)
                    upd(accs[off + j],
                        place(limb * cnt_w, 0), jnp.add)
        elif fn in ("min", "max"):
            sent = _SENTINEL[fn]
            mrg = jnp.minimum if fn == "min" else jnp.maximum
            src = bcast[in_col]
            if src.shape == (block, 1):       # probe-side masked reduce
                red = jnp.min if fn == "min" else jnp.max
                v = jnp.broadcast_to(src, (block, w_eff))
                masked = jnp.where(pair, v, sent)
                win_v = red(masked, axis=0)
            else:                              # build-side: gate on count
                win_v = jnp.where(cnt_w > 0, src.reshape(w_eff), sent)
            upd(accs[off], place(win_v, sent), mrg)
        off += w

    @pl.when(i == n_i - 1)
    def _():
        for o, acc in zip(out_refs, accs):
            o[:] = acc[:]
        cnt_out[:] = acc_cnt[:]
        esc_out[0] = esc_acc[0]


def pallas_bcast_join_agg(slot_cols, present, m, probe_cols, probe_valid,
                          probe_key, replay, aggs, block: int = 4096,
                          s_loc: int = 512, interpret: bool = False):
    """Broadcast-window fused join+filter+aggregate: the old formulation's
    [B, window] pair mask at a tight single 1024 window (vs the old 2048
    double window), VMEM-resident span accumulators, roll-based frame
    placement.  Same contract and replay convention as
    blocked_join_aggregate.

    STATUS (round 4, measured): row-exact in interpret mode (test_pallas)
    and compiles at full scale for sum-free agg sets (sum-limb accumulator
    variants SIGABRT the backend at 256K spans).  At the real q4 shape it
    measures 20.4 ms/4M rows vs 14.3 ms for the XLA fused scan — the 1-D
    1024-granularity constraint forces this kernel's window to 1024 slots
    while XLA windows exactly s_loc=512, and per-op rates are equal, so it
    LOSES 1.4× and is NOT dispatched.  A sub-1024 Pallas window needs
    sub-frame 1-D slicing the backend does not lower; kept as the
    starting point if that constraint lifts."""
    span0 = present.shape[0]
    n = probe_valid.shape[0]
    _, _, w_a = _bcast_windows(s_loc)
    span_pad = max(_round_up(span0, 1024), w_a)
    spad = span_pad - span0
    slot_names = tuple(sorted(slot_cols))
    packed = jnp.concatenate(
        [jnp.pad(present, (0, spad)).astype(jnp.int32)]
        + [jnp.pad(slot_cols[c].astype(jnp.int32), (0, spad))
           for c in slot_names])
    pad = (-n) % block
    pcols = {k: jnp.pad(v, (0, pad)) for k, v in probe_cols.items()}
    pvalid = jnp.pad(probe_valid, (0, pad)).astype(jnp.int32)
    probe_names = [probe_key] + [k for k in sorted(pcols) if k != probe_key]
    widths = [_acc_width(fn) for _, fn, _ in aggs]
    nacc = sum(widths)
    grid = ((n + pad) // block,)

    kernel = functools.partial(
        _bcast_kernel, probe_names=tuple(probe_names),
        slot_names=slot_names, replay=replay, aggs=tuple(aggs),
        s_loc=s_loc, span_pad=span_pad, block=block, interpret=interpret)
    blockspec = pl.BlockSpec((block,), lambda i, *_: (i,))
    spanspec = pl.BlockSpec((span_pad,), lambda i, *_: (0,))
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=([blockspec] * (len(probe_names) + 1)
                          + [pl.BlockSpec(
                              ((len(slot_names) + 1) * span_pad,),
                              lambda i, *_: (0,))]),
                out_specs=([spanspec] * (nacc + 1)
                           + [pl.BlockSpec(memory_space=pltpu.SMEM)]),
                scratch_shapes=([pltpu.VMEM((span_pad,), jnp.int32)]
                                * (nacc + 1)
                                + [pltpu.SMEM((1,), jnp.int32)]),
            ),
            out_shape=([jax.ShapeDtypeStruct((span_pad,), jnp.int32)]
                       * (nacc + 1)
                       + [jax.ShapeDtypeStruct((1,), jnp.int32)]),
            interpret=interpret,
            compiler_params=_cparams(),
        )(jnp.stack([m.astype(jnp.int32),
                     jnp.asarray(span0, jnp.int32) + m * 0]),
          *[pcols[k] for k in probe_names], pvalid, packed)

    return _combine_outputs(outs, aggs, widths, span0, m, jnp.int32)
