"""Pallas TPU kernels: blocked one-hot grouped aggregation.

The XLA formulation (ops/blocked.py) streams the span accumulator through HBM
on every block step (dynamic_slice + dynamic_update_slice per block).  These
kernels keep the WHOLE span accumulator in VMEM scratch across the sequential
TPU grid — each block touches HBM only to read its rows; accumulator traffic
is on-chip.  Pattern per the Pallas guide: revisiting output + scratch
persistence across grid steps, scalar prefetch for the key minimum, 128-lane
aligned dynamic windows.

Two kernels:

* ``pallas_local_agg`` — the general grouped aggregation
  (count/count_sum/sum/min/max over int32 columns), the production override
  for ops/blocked.blocked_local_agg wired in kernels.dense_group_aggregate.
  Integer sums accumulate exactly as FOUR 8-bit-limb int32 span accumulators
  in VMEM (each limb's block partial rides an MXU f32 dot ≤ 2¹⁸ < 2²⁴,
  f32-exact; limb accumulators stay < 2³¹ for windows ≤ 8.4M rows — checked
  statically), combined to int64 outside the kernel.
* ``pallas_count_max_agg`` — the original fixed count+max pair (kept for
  microbenches/regression).

Escape semantics match ops/blocked.py: rows outside their block's aligned
2·s_loc window raise a flag and callers fall back.
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


def _agg_kernel(m_ref, keys_ref, valid_ref, val_ref,
                cnt_out, max_out, esc_out,
                acc_cnt, acc_max, esc_acc,
                *, block: int, s_loc: int, span: int):
    i = pl.program_id(0)
    n_i = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        acc_cnt[:] = jnp.zeros((span,), jnp.int32)
        acc_max[:] = jnp.full((span,), I32_MIN, jnp.int32)
        esc_acc[0] = jnp.int32(0)

    keys = keys_ref[:]
    valid = valid_ref[:] != 0
    vals = val_ref[:]

    rel_all = keys - m_ref[0]
    # 1D VMEM arrays tile as (8×128)=1024 elements: dynamic slices must be
    # provably 1024-aligned.  Align the window base DOWN to s_loc and cover a
    # 2·s_loc window as two aligned halves (blocks spanning ≤ s_loc+1 fit).
    base = jnp.min(jnp.where(valid, rel_all, I32_MAX))
    base = jnp.clip(base, 0, max(span - 2 * s_loc, 0))
    base = pl.multiple_of((base // s_loc) * s_loc, s_loc)
    base2 = pl.multiple_of(base + s_loc, s_loc)
    w2 = 2 * s_loc

    rel = rel_all - base
    ok = valid & (rel >= 0) & (rel < w2)

    # jnp.any lowers via a float proxy whose weak literals go f64
    # under x64 → Mosaic scalar error; int32 reduce_max is native
    @pl.when(jnp.max(jnp.where(valid & ~ok, 1, 0)) > 0)
    def _():
        esc_acc[0] = jnp.int32(1)

    rel_c = jnp.where(ok, rel, w2)
    iota = jax.lax.broadcasted_iota(jnp.int32, (block, w2), 1)
    onehot = rel_c[:, None] == iota

    cnt_w = jnp.sum(onehot.astype(jnp.int32), axis=0)
    max_w = jnp.max(jnp.where(onehot, vals[:, None], I32_MIN), axis=0)

    for b, sl in ((base, slice(0, s_loc)), (base2, slice(s_loc, w2))):
        acc_cnt[pl.ds(b, s_loc)] = acc_cnt[pl.ds(b, s_loc)] + cnt_w[sl]
        acc_max[pl.ds(b, s_loc)] = jnp.maximum(acc_max[pl.ds(b, s_loc)],
                                               max_w[sl])

    @pl.when(i == n_i - 1)
    def _():
        cnt_out[:] = acc_cnt[:]
        max_out[:] = acc_max[:]
        esc_out[0] = esc_acc[0]


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7))
def pallas_count_max_agg(keys: jax.Array, valid: jax.Array, vals: jax.Array,
                         m: jax.Array, span: int, block: int = 1024,
                         s_loc: int = 1024, interpret: bool = False):
    """count + max grouped by dense key over a static span.

    ``m`` is the minimum valid key (scalar int32).  Returns (counts [span],
    maxes [span], escape flag [1]).  ``span``, ``block``, ``s_loc`` must be
    multiples of 128; n must divide by block.
    """
    n = keys.shape[0]
    assert n % block == 0 and span % s_loc == 0 and s_loc % 1024 == 0
    assert span >= 2 * s_loc, (span, s_loc)
    grid = (n // block,)

    kernel = functools.partial(_agg_kernel, block=block, s_loc=s_loc,
                               span=span)
    # 32-bit trace context: weak-int64 scalars (jax_enable_x64 is on
    # engine-wide) hit an infinite Mosaic _convert_helper recursion
    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((block,), lambda i, *_: (i,)),
                    pl.BlockSpec((block,), lambda i, *_: (i,)),
                    pl.BlockSpec((block,), lambda i, *_: (i,)),
                ],
                out_specs=[
                    pl.BlockSpec((span,), lambda i, *_: (0,)),
                    pl.BlockSpec((span,), lambda i, *_: (0,)),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                ],
                scratch_shapes=[
                    pltpu.VMEM((span,), jnp.int32),
                    pltpu.VMEM((span,), jnp.int32),
                    pltpu.SMEM((1,), jnp.int32),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((span,), jnp.int32),
                jax.ShapeDtypeStruct((span,), jnp.int32),
                jax.ShapeDtypeStruct((1,), jnp.int32),
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(m.reshape(1), keys, valid.astype(jnp.int32), vals)


# -- general grouped aggregation ----------------------------------------------

_SENTINEL = {"min": I32_MAX, "max": I32_MIN}
MAX_SUM_ROWS = (2**31 - 1) // 255  # limb accumulator bound (see module doc)


def _acc_width(fn: str) -> int:
    return 4 if fn in ("sum", "count_sum") else 1


def local_preferred(aggs) -> bool:
    """Evidence-based dispatch (BENCH_KERNELS.json, v5e, 4M rows): the VMEM-
    resident Pallas aggregation wins 1.65× on SUM-bearing agg sets (13.8 ms
    vs 22.8 ms — XLA pays 8 limb dots per block plus HBM accumulator round
    trips) but loses slightly on plain count/min/max (12.3 vs 10.4 ms — the
    1024-aligned double window doubles its one-hot ops).  FLOCK_TPU_PALLAS=2
    forces Pallas for every eligible aggregation."""
    import os

    if os.environ.get("FLOCK_TPU_PALLAS") == "2":
        return True
    return any(fn in ("sum", "count_sum") for _, fn, _ in aggs)


def local_eligible(aggs, n_rows: int, s_loc: int = 1024) -> bool:
    """Static eligibility for ``pallas_local_agg`` (int32 columns are the
    caller's precondition — kernels.dense_group_aggregate's int32_only
    gate).  Wide locality hints stay on the XLA path: the kernel's
    [block, 2·s_loc] one-hot temporary must fit VMEM (s_loc 1024 → 8 MB;
    the 4608-slot build-slotting hint would need 40 MB > the 16 MB scoped
    limit)."""
    if s_loc > 1024:
        return False
    fns = {fn for _, fn, _ in aggs}
    if not fns <= {"count", "count_sum", "sum", "min", "max"}:
        return False
    if fns & {"sum", "count_sum"} and n_rows > MAX_SUM_ROWS:
        return False
    return True


def _local_kernel(m_ref, keys_ref, valid_ref, *refs, col_names, aggs,
                  block, s_loc, span):
    widths = [_acc_width(fn) for _, fn, _ in aggs]
    ncols = len(col_names)
    col_refs = dict(zip(col_names, refs[:ncols]))
    nacc = sum(widths)
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
                    (span,), _SENTINEL.get(fn, 0), jnp.int32)
            off += w
        acc_cnt[:] = jnp.zeros((span,), jnp.int32)
        esc_acc[0] = jnp.int32(0)

    keys = keys_ref[:]
    valid = valid_ref[:] != 0
    rel_all = keys - m_ref[0]
    # aligned double-window scheme (see pallas_count_max_agg)
    base = jnp.min(jnp.where(valid, rel_all, I32_MAX))
    base = jnp.clip(base, 0, max(span - 2 * s_loc, 0))
    base = pl.multiple_of((base // s_loc) * s_loc, s_loc)
    base2 = pl.multiple_of(base + s_loc, s_loc)
    w2 = 2 * s_loc

    rel = rel_all - base
    ok = valid & (rel >= 0) & (rel < w2)

    @pl.when(jnp.max(jnp.where(valid & ~ok, 1, 0)) > 0)
    def _():
        esc_acc[0] = jnp.int32(1)

    rel_c = jnp.where(ok, rel, w2)
    iota = jax.lax.broadcasted_iota(jnp.int32, (block, w2), 1)
    onehot = rel_c[:, None] == iota
    oh_f = onehot.astype(jnp.float32)

    cnt_w = jnp.sum(onehot.astype(jnp.int32), axis=0)

    def upd(acc, w, merge):
        acc[pl.ds(base, s_loc)] = merge(acc[pl.ds(base, s_loc)], w[:s_loc])
        acc[pl.ds(base2, s_loc)] = merge(acc[pl.ds(base2, s_loc)], w[s_loc:])

    upd(acc_cnt, cnt_w, jnp.add)
    off = 0
    for (in_col, fn, _out), w in zip(aggs, widths):
        if fn == "count":
            upd(accs[off], cnt_w, jnp.add)
        elif fn in ("sum", "count_sum"):
            # one (4, block) × (block, w2) MXU matmul per column: all four
            # 8-bit limbs contract against the one-hot at once (Mosaic needs
            # 2-D operands — a 1-D lhs does not lower)
            v = col_refs[in_col][:]
            limbs = jnp.stack([((v >> (8 * j)) & 0xFF).astype(jnp.float32)
                               for j in range(4)])
            parts = jnp.dot(limbs, oh_f,
                            preferred_element_type=jnp.float32)
            for j in range(4):
                upd(accs[off + j], parts[j].astype(jnp.int32), jnp.add)
        else:
            v = col_refs[in_col][:]
            masked = jnp.where(onehot, v[:, None], _SENTINEL[fn])
            red = jnp.min if fn == "min" else jnp.max
            mrg = jnp.minimum if fn == "min" else jnp.maximum
            upd(accs[off], red(masked, axis=0), mrg)
        off += w

    @pl.when(i == n_i - 1)
    def _():
        for o, acc in zip(out_refs, accs):
            o[:] = acc[:]
        cnt_out[:] = acc_cnt[:]
        esc_out[0] = esc_acc[0]


def pallas_local_agg(keys, valid, agg_cols, aggs, out_capacity: int,
                     block: int = 1024, s_loc: int = 1024,
                     interpret: bool = False):
    """General grouped aggregation over a dense key span, VMEM-resident
    accumulators.  Same contract as ops/blocked.blocked_local_agg: returns
    (out_cols with __key, out_valid, escape); slot i holds key min+i.

    ``s_loc`` is rounded up to the 1024-element VMEM tile so dynamic window
    slices stay provably aligned; ``out_capacity`` pads to the window unit
    internally and slices back.
    """
    n = keys.shape[0]
    s_loc = -(-s_loc // 1024) * 1024
    span = max(-(-out_capacity // s_loc) * s_loc, 2 * s_loc)
    spad = span - out_capacity
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
        _local_kernel, col_names=col_names, aggs=tuple(aggs), block=block,
        s_loc=s_loc, span=span)
    blockspec = pl.BlockSpec((block,), lambda i, *_: (i,))
    spanspec = pl.BlockSpec((span,), lambda i, *_: (0,))
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[blockspec] * (2 + len(col_names)),
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
        )(m.reshape(1).astype(jnp.int32), kp, vp, *cols)

    out_cols = {}
    idx = 0
    for (in_col, fn, out), w in zip(aggs, widths):
        arrs = outs[idx:idx + w]
        idx += w
        if w == 1:
            out_cols[out] = arrs[0][:out_capacity]
        else:
            dt = jnp.int64 if fn == "sum" else jnp.int32
            comb = arrs[0].astype(dt)
            for j in range(1, 4):
                comb = comb + (arrs[j].astype(dt) << (8 * j))
            out_cols[out] = comb[:out_capacity]
    cnt = outs[nacc][:out_capacity]
    esc = outs[nacc + 1]
    out_cols["__key"] = m + jnp.arange(out_capacity, dtype=keys.dtype)
    return out_cols, cnt > 0, esc[0] > 0
