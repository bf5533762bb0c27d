"""Pallas TPU kernel: blocked one-hot grouped aggregation (count + max).

The XLA formulation (ops/blocked.py) streams the span accumulator through HBM
on every block step (dynamic_slice + dynamic_update_slice per block).  This
kernel keeps the WHOLE span accumulator in VMEM scratch across the sequential
TPU grid — each block touches HBM only to read its rows; accumulator traffic
is on-chip.  Pattern per the Pallas guide: revisiting output + scratch
persistence across grid steps, scalar prefetch for the key minimum, 128-lane
aligned dynamic windows.

Used for the hot single-key count/max aggregations (q5 counts, the winning-
bid max of q4/q6/q9's shared core).  Escape semantics match ops/blocked.py:
rows outside their block's window raise a flag and callers fall back.
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
        )(m.reshape(1), keys, valid.astype(jnp.int32), vals)
