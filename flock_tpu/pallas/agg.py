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
    base = jnp.min(jnp.where(valid, rel_all, I32_MAX))
    # 128-lane alignment for the VMEM window update
    base = jnp.clip(base - 128, 0, max(span - s_loc, 0))
    base = pl.multiple_of((base // 128) * 128, 128)

    rel = rel_all - base
    ok = valid & (rel >= 0) & (rel < s_loc)

    @pl.when(jnp.any(valid & ~ok))
    def _():
        esc_acc[0] = jnp.int32(1)

    rel_c = jnp.where(ok, rel, s_loc)
    iota = jax.lax.broadcasted_iota(jnp.int32, (block, s_loc), 1)
    onehot = rel_c[:, None] == iota

    cnt_w = jnp.sum(onehot.astype(jnp.int32), axis=0)
    max_w = jnp.max(jnp.where(onehot, vals[:, None], I32_MIN), axis=0)

    win = acc_cnt[pl.ds(base, s_loc)]
    acc_cnt[pl.ds(base, s_loc)] = win + cnt_w
    winm = acc_max[pl.ds(base, s_loc)]
    acc_max[pl.ds(base, s_loc)] = jnp.maximum(winm, max_w)

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
    assert n % block == 0 and span % 128 == 0 and s_loc % 128 == 0
    grid = (n // block,)

    kernel = functools.partial(_agg_kernel, block=block, s_loc=s_loc,
                               span=span)
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
                pl.BlockSpec((1,), lambda i, *_: (0,)),
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
