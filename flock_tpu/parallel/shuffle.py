"""Distributed shuffle: hash partition + all_to_all over the shard axis.

Reference counterpart: Flock's shuffle sends partition *i* of every producer's
output to group member ``(base+i) mod G`` as compressed Lambda payloads, with
arena/bitmap reassembly at the consumer (flock-function/src/aws/actor.rs:
425-543, flock/src/runtime/arena/mod.rs).  On a TPU mesh the same exchange is
one ``lax.all_to_all`` over ICI on a bucket-major buffer: transport is
lossless and ordered, so no reassembly bookkeeping exists.

Skew note (SURVEY.md §7.3): NEXMark's hot keys concentrate ~50% of bids on a
few auctions.  Shuffles here always run *after* local partial aggregation
(two-phase agg), so what travels is one partial row per (shard, key) — hot
keys cost the same as cold ones.  Broadcast joins (all_gather of the small
build side) avoid probe-side shuffles entirely.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from flock_tpu.parallel.mesh import AXIS

# Trace-time collective tally: when a list is installed here (see
# bench/scaling_model.py), every collective below appends a record with its
# STATIC per-shard ICI byte count while the SPMD program traces.  Shapes are
# static, so the tally is exact per execution — the instrumentation the
# reference gets from CloudWatch byte metrics (aws/cloudwatch.rs), computed
# at compile time instead of run time.
TALLY: list | None = None


def _tally(op: str, ici_bytes_per_shard: int, detail: str = "") -> None:
    if TALLY is not None:
        TALLY.append({"op": op, "ici_bytes_per_shard": int(ici_bytes_per_shard),
                      "detail": detail})


def hash32(keys: list[jax.Array]) -> jax.Array:
    """Deterministic int32 hash combine (Fibonacci mix per key)."""
    h = jnp.zeros_like(keys[0], dtype=jnp.int32)
    for k in keys:
        k = k.astype(jnp.int32)
        h = (h ^ (k * jnp.int32(-1640531527))) * jnp.int32(-1028477387) + (h << 6) + (h >> 2)
    return h & jnp.int32(0x7FFFFFFF)


def all_to_all_shuffle(cols: dict[str, jax.Array], valid: jax.Array,
                       keys: list[str], n_shards: int,
                       per_dest_cap: int | None = None,
                       axis: str = AXIS):
    """Exchange rows so equal keys land on the same shard (hash routing).

    Local [cap] columns → bucket-major [n, per_dest_cap] buffers → all_to_all
    → flattened local [n * per_dest_cap] columns.  Returns (cols, valid,
    overflow).
    """
    dest = hash32([cols[k] for k in keys]) % n_shards
    return all_to_all_by_dest(cols, valid, dest, n_shards, per_dest_cap, axis)


def all_to_all_by_dest(cols: dict[str, jax.Array], valid: jax.Array,
                       dest: jax.Array, n_shards: int,
                       per_dest_cap: int | None = None,
                       axis: str = AXIS):
    """Exchange rows to explicit destinations (range-partitioned sorts route
    by sampled splitters; hash shuffles wrap this with ``hash32``)."""
    cap = valid.shape[0]
    per_dest_cap = per_dest_cap or cap
    dest = jnp.where(valid, dest, n_shards)  # invalid rows sort last

    names = list(cols)
    operands = (dest,) + tuple(cols[n] for n in names) + (valid,)
    s = lax.sort(operands, num_keys=1, is_stable=True)
    sdest, svalid = s[0], s[-1]
    scols = dict(zip(names, s[1:-1]))

    # rank within destination bucket
    starts = jnp.searchsorted(sdest, jnp.arange(n_shards + 1, dtype=sdest.dtype))
    r = jnp.arange(cap, dtype=jnp.int32) - starts[jnp.clip(sdest, 0, n_shards)]
    in_range = svalid & (r < per_dest_cap)
    overflow = jnp.any(svalid & (r >= per_dest_cap))
    slot = jnp.where(in_range, sdest * per_dest_cap + r, n_shards * per_dest_cap)

    out_cols = {}
    for n in names:
        buf = jnp.zeros((n_shards * per_dest_cap,), scols[n].dtype).at[slot].set(
            scols[n], mode="drop")
        _tally("all_to_all",
               buf.nbytes * (n_shards - 1) // max(n_shards, 1), n)
        out_cols[n] = lax.all_to_all(
            buf.reshape(n_shards, per_dest_cap), axis, 0, 0, tiled=True
        ).reshape(-1)
    vbuf = jnp.zeros((n_shards * per_dest_cap,), bool).at[slot].set(
        in_range, mode="drop")
    _tally("all_to_all", vbuf.nbytes * (n_shards - 1) // max(n_shards, 1),
           "valid")
    out_valid = lax.all_to_all(
        vbuf.reshape(n_shards, per_dest_cap), axis, 0, 0, tiled=True
    ).reshape(-1)
    # overflow is per-shard; make it global so every shard reports it
    overflow = lax.psum(overflow.astype(jnp.int32), axis) > 0
    return out_cols, out_valid, overflow


def broadcast_gather(cols: dict[str, jax.Array], valid: jax.Array,
                     axis: str = AXIS, n_shards: int = 1):
    """all_gather every shard's rows (broadcast-build for lookup joins).
    ``n_shards`` is only used for the trace-time byte tally."""
    out_cols = {}
    for n, v in cols.items():
        # each shard RECEIVES (n_shards-1) remote copies of the buffer
        _tally("all_gather", int(v.nbytes) * max(n_shards - 1, 0), n)
        out_cols[n] = lax.all_gather(v, axis, tiled=True)
    out_valid = lax.all_gather(valid, axis, tiled=True)
    return out_cols, out_valid
