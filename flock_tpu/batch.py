"""Columnar batch: the TPU-native replacement for Arrow ``RecordBatch``.

Reference counterpart: Flock's data plane carries Arrow RecordBatches with
variable row counts (flock/src/runtime/payload.rs).  XLA wants static shapes,
so a :class:`Batch` is a *fixed-capacity* struct-of-arrays:

* ``columns``: dict name → jnp array of shape ``[capacity]`` (row-aligned),
* ``valid``: bool[capacity] — the validity mask; padding rows are invalid,
* capacity is static (part of the jit specialization), the live row count is
  ``valid.sum()`` (a traced value).

Operators are *masked*: filters only clear validity bits; compaction is an
explicit op used where densification pays (before windows merge / shuffle).

Dtype policy (TPU-first, keeps x64 disabled):
* ids/prices/codes: int32,
* timestamps: int32 **milliseconds since the stream base time** (reference
  BASE_TIME); absolute ms-since-epoch would need int64, which TPUs emulate.
  Sinks re-add the base when materializing (see ``TS_BASE``).
* money math: float32 on device; sinks recompute exact f64 from the carried
  int cents where parity output requires it (e.g. q1's 0.908*price).

Vocabulary string columns (person name/city/state, YSB ad/event types) are
dictionary codes (int32) with the vocab held host-side in ``Schema``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from flock_tpu.config import CONFIG
from flock_tpu.datagen.nexmark import BASE_TIME

TS_BASE = BASE_TIME  # sinks add this back to int32 relative-ms timestamps


def round_up(n: int, m: int | None = None) -> int:
    m = m or CONFIG.capacity_round
    return ((n + m - 1) // m) * m


def staged_numpy(cols: Mapping[str, np.ndarray], capacity: int | None = None,
                 rebase_ts: bool = True):
    """(padded host columns, valid mask) — the transfer-buffer staging pass
    WITHOUT any device copy: callers that stack/shard buffers before one
    device_put (the distributed stream drivers) use this directly instead of
    bouncing through device arrays.

    Native staging (native/stage.cpp) does pad/rebase/narrow in one
    streaming pass per column — numpy's subtract→astype→concatenate chain
    is three passes plus temporaries and dominated the feed (2.7 s per
    14.7M-row window on the 2-vCPU host; the reference's analogous hot loop
    is transmute.rs:255-266)."""
    n = len(next(iter(cols.values()))) if cols else 0
    if capacity is None:
        capacity = max(round_up(n), 128)
    if n > capacity:
        raise ValueError(f"{n} rows exceed capacity {capacity}")
    native_stage = None
    if n >= (1 << 16):
        from flock_tpu import native as _native

        native_stage = _native.stage_column
    out = {}
    for name, arr in cols.items():
        arr = np.asarray(arr)
        if native_stage is not None and arr.ndim == 1:
            base = None
            if arr.dtype == np.int64:
                # absolute ms timestamps rebase to relative int32;
                # int64 columns already in small ranges just narrow
                mn = _native.min_i64(arr) if arr.size else None
                base = TS_BASE if (rebase_ts and mn is not None
                                   and mn >= TS_BASE) else 0
            staged = native_stage(arr, capacity, base)
            if staged is not None:
                out[name] = staged
                continue
        if arr.dtype == np.int64:
            if rebase_ts and arr.size and int(arr.min()) >= TS_BASE:
                arr = (arr - TS_BASE).astype(np.int32)
            else:
                arr = arr.astype(np.int32)
        pad = np.zeros(capacity - n, dtype=arr.dtype)
        out[name] = np.concatenate([arr, pad])
    valid = np.zeros(capacity, dtype=bool)
    valid[:n] = True
    return out, valid


@jax.tree_util.register_pytree_node_class
@dataclass
class Batch:
    """Fixed-capacity columnar batch with validity mask."""

    columns: dict[str, jax.Array]
    valid: jax.Array  # bool[capacity]

    # -- pytree ---------------------------------------------------------------
    def tree_flatten(self):
        names = tuple(sorted(self.columns))
        return tuple(self.columns[n] for n in names) + (self.valid,), names

    @classmethod
    def tree_unflatten(cls, names, children):
        return cls(columns=dict(zip(names, children[:-1])), valid=children[-1])

    # -- construction ---------------------------------------------------------
    @classmethod
    def from_numpy(cls, cols: Mapping[str, np.ndarray], capacity: int | None = None,
                   rebase_ts: bool = True) -> "Batch":
        """Pad host columns to ``capacity`` rows; int64 ms timestamps are
        rebased to int32 relative ms."""
        out, valid = staged_numpy(cols, capacity, rebase_ts)
        return cls(columns={k: jnp.asarray(v) for k, v in out.items()},
                   valid=jnp.asarray(valid))

    @classmethod
    def empty_like(cls, proto: "Batch") -> "Batch":
        return cls(
            columns={k: jnp.zeros_like(v) for k, v in proto.columns.items()},
            valid=jnp.zeros_like(proto.valid),
        )

    # -- introspection --------------------------------------------------------
    @property
    def capacity(self) -> int:
        return self.valid.shape[0]

    def num_valid(self) -> jax.Array:
        return jnp.sum(self.valid)

    def __getitem__(self, name: str) -> jax.Array:
        return self.columns[name]

    def replace(self, **cols) -> "Batch":
        new = dict(self.columns)
        new.update(cols)
        return Batch(columns=new, valid=self.valid)

    def with_valid(self, valid: jax.Array) -> "Batch":
        return Batch(columns=self.columns, valid=valid)

    def select(self, names) -> "Batch":
        return Batch(columns={n: self.columns[n] for n in names}, valid=self.valid)

    # -- host materialization -------------------------------------------------
    def to_numpy(self, restore_ts: tuple[str, ...] = ()) -> dict[str, np.ndarray]:
        """Compact to live rows on host; named int32 ts columns are restored
        to absolute int64 ms.  All device→host transfers issue in ONE
        jax.device_get so they pipeline instead of paying a control
        round-trip per column (the remote tunnel costs ~30 ms each;
        measured as half of q11's emission time before this)."""
        import jax

        names = list(self.columns)
        fetched = jax.device_get([self.valid]
                                 + [self.columns[n] for n in names])
        valid = fetched[0]
        out = {}
        for name, h in zip(names, fetched[1:]):
            h = h[valid]
            if name in restore_ts:
                h = h.astype(np.int64) + TS_BASE
            out[name] = h
        return out


@dataclass
class Schema:
    """Host-side metadata: column order, dictionaries, timestamp columns.

    ``f64_recompute`` maps an output column to an exact float64 recompute
    recipe applied at the sink from carried integer basis columns:
    ("mul_lit", literal, basis_col) or ("div", sum_col, count_col).
    """

    names: list[str]
    dictionaries: dict[str, list[str]] = field(default_factory=dict)
    timestamp_cols: tuple[str, ...] = ()
    f64_recompute: dict[str, tuple] = field(default_factory=dict)

    def decode(self, cols: dict[str, np.ndarray]) -> dict[str, Any]:
        out = {}
        for n in self.names:
            v = cols[n]
            if n in self.dictionaries:
                vocab = np.asarray(self.dictionaries[n], dtype=object)
                out[n] = vocab[v]
            else:
                out[n] = v
        return out
