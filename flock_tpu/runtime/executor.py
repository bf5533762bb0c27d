"""Single-device executor — the ``LocalLauncher`` analogue (ground truth).

Reference counterpart: flock/src/launcher/local.rs:30-147 (feed MemTables,
collect the whole plan in-process).  Here: host columns → fixed-capacity
device Batches → one jitted XLA program per (plan, capacity signature) →
host materialization with timestamp restore and dictionary decode.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import numpy as np

from flock_tpu.batch import Batch, round_up
from flock_tpu.plan import compile_plan
from flock_tpu.queries.nexmark import QuerySpec


class OverflowError(RuntimeError):
    """A static output capacity was exceeded (the analogue of Flock's payload
    size guards); retry with larger capacities."""


@dataclass
class LocalExecutor:
    spec: QuerySpec
    agg_capacity: int | None = None
    _compiled: dict = field(default_factory=dict)

    def _fn(self, cap_sig: tuple, agg_capacity: int):
        key = (cap_sig, agg_capacity)
        if key not in self._compiled:
            self._compiled[key] = jax.jit(
                compile_plan(self.spec.plan, agg_capacity))
        return self._compiled[key]

    def prepare_window(self, tables: dict[str, dict[str, np.ndarray]],
                       capacities: dict[str, int] | None = None
                       ) -> dict[str, Batch]:
        """Host columns → fixed-capacity device Batches (the feed/transfer
        step — feed_data_sources analogue, runtime/context.rs:257-325)."""
        capacities = capacities or {}
        batches = {}
        for rel, cols in tables.items():
            n = len(next(iter(cols.values()))) if cols else 0
            cap = capacities.get(rel) or max(round_up(max(n, 1)), 128)
            batches[rel] = Batch.from_numpy(cols, cap)
        return batches

    def execute_batches(self, batches: dict[str, Batch],
                        check_overflow: bool = True) -> Batch:
        """Run the jitted plan over device-resident Batches (compute only)."""
        agg_cap = self.agg_capacity or (
            max(b.capacity for b in batches.values()) + 8192)
        cap_sig = tuple(sorted((r, b.capacity) for r, b in batches.items()))
        out, overflow = self._fn(cap_sig, agg_cap)(batches)
        if check_overflow and bool(overflow):
            raise OverflowError(
                f"q{self.spec.number}: static capacity exceeded "
                f"(caps={cap_sig}, agg={agg_cap})")
        return out

    def execute_window(self, tables: dict[str, dict[str, np.ndarray]],
                       capacities: dict[str, int] | None = None) -> Batch:
        """Run the query plan over one window's relation tables.

        Returns the device output Batch (padded).  Raises OverflowError if any
        static capacity was exceeded.
        """
        return self.execute_batches(self.prepare_window(tables, capacities))

    def materialize(self, out: Batch) -> dict[str, np.ndarray]:
        return materialize_columns(self.spec, out.to_numpy())


def materialize_columns(spec: QuerySpec, host: dict[str, np.ndarray]
                        ) -> dict[str, np.ndarray]:
    """Sink-side finalization shared by local and distributed executors:
    restore absolute timestamps (int32 relative → int64 ms) and recompute
    exact f64 money columns from their integer basis (queries/nexmark.py)."""
    from flock_tpu.batch import TS_BASE

    schema = spec.schema
    result = {}
    for name in schema.names:
        v = host[name]
        if name in schema.timestamp_cols:
            v = v.astype(np.int64) + TS_BASE
        if name == "price" and "price_cents" in host:
            v = 0.908 * host["price_cents"].astype(np.float64)
        elif name == "avg_final" and "sum_final" in host:
            v = host["sum_final"].astype(np.float64) / host["cnt"]
        elif name == "avg_price" and "sum_price" in host:
            v = host["sum_price"].astype(np.float64) / host["cnt"]
        result[name] = v
    return result
