"""Distributed stream driver: windowed queries over the SPMD mesh.

Combines the window state machine (runtime/stream.py — the reference's
source-function window drivers) with the DistributedExecutor: each window's
generator partitions shard across mesh devices (partition p → shard p % n,
the hashring-to-device-id collapse), and the per-window plan runs as one
SPMD program with collectives at stage boundaries.

Session/processing-time bookkeeping stays on the host exactly as in the
single-device driver (the reference also keeps it in the source function);
only the per-window compute distributes.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from flock_tpu.parallel.executor import DistributedExecutor
from flock_tpu.queries.nexmark import QuerySpec
from flock_tpu.runtime.executor import materialize_columns
from flock_tpu.runtime.stream import SessionState, StreamDriver, WindowResult
from flock_tpu.runtime.tables import concat_relations, default_side_input


@dataclass
class DistStreamDriver:
    spec: QuerySpec
    seconds: int
    n_shards: int
    side_input: dict | None = None

    def __post_init__(self):
        self.executor = DistributedExecutor(self.spec, self.n_shards)
        # reuse the single-device driver's window slicing rules
        self._slicer = StreamDriver.__new__(StreamDriver)
        self._slicer.spec = self.spec
        self._slicer.seconds = self.seconds

    def _shard_tables(self, window_parts: list[list[dict]]):
        """window_parts: per-epoch lists of per-generator relation tables."""
        rels = tuple(r for r in self.spec.relations if r != "side_input")
        shards = [[] for _ in range(self.n_shards)]
        for parts in window_parts:
            for p, part in enumerate(parts):
                shards[p % self.n_shards].append(part)
        out = []
        for i, ps in enumerate(shards):
            tables = dict(concat_relations(ps, rels))
            if "side_input" in self.spec.relations:
                si = self.side_input or default_side_input()
                tables["side_input"] = si if i == 0 else \
                    {k: v[:0] for k, v in si.items()}
            out.append(tables)
        return out

    def run(self, epoch_parts: list[list[dict]]) -> list[WindowResult]:
        kind = self.spec.window[0]
        if kind == "session":
            return self._run_session(epoch_parts)
        if kind == "global":
            return self._run_global(epoch_parts)
        results = []
        for tag, rng in self._slicer._window_epoch_ranges():
            window_parts = [epoch_parts[t] for t in rng
                            if t < len(epoch_parts)]
            host = self.executor.execute_window(
                self._shard_tables(window_parts))
            results.append(WindowResult(
                tag, materialize_columns(self.spec, host)))
        return results

    def _merged_bids(self, parts: list[dict]) -> dict:
        return dict(concat_relations(parts, ("bid",)))["bid"]

    def _run_session(self, epoch_parts) -> list[WindowResult]:
        state = SessionState(gap=self.spec.window[1])
        emitted = []
        for t, parts in enumerate(epoch_parts):
            emitted += state.advance(self._merged_bids(parts), t)
        emitted += state.flush(self.seconds)
        if not emitted:
            return []
        # one batch of closed sessions, row-sharded round-robin
        cols: dict[str, list] = {}
        for sid, (_, frags) in enumerate(emitted):
            for f in frags:
                for k, v in f.items():
                    cols.setdefault(k, []).append(v)
                cols.setdefault("__session", []).append(
                    np.full(len(f["bidder"]), sid, np.int32))
        bid = {k: np.concatenate(v) for k, v in cols.items()}
        n = len(bid["bidder"])
        shard_tables = []
        for i in range(self.n_shards):
            sel = np.arange(n) % self.n_shards == i
            shard_tables.append({"bid": {k: v[sel] for k, v in bid.items()}})
        host = self.executor.execute_window(shard_tables)
        return [WindowResult(("sessions",),
                             materialize_columns(self.spec, host))]

    def _run_global(self, epoch_parts) -> list[WindowResult]:
        w = self.spec.window[1]
        results = []
        for start in range(0, len(epoch_parts), w):
            chunk = epoch_parts[start:start + w]
            shards = [[] for _ in range(self.n_shards)]
            for i, parts in enumerate(chunk):
                for p, part in enumerate(parts):
                    bid = dict(part["bid"])
                    bid["p_time"] = np.full(len(bid["bidder"]),
                                            (start + i) * 1000, np.int32)
                    shards[p % self.n_shards].append(bid)
            names = ("auction", "bidder", "price", "b_date_time", "p_time")
            shard_tables = []
            for ps in shards:
                shard_tables.append({"bid": {
                    k: (np.concatenate([b[k] for b in ps]) if ps
                        else np.array([], np.int32)) for k in names}})
            host = self.executor.execute_window(shard_tables)
            results.append(WindowResult(
                ("ptime", start, start + w),
                materialize_columns(self.spec, host)))
        return results
