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
        if kind == "rows":
            return self._run_rows(epoch_parts)
        rels = tuple(r for r in self.spec.relations if r != "side_input")
        occupancy = [any(len(next(iter(p[r].values())))
                         for p in parts for r in rels if r in p and p[r])
                     for parts in epoch_parts]
        results = []
        for tag, rng in self._slicer._window_epoch_ranges(occupancy):
            window_parts = [epoch_parts[t] for t in rng
                            if t < len(epoch_parts)]
            host = self.executor.execute_window(
                self._shard_tables(window_parts))
            results.append(WindowResult(
                tag, materialize_columns(self.spec, host)))
        return results

    def _run_rows(self, epoch_parts) -> list[WindowResult]:
        """Row-count windows (Schedule::Rows): merged stream order is cut
        every n rows; each window row-shards across the mesh."""
        n = self.spec.window[1]
        (rel,) = tuple(r for r in self.spec.relations if r != "side_input")
        results: list[WindowResult] = []
        pending: list[dict] = []
        have = 0
        widx = 0

        def emit(cols: dict) -> None:
            nonlocal widx
            results.append(self._exec_row_sharded(
                rel, cols, ("rows", widx)))
            widx += 1

        for parts in epoch_parts:
            merged = dict(concat_relations(parts, (rel,)))[rel]
            cnt = len(next(iter(merged.values()))) if merged else 0
            if not cnt:
                continue
            pending.append(merged)
            have += cnt
            while have >= n:
                joined = {k: np.concatenate([p[k] for p in pending])
                          for k in pending[0]}
                emit({k: v[:n] for k, v in joined.items()})
                rest = {k: v[n:] for k, v in joined.items()}
                have -= n
                pending = [rest] if have else []
        if have:
            emit({k: np.concatenate([p[k] for p in pending])
                  for k in pending[0]})
        return results

    def _merged_bids(self, parts: list[dict]) -> dict:
        """Merged bid table projected to the columns the plan (or the
        session bookkeeping) reads — the same pushdown as the local driver,
        so what row-shards across the mesh is the live columns only."""
        from flock_tpu.plan import referenced_columns

        bid = dict(concat_relations(parts, ("bid",)))["bid"]
        refs = referenced_columns(self.spec.plan)
        if refs is None:
            return bid
        keep = (refs | set(self.spec.schema.names)
                | {SessionState.key, SessionState.time_col})
        return {k: v for k, v in bid.items() if k in keep}

    def _exec_row_sharded(self, rel: str, cols: dict, tag: tuple
                          ) -> WindowResult:
        """Row-shard one batch round-robin and execute SPMD.  Capacities are
        power-of-two bucketed to bound recompiles."""
        from flock_tpu.runtime.stream import _bucket_cap

        n = len(next(iter(cols.values())))
        shard_tables = []
        for i in range(self.n_shards):
            sel = np.arange(n) % self.n_shards == i
            shard_tables.append({rel: {k: v[sel] for k, v in cols.items()}})
        caps = {rel: _bucket_cap(-(-n // self.n_shards))}
        host = self.executor.execute_window(shard_tables, caps)
        return WindowResult(tag, materialize_columns(self.spec, host))

    def _exec_session_batch(self, bid: dict, tag: tuple) -> WindowResult:
        return self._exec_row_sharded("bid", bid, tag)

    def _run_session(self, epoch_parts) -> list[WindowResult]:
        """STREAMING session windows (see StreamDriver._run_session): closed
        sessions execute per epoch; host state is bounded by open sessions.
        Emissions materialize on host and row-shard across the mesh (the
        per-window compute is the distributed part, as in the reference's
        source-function session driver)."""
        state = SessionState(gap=self.spec.window[1])
        out: list[WindowResult] = []
        sid = 0
        t = -1
        for t, parts in enumerate(epoch_parts):
            em = state.advance(self._merged_bids(parts), t)
            if em is not None:
                bid = em.to_batch(sid)
                sid += em.n_sessions
                out.append(self._exec_session_batch(bid, ("sessions", t)))
        em = state.flush(t + 1)
        if em is not None:
            out.append(self._exec_session_batch(em.to_batch(sid),
                                                ("sessions", t + 1)))
        return out

    def _run_global(self, epoch_parts) -> list[WindowResult]:
        """STREAMING processing-time windows: each w-epoch window executes
        as soon as it completes."""
        from flock_tpu.runtime.stream import _bucket_cap

        w = self.spec.window[1]
        results = []
        names = ("auction", "bidder", "price", "b_date_time", "p_time")

        def emit(shards, start):
            shard_tables = []
            m = 1
            for ps in shards:
                cols = {k: (np.concatenate([b[k] for b in ps]) if ps
                            else np.array([], np.int32)) for k in names}
                m = max(m, len(cols["bidder"]))
                shard_tables.append({"bid": cols})
            host = self.executor.execute_window(
                shard_tables, {"bid": _bucket_cap(m)})
            results.append(WindowResult(
                ("ptime", start, start + w),
                materialize_columns(self.spec, host)))

        shards = [[] for _ in range(self.n_shards)]
        start = 0
        t = -1
        for t, parts in enumerate(epoch_parts):
            if t - start >= w:
                emit(shards, start)
                shards = [[] for _ in range(self.n_shards)]
                start = t
            for p, part in enumerate(parts):
                bid = dict(part["bid"])
                bid["p_time"] = np.full(len(bid["bidder"]), t * 1000,
                                        np.int32)
                shards[p % self.n_shards].append(bid)
        if any(shards):
            emit(shards, start)
        return results
