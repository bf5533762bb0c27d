"""Stream driver: micro-batch loop + window state machine.

Reference counterpart: the window drivers running inside Flock's data-source
function (flock-function/src/aws/window/{elementwise,tumbling,hopping,session,
global}.rs).  Host-side bookkeeping decides *which rows form a window* (the
data-dependent part); the device executes the per-window plan (the compute).

Window semantics mirrored from the reference:
* element-wise — one invocation per epoch (elementwise.rs),
* tumbling(w) — complete windows [k*w, k*w+w) only (tumbling.rs:55-63),
* hopping(w, h) — windows [t, t+w) for t = 0, h, 2h, … while t+w ≤ seconds
  (hopping.rs:54-60),
* session(gap) — per-bidder sessions; a new fragment more than ``gap`` seconds
  (second-truncated) after the session's last row closes it; idle sessions
  time out as epochs advance (session.rs:64-178); remaining sessions flush at
  stream end (bounded-run semantics),
* global/processing-time(w) — tumbling on *processing* time per key
  (global.rs); processing time is deterministic here: the arrival epoch in
  logical ms (the reference stamps wall-clock now(), nondeterministic by
  construction).
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field

import numpy as np

from flock_tpu.batch import round_up
from flock_tpu.datagen.nexmark import NexmarkConfig
from flock_tpu.queries.nexmark import QuerySpec, get_query
from flock_tpu.runtime.executor import LocalExecutor
from flock_tpu.runtime.tables import (
    concat_relations,
    default_side_input,
    epoch_to_relations,
)


def generate_epoch_parts(seconds: int, events_per_second: int,
                         generators: int = 1) -> list[list[dict]]:
    """Per-epoch, per-generator-partition relation tables (unmerged) — the
    unit of data parallelism for the distributed executor."""
    from flock_tpu.datagen.native_gen import nexmark_generate_partition

    cfg = NexmarkConfig(events_per_second=events_per_second,
                        num_event_generators=generators)
    parts: list[list[dict]] = [[] for _ in range(seconds)]
    for p in range(generators):
        for e in nexmark_generate_partition(cfg, seconds, p):
            if e.epoch < seconds:
                parts[e.epoch].append(epoch_to_relations(e))
    return parts


def generate_epochs(seconds: int, events_per_second: int, generators: int = 1
                    ) -> list[dict]:
    """Generate and merge all generator partitions into per-epoch relation
    tables (the arena-reassembly analogue: fragments of one window always meet
    in one place, flock/src/runtime/arena/mod.rs)."""
    from flock_tpu.datagen.native_gen import nexmark_generate_partition

    cfg = NexmarkConfig(events_per_second=events_per_second,
                        num_event_generators=generators)
    per_epoch: dict[int, list] = defaultdict(list)
    # ctypes releases the GIL during native generation → real thread
    # parallelism across generator partitions (the reference's per-partition
    # thread model, nexmark.rs:357-389)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(generators, 8)) as pool:
        results = list(pool.map(
            lambda p: nexmark_generate_partition(cfg, seconds, p),
            range(generators)))
    for eps in results:
        for e in eps:
            per_epoch[e.epoch].append(epoch_to_relations(e))
    epochs = []
    for t in range(seconds):
        parts = per_epoch.get(t, [])
        epochs.append(concat_relations(parts, ("person", "auction", "bid")))
    return epochs


def sessions_to_batch(closed, sid0: int) -> dict:
    """Closed sessions → one bid table with globally unique __session ids
    (the reference ships whole sessions to an aggregator the same way, one
    window per session key, session.rs:245-263).

    One concatenate per column over the flattened fragment list + one
    ``np.repeat`` for the ids — no per-fragment python work."""
    frag_lists = [frags for _, frags in closed]
    flat = [f for frags in frag_lists for f in frags]
    sids = np.repeat(
        np.arange(sid0, sid0 + len(closed), dtype=np.int32),
        [sum(len(f["bidder"]) for f in frags) for frags in frag_lists])
    cols = {k: np.concatenate([f[k] for f in flat]) for k in flat[0]}
    cols["__session"] = sids
    return cols


def _bucket_cap(n: int) -> int:
    """Power-of-two capacity bucket: per-epoch batches reuse a handful of
    compiled programs instead of one compile per distinct row count."""
    c = 128
    while c < n:
        c *= 2
    return c


@dataclass
class WindowResult:
    tag: tuple          # window identifier, e.g. ("epoch", 3) / ("win", 0, 10)
    columns: dict       # materialized output columns (schema order)


@dataclass
class SessionState:
    """Session-window bookkeeping (q11): per-bidder open windows.

    Reference counterpart: window/session.rs:64-178 — a fragment more than
    ``gap`` seconds (second-truncated) after its window's last row closes the
    window; idle windows time out as epochs advance.

    The state is checkpointable: ``to_payloads``/``from_payloads`` serialize
    the open windows through the payload codec so a replacement worker resumes
    mid-stream (the reference's S3 window-state checkpoint analogue,
    state/s3.rs + actor.rs:391-413).
    """

    gap: int
    open_windows: dict = field(default_factory=dict)  # bidder → [fragments]
    last_s: dict = field(default_factory=dict)        # bidder → last row sec
    epoch: int = 0

    def advance(self, bids: dict, t: int) -> list[tuple[tuple, list[dict]]]:
        """Feed one epoch's bids; returns sessions closed by gap/timeout."""
        emitted = []
        gap, windows, last_s = self.gap, self.open_windows, self.last_s
        if len(bids["bidder"]):
            # per-bidder fragments, in bidder order (HashDiff analogue)
            order = np.argsort(bids["bidder"], kind="stable")
            sb = {k: v[order] for k, v in bids.items()}
            keys = list(sb)
            vals = [sb[k] for k in keys]
            uniq, starts = np.unique(sb["bidder"], return_index=True)
            bounds = np.append(starts, len(sb["bidder"]))
            # python scalars hoisted out of the per-bidder loop (np scalar
            # indexing per bidder is ~10x the cost of a list lookup)
            first_sec = (sb["b_date_time"][starts] // 1000).tolist()
            frag_last = (sb["b_date_time"][bounds[1:] - 1] // 1000).tolist()
            blist = bounds.tolist()
            for i, bidder in enumerate(uniq.tolist()):
                lo, hi = blist[i], blist[i + 1]
                frag = {k: v[lo:hi] for k, v in zip(keys, vals)}
                prev = windows.get(bidder)
                if prev is not None:
                    if first_sec[i] - last_s[bidder] > gap:
                        emitted.append((("session", bidder, t), prev))
                        windows[bidder] = [frag]
                    else:
                        prev.append(frag)
                else:
                    windows[bidder] = [frag]
                last_s[bidder] = frag_last[i]
        # timeout scan (session.rs:136-178): epoch time vs last row time
        now_s = NexmarkConfig().base_time // 1000 + (t + 1)
        cutoff = now_s - gap
        for bidder in [b for b, s in last_s.items() if s < cutoff]:
            emitted.append((("session", bidder, t), windows.pop(bidder)))
            del last_s[bidder]
        self.epoch = t + 1
        return emitted

    def flush(self, seconds: int) -> list[tuple[tuple, list[dict]]]:
        """Close remaining sessions at stream end (bounded-run semantics)."""
        out = [(("session", b, seconds), f)
               for b, f in self.open_windows.items()]
        self.open_windows.clear()
        self.last_s.clear()
        return out

    # -- checkpoint / resume --------------------------------------------------

    def to_payloads(self, qid: str):
        from flock_tpu.runtime.payload import FragmentId, Payload

        out = []
        items = sorted(self.open_windows.items())
        for i, (bidder, frags) in enumerate(items):
            cols = {k: np.concatenate([f[k] for f in frags])
                    for k in frags[0]}
            out.append(Payload(
                FragmentId(qid, i, len(items), shuffle_id=0),
                cols, metadata={"bidder": int(bidder), "epoch": self.epoch}))
        return out

    @classmethod
    def from_payloads(cls, gap: int, payloads) -> "SessionState":
        st = cls(gap=gap)
        for p in payloads:
            bidder = p.metadata["bidder"]
            st.open_windows[bidder] = [dict(p.columns)]
            # fragments are time-ordered, so the restored window's last row
            # second is the tail of b_date_time — the open_windows/last_s
            # invariant must hold on resume or advance/timeout break
            st.last_s[bidder] = int(p.columns["b_date_time"][-1]) // 1000
            st.epoch = max(st.epoch, p.metadata["epoch"])
        return st


class StreamDriver:
    def __init__(self, spec: QuerySpec, seconds: int,
                 side_input: dict | None = None,
                 agg_capacity: int | None = None):
        self.spec = spec
        self.seconds = seconds
        self.side_input = side_input
        self.executor = LocalExecutor(spec, agg_capacity)

    # -- window slicing -------------------------------------------------------

    def _window_epoch_ranges(self, occupancy: list[bool] | None = None):
        """Window tag → epoch list, for the range-based kinds.

        ``occupancy`` (per-epoch has-data flags) is required only for stagger
        windows, whose anchors are data-dependent (window.rs:104-110 — a
        window opens at the first event after the previous one closes)."""
        kind = self.spec.window[0]
        s = self.seconds
        if kind == "elementwise":
            return [(("epoch", t), [t]) for t in range(s)]
        if kind == "tumbling":
            w = self.spec.window[1]
            return [(("win", k * w, k * w + w), list(range(k * w, k * w + w)))
                    for k in range(s // w)]
        if kind == "hopping":
            w, h = self.spec.window[1], self.spec.window[2]
            return [(("win", t, t + w), list(range(t, t + w)))
                    for t in range(0, s, h) if t + w <= s]
        if kind == "sliding":
            # window.rs:94-97: emit at every slide point, covering the
            # trailing w seconds (leading windows are partial)
            w, sl = self.spec.window[1], self.spec.window[2]
            return [(("win", max(0, t - w), t), list(range(max(0, t - w), t)))
                    for t in range(sl, s + 1, sl)]
        if kind == "stagger":
            # window.rs:104-110: first-event-anchored w-second windows
            w = self.spec.window[1]
            if occupancy is None:
                raise ValueError("stagger windows need per-epoch occupancy")
            out, t = [], 0
            while t < s:
                if occupancy[t]:
                    out.append((("win", t, t + w), list(range(t, min(t + w, s)))))
                    t += w
                else:
                    t += 1
            return out
        raise ValueError(kind)

    # -- execution ------------------------------------------------------------

    @staticmethod
    def _epoch_rows(tables: dict) -> int:
        return sum(len(next(iter(cols.values()))) for cols in tables.values()
                   if cols)

    def run(self, epochs: list[dict]) -> list[WindowResult]:
        kind = self.spec.window[0]
        if kind == "session":
            return self._run_session(epochs)
        if kind == "global":
            return self._run_global(epochs)
        if kind == "rows":
            return self._run_rows(epochs)
        return self._run_ranges(epochs)

    def _fixed_caps(self, windows, relations) -> dict[str, int]:
        caps = {}
        for rel in relations:
            m = 1
            for _, tables in windows:
                cols = tables.get(rel)
                if cols:
                    m = max(m, len(next(iter(cols.values()))))
            caps[rel] = max(round_up(m), 128)
        return caps

    def _execute_all(self, windows) -> list[WindowResult]:
        """Run every window with one capacity signature (one XLA compile).

        On capacity overflow (static buffers too small — e.g. an unexpectedly
        wide key span) the aggregate capacity doubles and the window retries,
        mirroring the reference's guard-and-retry posture around payload
        limits."""
        from flock_tpu.runtime.executor import OverflowError

        caps = self._fixed_caps(windows, list({r for _, t in windows for r in t}))
        out = []
        for tag, tables in windows:
            for attempt in range(6):
                try:
                    b = self.executor.execute_window(tables, caps)
                    break
                except OverflowError:
                    if attempt == 5:
                        raise
                    from flock_tpu.config import CONFIG
                    base = self.executor.agg_capacity or (
                        max(caps.values()) + CONFIG.agg_span_margin)
                    self.executor.agg_capacity = base * 4
            out.append(WindowResult(tag, self.executor.materialize(b)))
        return out

    def _run_ranges(self, epochs) -> list[WindowResult]:
        """Stage each epoch on device ONCE; windows concat in HBM (see
        LocalExecutor.execute_epochs).  Hopping windows reuse overlapping
        epochs without re-transfer."""
        rels = tuple(r for r in self.spec.relations if r != "side_input")
        # uniform per-epoch capacities (one compile per window width)
        caps = {}
        for rel in rels:
            m = max((len(next(iter(e[rel].values())))
                     for e in epochs if rel in e and e[rel]), default=1)
            caps[rel] = max(round_up(m), 128)
        staged = [self.executor.prepare_window(
            {rel: e[rel] for rel in rels}, caps) for e in epochs]
        statics = None
        if "side_input" in self.spec.relations:
            si = self.side_input or default_side_input()
            statics = self.executor.prepare_window({"side_input": si})
        occupancy = [self._epoch_rows({r: e.get(r, {}) for r in rels}) > 0
                     for e in epochs]
        out = []
        for tag, rng in self._window_epoch_ranges(occupancy):
            ets = [staged[t] for t in rng if t < len(staged)]
            b = self.executor.execute_epochs(ets, statics)
            out.append(WindowResult(tag, self.executor.materialize(b)))
        return out

    def _execute_retry(self, tag, tables, caps) -> WindowResult:
        """One window with the overflow guard-and-retry posture of
        ``_execute_all`` (capacity-bucketed so recompiles stay bounded)."""
        from flock_tpu.runtime.executor import OverflowError

        for attempt in range(6):
            try:
                b = self.executor.execute_window(tables, caps)
                break
            except OverflowError:
                if attempt == 5:
                    raise
                from flock_tpu.config import CONFIG
                base = self.executor.agg_capacity or (
                    max(caps.values()) + CONFIG.agg_span_margin)
                self.executor.agg_capacity = base * 4
        return WindowResult(tag, self.executor.materialize(b))

    # -- session windows (q11) ------------------------------------------------

    def _run_session(self, epochs) -> list[WindowResult]:
        """STREAMING session windows: sessions closed by gap/timeout are
        executed and emitted per epoch (the reference's per-epoch session
        drain, flock-function/src/aws/window/session.rs:136-178).  Host
        state is bounded by the OPEN sessions; nothing accumulates for the
        run's whole length.  Remaining sessions flush at stream end."""
        state = SessionState(gap=self.spec.window[1])
        out: list[WindowResult] = []
        sid = 0
        t = -1
        for t, tables in enumerate(epochs):
            closed = state.advance(tables["bid"], t)
            if closed:
                bid = sessions_to_batch(closed, sid)
                sid += len(closed)
                caps = {"bid": _bucket_cap(len(bid["bidder"]))}
                out.append(self._execute_retry(
                    ("sessions", t), {"bid": bid}, caps))
        closed = state.flush(t + 1)
        if closed:
            bid = sessions_to_batch(closed, sid)
            caps = {"bid": _bucket_cap(len(bid["bidder"]))}
            out.append(self._execute_retry(
                ("sessions", t + 1), {"bid": bid}, caps))
        return out

    # -- processing-time windows (q12) ---------------------------------------

    def _run_global(self, epochs) -> list[WindowResult]:
        """STREAMING processing-time windows: each w-epoch arrival window
        executes as soon as it completes; only the current window's epochs
        are held on host (global.rs:161-307)."""
        w = self.spec.window[1]
        out: list[WindowResult] = []
        pending: list[dict] = []
        start = 0

        def emit(start: int) -> WindowResult | None:
            if not pending:
                return None
            cols = {k: np.concatenate([p[k] for p in pending])
                    for k in pending[0]}
            pending.clear()
            caps = {"bid": _bucket_cap(len(cols["bidder"]))}
            return self._execute_retry(
                ("ptime", start, start + w), {"bid": cols}, caps)

        t = -1
        for t, tables in enumerate(epochs):
            if t - start >= w:
                r = emit(start)
                if r is not None:
                    out.append(r)
                start = t
            bid = dict(tables["bid"])
            bid["p_time"] = np.full(len(bid["bidder"]), t * 1000, np.int32)
            pending.append(bid)
        r = emit(start)
        if r is not None:
            out.append(r)
        return out

    # -- row-count windows (Schedule::Rows, window.rs:75-77) -------------------

    def _run_rows(self, epochs) -> list[WindowResult]:
        """Row-count windows: the driving relation's rows pack into
        consecutive windows of exactly n rows; the remainder flushes at
        stream end.  Host state is bounded by one window's rows."""
        n = self.spec.window[1]
        rels = tuple(r for r in self.spec.relations if r != "side_input")
        if len(rels) != 1:
            raise NotImplementedError(
                "rows windows need a single driving relation")
        rel = rels[0]
        out: list[WindowResult] = []
        pending: list[dict] = []
        have = 0
        widx = 0

        def emit(cols: dict) -> None:
            nonlocal widx
            caps = {rel: _bucket_cap(len(next(iter(cols.values()))))}
            out.append(self._execute_retry(("rows", widx), {rel: cols}, caps))
            widx += 1

        for tables in epochs:
            cols = tables.get(rel)
            if not cols or not len(next(iter(cols.values()))):
                continue
            pending.append(dict(cols))
            have += len(next(iter(cols.values())))
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
        return out


def run_nexmark(query: int, seconds: int = 2, events_per_second: int = 1000,
                generators: int = 1, side_input: dict | None = None
                ) -> list[WindowResult]:
    """End-to-end: generate → window → execute → materialize (the
    ``LocalLauncher`` benchmark path)."""
    spec = get_query(query)
    epochs = generate_epochs(seconds, events_per_second, generators)
    driver = StreamDriver(spec, seconds, side_input=side_input)
    return driver.run(epochs)
