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
from dataclasses import dataclass

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


from flock_tpu.runtime.executor import _pow2_bucket as _bucket_cap


def _bucket_cap_fine(n: int) -> int:
    """1/8-octave capacity bucket (m in 8..15 times a power of two): output
    buffers track the observed span within ~12% instead of up to 2x, so the
    answer readback ships ~the answer, at a bounded compile-signature count
    (8 buckets per octave)."""
    c = 128
    while c < n:
        c *= 2
    if c <= 1024:
        return c
    step = c // 16
    m = c // 2
    while m < n:
        m += step
    return m


@dataclass
class WindowResult:
    tag: tuple          # window identifier, e.g. ("epoch", 3) / ("win", 0, 10)
    columns: dict       # materialized output columns (schema order)


@dataclass
class _Chunk:
    """One epoch's rows retained on the host while sessions stay open.
    ``staged`` optionally holds the same rows as a device-resident Batch
    (set by the local driver's device emission path; rows are then never
    re-shipped — an emission transfers only two small dense label tables)."""

    cid: int             # absolute chunk counter (session start markers)
    cols: dict           # host columns, arrival order
    bidders: np.ndarray  # int64 view of the session-key column
    kmin: int            # key range of this chunk (emission pre-filter)
    kmax: int
    staged: object = None


_SPAN_LIMIT = 1 << 24  # dense key-table fallback threshold (64MB of int64)
_NO_START = np.iinfo(np.int32).max
_NO_END = np.iinfo(np.int32).max


def _host_masks(closed: np.ndarray, starts: np.ndarray, ends: np.ndarray,
                ch: _Chunk):
    """(labels int32[rows], live bool[rows]) for one chunk against one closed
    set.  Labels are a monotone compression of the key column (non-closed
    keys carry their insertion rank), so blocked-locality aggregation works
    over unsorted rows.  A row is live iff its key's session is closed AND
    the session's chunk range [start, end) contains this chunk — rows outside
    it belong to a previous or reopened session of the same key."""
    k = len(closed)
    cmin = int(closed.min())
    cspan = int(closed.max()) - cmin + 1
    cb = ch.bidders
    if cspan <= max(64 * k, _SPAN_LIMIT):
        flag = np.zeros(cspan, bool)
        flag[closed - cmin] = True
        rank = (np.cumsum(flag) - flag).astype(np.int32)
        stab = np.full(cspan, np.iinfo(np.int64).max, np.int64)
        stab[closed - cmin] = starts
        etab = np.full(cspan, -1, np.int64)
        etab[closed - cmin] = ends
        p = cb - cmin
        inr = (p >= 0) & (p < cspan)
        pc = np.where(inr, p, 0)
        lab = np.minimum(rank[pc], k - 1)
        live = inr & flag[pc] & (stab[pc] <= ch.cid) & (ch.cid < etab[pc])
    else:
        ix = np.searchsorted(closed, cb)
        ixc = np.minimum(ix, k - 1)
        lab = ixc.astype(np.int32)
        live = ((closed[ixc] == cb) & (starts[ixc] <= ch.cid)
                & (ch.cid < ends[ixc]))
    return lab, live


class Emission:
    """Sessions closed by one ``advance``/``flush`` call — a LAZY description
    (closed keys + per-session [start, end) chunk ranges + a chunk snapshot).
    Realization is the consumer's choice:

    * ``dense_tables()`` — three small int32 tables (session rank, start
      chunk, end chunk) the device program uses to label/filter HBM-resident
      rows itself: per-emission transfer is O(key span), not O(rows);
    * ``parts()``/``to_batch()`` — host-side per-row labels for the generic
      executors (distributed row-sharding, tests, checkpoints)."""

    def __init__(self, groups: list, chunks: list, t: int):
        # group = (closed sorted, starts, ends) — ends bound gap-closed
        # sessions away from the reopening epoch's chunk
        groups = [g for g in groups if len(g[0])]
        self.t = t
        self.merged = None
        if len(groups) == 1:
            self.merged = groups[0]
        elif groups:
            allc = np.concatenate([g[0] for g in groups])
            alls = np.concatenate([g[1] for g in groups])
            alle = np.concatenate([g[2] for g in groups])
            order = np.argsort(allc, kind="stable")
            allc, alls, alle = allc[order], alls[order], alle[order]
            if not np.any(allc[1:] == allc[:-1]):
                self.merged = (allc, alls, alle)
        self.groups = groups
        lo = min(int(g[0].min()) for g in groups)
        hi = max(int(g[0].max()) for g in groups)
        min_start = min(int(g[1].min()) for g in groups)
        self.chunks = [ch for ch in chunks
                       if ch.cid >= min_start
                       and ch.kmax >= lo and ch.kmin <= hi]

    @property
    def bidders(self) -> np.ndarray:
        if self.merged is not None:
            return self.merged[0]
        return np.concatenate([g[0] for g in self.groups])

    @property
    def n_sessions(self) -> int:
        return sum(len(g[0]) for g in self.groups)

    def dense_tables(self, span_bucket: int):
        """(rank_tab, ok_tab, end_tab, cmin, k) for the device labeling
        program, or None when not expressible (duplicate keys across groups —
        gap≈0 degenerate case — or key span ≥ span_bucket).
        ``rank_tab[key-cmin]`` is the session label (monotone insertion rank
        for non-closed keys); a row in chunk c is live iff
        ok_tab ≤ c.cid < end_tab."""
        if self.merged is None:
            return None
        closed, starts, ends = self.merged
        cmin = int(closed.min())
        span = int(closed.max()) - cmin + 1
        if span >= span_bucket:
            return None
        flag = np.zeros(span_bucket, bool)
        flag[closed - cmin] = True
        rank = (np.cumsum(flag) - flag).astype(np.int32)
        ok = np.full(span_bucket, _NO_START, np.int32)
        ok[closed - cmin] = starts.astype(np.int32)
        endt = np.zeros(span_bucket, np.int32)
        endt[closed - cmin] = np.minimum(ends, _NO_END).astype(np.int32)
        return rank, ok, endt, cmin, len(closed)

    def parts(self):
        """Host-side realization: (chunk, labels, live) per involved chunk,
        with labels offset per group so session ids stay unique."""
        out, off = [], 0
        for closed, starts, ends in self.groups:
            for ch in self.chunks:
                if ch.kmax < closed.min() or ch.kmin > closed.max() \
                        or ch.cid < starts.min():
                    continue
                lab, live = _host_masks(closed, starts, ends, ch)
                if live.any():
                    out.append((ch, lab + np.int32(off), live))
            off += len(closed)
        return out

    @property
    def n_rows(self) -> int:
        return sum(int(lv.sum()) for _, __, lv in self.parts())

    def to_batch(self, sid0: int = 0) -> dict:
        """Host-materialized emitted rows with a ``__session`` id column
        (the generic form fed to arbitrary executors)."""
        parts = self.parts()
        idxs = [(ch, np.flatnonzero(lv), lab) for ch, lab, lv in parts]
        cols = {c: np.concatenate([ch.cols[c][ix] for ch, ix, _ in idxs])
                for c in parts[0][0].cols}
        cols["__session"] = np.concatenate(
            [lab[ix] for _, ix, lab in idxs]).astype(np.int32) + sid0
        return cols


_INF_END = np.iinfo(np.int64).max


class SessionState:
    """Session-window bookkeeping (q11): per-bidder open windows, fully
    vectorized (no per-bidder host loop, no per-row work on the hot path).

    Reference counterpart: window/session.rs:64-178 — a fragment more than
    ``gap`` seconds (second-truncated) after its window's last row closes the
    window; idle windows time out as epochs advance.

    Open-session state is three aligned vectors over the sorted open-key set
    (last row second, session start chunk) plus the retained row chunks.
    Per-epoch statistics use dense key-span scatter tables (NEXMark keys are
    generated near a sliding frontier, so spans stay small — event.rs:171-184)
    with an argsort fallback for sparse keys.  Rows are never mutated:
    exactly-once emission falls out of per-session [start, end) chunk ranges,
    and chunks retire once no open session can reach them.

    The state is checkpointable: ``to_payloads``/``from_payloads`` serialize
    the open windows through the payload codec so a replacement worker resumes
    mid-stream (the reference's S3 window-state checkpoint analogue,
    state/s3.rs + actor.rs:391-413).
    """

    key = "bidder"
    time_col = "b_date_time"

    def __init__(self, gap: int):
        self.gap = gap
        self.chunks: list[_Chunk] = []
        self.ob = np.empty(0, np.int64)         # open session keys, sorted
        self.last_s = np.empty(0, np.int64)     # last row second per key
        self.start_cid = np.empty(0, np.int64)  # chunk id the session opened at
        self.next_cid = 0
        self.epoch = 0

    # -- internals -------------------------------------------------------------

    @staticmethod
    def _per_key_stats(keys: np.ndarray, times: np.ndarray):
        """(uniq sorted keys, first row second, last row second) per key.
        Rows arrive time-ordered within an epoch, so first/last occurrence
        equals min/max; dense scatter tables make this O(n) without a sort.
        Epochs sliced by event second (the generator's layout) hit the
        constant-second fast path: every key's first == last == the epoch's
        second, so only the key-occupancy pass runs."""
        kmin = int(keys.min())
        span = int(keys.max()) - kmin + 1
        n = len(keys)
        tmin = int(times.min())
        const_sec = tmin // 1000 if int(times.max()) // 1000 == tmin // 1000 \
            else None
        if span <= max(64 * n, _SPAN_LIMIT):
            from flock_tpu import native

            st = native.session_stats(keys, times, kmin, span)
            if st is not None:     # one C pass (~1-2 ns/row) instead of
                first_t, last_t = st  # several vectorized numpy passes
                off = np.flatnonzero(last_t >= 0)
                return off + kmin, first_t[off], last_t[off]
            pos = keys - kmin
            if const_sec is not None:
                flag = np.zeros(span, bool)
                flag[pos] = True
                off = np.flatnonzero(flag)
                sec = np.full(len(off), const_sec, np.int64)
                return off + kmin, sec, sec
            secs = times // 1000
            last = np.full(span, -1, np.int64)
            last[pos] = secs
            first = np.empty(span, np.int64)
            first[pos[::-1]] = secs[::-1]
            off = np.flatnonzero(last >= 0)
            return off + kmin, first[off], last[off]
        secs = times // 1000
        order = np.argsort(keys, kind="stable")
        sk, ss = keys[order], secs[order]
        uniq, starts = np.unique(sk, return_index=True)
        ends = np.append(starts[1:], n) - 1
        return uniq, ss[starts], ss[ends]

    def _prune_chunks(self) -> None:
        """A chunk retires once every open session started after it — its
        remaining rows all belong to already-emitted sessions."""
        if not len(self.ob):
            self.chunks = []
            return
        floor = int(self.start_cid.min())
        self.chunks = [c for c in self.chunks if c.cid >= floor]

    # -- epoch advance ---------------------------------------------------------

    def advance(self, bids: dict, t: int, staged=None) -> Emission | None:
        """Feed one epoch's rows; returns the sessions closed by gap/timeout
        (as a lazy Emission over the retained chunks) or None."""
        groups: list[tuple] = []
        n = len(bids[self.key])
        if n:
            keys = np.asarray(bids[self.key]).astype(np.int64, copy=False)
            times = np.asarray(bids[self.time_col])
            uniq, first_sec, last_sec = self._per_key_stats(keys, times)
            if len(self.ob):
                ix = np.searchsorted(self.ob, uniq)
                ixc = np.minimum(ix, len(self.ob) - 1)
                found = (ix < len(self.ob)) & (self.ob[ixc] == uniq)
                gap_close = found & (first_sec - self.last_s[ixc] > self.gap)
            else:
                found = np.zeros(len(uniq), bool)
                gap_close = found
            cid = self.next_cid
            self.next_cid += 1
            if gap_close.any():
                # the closing (old) sessions END at this epoch's chunk: its
                # rows belong to the reopened sessions
                k1 = int(gap_close.sum())
                groups.append((uniq[gap_close],
                               self.start_cid[ixc[gap_close]],
                               np.full(k1, cid, np.int64)))
            self.chunks.append(_Chunk(
                cid=cid, cols={c: np.asarray(v) for c, v in bids.items()},
                bidders=keys, kmin=int(keys.min()), kmax=int(keys.max()),
                staged=staged))
            # merge the open set: epoch keys update last_s; fresh keys (new or
            # gap-reopened) start a session at this chunk
            ob2 = np.union1d(self.ob, uniq)
            last2 = np.empty(len(ob2), np.int64)
            start2 = np.empty(len(ob2), np.int64)
            if len(self.ob):
                po = np.searchsorted(ob2, self.ob)
                last2[po] = self.last_s
                start2[po] = self.start_cid
            pn = np.searchsorted(ob2, uniq)
            last2[pn] = last_sec
            fresh = ~found | gap_close
            start2[pn[fresh]] = cid
            self.ob, self.last_s, self.start_cid = ob2, last2, start2
        # timeout scan (session.rs:136-178): epoch time vs last row time
        now_s = NexmarkConfig().base_time // 1000 + (t + 1)
        cutoff = now_s - self.gap
        to = self.last_s < cutoff
        if to.any():
            groups.append((self.ob[to], self.start_cid[to],
                           np.full(int(to.sum()), _INF_END, np.int64)))
            keep = ~to
            self.ob = self.ob[keep]
            self.last_s = self.last_s[keep]
            self.start_cid = self.start_cid[keep]
        self.epoch = t + 1
        em = Emission(groups, list(self.chunks), t) if groups else None
        self._prune_chunks()
        return em

    def flush(self, seconds: int) -> Emission | None:
        """Close remaining sessions at stream end (bounded-run semantics)."""
        if not len(self.ob):
            return None
        em = Emission(
            [(self.ob, self.start_cid,
              np.full(len(self.ob), _INF_END, np.int64))],
            list(self.chunks), seconds)
        self.ob = np.empty(0, np.int64)
        self.last_s = np.empty(0, np.int64)
        self.start_cid = np.empty(0, np.int64)
        self.chunks = []
        return em

    def _live_row_indices(self):
        ends = np.full(len(self.ob), _INF_END, np.int64)
        idxs = []
        for ch in self.chunks:
            _, live = _host_masks(self.ob, self.start_cid, ends, ch)
            idxs.append((ch, np.flatnonzero(live)))
        return idxs

    def compact(self, max_chunks: int, restage=None) -> None:
        """Bound retained-chunk count (and device buffers/compile signatures)
        by merging live rows into one chunk when long-lived sessions pile up
        epochs (the granule-packing analogue, window/mod.rs:29-56)."""
        if len(self.chunks) <= max_chunks or not len(self.ob):
            return
        idxs = self._live_row_indices()
        cols = {c: np.concatenate([ch.cols[c][ix] for ch, ix in idxs])
                for c in self.chunks[0].cols}
        keys = cols[self.key].astype(np.int64, copy=False)
        cid = self.next_cid
        self.next_cid += 1
        merged = _Chunk(cid=cid, cols=cols, bidders=keys,
                        kmin=int(keys.min()) if len(keys) else 0,
                        kmax=int(keys.max()) if len(keys) else -1,
                        staged=restage(cols) if restage else None)
        self.chunks = [merged]

    # -- checkpoint / resume ---------------------------------------------------

    def to_payloads(self, qid: str):
        from flock_tpu.runtime.payload import FragmentId, Payload

        if not len(self.ob):
            return []
        idxs = self._live_row_indices()
        cols = {c: np.concatenate([ch.cols[c][ix] for ch, ix in idxs])
                for c in self.chunks[0].cols}
        keys = cols[self.key].astype(np.int64, copy=False)
        # group rows per key, chunk (=time) order preserved within key
        order = np.argsort(keys, kind="stable")
        sk = keys[order]
        bounds = np.flatnonzero(np.diff(sk)) + 1
        splits = np.concatenate([[0], bounds, [len(sk)]])
        uniq = sk[splits[:-1]]
        out = []
        for i, bidder in enumerate(uniq.tolist()):
            sel = order[splits[i]:splits[i + 1]]
            out.append(Payload(
                FragmentId(qid, i, len(uniq), shuffle_id=0),
                {c: v[sel] for c, v in cols.items()},
                metadata={"bidder": int(bidder), "epoch": self.epoch}))
        return out

    @classmethod
    def from_payloads(cls, gap: int, payloads) -> "SessionState":
        st = cls(gap=gap)
        payloads = list(payloads)
        if not payloads:
            return st
        bidders = np.array([p.metadata["bidder"] for p in payloads], np.int64)
        # fragments are time-ordered, so the restored window's last row
        # second is the tail of its time column — the open-set/last_s
        # invariant must hold on resume or gap/timeout logic breaks
        last = np.array([int(p.columns[cls.time_col][-1]) // 1000
                         for p in payloads], np.int64)
        order = np.argsort(bidders)
        st.ob = bidders[order]
        st.last_s = last[order]
        st.start_cid = np.zeros(len(payloads), np.int64)
        cols = {c: np.concatenate([p.columns[c] for p in payloads])
                for c in payloads[0].columns}
        keys = cols[cls.key].astype(np.int64, copy=False)
        st.chunks = [_Chunk(cid=0, cols=cols, bidders=keys,
                            kmin=int(keys.min()), kmax=int(keys.max()))]
        st.next_cid = 1
        st.epoch = max(p.metadata["epoch"] for p in payloads)
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

    def run(self, epochs: list[dict],
            prestaged: list | None = None) -> list[WindowResult]:
        kind = self.spec.window[0]
        if kind == "session":
            return self._run_session(epochs, prestaged)
        if kind == "global":
            return self._run_global(epochs, prestaged)
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
                    # relation capacities widen too: join fan-out extras
                    # (duplicate build keys) need free output slots
                    caps = {r: c * 2 for r, c in caps.items()}
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
        ranges = self._window_epoch_ranges(occupancy)
        widx = attempt = 0
        while widx < len(ranges):
            tag, rng = ranges[widx]
            ets = [staged[t] for t in rng if t < len(staged)]
            from flock_tpu.runtime.executor import OverflowError
            try:
                b = self.executor.execute_epochs(ets, statics)
            except OverflowError:
                # static buffers too small (wide key span, or join fan-out
                # extras from duplicate build keys): double the per-epoch
                # capacities, re-stage, retry the window
                attempt += 1
                if attempt > 5:
                    raise
                caps = {r: c * 2 for r, c in caps.items()}
                staged = [self.executor.prepare_window(
                    {rel: e[rel] for rel in rels}, caps) for e in epochs]
                continue
            out.append(WindowResult(tag, self.executor.materialize(b)))
            widx += 1
            attempt = 0   # the widen budget is per WINDOW, like the
            # sibling retry loops — not shared across the stream
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
                caps = {r: c * 2 for r, c in caps.items()}
        return WindowResult(tag, self.executor.materialize(b))

    # -- session windows (q11) ------------------------------------------------

    def _needed_cols(self, bid: dict, extra: tuple[str, ...] = ()) -> dict:
        """Project an input table down to the columns the plan (or the window
        bookkeeping) actually reads — DataFusion-style projection pushdown,
        applied before rows are staged in HBM."""
        from flock_tpu.plan import referenced_columns

        refs = referenced_columns(self.spec.plan)
        if refs is None:
            return bid
        keep = refs | set(self.spec.schema.names) | set(extra)
        return {k: v for k, v in bid.items() if k in keep}

    MAX_CHUNKS = 8

    def prestage(self, epochs) -> list:
        """Stage each epoch's projected driving table in HBM ahead of the
        run (the bench convention reports the feed separately; production
        drivers stage as epochs arrive)."""
        kind = self.spec.window[0]
        out = []
        for tables in epochs:
            if kind == "session":
                bid = self._needed_cols(
                    tables["bid"],
                    extra=(SessionState.key, SessionState.time_col))
            else:
                rel = self.executor._driving_relation()
                bid = self._needed_cols(tables[rel])
                bid.pop("p_time", None)
            n = len(next(iter(bid.values()))) if bid else 0
            out.append(self.executor.stage_chunk(bid) if n else None)
        return out

    def _run_session(self, epochs, prestaged=None) -> list[WindowResult]:
        """STREAMING session windows: sessions closed by gap/timeout are
        executed and emitted per epoch (the reference's per-epoch session
        drain, flock-function/src/aws/window/session.rs:136-178).

        TPU-native dataflow, two tiers:

        * INCREMENTAL device path (runtime/device_session.py) — when the
          plan's session aggregation is incrementally mergeable
          (count/sum/min/max), the whole open-set state lives as dense span
          accumulators in HBM: rows are consumed once, the epoch they
          arrive, and the host's per-epoch work is one dispatch.  Gated on
          gap ≥ 1 s (the per-epoch first/last-second granularity both tiers
          share).
        * generic label-table path — each epoch's (projected) rows are
          staged in HBM exactly once; the host keeps vectorized per-key
          bookkeeping, and an emission ships three O(key-span) label tables;
          closed sessions are assembled and aggregated on device.  Host
          state stays bounded by the OPEN sessions (chunks compact past
          MAX_CHUNKS); remaining sessions flush at stream end."""
        from flock_tpu.runtime import device_session

        gap = self.spec.window[1]
        fs = device_session.session_fast_spec(
            self.spec, SessionState.key, self.executor._driving_relation()) \
            if gap >= 1 else None
        if fs is not None:
            return device_session.run_device_sessions(
                self, epochs, prestaged, fs)
        state = SessionState(gap=self.spec.window[1])
        key, tcol = SessionState.key, SessionState.time_col
        out: list[WindowResult] = []
        t = -1
        for t, tables in enumerate(epochs):
            bid = self._needed_cols(tables["bid"], extra=(key, tcol))
            n = len(bid[key])
            staged = None
            if n:
                staged = prestaged[t] if prestaged is not None \
                    else self.executor.stage_chunk(bid)
            em = state.advance(bid, t, staged=staged) if n or len(state.ob) \
                else None
            if em is not None:
                out.append(self._exec_emission(em))
            state.compact(self.MAX_CHUNKS, restage=self.executor.stage_chunk)
        em = state.flush(t + 1)
        if em is not None:
            out.append(self._exec_emission(em))
        return out

    def _exec_emission(self, em: Emission) -> WindowResult:
        from flock_tpu.runtime.executor import OverflowError

        agg_cap = max(_bucket_cap(em.n_sessions), 128)
        dt = None
        if em.merged is not None and em.chunks and \
                all(ch.staged is not None for ch in em.chunks):
            closed = em.merged[0]
            span = int(closed.max()) - int(closed.min()) + 1
            bucket = max(_bucket_cap(span + 1), 128)
            if bucket <= _SPAN_LIMIT:
                dt = em.dense_tables(bucket)
        if dt is not None:
            chunks = [ch.staged for ch in em.chunks]
            cids = [ch.cid for ch in em.chunks]
            for attempt in range(6):
                try:
                    b = self.executor.execute_session_tables(
                        chunks, SessionState.key, dt, cids, agg_cap)
                    break
                except OverflowError:
                    if attempt == 5:
                        raise
                    agg_cap *= 4
            return WindowResult(("sessions", em.t),
                                self.executor.materialize(b))
        # host fallback: sparse keys, unstaged (restored) chunks, or
        # duplicate keys across close groups (gap≈0)
        bid = em.to_batch()
        rel = self.executor._driving_relation()
        caps = {rel: _bucket_cap(len(bid["__session"]))}
        self.executor.agg_capacity = agg_cap
        return self._execute_retry(("sessions", em.t), {rel: bid}, caps)

    # -- processing-time windows (q12) ---------------------------------------

    def _run_global(self, epochs, prestaged=None) -> list[WindowResult]:
        """STREAMING processing-time windows: each w-epoch arrival window
        executes as soon as it completes; only the current window's staged
        chunks are held (global.rs:161-307).  The processing-time column is
        synthesized ON DEVICE from the arrival epoch (a traced scalar per
        chunk), so zero per-row data moves at emission time; the grouped
        aggregation is sized to the window's observed key span."""
        from flock_tpu.config import CONFIG
        from flock_tpu.runtime.executor import OverflowError

        w = self.spec.window[1]
        rel = self.executor._driving_relation()
        # span-sizing key = the plan's single group key (q12: bidder); the
        # driver is generic over whatever relation/key the plan groups on
        from flock_tpu.plan import Aggregate, walk

        span_keys = [n.group_keys[0] for n in walk(self.spec.plan)
                     if isinstance(n, Aggregate) and len(n.group_keys) == 1
                     and n.group_keys[0] != "p_time"]
        if not span_keys:
            raise ValueError(
                "processing-time driver needs a single-key aggregation")
        span_key = span_keys[0]
        out: list[WindowResult] = []
        pending: list[tuple] = []  # (t, staged Batch, key_min, key_max)
        start = 0

        def emit(start: int) -> WindowResult | None:
            if not pending:
                return None
            chunks = [b for _, b, __, ___ in pending]
            p_times = [tt * 1000 for tt, _, __, ___ in pending]
            span = (max(mx for *_, mx in pending)
                    - min(mn for _, __, mn, ___ in pending) + 1)
            agg_cap = _bucket_cap_fine(span + CONFIG.agg_span_margin)
            pending.clear()
            for attempt in range(6):
                try:
                    b = self.executor.execute_consts(
                        chunks, {"p_time": p_times}, agg_cap)
                    break
                except OverflowError:
                    if attempt == 5:
                        raise
                    agg_cap *= 4
            return WindowResult(("ptime", start, start + w),
                                self.executor.materialize(b))

        t = -1
        for t, tables in enumerate(epochs):
            if t - start >= w:
                r = emit(start)
                if r is not None:
                    out.append(r)
                start = t
            bid = self._needed_cols(tables[rel])
            bid.pop("p_time", None)
            keys = bid[span_key]
            if not len(keys):
                continue
            staged = prestaged[t] if prestaged is not None \
                else self.executor.stage_chunk(bid)
            pending.append((t, staged, int(keys.min()), int(keys.max())))
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
