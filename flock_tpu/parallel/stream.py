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


_DIST_SESS_COMPILED: dict = {}


def _dist_session_fn(executor, spec, cap_sig: tuple, names: tuple,
                     span_bucket: int, agg_cap: int, n_chunks: int):
    """Build (or fetch) the compiled SPMD session-emission program for a
    shape signature (also used by bench/scaling_model.py to trace the
    program's collective bytes at bench-scale shapes without data)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from flock_tpu.parallel.executor import _Ctx, lower_dist
    from flock_tpu.parallel.mesh import AXIS
    from flock_tpu.plan import fuse_join_aggregates

    key_col = SessionState.key
    rel = next(r for r in spec.relations if r != "side_input")
    ck = (spec.plan, executor.n_shards, executor.mesh, cap_sig, names,
          span_bucket, agg_cap)
    if ck not in _DIST_SESS_COMPILED:
        spec_plan = fuse_join_aggregates(spec.plan)
        ctx = _Ctx(executor.n_shards, agg_cap)
        per = len(names) + 1
        names_box = {}

        def local_fn(*flat):
            chunk_data = []
            i = 0
            for _c in range(n_chunks):
                cc = {n: flat[i + j][0] for j, n in enumerate(names)}
                v = flat[i + per - 1][0]
                i += per
                chunk_data.append((cc, v))
            rank_t, ok_t, end_t, scal = flat[i], flat[i + 1], flat[i + 2], \
                flat[i + 3]
            cmin_, k_ = scal[0], scal[1]
            cids_ = scal[2:]
            labs, valids = [], []
            cols_cat = {n: [] for n in names}
            for ci, (cc, v) in enumerate(chunk_data):
                b = cc[key_col]
                p = jnp.clip(b - cmin_, 0, span_bucket - 1)
                labs.append(jnp.minimum(rank_t[p], k_ - 1))
                valids.append(v & (b >= cmin_) & (ok_t[p] <= cids_[ci])
                              & (cids_[ci] < end_t[p]))
                for n in names:
                    cols_cat[n].append(cc[n])
            cols = {n: jnp.concatenate(cols_cat[n]) for n in names}
            cols["__session"] = jnp.concatenate(labs).astype(jnp.int32)
            valid = jnp.concatenate(valids)
            out_cols, out_valid, ovf = lower_dist(
                spec_plan, {rel: (cols, valid)}, ctx)
            out_names = tuple(sorted(out_cols))
            names_box["names"] = out_names
            return (tuple(out_cols[n][None] for n in out_names)
                    + (out_valid[None], ovf.reshape(1, 1)))

        n_in = n_chunks * per
        fm = jax.jit(jax.shard_map(
            local_fn, mesh=executor.mesh,
            in_specs=tuple([P(AXIS, None)] * n_in + [P(None)] * 4),
            out_specs=P(AXIS, None),
        ))
        _DIST_SESS_COMPILED[ck] = (fm, names_box)
    return _DIST_SESS_COMPILED[ck]


def _dist_session_exec(executor, spec, staged_chunks, cids, rank_tab,
                       ok_tab, end_tab, cmin, k, agg_cap):
    """One SPMD dispatch: label + filter mesh-resident session chunk rows
    from broadcast dense tables, then run the plan with distributed
    lowering (partial agg → all_to_all by __session → final agg).

    ``staged_chunks``: dicts of col → [n_shards, cap] mesh-sharded arrays
    (plus ``__valid``); the tables are O(key-span) and replicated — the
    distributed port of runtime/executor._run_plan_session_tables."""
    from flock_tpu.runtime.executor import OverflowError

    names = tuple(sorted(c for c in staged_chunks[0] if c != "__valid"))
    cap_sig = tuple(next(iter(ch.values())).shape[1] for ch in staged_chunks)
    span_bucket = len(rank_tab)
    fm, names_box = _dist_session_fn(
        executor, spec, cap_sig, names, span_bucket, agg_cap,
        len(staged_chunks))

    flat = []
    for ch in staged_chunks:
        flat.extend(ch[n] for n in names)
        flat.append(ch["__valid"])
    scal = np.concatenate([[cmin, k], np.asarray(cids, np.int64)]).astype(
        np.int64)
    outs = fm(*flat, np.asarray(rank_tab), np.asarray(ok_tab),
              np.asarray(end_tab), scal)
    out_names = names_box["names"]
    *col_arrays, valid, ovf = outs
    if bool(np.asarray(ovf).any()):
        raise OverflowError(f"q{spec.number} distributed session overflow")
    valid = np.asarray(valid).reshape(-1)
    return {n: np.asarray(a).reshape(valid.shape[0])[valid]
            for n, a in zip(out_names, col_arrays)}


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

    def _stage_session_chunk(self, cols: dict):
        """Row-shard one epoch's merged rows and stage them as mesh-sharded
        device arrays [n_shards, cap] (each shard's rows live in ITS HBM —
        staged exactly once; emissions later ship only O(key-span) label
        tables, mirroring runtime/stream.py's local label-table path)."""
        import jax
        import numpy as np_
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        from flock_tpu.batch import Batch
        from flock_tpu.parallel.mesh import AXIS
        from flock_tpu.runtime.stream import _bucket_cap

        from flock_tpu.batch import staged_numpy

        n = len(next(iter(cols.values())))
        per = -(-n // self.n_shards)
        cap = _bucket_cap(max(per, 1))
        stacked = {}
        valids = []
        for i in range(self.n_shards):
            sel = np_.arange(n) % self.n_shards == i
            # host-side staging only: the ONE device transfer is the
            # stacked device_put below (Batch.from_numpy would bounce every
            # shard's columns through device arrays first)
            scols, svalid = staged_numpy({k: v[sel] for k, v in cols.items()},
                                         cap)
            for k in cols:
                stacked.setdefault(k, []).append(scols[k])
            valids.append(svalid)
        sh = NamedSharding(self.executor.mesh, P(AXIS, None))
        dev = {k: jax.device_put(np_.stack(v), sh)
               for k, v in stacked.items()}
        dev["__valid"] = jax.device_put(np_.stack(valids), sh)
        return dev

    def _exec_session_tables(self, em, tag: tuple) -> WindowResult:
        """Distributed label-table emission: every shard labels/filters its
        RESIDENT chunk rows from the broadcast dense tables, then the plan
        runs SPMD (partial agg → all_to_all by session → final agg)."""
        import numpy as np_

        from flock_tpu.runtime.stream import _SPAN_LIMIT, _bucket_cap

        dt = None
        if em.merged is not None and em.chunks and \
                all(ch.staged is not None for ch in em.chunks):
            closed = em.merged[0]
            span = int(closed.max()) - int(closed.min()) + 1
            bucket = max(_bucket_cap(span + 1), 128)
            if bucket <= _SPAN_LIMIT:
                dt = em.dense_tables(bucket)
        if dt is None:
            return None
        from flock_tpu.runtime.executor import OverflowError

        rank_tab, ok_tab, end_tab, cmin, k = dt
        agg_cap = max(_bucket_cap(em.n_sessions), 128)
        for attempt in range(6):
            try:
                host = _dist_session_exec(
                    self.executor, self.spec,
                    [ch.staged for ch in em.chunks],
                    np_.asarray([ch.cid for ch in em.chunks], np_.int32),
                    rank_tab, ok_tab, end_tab, cmin, k, agg_cap)
                break
            except OverflowError:
                if attempt == 5:
                    raise
                agg_cap *= 4
        return WindowResult(tag, materialize_columns(self.spec, host))

    def _run_session(self, epoch_parts) -> list[WindowResult]:
        """STREAMING session windows (see StreamDriver._run_session), three
        tiers:

        * KEY-RANGE device-resident state (``_run_session_device``) — when
          the plan is incrementally aggregable, shards own disjoint key
          ranges and each keeps its slice of the dense span accumulators in
          its own HBM.  Sessions are per-key, so the per-epoch step is
          COLLECTIVE-FREE data parallelism: every term of the wall time
          divides by the mesh width (the scaling model's path to the ≥0.8
          axis — SCALING_r05.json stateful_note).
        * label-table path — emissions ship O(key-span) label tables and
          each shard labels its HBM-resident rows itself.
        * host-materializing row-shard fallback (sparse/degenerate keys).
        """
        from flock_tpu.runtime import device_session as ds

        gap = self.spec.window[1]
        rel = next(r for r in self.spec.relations if r != "side_input")
        fs = ds.session_fast_spec(self.spec, SessionState.key, rel) \
            if gap >= 1 else None
        if fs is not None:
            return self._run_session_device(epoch_parts, fs)
        state = SessionState(gap=self.spec.window[1])
        out: list[WindowResult] = []
        sid = 0
        t = -1
        for t, parts in enumerate(epoch_parts):
            bid = self._merged_bids(parts)
            staged = self._stage_session_chunk(bid) \
                if len(bid[SessionState.key]) else None
            em = state.advance(bid, t, staged=staged)
            if em is not None:
                r = self._exec_session_tables(em, ("sessions", t))
                if r is None:     # host fallback (sparse/degenerate)
                    b = em.to_batch(sid)
                    sid += em.n_sessions
                    r = self._exec_session_batch(b, ("sessions", t))
                out.append(r)
            state.compact(StreamDriver.MAX_CHUNKS,
                          restage=self._stage_session_chunk)
        em = state.flush(t + 1)
        if em is not None:
            r = self._exec_session_tables(em, ("sessions", t + 1))
            if r is None:
                r = self._exec_session_batch(em.to_batch(sid),
                                             ("sessions", t + 1))
            out.append(r)
        return out

    # -- key-range device-resident sessions ----------------------------------

    def _run_session_device(self, epoch_parts, fs) -> list[WindowResult]:
        """Key-range sharded incremental sessions (runtime/device_session
        per shard, under shard_map — no collectives).  Key-space growth
        restarts the run with doubled per-shard spans: range boundaries move
        with the span, so in-place growth would strand state on the wrong
        shard (growth is rare — the initial span anticipates linear key
        growth across the stream)."""
        from flock_tpu.runtime import device_session as ds

        key, tcol = SessionState.key, SessionState.time_col
        epoch_aggs, accs = ds._acc_plan(fs, key, tcol)
        need = sorted({key, tcol}
                      | {c for c, _f, _o in epoch_aggs if c is not None})
        metas = []
        for parts in epoch_parts:
            bid = self._merged_bids(parts)
            bid = {c: bid[c] for c in need}
            k = bid[key]
            metas.append((len(k), int(k.min()) if len(k) else 0,
                          int(k.max()) if len(k) else -1, bid,
                          *ds._event_sec_range(bid.get(SessionState.time_col))))
        first = next((t for t in range(len(metas)) if metas[t][0]), None)
        if first is None:
            return []
        # global key range: a later epoch's key below the first epoch's min
        # must not strand the base (range boundaries cannot rebase downward)
        m = min(mn for nn, mn, *_ in metas if nn)
        kmax_all = max(mx for nn, _mn, mx, *_ in metas if nn)
        for attempt in range(6):
            S_shard = ds._bucket(
                max((kmax_all - m + 1) // self.n_shards, 1) + 4096
            ) * (2 ** attempt)
            res = self._session_device_once(metas, first, fs, epoch_aggs,
                                            accs, m, S_shard,
                                            8192 * (2 ** attempt))
            if res is not None:
                return res
        raise RuntimeError("distributed device sessions: span retry budget")

    def _session_device_once(self, metas, first, fs, epoch_aggs, accs,
                             m, S_shard, cap_out0):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        from flock_tpu.batch import staged_numpy
        from flock_tpu.parallel.mesh import AXIS
        from flock_tpu.runtime import device_session as ds
        from flock_tpu.runtime.stream import _bucket_cap

        key, tcol = SessionState.key, SessionState.time_col
        gap = self.spec.window[1]
        n = self.n_shards
        mesh = self.executor.mesh
        sh_row = NamedSharding(mesh, P(AXIS, None))
        sh_vec = NamedSharding(mesh, P(AXIS))
        state_names = ("open", "last_s") + tuple(nm for nm, _ in accs)
        idents = {"open": False, "last_s": ds.I32_MIN}
        idents.update({nm: ident for nm, (_e, _f, _d, ident) in accs})
        dts = {"open": np.bool_, "last_s": np.int32}
        dts.update({nm: (np.int64 if _d == jnp.int64 else np.int32)
                    for nm, (_e, _f, _d, _i) in accs})
        # buffers carry an S_shard tail pad (device_session.step_impl's
        # window merge uses SE = S_shard here, so the pad keeps the merge
        # slice from clamping); each shard's LOGICAL range stays S_shard
        state = {nm: jax.device_put(
            np.full((n, 2 * S_shard), idents[nm], dts[nm]), sh_row)
            for nm in state_names}
        m_sh = jax.device_put(
            (m + np.arange(n, dtype=np.int64) * S_shard).astype(np.int32),
            sh_vec)

        def build_fns(cap, cap_out, may_close):
            ck = ("devsess", self.spec.plan, n, mesh, S_shard, cap, cap_out,
                  may_close)
            if ck in _DIST_SESS_COMPILED:
                return _DIST_SESS_COMPILED[ck]

            def local_step(st, cols, valid, msh, scal):
                st1 = {k2: v[0] for k2, v in st.items()}
                cc = {k2: v[0] for k2, v in cols.items()}
                st2, oc, ov, ne, ovf = ds.step_impl(
                    key, tcol, epoch_aggs, accs, S_shard, cap_out,
                    fs.s_loc, may_close, scal[0], scal[1], msh[0],
                    st1, cc, valid[0])
                return ({k2: v[None] for k2, v in st2.items()},
                        {k2: v[None] for k2, v in oc.items()},
                        ne.reshape(1), ovf.reshape(1))

            fn = jax.jit(jax.shard_map(
                local_step, mesh=mesh,
                in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS, None),
                          P(AXIS), P(None)),
                out_specs=(P(AXIS, None), P(AXIS, None), P(AXIS), P(AXIS))))
            _DIST_SESS_COMPILED[ck] = fn
            return fn

        def build_flush(cap_out):
            ck = ("devsess_flush", self.spec.plan, n, mesh, S_shard, cap_out)
            if ck in _DIST_SESS_COMPILED:
                return _DIST_SESS_COMPILED[ck]

            def local_flush(st, msh):
                st1 = {k2: v[0] for k2, v in st.items()}
                oc, ov, ne = ds.flush_impl(accs, cap_out, msh[0], st1)
                return ({k2: v[None] for k2, v in oc.items()},
                        ne.reshape(1))

            fn = jax.jit(jax.shard_map(
                local_flush, mesh=mesh,
                in_specs=(P(AXIS, None), P(AXIS)),
                out_specs=(P(AXIS, None), P(AXIS))))
            _DIST_SESS_COMPILED[ck] = fn
            return fn

        need = sorted({key, tcol}
                      | {c for c, _f, _o in epoch_aggs if c is not None})

        def materialize(oc, ne_host, tag):
            names_oc = sorted(oc)
            fetched = jax.device_get([oc[c] for c in names_oc])
            cols = {c: np.concatenate(
                [a[i, :ne_host[i]] for i in range(n)])
                for c, a in zip(names_oc, fetched)}
            host = ds.finish_names(fs, key, cols)
            return WindowResult(tag, materialize_columns(self.spec, host))

        out: list[WindowResult] = []
        cap_out = cap_out0
        min_ev_seen = None
        for t in range(first, len(metas)):
            nrows, _mn, _mx, bid, ev_mn, ev_mx = metas[t]
            min_ev_seen, may_close = ds.closure_gate(
                min_ev_seen, ev_mn, ev_mx, nrows, t, gap)
            if nrows:
                k = bid[key]
                part = np.clip((np.asarray(k, np.int64) - m) // S_shard,
                               0, n - 1)
                per = int(max(np.bincount(part, minlength=n).max(), 1))
                cap = _bucket_cap(per)
                stacked = {c: [] for c in need}
                valids = []
                for i in range(n):
                    sel = part == i
                    scols, svalid = staged_numpy(
                        {c: np.asarray(bid[c])[sel] for c in need}, cap)
                    for c in need:
                        stacked[c].append(scols[c])
                    valids.append(svalid)
                cols_dev = {c: jax.device_put(np.stack(v), sh_row)
                            for c, v in stacked.items()}
                valid_dev = jax.device_put(np.stack(valids), sh_row)
            else:
                cap = 128
                cols_dev = {c: jax.device_put(
                    np.zeros((n, cap), np.int32), sh_row) for c in need}
                valid_dev = jax.device_put(np.zeros((n, cap), bool), sh_row)
            scal = np.asarray([gap, t + 1 - gap], np.int32)
            fn = build_fns(cap, cap_out, may_close)
            state2, oc, ne, ovf = fn(state, cols_dev, valid_dev, m_sh, scal)
            ovf_h, ne_h = jax.device_get((ovf, ne))
            if bool(np.asarray(ovf_h).any()):
                return None       # span/output growth → caller restarts
            state = state2
            if may_close and int(np.asarray(ne_h).sum()):
                out.append(materialize(oc, np.asarray(ne_h),
                                       ("sessions", t)))

        flush = build_flush(S_shard)
        oc, ne = flush(state, m_sh)
        ne_h = np.asarray(jax.device_get(ne))
        if int(ne_h.sum()):
            out.append(materialize(oc, ne_h, ("sessions", len(metas))))
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
