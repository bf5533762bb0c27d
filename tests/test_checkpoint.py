"""Checkpoint/resume: session-window state survives a worker replacement.

Reference analogue: window fragments checkpointed to S3 and re-read by a
replacement function instance (SURVEY §5 checkpoint/resume)."""

import numpy as np

from flock_tpu.runtime.state import FileStateBackend
from flock_tpu.runtime.stream import SessionState, generate_epochs


def _session_rows(cols):
    """Emitted batch → [(bidder, count, min_time, max_time)] per session."""
    sid = cols["__session"]
    rows = []
    for s in np.unique(sid):
        m = sid == s
        times = cols["b_date_time"][m]
        rows.append((int(cols["bidder"][m][0]), int(m.sum()),
                     int(times.min()), int(times.max())))
    return rows


def _run_sessions(epochs, gap=10, split_at=None, backend=None, qid="ck"):
    """Run sessionization; optionally checkpoint at split_at and resume into a
    fresh SessionState (simulating a worker replacement)."""
    st = SessionState(gap=gap)
    rows = []
    for t, tables in enumerate(epochs):
        if split_at is not None and t == split_at:
            # checkpoint → "crash" → restore in a new instance
            for p in st.to_payloads(qid):
                backend.write(0, p)
            seqs = backend.list_seqs(qid, 0, 0)
            st = SessionState.from_payloads(
                gap, [backend.read(qid, 0, 0, s) for s in seqs])
        em = st.advance(tables["bid"], t)
        if em is not None:
            rows += _session_rows(em.to_batch())
    em = st.flush(len(epochs))
    if em is not None:
        rows += _session_rows(em.to_batch())
    return sorted(rows)


def test_session_checkpoint_resume(tmp_path):
    # sparse stream → real session gaps and timeouts
    epochs = generate_epochs(16, 200, 1)
    direct = _run_sessions(epochs)
    resumed = _run_sessions(epochs, split_at=8,
                            backend=FileStateBackend(root=str(tmp_path)))
    assert direct == resumed
    assert len(direct) > 0


def test_session_timeout_after_resume(tmp_path):
    """A session open at checkpoint time must still TIME OUT after resume —
    i.e. from_payloads restores the last-row-second bookkeeping, not just the
    fragment rows (the silent failure mode where restored sessions never
    expire)."""
    from flock_tpu.datagen.nexmark import NexmarkConfig

    base = NexmarkConfig().base_time
    bid = {
        "auction": np.array([7, 7], np.int64),
        "bidder": np.array([42, 42], np.int64),
        "price": np.array([100, 200], np.int64),
        "b_date_time": np.array([base, base + 500], np.int64),
    }
    empty = {k: v[:0] for k, v in bid.items()}
    # bidder 42 bids in epoch 0 only; gap=3 → session must close by timeout
    # at epoch 3 (now_s - gap > last_s), which is AFTER the resume at epoch 2
    epochs = [{"bid": bid}] + [{"bid": empty}] * 7
    direct = _run_sessions(epochs, gap=3)
    resumed = _run_sessions(epochs, gap=3, split_at=2,
                            backend=FileStateBackend(root=str(tmp_path)))
    assert direct == resumed == [(42, 2, base, base + 500)]

    # the emission records the CLOSE epoch: by timeout, not end-of-stream
    st = SessionState(gap=3)
    emitted = []
    for t, tables in enumerate(epochs):
        em = st.advance(tables["bid"], t)
        if em is not None:
            emitted.append(em)
    assert emitted and emitted[0].t < len(epochs)
    assert not len(st.ob) and not st.chunks
    assert st.flush(len(epochs)) is None


def test_dist_session_checkpoint_resume_on_mesh(tmp_path):
    """Checkpoint/resume THROUGH the distributed session driver on the
    8-shard mesh (the reference's replacement-worker flow, state/s3.rs +
    actor.rs:391-413, but SPMD): mid-stream the session state serializes to
    the file backend, a replacement driver restores it, restages the
    restored rows into mesh HBM, and the continued run is row-exact vs the
    uninterrupted single-device driver."""
    from flock_tpu.parallel.stream import DistStreamDriver
    from flock_tpu.queries.nexmark import get_query
    from flock_tpu.runtime.stream import (StreamDriver, generate_epoch_parts)

    SEC, EPS, G = 16, 200, 8
    epochs = generate_epochs(SEC, EPS, G)
    parts = generate_epoch_parts(SEC, EPS, G)
    spec = get_query(11)
    want = StreamDriver(spec, SEC).run(epochs)

    def advance_through(driver, state, t, parts_t, out):
        bid = driver._merged_bids(parts_t)
        staged = driver._stage_session_chunk(bid) \
            if len(bid[SessionState.key]) else None
        em = state.advance(bid, t, staged=staged)
        if em is not None:
            r = driver._exec_session_tables(em, ("sessions", t))
            if r is None:
                r = driver._exec_session_batch(em.to_batch(0),
                                               ("sessions", t))
            out.append(r)
        state.compact(StreamDriver.MAX_CHUNKS,
                      restage=driver._stage_session_chunk)

    backend = FileStateBackend(root=str(tmp_path))
    split = 8
    driver = DistStreamDriver(spec, SEC, 8)
    state = SessionState(gap=spec.window[1])
    out = []
    for t in range(split):
        advance_through(driver, state, t, parts[t], out)
    # checkpoint → "crash" → replacement driver + restored state
    for p in state.to_payloads("distck"):
        backend.write(0, p)
    seqs = backend.list_seqs("distck", 0, 0)
    driver2 = DistStreamDriver(spec, SEC, 8)
    state2 = SessionState.from_payloads(
        spec.window[1],
        [backend.read("distck", 0, 0, s) for s in seqs])
    # restage the restored chunk so emissions keep the mesh label-table path
    for ch in state2.chunks:
        ch.staged = driver2._stage_session_chunk(ch.cols)
    for t in range(split, SEC):
        advance_through(driver2, state2, t, parts[t], out)
    em = state2.flush(SEC)
    if em is not None:
        r = driver2._exec_session_tables(em, ("sessions", SEC))
        if r is None:
            r = driver2._exec_session_batch(em.to_batch(0),
                                            ("sessions", SEC))
        out.append(r)

    def allrows(results):
        names = ("bidder", "bid_count", "start_time", "end_time")
        return sorted(
            tuple(int(r.columns[c][i]) for c in names)
            for r in results
            for i in range(len(next(iter(r.columns.values())))))

    got, expect = allrows(out), allrows(want)
    assert len(expect) > 0 and got == expect


def test_device_session_state_checkpoint_resume(tmp_path):
    """Checkpoint/resume for the DEVICE session tier (runtime/device_session):
    the state already IS the per-session aggregates, so the checkpoint is one
    payload of O(open sessions) — no row re-shipping (contrast
    SessionState.to_payloads).  A replacement state restored from the file
    backend continues the stream and the union of emissions is row-exact vs
    the generic-tier run.  Driven at the state layer, exactly like the
    SessionState checkpoint tests above."""
    import jax.numpy as jnp

    from flock_tpu.queries.nexmark import get_query
    from flock_tpu.runtime import device_session as ds

    spec = get_query(11)
    gap = spec.window[1]
    epochs = generate_epochs(16, 200, 1)
    want = _run_sessions(epochs)

    key, tcol = SessionState.key, SessionState.time_col
    fs = ds.session_fast_spec(spec, key, "bid")
    assert fs is not None
    epoch_aggs, accs = ds._acc_plan(fs, key, tcol)
    need = sorted({key, tcol})
    from flock_tpu.batch import TS_BASE, Batch

    kmin = min(int(e["bid"][key].min()) for e in epochs if len(e["bid"][key]))
    kmax = max(int(e["bid"][key].max()) for e in epochs if len(e["bid"][key]))
    m, SE = kmin, 1024
    S_buf = ds._bucket(kmax - kmin + 1 + 1) + SE
    state = ds.init_state(S_buf, accs)
    backend = FileStateBackend(root=str(tmp_path))
    split = 8
    rows = []

    def emit(out_cols, n):
        cols = {c: np.asarray(a)[:n] for c, a in out_cols.items()}
        host = ds.finish_names(fs, key, cols)
        for i in range(n):
            rows.append((int(host["bidder"][i]), int(host["bid_count"][i]),
                         int(host["start_time"][i]) + TS_BASE,
                         int(host["end_time"][i]) + TS_BASE))

    for t, tables in enumerate(epochs):
        if t == split:
            # checkpoint → "crash" → restore into a fresh state
            for p in ds.to_payloads(state, m, accs, "devck", t):
                backend.write(0, p)
            seqs = backend.list_seqs("devck", 0, 0)
            state, ep, ev_floor = ds.from_payloads(
                [backend.read("devck", 0, 0, s) for s in seqs],
                accs, m, S_buf)
            assert ep == split
            # the resumer must seed the closure gate's event floor with the
            # restored minimum last-row second (gate-soundness contract)
            assert ev_floor is not None
        bid = {c: tables["bid"][c] for c in need}
        b = Batch.from_numpy(dict(bid), max(len(bid[key]), 128))
        st2, oc, ov, ne, ovf = ds.step_impl(
            key, tcol, epoch_aggs, accs, SE, 1024, None, True,
            np.int32(gap), np.int32(t + 1 - gap), np.int32(m),
            state, dict(b.columns), b.valid)
        assert not bool(ovf)
        state = st2
        n = int(ne)
        if n:
            emit(oc, n)
    oc, ov, ne = ds.flush_impl(accs, S_buf, np.int32(m), state)
    if int(ne):
        emit(oc, int(ne))
    assert sorted(rows) == want and len(want) > 0


def test_device_session_empty_checkpoint_advances_watermark(tmp_path):
    """A checkpoint with ZERO open sessions still writes its (empty)
    payload: the epoch watermark must advance, or a crash after every
    session closed would restore a stale earlier checkpoint and re-emit
    windows."""
    from flock_tpu.queries.nexmark import get_query
    from flock_tpu.runtime import device_session as ds

    spec = get_query(11)
    fs = ds.session_fast_spec(spec, SessionState.key, "bid")
    _ea, accs = ds._acc_plan(fs, SessionState.key, SessionState.time_col)
    state = ds.init_state(2048, accs)   # nothing open
    backend = FileStateBackend(root=str(tmp_path))
    for p in ds.to_payloads(state, 1000, accs, "devck2", 9):
        backend.write(0, p)
    seqs = backend.list_seqs("devck2", 0, 0)
    assert seqs, "empty checkpoint must still persist the watermark"
    st, ep, ev_floor = ds.from_payloads(
        [backend.read("devck2", 0, 0, s) for s in seqs], accs, 1000, 2048)
    assert ep == 9 and ev_floor is None
    assert not bool(np.asarray(st["open"]).any())


def test_device_session_driver_level_resume(tmp_path):
    """A REPLACEMENT driver resumes the device session tier end-to-end:
    checkpoint payloads restore through run_device_sessions(resume_payloads=,
    t_base=) — the state base/span widen over the restored keys, the closure
    gate seeds from the restored event floor, and timeout cutoffs keep
    counting stream-absolute epochs.  Union of pre-crash emissions and the
    resumed driver's results is row-exact vs the uninterrupted generic run."""
    from flock_tpu.queries.nexmark import get_query
    from flock_tpu.runtime import device_session as ds
    from flock_tpu.runtime.stream import StreamDriver

    spec = get_query(11)
    gap = spec.window[1]
    epochs = generate_epochs(16, 200, 1)
    want = _run_sessions(epochs)

    key, tcol = SessionState.key, SessionState.time_col
    fs = ds.session_fast_spec(spec, key, "bid")
    epoch_aggs, accs = ds._acc_plan(fs, key, tcol)
    from flock_tpu.batch import TS_BASE, Batch

    # first half at the state layer (mirrors a worker that dies at t=8)
    kmin = min(int(e["bid"][key].min()) for e in epochs if len(e["bid"][key]))
    kmax = max(int(e["bid"][key].max()) for e in epochs if len(e["bid"][key]))
    m, SE, split = kmin, 1024, 8
    S_buf = ds._bucket(kmax - kmin + 1 + 1) + SE
    state = ds.init_state(S_buf, accs)
    rows = []
    for t in range(split):
        bid = {c: epochs[t]["bid"][c] for c in (key, tcol)}
        b = Batch.from_numpy(dict(bid), max(len(bid[key]), 128))
        state, oc, _ov, ne, ovf = ds.step_impl(
            key, tcol, epoch_aggs, accs, SE, 1024, None, True,
            np.int32(gap), np.int32(t + 1 - gap), np.int32(m),
            state, dict(b.columns), b.valid)
        assert not bool(ovf)
        n = int(ne)
        if n:
            cols = {c: np.asarray(a)[:n] for c, a in oc.items()}
            host = ds.finish_names(fs, key, cols)
            rows += [(int(host["bidder"][i]), int(host["bid_count"][i]),
                      int(host["start_time"][i]) + TS_BASE,
                      int(host["end_time"][i]) + TS_BASE)
                     for i in range(n)]
    backend = FileStateBackend(root=str(tmp_path))
    for p in ds.to_payloads(state, m, accs, "devck3", split):
        backend.write(0, p)

    # replacement driver: resumes THROUGH the driver loop
    seqs = backend.list_seqs("devck3", 0, 0)
    payloads = [backend.read("devck3", 0, 0, s) for s in seqs]
    driver = StreamDriver(spec, 16)
    res = ds.run_device_sessions(driver, epochs[split:], None, fs,
                                 resume_payloads=payloads, t_base=split)
    for r in res:
        for i in range(len(r.columns["bidder"])):
            rows.append((int(r.columns["bidder"][i]),
                         int(r.columns["bid_count"][i]),
                         int(r.columns["start_time"][i]),
                         int(r.columns["end_time"][i])))
    assert sorted(rows) == want and len(want) > 0
