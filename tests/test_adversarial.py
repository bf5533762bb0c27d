"""Adversarial streaming inputs: state and compile counts stay bounded.

Reference analogue: granule packing bounds payload/buffer growth no matter
how hot one window key gets (flock-function/src/aws/window/mod.rs:29-56)."""

import os

import numpy as np
import pytest

from flock_tpu.datagen.nexmark import NexmarkConfig
from flock_tpu.queries.nexmark import get_query
from flock_tpu.runtime.stream import StreamDriver


def _hot_epochs(seconds: int, rows_per_epoch: int):
    """One immortal session: a single bidder bidding continuously — the
    session never gap-closes or times out until the stream ends."""
    base = NexmarkConfig().base_time
    epochs = []
    for t in range(seconds):
        n = rows_per_epoch
        epochs.append({"bid": {
            "auction": np.full(n, 5, np.int64),
            "bidder": np.full(n, 77, np.int64),
            "price": np.arange(n, dtype=np.int64) + 100,
            "b_date_time": base + t * 1000 + np.arange(n, dtype=np.int64) % 1000,
        }})
    return epochs


def test_hot_session_bounded_chunks_and_compiles(monkeypatch):
    """The GENERIC (label-table) session path: chunk compaction bounds host
    state for an immortal session.  q11 now defaults to the incremental
    device path (runtime/device_session.py — no chunks at all), so this test
    pins the generic tier, which remains the fallback for non-incremental
    session plans."""
    import flock_tpu.runtime.stream as stream_mod
    from flock_tpu.runtime import device_session as ds_mod
    from flock_tpu.runtime import executor as ex_mod

    monkeypatch.setattr(ds_mod, "session_fast_spec",
                        lambda *a, **kw: None)
    seen = {"max_chunks": 0}
    real = stream_mod.SessionState

    class Spy(real):
        def compact(self, max_chunks, restage=None):
            super().compact(max_chunks, restage)
            seen["max_chunks"] = max(seen["max_chunks"], len(self.chunks))

    monkeypatch.setattr(stream_mod, "SessionState", Spy)

    spec = get_query(11)
    seconds = 40
    epochs = _hot_epochs(seconds, 500)
    cache_before = ex_mod._run_plan_session_tables._cache_size()
    driver = StreamDriver(spec, seconds)
    results = driver.run(epochs)

    # retained chunks stay bounded by compaction, no matter how long the
    # session lives
    assert 0 < seen["max_chunks"] <= StreamDriver.MAX_CHUNKS
    # one immortal session → exactly one emitted row at flush, exact count
    rows = sum(len(next(iter(r.columns.values()))) for r in results)
    assert rows == 1
    (last,) = [r for r in results if len(next(iter(r.columns.values())))]
    assert int(np.asarray(last.columns["bid_count"])[0]) == 500 * seconds
    # compiled-program growth is bounded (capacity buckets + compaction keep
    # the emission signature set small; no per-epoch fresh XLA programs)
    assert ex_mod._run_plan_session_tables._cache_size() - cache_before <= 4


def test_hot_session_device_path_matches_generic(monkeypatch):
    """The incremental device path and the generic label-table path agree
    row-exactly on the immortal-session stream (and the device path retains
    ZERO row chunks — its state is O(key span), not O(rows))."""
    from flock_tpu.runtime import device_session as ds_mod

    spec = get_query(11)
    seconds = 15
    epochs = _hot_epochs(seconds, 300)
    fast = StreamDriver(spec, seconds).run(epochs)
    monkeypatch.setattr(ds_mod, "session_fast_spec", lambda *a, **kw: None)
    slow = StreamDriver(spec, seconds).run(epochs)

    def allrows(results):
        return sorted(
            tuple(int(r.columns[c][i]) for c in ("bidder", "bid_count",
                                                 "start_time", "end_time"))
            for r in results
            for i in range(len(next(iter(r.columns.values())))))

    assert allrows(fast) == allrows(slow)


def test_hot_session_growing_rate_reuses_capacity_buckets():
    """Epoch sizes that wander (bursts) reuse power-of-two capacity buckets
    instead of compiling one program per distinct row count."""
    from flock_tpu.runtime import executor as ex_mod

    spec = get_query(11)
    base = NexmarkConfig().base_time
    rng = np.random.default_rng(3)
    epochs = []
    seconds = 12
    for t in range(seconds):
        n = int(rng.integers(400, 512))  # distinct sizes, one 512 bucket
        epochs.append({"bid": {
            "auction": np.full(n, 5, np.int64),
            "bidder": np.full(n, 77, np.int64),
            "price": np.arange(n, dtype=np.int64),
            "b_date_time": base + t * 1000 + np.arange(n, dtype=np.int64) % 1000,
        }})
    before = ex_mod._run_plan_session_tables._cache_size()
    results = StreamDriver(spec, seconds).run(epochs)
    assert sum(len(next(iter(r.columns.values()))) for r in results) == 1
    assert ex_mod._run_plan_session_tables._cache_size() - before <= 2


def test_session_sparse_key_span_uses_sorted_fallback():
    """Keys spread over a huge span (no dense table fits) take the
    argsort/searchsorted branches in both the per-key stats and the
    emission masks, and the emission realizes via the host path."""
    base = NexmarkConfig().base_time
    k = np.array([10, 1 << 40, 10, 1 << 40, 77], np.int64)
    bid = {
        "bidder": k,
        "b_date_time": np.full(5, base + 10, np.int64),
        "price": np.arange(5, dtype=np.int64),
        "auction": np.ones(5, np.int64),
    }
    from flock_tpu.runtime.stream import SessionState

    st = SessionState(gap=2)
    assert st.advance(bid, 0) is None
    em = st.flush(1)
    assert em is not None and em.n_sessions == 3
    assert em.dense_tables(1 << 20) is None  # span >> bucket
    cols = em.to_batch()
    sid = cols["__session"]
    counts = sorted(int((sid == s).sum()) for s in np.unique(sid))
    assert counts == [1, 2, 2]


def test_session_stream_soak_mid_stream_emissions():
    """A stream longer than the session gap emits CLOSED sessions mid-stream
    (gap + timeout closes through the device-table path), and the union of
    all emissions is row-exact vs the whole-stream oracle."""
    import sys

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    import oracle

    from flock_tpu.runtime.stream import generate_epochs

    seconds, eps = 24, 20_000
    epochs = generate_epochs(seconds, eps)
    driver = StreamDriver(get_query(11), seconds)
    res = driver.run(epochs)
    assert len(res) > 1, "expected mid-stream emissions, got flush only"
    got = sorted(
        (int(r.columns["bidder"][i]), int(r.columns["bid_count"][i]),
         int(r.columns["start_time"][i]), int(r.columns["end_time"][i]))
        for r in res for i in range(len(r.columns["bidder"])))
    want = oracle.q11_sessions([e["bid"] for e in epochs], gap=10)
    want_rows = sorted(zip(*(np.asarray(want[k]).tolist()
                             for k in ("bidder", "bid_count",
                                       "start_time", "end_time"))))
    assert got == want_rows


@pytest.mark.skipif(not os.environ.get("FLOCK_TPU_SOAK"),
                    reason="opt-in soak (set FLOCK_TPU_SOAK=1); ~2 min on "
                           "the CPU backend, ~24 s on TPU")
def test_session_soak_large():
    """The round-3 hardware soak, promoted to an opt-in test: 24 s x 200k
    events/s q11 with mid-stream session emissions (device label-table
    path), row-exact vs the whole-stream oracle (~96k sessions)."""
    import sys

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    import oracle

    from flock_tpu.runtime.stream import generate_epochs

    seconds, eps = 24, 200_000
    epochs = generate_epochs(seconds, eps)
    driver = StreamDriver(get_query(11), seconds)
    res = driver.run(epochs)
    assert len(res) > 1, "expected mid-stream emissions, got flush only"
    got = sorted(
        (int(r.columns["bidder"][i]), int(r.columns["bid_count"][i]),
         int(r.columns["start_time"][i]), int(r.columns["end_time"][i]))
        for r in res for i in range(len(r.columns["bidder"])))
    want = oracle.q11_sessions([e["bid"] for e in epochs], gap=10)
    want_rows = sorted(zip(*(np.asarray(want[k]).tolist()
                             for k in ("bidder", "bid_count",
                                       "start_time", "end_time"))))
    assert got == want_rows


def _mk_bid_epoch(bidders, secs):
    base = NexmarkConfig().base_time
    n = len(bidders)
    return {"bid": {
        "auction": np.full(n, 5, np.int64),
        "bidder": np.asarray(bidders, np.int64),
        "price": np.arange(n, dtype=np.int64) + 100,
        "b_date_time": base + np.asarray(secs, np.int64) * 1000,
    }}


def _session_rows(results):
    return sorted(
        tuple(int(r.columns[c][i]) for c in ("bidder", "bid_count",
                                             "start_time", "end_time"))
        for r in results
        for i in range(len(next(iter(r.columns.values())))))


@pytest.mark.parametrize("dist", [False, True])
def test_device_session_key_below_first_epoch_min(dist, monkeypatch):
    """A later epoch's key BELOW the first epoch's min must not strand the
    device tier's state base (span growth cannot rebase downward; the base
    now comes from the global key range).  Formerly a retry-budget crash."""
    from flock_tpu.runtime import device_session as ds_mod

    empty = _mk_bid_epoch([], [])
    epochs = [_mk_bid_epoch([5000, 5001, 5002], [0, 0, 0]),
              _mk_bid_epoch([4000], [1])] + [empty] * 13
    spec = get_query(11)
    if dist:
        from flock_tpu.parallel.stream import DistStreamDriver

        parts = [[e] for e in epochs]
        got = _session_rows(DistStreamDriver(spec, len(epochs), 8).run(parts))
    else:
        got = _session_rows(StreamDriver(spec, len(epochs)).run(epochs))
    monkeypatch.setattr(ds_mod, "session_fast_spec", lambda *a, **kw: None)
    want = _session_rows(StreamDriver(spec, len(epochs)).run(epochs))
    assert got == want and len(want) == 4


@pytest.mark.parametrize("dist", [False, True])
def test_device_session_late_rows_event_time_timeouts(dist, monkeypatch):
    """Late rows (event second lagging the arrival epoch) must still time
    sessions out: the merge-only step gate is an EVENT-time bound, not an
    arrival-epoch bound.  Formerly the device tier merged two sessions the
    generic tier (and session.rs semantics) close separately."""
    from flock_tpu.runtime import device_session as ds_mod

    empty = _mk_bid_epoch([], [])
    epochs = ([empty] * 8 + [_mk_bid_epoch([100], [0])] + [empty] * 3
              + [_mk_bid_epoch([100], [12])] + [empty] * 10)
    spec = get_query(11)
    if dist:
        from flock_tpu.parallel.stream import DistStreamDriver

        parts = [[e] for e in epochs]
        got = _session_rows(DistStreamDriver(spec, len(epochs), 8).run(parts))
    else:
        got = _session_rows(StreamDriver(spec, len(epochs)).run(epochs))
    monkeypatch.setattr(ds_mod, "session_fast_spec", lambda *a, **kw: None)
    want = _session_rows(StreamDriver(spec, len(epochs)).run(epochs))
    assert got == want and len(want) == 2
