"""Tier-B at scale: one ~1M-event window, engine vs oracle, row-exact.

The small tier-B shapes (~6k events/window) cannot exercise span/capacity
behavior — wide key spans, capacity-retry boundaries, blocked-window
locality at real block counts.  This runs ONE large window through q4, q6,
q9 and q11 on the CPU backend (marked slow; single seed, generated once)."""

import numpy as np
import pytest

import oracle
from flock_tpu.queries.nexmark import get_query
from flock_tpu.runtime.stream import StreamDriver, generate_epochs
from flock_tpu.runtime.tables import concat_relations

SECONDS = 4
EPS = 250_000        # ~1M events in one stream


@pytest.fixture(scope="module")
def epochs():
    return generate_epochs(SECONDS, EPS)


@pytest.fixture(scope="module")
def window(epochs):
    return concat_relations(epochs, ("person", "auction", "bid"))


def rows(cols, names):
    arrays = [np.asarray(cols[n]) for n in names]
    if not len(arrays[0]):
        return []
    return sorted(zip(*(a.tolist() for a in arrays)))


@pytest.mark.slow
@pytest.mark.parametrize("qnum,fn,names", [
    (4, oracle.q4, ["category", "avg_final"]),
    (6, oracle.q6, ["seller", "avg_price"]),
    (9, oracle.q9, ["auction", "bidder", "price", "b_date_time"]),
])
def test_large_window_winning_bids(qnum, fn, names, epochs, window):
    spec = get_query(qnum)
    driver = StreamDriver(spec, SECONDS)
    # one whole-stream window: widen the driver's slicing to the full range
    driver._window_epoch_ranges = lambda occupancy=None: [
        (("win", 0, SECONDS), list(range(SECONDS)))]
    results = driver.run(epochs)
    assert len(results) == 1
    got = rows(results[0].columns, names)
    want = rows(fn(window["auction"], window["bid"]), names)
    assert got == want, f"q{qnum}: {len(got)} vs {len(want)} rows"


@pytest.mark.slow
@pytest.mark.parametrize("qnum,fn,names", [
    (4, oracle.q4, ["category", "avg_final"]),
    (9, oracle.q9, ["auction", "bidder", "price", "b_date_time"]),
])
def test_large_window_misaligned_generators(qnum, fn, names):
    """The misaligned-G seed at scale: G=6 with 100000/6 not a multiple of
    50 wraps auction ids hard — at 60k events/s the window holds ~2.1k
    duplicated auction ids with multiplicity up to 8 and join fan-out extras
    ≈1.6× the bid count, driving the capacity-retry path (the static free
    slots don't fit the extras on the first attempt)."""
    misaligned = generate_epochs(SECONDS, 60_000, 6)
    w = concat_relations(misaligned, ("person", "auction", "bid"))
    spec = get_query(qnum)
    driver = StreamDriver(spec, SECONDS)
    driver._window_epoch_ranges = lambda occupancy=None: [
        (("win", 0, SECONDS), list(range(SECONDS)))]
    results = driver.run(misaligned)
    got = rows(results[0].columns, names)
    want = rows(fn(w["auction"], w["bid"]), names)
    assert got == want, f"q{qnum}: {len(got)} vs {len(want)} rows"


@pytest.mark.slow
def test_large_window_sessions(epochs):
    spec = get_query(11)
    driver = StreamDriver(spec, SECONDS)
    results = driver.run(epochs)
    got = sorted(
        (int(r.columns["bidder"][i]), int(r.columns["bid_count"][i]),
         int(r.columns["start_time"][i]), int(r.columns["end_time"][i]))
        for r in results for i in range(len(r.columns["bidder"])))
    want = oracle.q11_sessions([e["bid"] for e in epochs], gap=10)
    want_rows = sorted(zip(*(np.asarray(want[k]).tolist()
                             for k in ("bidder", "bid_count",
                                       "start_time", "end_time"))))
    assert got == want_rows
