"""Sliding/Stagger/Rows windows + the Schedule model (window.rs:39-115).

The reference declares all seven window kinds and four schedule kinds but
drives only five window kinds with Schedule::Seconds; here all seven execute,
so these tests pin the semantics against numpy oracles and against the
single-device driver for the distributed variant.
"""

import dataclasses

import numpy as np
import pytest

from flock_tpu.parallel.stream import DistStreamDriver
from flock_tpu.queries.nexmark import get_query
from flock_tpu.runtime.stream import (
    StreamDriver,
    generate_epoch_parts,
    generate_epochs,
)
from flock_tpu.window import (
    Schedule,
    Window,
    sliding_window,
    stagger_window,
    tumbling_window,
)

from oracle import q2 as oracle_q2

SECONDS = 10
EPS = 600


@pytest.fixture(scope="module")
def data():
    return (generate_epochs(SECONDS, EPS, 2),
            generate_epoch_parts(SECONDS, EPS, 2))


def with_window(qnum: int, window: tuple):
    return dataclasses.replace(get_query(qnum), window=window)


def rows(cols, names):
    arrays = [np.asarray(cols[n]) for n in names]
    if not len(arrays[0]):
        return []
    return sorted(zip(*(a.tolist() for a in arrays)))


def merged_bids(epochs, rng):
    keys = epochs[0]["bid"].keys()
    return {k: np.concatenate([epochs[t]["bid"][k] for t in rng])
            for k in keys}


# ---------------------------------------------------------------- schedule --

def test_schedule_rate_parsing():
    assert Schedule.rate("rate(1 second)").to_seconds() == 1
    assert Schedule.rate("rate(5 minutes)").to_seconds() == 300
    assert Schedule.rate("rate(2 hours)").to_seconds() == 7200
    assert Schedule.rate("rate(7 days)").to_seconds() == 604800
    with pytest.raises(ValueError):
        Schedule.rate("every 5 minutes").to_seconds()


def test_schedule_cron_not_executable():
    with pytest.raises(NotImplementedError):
        Schedule.cron("cron(0/10 * ? * MON-FRI *)").to_seconds()


def test_window_lowering():
    assert tumbling_window(10).to_spec() == ("tumbling", 10)
    assert tumbling_window(Schedule.rate("rate(1 minute)")).to_spec() == \
        ("tumbling", 60)
    assert tumbling_window(Schedule.rows(512)).to_spec() == ("rows", 512)
    assert sliding_window(10, 5).to_spec() == ("sliding", 10, 5)
    assert stagger_window(4).to_spec() == ("stagger", 4)
    assert Window("session", Schedule.seconds(10)).to_spec() == \
        ("session", 10)


# ----------------------------------------------------------------- sliding --

def test_sliding_windows_oracle(data):
    epochs, _ = data
    spec = with_window(2, ("sliding", 4, 2))
    results = StreamDriver(spec, SECONDS).run(epochs)
    # slide points 2,4,6,8,10; leading windows partial
    assert [r.tag for r in results] == [
        ("win", 0, 2), ("win", 0, 4), ("win", 2, 6), ("win", 4, 8),
        ("win", 6, 10)]
    names = spec.schema.names
    for r in results:
        _, lo, hi = r.tag
        expect = oracle_q2(merged_bids(epochs, range(lo, hi)))
        assert rows(expect, names) == rows(r.columns, names)


# ----------------------------------------------------------------- stagger --

def test_stagger_anchors_on_first_event(data):
    epochs, _ = data
    # blank epochs 0,1 and 5 → anchors at 2 and (2+3=5 is empty) 6
    empty_bid = {k: v[:0] for k, v in epochs[0]["bid"].items()}
    gapped = [dict(e) for e in epochs]
    for t in (0, 1, 5):
        gapped[t] = {"bid": empty_bid}
    spec = with_window(2, ("stagger", 3))
    results = StreamDriver(spec, SECONDS).run(gapped)
    assert [r.tag for r in results] == [
        ("win", 2, 5), ("win", 6, 9), ("win", 9, 12)]
    names = spec.schema.names
    for r in results:
        _, lo, hi = r.tag
        expect = oracle_q2(merged_bids(gapped, range(lo, min(hi, SECONDS))))
        assert rows(expect, names) == rows(r.columns, names)


def test_stagger_all_occupied_equals_tumbling(data):
    epochs, _ = data
    stag = StreamDriver(with_window(2, ("stagger", 5)), SECONDS).run(epochs)
    tumb = StreamDriver(with_window(2, ("tumbling", 5)), SECONDS).run(epochs)
    names = get_query(2).schema.names
    assert [rows(r.columns, names) for r in stag] == \
        [rows(r.columns, names) for r in tumb]


# -------------------------------------------------------------------- rows --

def test_rows_windows_exact_packing(data):
    epochs, _ = data
    n = 700
    spec = with_window(0, ("rows", n))
    results = StreamDriver(spec, SECONDS).run(epochs)
    names = spec.schema.names
    all_bids = merged_bids(epochs, range(SECONDS))
    total = len(all_bids["bidder"])
    sizes = [len(r.columns[names[0]]) for r in results]
    assert sizes[:-1] == [n] * (total // n)
    assert sizes[-1] == total % n or sizes[-1] == n
    assert sum(sizes) == total
    # q0 is identity: per-window rows == the exact chunk (stream order)
    flat = sorted(r for res in results for r in rows(res.columns, names))
    expect = sorted(zip(*(np.asarray(all_bids[c]).tolist() for c in names)))
    assert flat == expect


# -------------------------------------------------------- distributed ≡ local

@pytest.mark.parametrize("window", [("sliding", 4, 2), ("stagger", 3),
                                    ("rows", 700)])
def test_dist_new_windows_match_local(window, data):
    epochs, parts = data
    spec = with_window(2 if window[0] != "rows" else 0, window)
    local = StreamDriver(spec, SECONDS).run(epochs)
    dist = DistStreamDriver(spec, SECONDS, 8).run(parts)
    names = spec.schema.names
    lrows = sorted(r for res in local for r in rows(res.columns, names))
    drows = sorted(r for res in dist for r in rows(res.columns, names))
    assert lrows == drows
