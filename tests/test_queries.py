"""Tier-B tests: every NEXMark query, engine vs independent numpy oracle,
row-exact (sorted multiset compare — the analogue of the reference's
assert_batches_sorted_eq!, flock/src/test_util.rs:61-84)."""

import numpy as np
import pytest

import oracle
from flock_tpu.queries.nexmark import get_query
from flock_tpu.runtime.stream import StreamDriver, generate_epochs
from flock_tpu.runtime.tables import concat_relations, default_side_input

SECONDS = 12
EPS = 500
GENERATORS = 2


@pytest.fixture(scope="module")
def epochs():
    return generate_epochs(SECONDS, EPS, GENERATORS)


def rows(cols: dict, names: list[str]):
    arrays = [np.asarray(cols[n]) for n in names]
    if not len(arrays[0]):
        return []
    return sorted(zip(*(a.tolist() for a in arrays)))


def run_engine(qnum: int, epochs, **kw):
    spec = get_query(qnum)
    driver = StreamDriver(spec, SECONDS, **kw)
    return spec, driver.run(epochs)


def window_tables(epochs, rng, relations):
    parts = [epochs[t] for t in rng]
    return concat_relations(parts, relations)


# -- element-wise queries ----------------------------------------------------


@pytest.mark.parametrize("qnum,fn,names", [
    (0, oracle.q0, ["auction", "bidder", "price", "b_date_time"]),
    (1, oracle.q1, ["auction", "bidder", "price", "b_date_time"]),
    (2, oracle.q2, ["auction", "price"]),
    (10, oracle.q0, ["auction", "bidder", "price", "b_date_time"]),
])
def test_elementwise_bid_queries(qnum, fn, names, epochs):
    spec, results = run_engine(qnum, epochs)
    assert len(results) == SECONDS
    for t, r in enumerate(results):
        expected = fn(window_tables(epochs, [t], ("bid",))["bid"])
        assert rows(r.columns, names) == rows(expected, names), f"q{qnum} t={t}"


@pytest.mark.parametrize("qnum,fn,names,rels", [
    (3, oracle.q3, ["name", "city", "state", "a_id"], ("person", "auction")),
    (4, oracle.q4, ["category", "avg_final"], ("auction", "bid")),
    (6, oracle.q6, ["seller", "avg_price"], ("auction", "bid")),
    (9, oracle.q9, ["auction", "bidder", "price", "b_date_time"], ("auction", "bid")),
])
def test_elementwise_join_queries(qnum, fn, names, rels, epochs):
    spec, results = run_engine(qnum, epochs)
    for t, r in enumerate(results):
        tables = window_tables(epochs, [t], rels)
        expected = fn(*[tables[rel] for rel in rels])
        assert rows(r.columns, names) == rows(expected, names), f"q{qnum} t={t}"


def test_q13(epochs):
    side = default_side_input()
    spec, results = run_engine(13, epochs, side_input=side)
    for t, r in enumerate(results):
        bid = window_tables(epochs, [t], ("bid",))["bid"]
        expected = oracle.q13(bid, side)
        assert rows(r.columns, ["auction", "bidder", "price", "b_date_time",
                                "value"]) == \
            rows(expected, ["auction", "bidder", "price", "b_date_time",
                            "value"]), f"t={t}"


# -- windowed queries --------------------------------------------------------


def test_q5_hopping(epochs):
    spec, results = run_engine(5, epochs)
    # seconds=12, w=10, h=5 → single window [0, 10)
    assert len(results) == 1 and results[0].tag == ("win", 0, 10)
    bid = window_tables(epochs, range(0, 10), ("bid",))["bid"]
    expected = oracle.q5(bid)
    assert rows(results[0].columns, ["auction", "num"]) == \
        rows(expected, ["auction", "num"])


def test_q7_tumbling(epochs):
    spec, results = run_engine(7, epochs)
    assert len(results) == 1  # only the complete [0,10) window
    bid = window_tables(epochs, range(0, 10), ("bid",))["bid"]
    expected = oracle.q7(bid)
    assert rows(results[0].columns, ["auction", "price", "bidder",
                                     "b_date_time"]) == \
        rows(expected, ["auction", "price", "bidder", "b_date_time"])


def test_q8_tumbling(epochs):
    spec, results = run_engine(8, epochs)
    assert len(results) == 1
    t = window_tables(epochs, range(0, 10), ("person", "auction"))
    expected = oracle.q8(t["person"], t["auction"])
    assert rows(results[0].columns, ["p_id", "name"]) == \
        rows(expected, ["p_id", "name"])


def test_q11_sessions(epochs):
    spec, results = run_engine(11, epochs)
    got = [r.columns for r in results]
    all_rows = []
    for g in got:
        all_rows += rows(g, ["bidder", "bid_count", "start_time", "end_time"])
    expected = oracle.q11_sessions([e["bid"] for e in epochs], gap=10)
    assert sorted(all_rows) == rows(
        expected, ["bidder", "bid_count", "start_time", "end_time"])


def test_q11_incremental_emission(epochs):
    """Sessions closed by gap/timeout are executed and emitted PER EPOCH
    (bounded host state, the reference's per-epoch session drain,
    session.rs:136-178) — not buffered until stream end."""
    spec, results = run_engine(11, epochs)
    tags = [r.tag for r in results]
    assert all(t[0] == "sessions" for t in tags)
    assert tags == sorted(tags), "results emitted in epoch order"
    # the 10s gap forces timeouts before stream end at this event rate
    assert len(tags) > 1 and tags[0][1] < SECONDS, \
        "mid-stream emission expected (got only a flush batch)"


def test_q12_ptime(epochs):
    spec, results = run_engine(12, epochs)
    assert len(results) == 2  # arrival windows [0,10) and [10,12)
    for wi, (start, r) in enumerate(zip((0, 10), results)):
        chunk = [e["bid"] for e in epochs[start:start + 10]]
        expected = oracle.q12_window(chunk, start)
        assert rows(r.columns, ["bidder", "bid_count", "start_time",
                                "end_time"]) == \
            rows(expected, ["bidder", "bid_count", "start_time", "end_time"])


def test_empty_window():
    # An epoch with no events must execute cleanly and produce zero rows.
    spec = get_query(4)
    driver = StreamDriver(spec, 1)
    empty = concat_relations([], ("person", "auction", "bid"))
    res = driver.run([empty])
    assert len(res) == 1
    assert all(len(v) == 0 for v in res[0].columns.values())


def test_stacked_execution_matches_sequential(epochs):
    # lax.map over stacked windows ≡ per-window execution (the one-dispatch
    # streaming pipeline used by bench.py)
    spec = get_query(2)
    from flock_tpu.runtime.executor import LocalExecutor
    ex = LocalExecutor(spec)
    caps = {"bid": 1024}
    staged = [ex.prepare_window(window_tables(epochs, [t], ("bid",)), caps)
              for t in range(4)]
    stacked_out, _ = ex.execute_stacked(staged)
    for t in range(4):
        want = ex.execute_batches(staged[t])
        import numpy as np
        got_valid = np.asarray(stacked_out.valid[t])
        assert np.array_equal(got_valid, np.asarray(want.valid))
        for c in want.columns:
            assert np.array_equal(
                np.asarray(stacked_out.columns[c][t])[got_valid],
                np.asarray(want.columns[c])[np.asarray(want.valid)])


def test_overflow_auto_retry(epochs):
    # a deliberately tiny aggregate capacity must overflow, then auto-widen
    spec = get_query(12)
    driver = StreamDriver(spec, SECONDS, agg_capacity=128)
    results = driver.run(epochs)
    total = sum(len(next(iter(r.columns.values()))) for r in results)
    # same rows as the default-capacity run
    want = StreamDriver(spec, SECONDS).run(epochs)
    want_total = sum(len(next(iter(r.columns.values()))) for r in want)
    assert total == want_total > 0
