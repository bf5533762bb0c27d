"""Distributed windowed driver ≡ single-device windowed driver (all window
kinds), on the 8-virtual-device mesh."""

import numpy as np
import pytest

from flock_tpu.parallel.stream import DistStreamDriver
from flock_tpu.queries.nexmark import get_query
from flock_tpu.runtime.stream import (
    StreamDriver,
    generate_epoch_parts,
    generate_epochs,
)

SECONDS = 12
EPS = 800
GENS = 8


@pytest.fixture(scope="module")
def data():
    return (generate_epochs(SECONDS, EPS, GENS),
            generate_epoch_parts(SECONDS, EPS, GENS))


def rows(cols, names):
    arrays = [np.asarray(cols[n]) for n in names]
    if not len(arrays[0]):
        return []
    return sorted(zip(*(a.tolist() for a in arrays)))


@pytest.mark.parametrize("qnum", [4, 5, 7, 11, 12])
def test_dist_windowed_matches_local(qnum, data):
    epochs, parts = data
    spec = get_query(qnum)
    local = StreamDriver(spec, SECONDS).run(epochs)
    dist = DistStreamDriver(spec, SECONDS, 8).run(parts)
    names = spec.schema.names
    lrows = sorted(r for res in local for r in rows(res.columns, names))
    drows = sorted(r for res in dist for r in rows(res.columns, names))
    assert lrows == drows, f"q{qnum}"


def test_dist_session_uses_label_tables(data, monkeypatch):
    """The distributed LABEL-TABLE session tier must ship label tables (SPMD
    label+filter over mesh-resident chunks), NOT re-materialize emission
    rows on the host — and stay row-exact vs the local driver.  q11 now
    defaults to the key-range device-state tier (collective-free;
    exercised by test_dist_windowed_matches_local[11] and the test below),
    so this pins the label-table tier, which remains the fallback for
    non-incremental session plans."""
    import flock_tpu.parallel.stream as pstream
    from flock_tpu.runtime import device_session as ds_mod

    monkeypatch.setattr(ds_mod, "session_fast_spec", lambda *a, **kw: None)
    epochs, parts = data
    spec = get_query(11)
    calls = {"tables": 0, "fallback": 0}
    orig_exec = pstream._dist_session_exec
    orig_fb = pstream.DistStreamDriver._exec_session_batch

    def spy_exec(*a, **kw):
        calls["tables"] += 1
        return orig_exec(*a, **kw)

    def spy_fb(self, bid, tag):
        calls["fallback"] += 1
        return orig_fb(self, bid, tag)

    monkeypatch.setattr(pstream, "_dist_session_exec", spy_exec)
    monkeypatch.setattr(pstream.DistStreamDriver, "_exec_session_batch",
                        spy_fb)
    local = StreamDriver(spec, SECONDS).run(epochs)
    dist = DistStreamDriver(spec, SECONDS, 8).run(parts)
    assert calls["tables"] > 0, "label-table path never executed"
    assert calls["fallback"] == 0, "host fallback used on dense emissions"
    names = spec.schema.names
    lrows = sorted(r for res in local for r in rows(res.columns, names))
    drows = sorted(r for res in dist for r in rows(res.columns, names))
    assert lrows == drows


def test_dist_session_device_tier_default_and_collective_free(data,
                                                              monkeypatch):
    """q11's distributed default is the KEY-RANGE device-state tier:
    per-shard dense span accumulators under shard_map with NO collectives
    (sessions are per-key; shards own disjoint key ranges), row-exact vs
    the local driver.  The label-table exec must never run."""
    import flock_tpu.parallel.stream as pstream

    epochs, parts = data
    spec = get_query(11)
    calls = {"device": 0, "tables": 0}
    orig_dev = pstream.DistStreamDriver._run_session_device

    def spy_dev(self, *a, **kw):
        calls["device"] += 1
        return orig_dev(self, *a, **kw)

    monkeypatch.setattr(pstream.DistStreamDriver, "_run_session_device",
                        spy_dev)
    monkeypatch.setattr(
        pstream, "_dist_session_exec",
        lambda *a, **kw: calls.__setitem__("tables", calls["tables"] + 1))
    # the shuffle tally records collectives at TRACE time — clear the
    # compiled-program cache so this run actually traces (a cache hit would
    # make the empty-tally assertion vacuous)
    import flock_tpu.parallel.shuffle as shuffle

    pstream._DIST_SESS_COMPILED.clear()
    shuffle.TALLY = tally = []
    try:
        local = StreamDriver(spec, SECONDS).run(epochs)
        dist = DistStreamDriver(spec, SECONDS, 8).run(parts)
    finally:
        shuffle.TALLY = None
    assert calls["device"] == 1 and calls["tables"] == 0
    assert tally == [], "device session tier must be collective-free"
    names = spec.schema.names
    lrows = sorted(r for res in local for r in rows(res.columns, names))
    drows = sorted(r for res in dist for r in rows(res.columns, names))
    assert lrows == drows
