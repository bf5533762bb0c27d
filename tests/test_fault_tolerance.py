"""Fault-tolerance integration: lost-fragment recovery through the state
backend + arena, and retry/backoff policy.

Mirrors the reference flow (actor.rs:186-234): every producer checkpoints each
fragment to the state backend in parallel with sending; a consumer whose
window is starving diffs the backend's stored seqs against its bitmap and
pulls the missing fragments, then processes the window exactly once.
"""

import numpy as np
import pytest

from flock_tpu.queries.nexmark import get_query
from flock_tpu.runtime.arena import Arena, WindowStatus
from flock_tpu.runtime.executor import LocalExecutor
from flock_tpu.runtime.payload import to_fragments
from flock_tpu.runtime.state import FileStateBackend
from flock_tpu.runtime.stream import generate_epochs
from flock_tpu.runtime.tables import concat_relations
from flock_tpu.utils.retry import RetryBudgetExceeded, with_retry


def test_lost_fragment_recovery(tmp_path):
    epochs = generate_epochs(2, 1000)
    window = concat_relations(epochs, ("auction", "bid"))

    backend = FileStateBackend(root=str(tmp_path))
    qid = "q4-test-run"
    frags = {}
    for rel in ("auction", "bid"):
        frags[rel] = to_fragments(window[rel], f"{qid}-{rel}", granule=500)
        for f in frags[rel]:
            backend.write(plan_idx=0, payload=f)   # checkpoint ∥ send

    # delivery loses one bid fragment and duplicates another
    arena = Arena()
    delivered = {"auction": frags["auction"],
                 "bid": [f for i, f in enumerate(frags["bid"]) if i != 1]}
    delivered["bid"].append(frags["bid"][0])  # duplicate
    status = {}
    for rel, fs in delivered.items():
        for f in fs:
            status[rel] = arena.collect(f)
    assert status["bid"] is WindowStatus.NOT_READY

    # starving consumer: bitmap diff → pull missing from the backend
    missing = arena.missing((f"{qid}-bid", 0))
    assert missing == [1]
    for seq in missing:
        recovered = backend.read(f"{qid}-bid", 0, 0, seq)
        assert recovered is not None
        status["bid"] = arena.collect(recovered)
    assert status["bid"] is WindowStatus.READY

    # reassembled window executes identically to the direct path
    tables = {"auction": arena.take((f"{qid}-auction", 0)),
              "bid": arena.take((f"{qid}-bid", 0))}
    spec = get_query(4)
    ex = LocalExecutor(spec)
    got = ex.materialize(ex.execute_window(tables))
    want = ex.materialize(ex.execute_window(window))
    for k in spec.schema.names:
        assert np.array_equal(got[k], want[k])

    # at-least-once: re-delivery of a processed window short-circuits
    assert arena.collect(frags["bid"][0]) is WindowStatus.PROCESSED


def test_retry_backoff():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 4:
            raise TimeoutError("transient")
        return "ok"

    assert with_retry(flaky, sleep=lambda s: None) == "ok"
    assert calls["n"] == 4

    with pytest.raises(RetryBudgetExceeded):
        with_retry(lambda: (_ for _ in ()).throw(OSError("down")),
                   max_retries=3, sleep=lambda s: None)


def test_lost_fragment_recovery_distributed(tmp_path):
    """Lost-fragment recovery feeding the DISTRIBUTED executor on the
    8-shard mesh: the reassembled window (bitmap diff → backend pull) shards
    across the mesh and executes row-exactly vs the direct local path."""
    from flock_tpu.parallel.executor import DistributedExecutor
    from flock_tpu.runtime.executor import materialize_columns

    epochs = generate_epochs(2, 1000)
    window = concat_relations(epochs, ("auction", "bid"))

    backend = FileStateBackend(root=str(tmp_path))
    qid = "q4-dist-run"
    frags = {}
    for rel in ("auction", "bid"):
        frags[rel] = to_fragments(window[rel], f"{qid}-{rel}", granule=500)
        for f in frags[rel]:
            backend.write(plan_idx=0, payload=f)

    arena = Arena()
    delivered = {"auction": frags["auction"],
                 "bid": [f for i, f in enumerate(frags["bid"]) if i != 2]}
    status = {}
    for rel, fs in delivered.items():
        for f in fs:
            status[rel] = arena.collect(f)
    assert status["bid"] is WindowStatus.NOT_READY
    for seq in arena.missing((f"{qid}-bid", 0)):
        status["bid"] = arena.collect(backend.read(f"{qid}-bid", 0, 0, seq))
    assert status["bid"] is WindowStatus.READY

    tables = {"auction": arena.take((f"{qid}-auction", 0)),
              "bid": arena.take((f"{qid}-bid", 0))}
    spec = get_query(4)
    n_shards = 8
    shard_tables = []
    for i in range(n_shards):
        st = {}
        for rel, cols in tables.items():
            n = len(next(iter(cols.values())))
            sel = np.arange(n) % n_shards == i
            st[rel] = {k: np.asarray(v)[sel] for k, v in cols.items()}
        shard_tables.append(st)
    dist = DistributedExecutor(spec, n_shards)
    got = materialize_columns(spec, dist.execute_window(shard_tables))
    ex = LocalExecutor(spec)
    want = ex.materialize(ex.execute_window(window))
    rows = lambda c: sorted(  # noqa: E731
        tuple(round(float(c[k][i]), 6) for k in spec.schema.names)
        for i in range(len(c[spec.schema.names[0]])))
    assert rows(got) == rows(want)
