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
