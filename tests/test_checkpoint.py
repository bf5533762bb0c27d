"""Checkpoint/resume: session-window state survives a worker replacement.

Reference analogue: window fragments checkpointed to S3 and re-read by a
replacement function instance (SURVEY §5 checkpoint/resume)."""

import numpy as np

from flock_tpu.runtime.state import FileStateBackend
from flock_tpu.runtime.stream import SessionState, generate_epochs


def _run_sessions(epochs, gap=10, split_at=None, backend=None, qid="ck"):
    """Run sessionization; optionally checkpoint at split_at and resume into a
    fresh SessionState (simulating a worker replacement)."""
    st = SessionState(gap=gap)
    emitted = []
    for t, tables in enumerate(epochs):
        if split_at is not None and t == split_at:
            # checkpoint → "crash" → restore in a new instance
            for p in st.to_payloads(qid):
                backend.write(0, p)
            seqs = backend.list_seqs(qid, 0, 0)
            st = SessionState.from_payloads(
                gap, [backend.read(qid, 0, 0, s) for s in seqs])
        emitted += st.advance(tables["bid"], t)
    emitted += st.flush(len(epochs))
    rows = []
    for (_, bidder, _t), frags in emitted:
        times = np.concatenate([f["b_date_time"] for f in frags])
        rows.append((bidder, len(times), int(times.min()), int(times.max())))
    return sorted(rows)


def test_session_checkpoint_resume(tmp_path):
    # sparse stream → real session gaps and timeouts
    epochs = generate_epochs(16, 200, 1)
    direct = _run_sessions(epochs)
    resumed = _run_sessions(epochs, split_at=8,
                            backend=FileStateBackend(root=str(tmp_path)))
    assert direct == resumed
    assert len(direct) > 0
