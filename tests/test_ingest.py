"""External stream ingestion: out-of-order fragments → arena → windowed
query, row-exact vs the direct path (the kafka-trigger ingest analogue,
kafka.rs:35-110 + the actor's collect loop, actor.rs:99-123)."""

import base64
import json
import random
import threading

import numpy as np
import pytest

import oracle
from flock_tpu.datagen.ingest import (
    EpochAssembler,
    FileTailSource,
    IngestDriver,
    SocketIngestServer,
    fragment_lines,
    kafka_event_to_columns,
    send_fragments,
)
from flock_tpu.queries.nexmark import get_query
from flock_tpu.runtime.stream import StreamDriver, generate_epochs

SECONDS = 6
EPS = 800


@pytest.fixture(scope="module")
def epochs():
    return generate_epochs(SECONDS, EPS, 2)


def rows(cols, names):
    arrays = [np.asarray(cols[n]) for n in names]
    if not len(arrays[0]):
        return []
    return sorted(zip(*(a.tolist() for a in arrays)))


def all_rows(results, names):
    return sorted(r for res in results for r in rows(res.columns, names))


def scrambled(lines, seed=7, dup=5):
    """Out-of-order + duplicated delivery (Lambda is at-least-once)."""
    rng = random.Random(seed)
    out = list(lines)
    rng.shuffle(out)
    for _ in range(dup):
        out.insert(rng.randrange(len(out) + 1), rng.choice(lines))
    return out


def test_ingest_out_of_order_q2(epochs):
    spec = get_query(2)
    lines = fragment_lines(epochs, "q2", granule=512, relations=("bid",))
    results = IngestDriver(spec, SECONDS, "q2").run(scrambled(lines))
    direct = StreamDriver(spec, SECONDS).run(epochs)
    names = spec.schema.names
    assert all_rows(results, names) == all_rows(direct, names)


def test_ingest_multi_relation_q3(epochs):
    spec = get_query(3)
    lines = fragment_lines(epochs, "q3", granule=256,
                           relations=("person", "auction"))
    results = IngestDriver(spec, SECONDS, "q3").run(scrambled(lines, seed=3))
    direct = StreamDriver(spec, SECONDS).run(epochs)
    names = spec.schema.names
    assert all_rows(results, names) == all_rows(direct, names)


def test_ingest_incomplete_stream_raises(epochs):
    spec = get_query(2)
    lines = fragment_lines(epochs, "qx", granule=512)
    with pytest.raises(ValueError, match="incomplete"):
        IngestDriver(spec, SECONDS, "qx").run(lines[:-1])


def test_epoch_assembler_in_order_release(epochs):
    lines = fragment_lines(epochs, "qa", granule=512)
    asm = EpochAssembler("qa", ("bid",), SECONDS)
    released = []
    for line in reversed(lines):  # worst case: fully reversed arrival
        released.extend(t for t, _ in asm.feed(line))
    assert released == list(range(SECONDS))
    assert asm.done


def test_socket_ingest_end_to_end(epochs):
    spec = get_query(2)
    lines = scrambled(fragment_lines(epochs, "qs", granule=512), seed=11)
    srv = SocketIngestServer()
    try:
        producer = threading.Thread(
            target=send_fragments, args=(srv.address, lines), daemon=True)
        producer.start()
        results = IngestDriver(spec, SECONDS, "qs").run(
            srv.lines(len(lines), timeout_s=60))
        producer.join(10)
    finally:
        srv.close()
    direct = StreamDriver(spec, SECONDS).run(epochs)
    names = spec.schema.names
    assert all_rows(results, names) == all_rows(direct, names)


def test_file_tail_ingest(tmp_path, epochs):
    spec = get_query(2)
    lines = scrambled(fragment_lines(epochs, "qf", granule=512), seed=5)
    log = tmp_path / "frags.jsonl"
    log.write_text("")

    def producer():
        with open(log, "a") as f:
            for i, line in enumerate(lines):
                f.write(line + "\n")
                if i % 7 == 0:
                    f.flush()
            f.flush()

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    src = FileTailSource(str(log), n_lines=len(lines), timeout_s=60)
    results = IngestDriver(spec, SECONDS, "qf").run(src)
    t.join(10)
    direct = StreamDriver(spec, SECONDS).run(epochs)
    names = spec.schema.names
    assert all_rows(results, names) == all_rows(direct, names)


def test_kafka_trigger_nexmark_payload(epochs):
    """A kafka trigger event whose record values are reference-format bid
    rows routes to the typed bid parser, row-exact vs the source epoch."""
    bid = epochs[0]["bid"]
    lines = [json.dumps({
        "auction": int(bid["auction"][i]), "bidder": int(bid["bidder"][i]),
        "price": int(bid["price"][i]),
        "b_date_time": int(bid["b_date_time"][i]),
    }) for i in range(len(bid["auction"]))]
    event = {"records": {"topic-0": [
        {"value": base64.b64encode(l.encode()).decode()} for l in lines]}}
    rel, cols = kafka_event_to_columns(event)
    assert rel == "bid"
    exp = oracle.q0(bid)
    names = ["auction", "bidder", "price", "b_date_time"]
    assert rows(cols, names) == rows(exp, names)


def test_send_fragments_reconnects_midstream(epochs, monkeypatch):
    """A transport fault mid-send reconnects with backoff and resumes from
    the first unsent line (at-least-once; the arena dedups duplicates)."""
    import socket as socket_mod

    from flock_tpu.datagen.ingest import SocketIngestServer

    lines = fragment_lines(epochs[:2], "retry-q", granule=256)
    srv = SocketIngestServer()
    real_socket = socket_mod.socket
    state = {"calls": 0}

    # the producer creates its socket directly (it must pin SO_SNDBUF before
    # connect to bound the resend rewind), so fault injection wraps
    # socket.socket itself; connects are counted per producer socket
    class _FlakySock:
        def __init__(self, *a, **kw):
            self._inner = real_socket(*a, **kw)
            self._sent = 0

        def __enter__(self):
            return self

        def __exit__(self, *a):
            self._inner.close()

        def __getattr__(self, name):
            return getattr(self._inner, name)

        def connect(self, address):
            state["calls"] += 1
            return self._inner.connect(address)

        def sendall(self, data):
            self._sent += 1
            if state["calls"] == 1 and self._sent > len(lines) // 2:
                raise ConnectionResetError("injected mid-stream fault")
            self._inner.sendall(data)

    monkeypatch.setattr("socket.socket", _FlakySock)
    try:
        send_fragments(srv.address, lines)
        # the reconnect rewinds past possibly-undelivered lines, so the
        # server sees len(lines) + duplicates; poll the buffer (BEFORE
        # close — shutdown stops the handler threads feeding it) until
        # every unique line has arrived at least once
        import time as _time

        deadline = _time.monotonic() + 120
        got: list = []
        while _time.monotonic() < deadline:
            with srv._cv:
                got = list(srv._lines)
            if set(got) >= set(lines):
                break
            _time.sleep(0.05)
    finally:
        srv.close()
    assert state["calls"] >= 2  # really reconnected
    # every line arrives at least once (duplicates allowed, arena dedups)
    assert set(got) >= set(lines)


def test_file_state_write_retries_transient_fault(tmp_path, monkeypatch):
    """FileStateBackend.write survives a transient filesystem fault via the
    reference's linear-random backoff policy (aws/lambda.rs:104-152)."""
    import os as os_mod

    from flock_tpu.runtime.payload import FragmentId, Payload
    from flock_tpu.runtime.state import FileStateBackend

    backend = FileStateBackend(root=str(tmp_path))
    p = Payload(FragmentId("rq", 0, 1, 0),
                {"bidder": np.array([1, 2], np.int64),
                 "b_date_time": np.array([10, 20], np.int64)})
    real_replace = os_mod.replace
    state = {"fails": 2}

    def flaky_replace(src, dst):
        if state["fails"] > 0:
            state["fails"] -= 1
            raise OSError("injected transient fault")
        return real_replace(src, dst)

    monkeypatch.setattr("os.replace", flaky_replace)
    backend.write(0, p)
    assert state["fails"] == 0
    got = backend.read("rq", 0, 0, 0)
    assert got is not None and got.columns["bidder"].tolist() == [1, 2]
