"""Tests for auxiliary runtime subsystems: payload codec, arena reassembly,
state backends (checkpoint/recovery), sinks, config, metrics.

Mirrors the reference's unit tests for payload/bitmap/encoding/state
(runtime/payload.rs:254-553, arena/{mod,bitmap}.rs, state/s3.rs)."""

import os

import numpy as np
import pytest

from flock_tpu.config import EngineConfig, load_config
from flock_tpu.runtime.arena import Arena, WindowStatus
from flock_tpu.runtime.payload import (
    FragmentId,
    Payload,
    decode,
    encode,
    to_fragments,
)
from flock_tpu.runtime.sink import FileSink, MemorySink, make_sink
from flock_tpu.runtime.state import FileStateBackend, MemoryStateBackend
from flock_tpu.batch import Schema
from flock_tpu.utils.metrics import Metrics


def _cols(n=100, seed=0):
    rng = np.random.default_rng(seed)
    return {"a": rng.integers(0, 1000, n).astype(np.int32),
            "t": rng.integers(0, 10**12, n).astype(np.int64)}


def test_payload_roundtrip_and_compression():
    p = Payload(FragmentId("q4-run1", 2, 5, shuffle_id=3), _cols(5000),
                metadata={"invocation_type": "sync"})
    data = encode(p)
    q = decode(data)
    assert q.fragment == p.fragment
    assert q.metadata == p.metadata
    for k in p.columns:
        assert np.array_equal(p.columns[k], q.columns[k])
    # compression actually compresses the (low-entropy) int columns
    raw_bytes = sum(v.nbytes for v in p.columns.values())
    assert len(data) < raw_bytes


@pytest.mark.parametrize("codec", ["zstd", "zlib", "lz4", "snappy", "none"])
def test_payload_codecs_roundtrip(codec):
    """Every codec roundtrips; the codec rides in the header so any decoder
    handles any producer's payloads (encoding.rs Encoding analogue)."""
    p = Payload(FragmentId("qx", 0, 1), _cols(3000, seed=7),
                metadata={"codec_test": codec})
    data = encode(p, codec=codec)
    q = decode(data)
    assert q.metadata == p.metadata
    for k in p.columns:
        assert np.array_equal(p.columns[k], q.columns[k])


def test_lz4_native_codec():
    """The from-scratch LZ4 block codec (native/codec.cpp) compresses
    repetitive data and roundtrips arbitrary bytes."""
    from flock_tpu.native import lz4_compress, lz4_decompress

    rep = b"flock-tpu " * 10_000
    comp = lz4_compress(rep)
    assert len(comp) < len(rep) // 10
    assert lz4_decompress(comp, len(rep)) == rep
    rnd = np.random.default_rng(3).integers(0, 256, 65_536).astype(
        np.uint8).tobytes()
    assert lz4_decompress(lz4_compress(rnd), len(rnd)) == rnd
    # lz4-coded payloads beat "none" on low-entropy columns
    p = Payload(FragmentId("qz", 0, 1), {"a": np.arange(50_000, dtype=np.int64)})
    assert len(encode(p, codec="lz4")) < len(encode(p, codec="none"))


def test_config_default_codec():
    # zstd is the reference's default encoding (encoding.rs:27-112)
    assert EngineConfig().payload_codec == "zstd"
    cfg = load_config(None)
    assert cfg.payload_codec in ("zstd", "zlib", "lz4", "snappy", "none")


def test_fragment_slicing():
    frags = to_fragments(_cols(1000), "qid", granule=300)
    assert [f.fragment.seq_num for f in frags] == [0, 1, 2, 3]
    assert all(f.fragment.seq_len == 4 for f in frags)
    assert sum(len(f.columns["a"]) for f in frags) == 1000


def test_arena_out_of_order_and_dedup():
    cols = _cols(900, seed=1)
    frags = to_fragments(cols, "w1", granule=300)
    arena = Arena()
    # out-of-order arrival with a duplicate
    assert arena.collect(frags[2]) is WindowStatus.NOT_READY
    assert arena.collect(frags[0]) is WindowStatus.NOT_READY
    assert arena.collect(frags[2]) is WindowStatus.NOT_READY  # dup dropped
    assert arena.missing(("w1", 0)) == [1]
    assert arena.collect(frags[1]) is WindowStatus.READY
    merged = arena.take(("w1", 0))
    for k in cols:
        assert np.array_equal(merged[k], cols[k])
    # re-delivery after processing short-circuits
    assert arena.collect(frags[0]) is WindowStatus.PROCESSED


@pytest.mark.parametrize("backend_fn", [
    lambda tmp: MemoryStateBackend(),
    lambda tmp: FileStateBackend(root=str(tmp)),
])
def test_state_backend_checkpoint_recovery(backend_fn, tmp_path):
    be = backend_fn(tmp_path)
    frags = to_fragments(_cols(600, seed=2), "q5-run", granule=200)
    for f in frags:
        be.write(plan_idx=1, payload=f)
    # a replacement worker recovers the missing fragment set
    assert be.list_seqs("q5-run", 1, 0) == [0, 1, 2]
    got = be.read("q5-run", 1, 0, 2)
    assert np.array_equal(got.columns["a"], frags[2].columns["a"])
    assert be.read("q5-run", 1, 0, 99) is None


def test_sinks(tmp_path):
    schema = Schema(["x", "label"], dictionaries={"label": ["lo", "hi"]})
    cols = {"x": np.array([1, 2], np.int32), "label": np.array([0, 1], np.int32)}
    mem = MemorySink()
    mem.write(("epoch", 0), cols, schema)
    (tag, decoded), = mem.read()
    assert list(decoded["label"]) == ["lo", "hi"]

    fs = FileSink(directory=str(tmp_path), fmt="csv")
    fs.write(("win", 0, 10), cols, schema)
    text = open(fs.read()[0]).read()
    assert text.splitlines()[0] == "x,label"
    assert "2,hi" in text

    bh = make_sink("blackhole")
    bh.write("t", cols, schema)
    assert bh.rows_seen == 2


def test_config_env_override(monkeypatch, tmp_path):
    assert EngineConfig().target_partitions == 8
    toml = tmp_path / "flock.toml"
    toml.write_text("target_partitions = 4\nsession_gap_s = 20\n")
    cfg = load_config(str(toml))
    assert cfg.target_partitions == 4 and cfg.session_gap_s == 20
    monkeypatch.setenv("FLOCK_TPU_TARGET_PARTITIONS", "16")
    assert load_config(str(toml)).target_partitions == 16


def test_metrics():
    m = Metrics()
    m.count("rows", 500)
    with m.timer("exec"):
        pass
    assert m.counters["rows"] == 500
    assert "rows" in m.to_json()


def test_executor_records_metrics():
    """Engine paths feed the global METRICS registry (per-query windows,
    rows, execute time) — the observability the CLI surfaces via --metrics."""
    from flock_tpu.queries.nexmark import get_query
    from flock_tpu.runtime.executor import LocalExecutor
    from flock_tpu.utils.metrics import METRICS

    before = METRICS.counters.get("q2.windows", 0)
    ex = LocalExecutor(get_query(2))
    ex.execute_window({"bid": {
        "auction": np.array([123, 246, 5], np.int32),
        "bidder": np.array([1, 2, 3], np.int32),
        "price": np.array([10, 20, 30], np.int32),
        "b_date_time": np.array([0, 1, 2], np.int32),
    }})
    assert METRICS.counters["q2.windows"] == before + 1
    assert METRICS.counters["q2.rows_in"] >= 3
    assert METRICS.timings["q2.execute_s"] > 0
