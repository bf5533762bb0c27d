"""Source-layer tests: reference-format JSONL round trip (the external
generator-parity proof) and the stream interfaces."""

import numpy as np

from flock_tpu.datagen.sources import (
    JsonFileSource,
    NexmarkSource,
    dump_events_json,
)
from flock_tpu.runtime.stream import generate_epochs
from flock_tpu.utils.testing import assert_columns_equal, pretty_format


def test_json_roundtrip_matches_native(tmp_path):
    # scalar generator (full string fidelity) → reference-format JSONL →
    # parse back → identical numeric columns to the native generator
    paths = dump_events_json(str(tmp_path / "ev"), seconds=1,
                             events_per_second=1000)
    bid = JsonFileSource(paths["bid"], "bid").load()
    person = JsonFileSource(paths["person"], "person").load()
    auction = JsonFileSource(paths["auction"], "auction").load()

    native = generate_epochs(1, 1000)[0]
    assert_columns_equal(bid, native["bid"],
                         ["auction", "bidder", "price", "b_date_time"])
    assert_columns_equal(person, native["person"],
                         ["p_id", "name", "city", "state", "p_date_time"])
    assert_columns_equal(auction, native["auction"],
                         ["a_id", "initial_bid", "reserve", "a_date_time",
                          "expires", "seller", "category"])


def test_source_interfaces():
    eps = NexmarkSource(seconds=1, events_per_second=500).epochs()
    assert len(eps) == 1 and len(eps[0]["bid"]["auction"]) == 460


def test_pretty_format():
    cols = {"a": np.array([1, 22]), "b": np.array([333, 4])}
    text = pretty_format(cols, ["a", "b"])
    assert "| a " in text and "| 22" in text
