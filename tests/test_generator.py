"""Tier-A tests: deterministic generators (NEXMark + YSB).

Mirrors the reference's generator tests (flock/src/datasource/nexmark/
nexmark.rs:421-454: exact event counts per epoch; determinism) and adds the
scalar-Python vs native-C++ equivalence check.
"""

import numpy as np
import pytest

from flock_tpu.datagen import ysb as ysb_mod
from flock_tpu.datagen.native_gen import nexmark_generate_partition
from flock_tpu.datagen.nexmark import (
    NexmarkConfig,
    ScalarGenerator,
    US_STATES,
)

COLS = [
    "p_id", "p_name_code", "p_city_code", "p_state_code", "p_date_time",
    "a_id", "a_initial_bid", "a_reserve", "a_date_time", "a_expires",
    "a_seller", "a_category",
    "b_auction", "b_bidder", "b_price", "b_date_time",
]


def test_scalar_native_equivalence():
    cfg = NexmarkConfig(events_per_second=2000, num_event_generators=2)
    for partition in (0, 1):
        py = ScalarGenerator(cfg, seconds=2).generate_partition(partition)
        nat = nexmark_generate_partition(cfg, 2, partition)
        assert len(py) == len(nat)
        for a, b in zip(py, nat):
            assert a.epoch == b.epoch
            for f in COLS:
                assert np.array_equal(getattr(a, f), getattr(b, f)), f


def test_event_counts_match_reference():
    # nexmark.rs:428-454: 10 threads, 1s, 10_000 eps => 10_000 total events,
    # split 1000 per generator; proportions 1:3:46 over blocks of 50.
    cfg = NexmarkConfig(events_per_second=10_000, num_event_generators=10)
    total = 0
    for p in range(10):
        eps = nexmark_generate_partition(cfg, 1, p)
        assert len(eps) == 1
        e = eps[0]
        n = len(e.p_id) + len(e.a_id) + len(e.b_auction)
        assert len(e.p_id) == 20      # 1000/50 * 1
        assert len(e.a_id) == 60      # 1000/50 * 3
        assert len(e.b_auction) == 920  # 1000/50 * 46
        total += n
    assert total == 10_000


def test_determinism_across_runs():
    cfg = NexmarkConfig(events_per_second=1000)
    a = nexmark_generate_partition(cfg, 1, 0)
    b = nexmark_generate_partition(cfg, 1, 0)
    for x, y in zip(a, b):
        for f in COLS:
            assert np.array_equal(getattr(x, f), getattr(y, f))


def test_timestamps_monotone_and_epoch_consistent():
    cfg = NexmarkConfig(events_per_second=1000)
    eps = nexmark_generate_partition(cfg, 3, 0)
    for e in eps:
        for ts in (e.p_date_time, e.a_date_time, e.b_date_time):
            if len(ts):
                assert np.all(np.diff(ts) >= 0)
                assert np.all((ts - cfg.base_time) // 1000 == e.epoch)


def test_hot_key_skew():
    # Hot auctions get ~50% of bids (hot_auction_ratio=2, event.rs:355-359);
    # hot auction ids are multiples of 100 (pre-offset).
    cfg = NexmarkConfig(events_per_second=100_000)
    e = nexmark_generate_partition(cfg, 1, 0)[0]
    hot = ((e.b_auction - 1000) % 100 == 0).mean()
    assert 0.45 < hot < 0.56
    # Hot bidders ~75% (ratio 4): ids ≡ 1 mod 100 pre-offset.
    hot_b = ((e.b_bidder - 1000) % 100 == 1).mean()
    assert 0.70 < hot_b < 0.80


def test_id_ranges():
    cfg = NexmarkConfig(events_per_second=10_000)
    e = nexmark_generate_partition(cfg, 1, 0)[0]
    assert np.all(e.p_id >= 1000)
    assert np.all(e.a_id >= 1000)
    assert np.all((e.a_category >= 10) & (e.a_category < 15))
    assert np.all((e.p_state_code >= 0) & (e.p_state_code < len(US_STATES)))
    assert np.all(e.a_expires > e.a_date_time)
    assert np.all(e.b_price >= 100)  # min price: round(10^0 * 100)
    assert np.all(e.a_reserve >= e.a_initial_bid)


def test_partition_offsets_disjoint_event_ids():
    # event.rs:86-88: partition p offsets ids by (100_000/num_gens)*p, so the
    # p_id/a_id streams of different partitions interleave deterministically.
    cfg = NexmarkConfig(events_per_second=2000, num_event_generators=2)
    e0 = nexmark_generate_partition(cfg, 1, 0)[0]
    e1 = nexmark_generate_partition(cfg, 1, 1)[0]
    assert not np.array_equal(e0.b_auction, e1.b_auction)
    # same timeline => identical timestamps
    assert np.array_equal(e0.b_date_time, e1.b_date_time)


def test_ysb_scalar_native_equivalence():
    cfg = ysb_mod.YsbConfig(seconds=2, events_per_second=2000, threads=2)
    for idx in (0, 1):
        py = ysb_mod.scalar_generate_partition(cfg, idx)
        nat = ysb_mod.generate_partition(cfg, idx)
        for k in py:
            assert np.array_equal(py[k], nat[k]), k


def test_ysb_counts_and_epochs():
    cfg = ysb_mod.YsbConfig(seconds=3, events_per_second=3000, threads=1)
    d = ysb_mod.generate_partition(cfg, 0)
    assert len(d["ad_id"]) == pytest.approx(9000, abs=3)
    assert set(np.unique(d["epoch"]).tolist()) == {0, 1, 2}
    assert d["ad_id"].max() < cfg.num_ads
    assert d["event_type"].max() <= 2


def test_out_of_order_groups():
    # out-of-order-group-size > 1 permutes event timestamps within groups
    # (config.rs:275-279: (e/n)*n + (e*953)%n); epoch slicing follows the
    # monotonic loop clock, exactly like the reference's next_epoch
    cfg = NexmarkConfig(events_per_second=1000, out_of_order_group_size=100)
    eps = nexmark_generate_partition(cfg, 2, 0)
    assert len(eps) == 2
    ts = eps[0].b_date_time
    assert len(ts) == 920
    assert np.any(np.diff(ts) < 0)          # genuinely out of order
    # counts are conserved vs in-order generation (events permute, not drop)
    cfg2 = NexmarkConfig(events_per_second=1000)
    in_order = nexmark_generate_partition(cfg2, 2, 0)
    assert sum(len(e.b_price) for e in eps) == \
        sum(len(e.b_price) for e in in_order)
