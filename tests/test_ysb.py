"""Tier-B: YSB pipeline vs numpy oracle (tumbling 10s windows)."""

import numpy as np

import oracle
from flock_tpu.datagen.ysb import YsbConfig
from flock_tpu.queries.ysb import generate_ysb_epochs, run_ysb


def test_ysb_end_to_end():
    cfg = YsbConfig(seconds=20, events_per_second=2000, threads=2)
    results = run_ysb(cfg)
    assert len(results) == 2
    epochs = generate_ysb_epochs(cfg)
    for k, r in enumerate(results):
        chunk = epochs[k * 10:(k + 1) * 10]
        events = {key: np.concatenate([c["ad_event"][key] for c in chunk])
                  for key in chunk[0]["ad_event"]}
        expected = oracle.ysb(events, cfg.ads_per_campaign)
        got = sorted(zip(r.columns["campaign_id"].tolist(),
                         r.columns["count"].tolist()))
        want = sorted(zip(expected["campaign_id"].tolist(),
                          expected["count"].tolist()))
        assert got == want
        # the reference reseeds the per-epoch RNG with the same seed, so every
        # epoch draws the same ad prefix — coverage is high but not total
        assert len(got) > cfg.campaigns * 0.9


def test_ysb_view_fraction():
    # event types cycle uniformly; views ≈ 1/3
    cfg = YsbConfig(seconds=10, events_per_second=3000)
    epochs = generate_ysb_epochs(cfg)
    events = np.concatenate([e["ad_event"]["event_type"] for e in epochs])
    frac = (events == 0).mean()
    assert 0.30 < frac < 0.37
