"""ctypes wrapper over the native generator (flock_tpu/native/flockgen.cpp).

Produces the same ``EpochColumns`` as the scalar Python generator, but at
native speed and directly in columnar (SoA) form — the TPU-native replacement
for the reference's per-event JSON serialize → Arrow JSON-reader decode path
(flock/src/datasource/nexmark/generator.rs:70-99, flock/src/transmute.rs:255-266).
"""

from __future__ import annotations

import ctypes

import numpy as np

from flock_tpu.datagen.nexmark import EpochColumns, NexmarkConfig
from flock_tpu.native import get_lib

_CFG_FIELDS = [
    "active_people", "in_flight_auctions", "out_of_order_group_size",
    "hot_seller_ratio", "hot_auction_ratio", "hot_bidder_ratio",
    "first_event_id", "first_event_number", "base_time", "num_categories",
    "auction_id_lead", "hot_seller_ratio_2", "hot_auction_ratio_2",
    "hot_bidder_ratio_2", "person_proportion", "auction_proportion",
    "bid_proportion", "first_auction_id", "first_person_id",
    "first_category_id", "person_id_lead", "num_event_generators",
    "events_per_second",
]


def _cfg_array(cfg: NexmarkConfig) -> np.ndarray:
    return np.array([getattr(cfg, f) for f in _CFG_FIELDS], dtype=np.int64)


def _ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.c_void_p)


def nexmark_generate_partition(
    cfg: NexmarkConfig, seconds: int, partition: int
) -> list[EpochColumns]:
    """Generate all epochs for one generator partition natively."""
    lib = get_lib()
    total = (seconds + 1) * (cfg.events_per_second // cfg.num_event_generators) + 64
    denom = cfg.proportion_denominator
    p_cap = total * cfg.person_proportion // denom + 64
    a_cap = total * cfg.auction_proportion // denom + 64
    b_cap = total * cfg.bid_proportion // denom + 64

    while True:
        p_id = np.empty(p_cap, np.int32); p_name = np.empty(p_cap, np.int32)
        p_city = np.empty(p_cap, np.int32); p_state = np.empty(p_cap, np.int32)
        p_ts = np.empty(p_cap, np.int64); p_epoch = np.empty(p_cap, np.int32)
        a_id = np.empty(a_cap, np.int32); a_ib = np.empty(a_cap, np.int32)
        a_res = np.empty(a_cap, np.int32); a_ts = np.empty(a_cap, np.int64)
        a_exp = np.empty(a_cap, np.int64); a_seller = np.empty(a_cap, np.int32)
        a_cat = np.empty(a_cap, np.int32); a_epoch = np.empty(a_cap, np.int32)
        b_auc = np.empty(b_cap, np.int32); b_bid = np.empty(b_cap, np.int32)
        b_price = np.empty(b_cap, np.int32); b_ts = np.empty(b_cap, np.int64)
        b_epoch = np.empty(b_cap, np.int32)
        p_n = ctypes.c_int64(); a_n = ctypes.c_int64(); b_n = ctypes.c_int64()

        rc = lib.fg_nexmark_generate(
            _ptr(_cfg_array(cfg)), ctypes.c_int64(seconds), ctypes.c_int64(partition),
            _ptr(p_id), _ptr(p_name), _ptr(p_city), _ptr(p_state), _ptr(p_ts),
            _ptr(p_epoch), ctypes.c_int64(p_cap), ctypes.byref(p_n),
            _ptr(a_id), _ptr(a_ib), _ptr(a_res), _ptr(a_ts), _ptr(a_exp),
            _ptr(a_seller), _ptr(a_cat), _ptr(a_epoch), ctypes.c_int64(a_cap),
            ctypes.byref(a_n),
            _ptr(b_auc), _ptr(b_bid), _ptr(b_price), _ptr(b_ts), _ptr(b_epoch),
            ctypes.c_int64(b_cap), ctypes.byref(b_n),
        )
        if rc == 0:
            break
        p_cap, a_cap, b_cap = p_n.value + 1, a_n.value + 1, b_n.value + 1

    np_, na, nb = p_n.value, a_n.value, b_n.value
    p_epoch = p_epoch[:np_]; a_epoch = a_epoch[:na]; b_epoch = b_epoch[:nb]

    all_epochs = np.unique(np.concatenate([p_epoch, a_epoch, b_epoch]))
    out = []
    for e in all_epochs.tolist():
        pm = np.searchsorted(p_epoch, [e, e + 1])
        am = np.searchsorted(a_epoch, [e, e + 1])
        bm = np.searchsorted(b_epoch, [e, e + 1])
        out.append(EpochColumns(
            epoch=int(e),
            p_id=p_id[pm[0]:pm[1]].copy(),
            p_name_code=p_name[pm[0]:pm[1]].copy(),
            p_city_code=p_city[pm[0]:pm[1]].copy(),
            p_state_code=p_state[pm[0]:pm[1]].copy(),
            p_date_time=p_ts[pm[0]:pm[1]].copy(),
            a_id=a_id[am[0]:am[1]].copy(),
            a_initial_bid=a_ib[am[0]:am[1]].copy(),
            a_reserve=a_res[am[0]:am[1]].copy(),
            a_date_time=a_ts[am[0]:am[1]].copy(),
            a_expires=a_exp[am[0]:am[1]].copy(),
            a_seller=a_seller[am[0]:am[1]].copy(),
            a_category=a_cat[am[0]:am[1]].copy(),
            b_auction=b_auc[bm[0]:bm[1]].copy(),
            b_bidder=b_bid[bm[0]:bm[1]].copy(),
            b_price=b_price[bm[0]:bm[1]].copy(),
            b_date_time=b_ts[bm[0]:bm[1]].copy(),
        ))
    return out


def ysb_generate_partition(
    seconds: int, events_per_second: int, threads: int, index: int,
    campaigns: int = 100, ads: int = 10,
):
    """Generate YSB ad events for one partition.

    Returns dict of columns: ad_id/ad_type/event_type codes, event_time (ms),
    epoch tag.  campaign(ad) = ad // ads.
    """
    lib = get_lib()
    cap = seconds * events_per_second // threads + events_per_second + 64
    while True:
        ad_id = np.empty(cap, np.int32); ad_type = np.empty(cap, np.int32)
        event_type = np.empty(cap, np.int32); event_time = np.empty(cap, np.int64)
        epoch = np.empty(cap, np.int32)
        n = ctypes.c_int64()
        rc = lib.fg_ysb_generate(
            ctypes.c_int64(seconds), ctypes.c_int64(events_per_second),
            ctypes.c_int64(threads), ctypes.c_int64(index),
            ctypes.c_int64(campaigns), ctypes.c_int64(ads),
            _ptr(ad_id), _ptr(ad_type), _ptr(event_type), _ptr(event_time),
            _ptr(epoch), ctypes.c_int64(cap), ctypes.byref(n),
        )
        if rc == 0:
            break
        cap = n.value + 1
    n = n.value
    return {
        "ad_id": ad_id[:n].copy(),
        "ad_type": ad_type[:n].copy(),
        "event_type": event_type[:n].copy(),
        "event_time": event_time[:n].copy(),
        "epoch": epoch[:n].copy(),
    }
