"""Independent numpy oracle for NEXMark q0–q13 + YSB.

This is the behavioral reference for tier-B tests — an intentionally separate
implementation of the executed SQL semantics (reference: benchmarks/src/
nexmark/query/q*.sql and the per-query local tests in flock/src/datasource/
nexmark/queries/).  Each oracle operates on one window's host columns, exactly
like the engine's per-window plan execution.

Tie-breaking for q6's ROW_NUMBER follows the engine's documented deterministic
rule (price desc → b_date_time asc; b_date_time desc → auction asc); DataFusion
leaves ties unspecified, so both implementations pin the same total order.
"""

from __future__ import annotations

import numpy as np


def _rows(cols: dict, names: list[str]) -> set:
    arrays = [cols[n] for n in names]
    return set(zip(*(a.tolist() for a in arrays))) if len(arrays[0]) else set()


def q0(bid):
    return bid


def q1(bid):
    return {
        "auction": bid["auction"], "bidder": bid["bidder"],
        "price": 0.908 * bid["price"].astype(np.float64),
        "b_date_time": bid["b_date_time"],
    }


def q2(bid):
    m = bid["auction"] % 123 == 0
    return {"auction": bid["auction"][m], "price": bid["price"][m]}


def q3(person, auction):
    # US_STATES order az,ca,id,or,wa,wy → codes 1,2,3 are ca/id/or.
    # Duplicate-faithful: were a p_id ever duplicated (see _auction_rows for
    # the id-wraparound mechanism), the SQL joins EVERY duplicate person row,
    # and so does this oracle.
    pm = np.isin(person["state"], [1, 2, 3])
    am = auction["category"] == 10
    p = {k: v[pm] for k, v in person.items()}
    a = {k: v[am] for k, v in auction.items()}
    idx: dict[int, list] = {}
    for i, pid in enumerate(p["p_id"]):
        idx.setdefault(int(pid), []).append(i)
    out = {"name": [], "city": [], "state": [], "a_id": []}
    for i in range(len(a["a_id"])):
        for j in idx.get(int(a["seller"][i]), ()):
            out["name"].append(p["name"][j])
            out["city"].append(p["city"][j])
            out["state"].append(p["state"][j])
            out["a_id"].append(a["a_id"][i])
    return {k: np.array(v, np.int32) for k, v in out.items()}


def _auction_rows(auction):
    """a_id → list of auction row indices.  Duplicate a_ids are real reference
    behavior: with G generators, the event-id offset 100_000/G need not align
    with the 50-event proportion denominator, so an epoch's auction events can
    collapse onto one last_id (event.rs:86-88 + Auction::last_id) — the SQL
    joins EVERY duplicate row, and so does this oracle."""
    aidx: dict[int, list] = {}
    for i, a in enumerate(auction["a_id"]):
        aidx.setdefault(int(a), []).append(i)
    return aidx


def _winning_max(auction, bid):
    """max bid price per auction over joined rows (a bid matches a_id when ANY
    duplicate auction row's [a_date_time, expires] interval admits it)."""
    aidx = _auction_rows(auction)
    best: dict[int, int] = {}
    for i in range(len(bid["auction"])):
        a = int(bid["auction"][i])
        rows_ = aidx.get(a)
        if rows_ is None:
            continue
        t = bid["b_date_time"][i]
        p = int(bid["price"][i])
        for j in rows_:
            if auction["a_date_time"][j] <= t <= auction["expires"][j]:
                if a not in best or p > best[a]:
                    best[a] = p
                break
    return best, aidx


def q4(auction, bid):
    # GROUP BY a_id, category over the joined rows: duplicate auction rows
    # with distinct categories form distinct groups; Max(price) per group is
    # over the bids admitted by THAT row's interval (plus same-category dups)
    aidx = _auction_rows(auction)
    best: dict[tuple, int] = {}   # (a_id, category) → max price
    for i in range(len(bid["auction"])):
        a = int(bid["auction"][i])
        rows_ = aidx.get(a)
        if rows_ is None:
            continue
        t = bid["b_date_time"][i]
        p = int(bid["price"][i])
        for j in rows_:
            if auction["a_date_time"][j] <= t <= auction["expires"][j]:
                k = (a, int(auction["category"][j]))
                if k not in best or p > best[k]:
                    best[k] = p
    sums: dict[int, list] = {}
    for (a, c), mx in best.items():
        s = sums.setdefault(c, [0, 0])
        s[0] += mx
        s[1] += 1
    cats = sorted(sums)
    return {
        "category": np.array(cats, np.int32),
        "avg_final": np.array([sums[c][0] / sums[c][1] for c in cats], np.float64),
    }


def q5(bid):
    if not len(bid["auction"]):
        return {"auction": np.array([], np.int32), "num": np.array([], np.int32)}
    uniq, counts = np.unique(bid["auction"], return_counts=True)
    maxn = counts.max()
    m = counts >= maxn
    return {"auction": uniq[m].astype(np.int32), "num": counts[m].astype(np.int32)}


def q6(auction, bid):
    # winning joined row per auction id (price desc, tie: earlier
    # b_date_time, tie: smaller seller — the engine's pinned total order;
    # the seller tiebreak only matters when duplicate auction rows admit
    # the same winning bid, see _auction_rows)
    aidx = _auction_rows(auction)
    best: dict[int, tuple] = {}   # a → (price, ts, seller) winner
    for i in range(len(bid["auction"])):
        a = int(bid["auction"][i])
        rows_ = aidx.get(a)
        if rows_ is None:
            continue
        t = int(bid["b_date_time"][i])
        p = int(bid["price"][i])
        for j in rows_:
            if not (auction["a_date_time"][j] <= t <= auction["expires"][j]):
                continue
            s = int(auction["seller"][j])
            cur = best.get(a)
            if cur is None or (p, -t, -s) > (cur[0], -cur[1], -cur[2]):
                best[a] = (p, t, s)
    # per seller: last 10 winners by (b_date_time desc, auction asc)
    per_seller: dict[int, list] = {}
    for a, (p, t, s) in best.items():
        per_seller.setdefault(s, []).append((t, a, p))
    sellers, avgs = [], []
    for s in sorted(per_seller):
        rows = sorted(per_seller[s], key=lambda r: (-r[0], r[1]))[:10]
        sellers.append(s)
        avgs.append(sum(r[2] for r in rows) / len(rows))
    return {"seller": np.array(sellers, np.int32),
            "avg_price": np.array(avgs, np.float64)}


def q7(bid):
    if not len(bid["price"]):
        return {k: bid[k] for k in ("auction", "price", "bidder", "b_date_time")}
    m = bid["price"] == bid["price"].max()
    return {k: bid[k][m] for k in ("auction", "price", "bidder", "b_date_time")}


def q8(person, auction):
    people = set(zip(person["p_id"].tolist(), person["name"].tolist()))
    sellers = set(auction["seller"].tolist())
    rows = sorted((p, n) for (p, n) in people if p in sellers)
    return {"p_id": np.array([r[0] for r in rows], np.int32),
            "name": np.array([r[1] for r in rows], np.int32)}


def q9(auction, bid):
    best, _ = _winning_max(auction, bid)
    keep = [i for i in range(len(bid["auction"]))
            if best.get(int(bid["auction"][i])) == int(bid["price"][i])]
    return {k: bid[k][keep] for k in ("auction", "bidder", "price", "b_date_time")}


def q11_sessions(epoch_bids: list[dict], gap: int = 10):
    """Sessionize the full stream: per bidder, split when the epoch gap
    between consecutive fragments exceeds ``gap`` seconds."""
    per_bidder: dict[int, list] = {}
    for bids in epoch_bids:
        for i in range(len(bids["bidder"])):
            per_bidder.setdefault(int(bids["bidder"][i]), []).append(
                int(bids["b_date_time"][i]))
    rows = []
    for b, times in per_bidder.items():
        times.sort()
        cur = [times[0]]
        for t in times[1:]:
            if t // 1000 - cur[-1] // 1000 > gap:
                rows.append((b, len(cur), cur[0], cur[-1]))
                cur = [t]
            else:
                cur.append(t)
        rows.append((b, len(cur), cur[0], cur[-1]))
    rows.sort()
    return {
        "bidder": np.array([r[0] for r in rows], np.int32),
        "bid_count": np.array([r[1] for r in rows], np.int64),
        "start_time": np.array([r[2] for r in rows], np.int64),
        "end_time": np.array([r[3] for r in rows], np.int64),
    }


def q12_window(epoch_bids: list[dict], start_epoch: int):
    """Per-bidder counts over one processing-time window of arrival epochs."""
    counts: dict[int, int] = {}
    pmin: dict[int, int] = {}
    pmax: dict[int, int] = {}
    for i, bids in enumerate(epoch_bids):
        p_time = (start_epoch + i) * 1000
        for b in bids["bidder"].tolist():
            counts[b] = counts.get(b, 0) + 1
            pmin.setdefault(b, p_time)
            pmax[b] = p_time
    bidders = sorted(counts)
    return {
        "bidder": np.array(bidders, np.int32),
        "bid_count": np.array([counts[b] for b in bidders], np.int64),
        "start_time": np.array([pmin[b] for b in bidders], np.int64),
        "end_time": np.array([pmax[b] for b in bidders], np.int64),
    }


def q13(bid, side_input):
    sidx = {int(k): int(v) for k, v in zip(side_input["key"], side_input["value"])}
    keep, vals = [], []
    for i in range(len(bid["auction"])):
        v = sidx.get(int(bid["auction"][i]))
        if v is not None:
            keep.append(i)
            vals.append(v)
    out = {k: bid[k][keep] for k in ("auction", "bidder", "price", "b_date_time")}
    out["value"] = np.array(vals, np.int32)
    return out


def ysb(events: dict, ads_per_campaign: int = 10):
    m = events["event_type"] == 0  # 'view'
    camp = events["ad_id"][m] // ads_per_campaign
    uniq, counts = np.unique(camp, return_counts=True)
    return {"campaign_id": uniq.astype(np.int32),
            "count": counts.astype(np.int64)}
