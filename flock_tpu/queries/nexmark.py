"""Hand-lowered plans for NEXMark q0–q13 (the executed DataFusion dialect).

SQL source of truth: /root/reference/benchmarks/src/nexmark/query/q*.sql (the
per-window SQL Flock actually executes — windowing itself is driven by the
runtime, not SQL; see create_nexmark_source, benchmarks/src/nexmark/main.rs:115-122).

Window type per query (main.rs:116-122):
  q0–q4, q6, q9, q10, q13 → element-wise (per epoch)
  q5  → hopping(window=10s, hop=5s)
  q7, q8 → tumbling(10s)
  q11 → session(gap 10s, per bidder)
  q12 → processing-time tumbling(10s, per bidder)

Relations fed per query (nexmark.rs:185-201): bids for q0/1/2/5/7/10–13;
persons+auctions for q3/8; auctions+bids for q4/6/9.

Money parity note: q1's ``0.908 * price`` and the AVG divisions are Float64 in
DataFusion.  Devices compute f32 alongside the exact integer columns
(price cents / int64 sums); sinks recompute the f64 value exactly on host.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from flock_tpu.batch import Schema
from flock_tpu.config import CONFIG
from flock_tpu.datagen.nexmark import FIRST_NAMES, LAST_NAMES, US_CITIES, US_STATES
from flock_tpu.ops.kernels import (S_LOC_AUCTION_OVER_BID, S_LOC_DENSE_IDS,
                                   S_LOC_PERSON_OVER_AUCTION,
                                   S_LOC_PERSON_OVER_BID)
from flock_tpu.plan import Aggregate, Filter, Join, Node, Project, Rank, Scan

# state dictionary codes (datagen vocab order: az,ca,id,or,wa,wy)
_CA, _ID, _OR = US_STATES.index("ca"), US_STATES.index("id"), US_STATES.index("or")

NAME_VOCAB = [f"{f} {l}" for f in FIRST_NAMES for l in LAST_NAMES]


@dataclass(frozen=True)
class QuerySpec:
    number: int
    plan: Node
    window: tuple  # ("elementwise",) | ("tumbling", s) | ("hopping", w, h) |
    #               ("sliding", w, slide) | ("stagger", w) | ("rows", n) |
    #               ("session", gap) | ("global", s)   — see flock_tpu/window.py
    relations: tuple[str, ...]
    schema: Schema  # output schema (column order + dictionaries + ts cols)


def _bid_scan() -> Node:
    return Scan("bid")


def q0() -> QuerySpec:
    return QuerySpec(
        0, _bid_scan(), ("elementwise",), ("bid",),
        Schema(["auction", "bidder", "price", "b_date_time"],
               timestamp_cols=("b_date_time",)),
    )


def q1() -> QuerySpec:
    plan = Project(_bid_scan(), (
        ("auction", "auction"),
        ("bidder", "bidder"),
        ("price", lambda c: jnp.float32(0.908) * c["price"].astype(jnp.float32)),
        ("price_cents", "price"),   # exact basis for the sink's f64 recompute
        ("b_date_time", "b_date_time"),
    ))
    return QuerySpec(
        1, plan, ("elementwise",), ("bid",),
        Schema(["auction", "bidder", "price", "b_date_time"],
               timestamp_cols=("b_date_time",)),
    )


def q2() -> QuerySpec:
    plan = Project(
        Filter(_bid_scan(), lambda c: c["auction"] % 123 == 0, "auction%123=0"),
        (("auction", "auction"), ("price", "price")),
    )
    return QuerySpec(2, plan, ("elementwise",), ("bid",),
                     Schema(["auction", "price"]))


def q3() -> QuerySpec:
    person = Filter(
        Scan("person"),
        lambda c: (c["state"] == _OR) | (c["state"] == _ID) | (c["state"] == _CA),
        "state in (or,id,ca)",
    )
    auction = Filter(Scan("auction"), lambda c: c["category"] == 10, "category=10")
    plan = Project(
        Join(build=person, probe=auction, build_key="p_id", probe_key="seller",
             take=(("name", "name"), ("city", "city"), ("state", "state")),
             probe_s_loc=S_LOC_PERSON_OVER_AUCTION,
             build_s_loc=S_LOC_DENSE_IDS,
             # dictionary codes: name < 99, city < 10, state < 6 → 1 limb
             take_limbs=(("name", 1), ("city", 1), ("state", 1))),
        (("name", "name"), ("city", "city"), ("state", "state"), ("a_id", "a_id")),
    )
    return QuerySpec(
        3, plan, ("elementwise",), ("person", "auction"),
        Schema(["name", "city", "state", "a_id"],
               dictionaries={"name": NAME_VOCAB, "city": US_CITIES,
                             "state": US_STATES}),
    )


def _winning_bid_interval(extra_take: tuple = ()) -> Node:
    """auction ⋈ bid ON a_id=auction AND b_date_time BETWEEN a_date_time AND
    expires — the shared core of q4/q6/q9 (q4.sql/q6.sql/q9.sql)."""
    return Join(
        build=Scan("auction"), probe=Scan("bid"),
        build_key="a_id", probe_key="auction",
        take=(("a_date_time", "a_date_time"), ("expires", "expires")) + extra_take,
        post_filter=lambda c: (c["b_date_time"] >= c["a_date_time"])
        & (c["b_date_time"] <= c["expires"]),
        build_s_loc=S_LOC_DENSE_IDS,  # a_id is dense-ascending: blocked slotting
        probe_s_loc=S_LOC_AUCTION_OVER_BID,
    )


def q4() -> QuerySpec:
    # GROUP BY a_id, category (q4.sql) — honest two-key grouping.  The fused
    # clean pass still runs the dense single-key path (category is
    # functionally dependent on a_id while auction ids are unique, so it
    # groups by a_id and carries category via max — plan._fused_clean_aggs);
    # duplicate auction ids (misaligned generator counts) escape at runtime
    # to the duplicate-faithful fan-out join + multi-key aggregation.
    per_auction = Aggregate(
        _winning_bid_interval((("category", "category"),)),
        group_keys=("auction", "category"),
        aggs=(("price", "max", "final"),),
    )
    per_category = Aggregate(
        per_auction,
        group_keys=("category",),
        aggs=(("final", "sum", "sum_final"), (None, "count", "cnt")),
        out_capacity=128,  # 5 categories (config.rs:130)
    )
    plan = Project(per_category, (
        ("category", "category"),
        ("avg_final", lambda c: c["sum_final"].astype(jnp.float32)
         / jnp.maximum(c["cnt"], 1).astype(jnp.float32)),
        ("sum_final", "sum_final"),  # exact basis for sink f64 division
        ("cnt", "cnt"),
    ))
    return QuerySpec(4, plan, ("elementwise",), ("auction", "bid"),
                     Schema(["category", "avg_final"]))


def q5() -> QuerySpec:
    counts = Aggregate(_bid_scan(), group_keys=("auction",),
                       aggs=((None, "count", "num"),))
    with_const = Project(counts, (
        ("auction", "auction"), ("num", "num"),
        ("__g", lambda c: jnp.zeros_like(c["num"])),
    ))
    maxn = Aggregate(with_const, group_keys=("__g",),
                     aggs=(("num", "max", "maxn"),), out_capacity=8)
    plan = Project(
        Join(build=maxn, probe=with_const, build_key="__g", probe_key="__g",
             take=(("maxn", "maxn"),),
             post_filter=lambda c: c["num"] >= c["maxn"]),
        (("auction", "auction"), ("num", "num")),
    )
    return QuerySpec(5, plan, ("hopping", 10, 5), ("bid",),
                     Schema(["auction", "num"]))


def q6() -> QuerySpec:
    # winning (highest-price) bid per closed auction, then per-seller average
    # over the seller's last 10 closed auctions (q6.sql).
    #
    # Winner selection = argmax, not ROW_NUMBER-over-sort: the ordering
    # (price desc, b_date_time asc) packs into one int64 key
    # price<<32 | (2^32-1 - rel_ts), whose per-auction MAX the fused
    # join+aggregate computes without materializing joined rows — replacing a
    # full sort of every interval-joined bid with one blocked pass.
    joined = _winning_bid_interval((("seller", "seller"),))
    with_key = Project(joined, (
        ("auction", "auction"), ("seller", "seller"),
        ("__order", lambda c: (c["price"].astype(jnp.int64) << 32)
         | (jnp.int64(0xFFFFFFFF) - c["b_date_time"].astype(jnp.int64))),
    ))
    # seller rides a winner-carry (wmin: min seller over rows attaining the
    # max __order) — equal to a plain max while auction rows are unique
    # (seller functionally dependent on auction), but duplicate auction rows
    # can carry DIFFERENT sellers for one id; the oracle/SQL tiebreak is
    # (price desc, time asc, seller asc), which wmin reproduces exactly
    win_agg = Aggregate(with_key, group_keys=("auction",),
                        aggs=(("__order", "max", "__order"),
                              ("seller", "wmin:__order", "seller")))
    winners = Project(win_agg, (
        ("auction", "auction"), ("seller", "seller"),
        ("price", lambda c: (c["__order"] >> 32).astype(jnp.int32)),
        ("b_date_time", lambda c: (jnp.int64(0xFFFFFFFF)
                                   - (c["__order"] & 0xFFFFFFFF)).astype(jnp.int32)),
    ))
    time_rank = Rank(winners, group_key="seller", order_col="b_date_time",
                     descending=True, rank_name="time_rank", tiebreak="auction")
    last10 = Filter(time_rank, lambda c: c["time_rank"] <= 10, "time_rank<=10")
    per_seller = Aggregate(last10, group_keys=("seller",),
                           aggs=(("price", "sum", "sum_price"),
                                 (None, "count", "cnt")))
    plan = Project(per_seller, (
        ("seller", "seller"),
        ("avg_price", lambda c: c["sum_price"].astype(jnp.float32)
         / jnp.maximum(c["cnt"], 1).astype(jnp.float32)),
        ("sum_price", "sum_price"),
        ("cnt", "cnt"),
    ))
    return QuerySpec(6, plan, ("elementwise",), ("auction", "bid"),
                     Schema(["seller", "avg_price"]))


def q7() -> QuerySpec:
    with_const = Project(_bid_scan(), (
        ("auction", "auction"), ("bidder", "bidder"), ("price", "price"),
        ("b_date_time", "b_date_time"),
        ("__g", lambda c: jnp.zeros_like(c["price"])),
    ))
    maxprice = Aggregate(with_const, group_keys=("__g",),
                         aggs=(("price", "max", "maxprice"),), out_capacity=8)
    plan = Project(
        Join(build=maxprice, probe=with_const, build_key="__g", probe_key="__g",
             take=(("maxprice", "maxprice"),),
             post_filter=lambda c: c["price"] == c["maxprice"]),
        (("auction", "auction"), ("price", "price"), ("bidder", "bidder"),
         ("b_date_time", "b_date_time")),
    )
    return QuerySpec(7, plan, ("tumbling", 10), ("bid",),
                     Schema(["auction", "price", "bidder", "b_date_time"],
                            timestamp_cols=("b_date_time",)))


def q8() -> QuerySpec:
    # GROUP BY p_id, name ≡ GROUP BY p_id with name carried (dependent col).
    # Both aggregates slot over person ids, so the join lowers to the
    # zero-random-access slot merge (kernels.slot_join).
    people = Aggregate(Scan("person"), group_keys=("p_id",),
                       aggs=(("name", "max", "name"),),
                       s_loc=S_LOC_DENSE_IDS)
    sellers = Aggregate(Scan("auction"), group_keys=("seller",), aggs=(),
                        s_loc=S_LOC_PERSON_OVER_AUCTION)
    plan = Project(
        Join(build=people, probe=sellers, build_key="p_id", probe_key="seller",
             take=(("name", "name"),)),
        (("p_id", lambda c: c["seller"]), ("name", "name")),
    )
    return QuerySpec(8, plan, ("tumbling", 10), ("person", "auction"),
                     Schema(["p_id", "name"],
                            dictionaries={"name": NAME_VOCAB}))


def q9() -> QuerySpec:
    final_per_auction = Aggregate(
        _winning_bid_interval(),
        group_keys=("auction",),
        aggs=(("price", "max", "final"),),
    )
    plan = Project(
        Join(build=final_per_auction, probe=_bid_scan(),
             build_key="auction", probe_key="auction",
             take=(("final", "final"),),
             post_filter=lambda c: c["price"] == c["final"]),
        (("auction", "auction"), ("bidder", "bidder"), ("price", "price"),
         ("b_date_time", "b_date_time")),
    )
    return QuerySpec(9, plan, ("elementwise",), ("auction", "bid"),
                     Schema(["auction", "bidder", "price", "b_date_time"],
                            timestamp_cols=("b_date_time",)))


def q10() -> QuerySpec:
    plan = Project(_bid_scan(), (
        ("auction", "auction"), ("bidder", "bidder"), ("price", "price"),
        ("b_date_time", "b_date_time"),
    ))
    return QuerySpec(10, plan, ("elementwise",), ("bid",),
                     Schema(["auction", "bidder", "price", "b_date_time"],
                            timestamp_cols=("b_date_time",)))


def q11() -> QuerySpec:
    # The stream driver slices sessions per bidder (the reference does this in
    # the source function via HashDiff partitioning, window/session.rs:187-321)
    # and feeds closed sessions with a __session id column; grouping by
    # (bidder, __session) yields one row per session.
    # __session ids are globally unique per session, so GROUP BY
    # (bidder, __session) ≡ GROUP BY __session with bidder carried.
    plan = Project(
        # __session labels are a monotone compression of bidder ids, so a
        # block's label span is bounded by the bidder stream's natural
        # locality window (labels arrive UNSORTED in arrival order)
        Aggregate(_bid_scan(), group_keys=("__session",),
                  aggs=(("bidder", "max", "bidder"),
                        (None, "count", "bid_count"),
                        ("b_date_time", "min", "start_time"),
                        ("b_date_time", "max", "end_time")),
                  s_loc=S_LOC_PERSON_OVER_BID),
        (("bidder", "bidder"), ("bid_count", "bid_count"),
         ("start_time", "start_time"), ("end_time", "end_time")),
    )
    return QuerySpec(11, plan, ("session", CONFIG.session_gap_s), ("bid",),
                     Schema(["bidder", "bid_count", "start_time", "end_time"],
                            timestamp_cols=("start_time", "end_time")))


def q12() -> QuerySpec:
    # p_time is attached by the stream driver (processing-time column);
    # the device plan groups per bidder within the processing-time window.
    plan = Aggregate(Scan("bid"), group_keys=("bidder",),
                     aggs=((None, "count", "bid_count"),
                           ("p_time", "min", "start_time"),
                           ("p_time", "max", "end_time")),
                     s_loc=S_LOC_PERSON_OVER_BID)
    return QuerySpec(12, plan, ("global", CONFIG.ptime_window_s), ("bid",),
                     Schema(["bidder", "bid_count", "start_time", "end_time"]))


def q13() -> QuerySpec:
    # Executed SQL joins ON auction = key directly (q13.sql; the %10000 form
    # only appears in the Flink-dialect doc version).  side_input is a bounded
    # (key int32, value int32) table loaded by the runtime (CSV or generated
    # key=value=i, mirroring the reference's gist fixture shape).
    plan = Project(
        Join(build=Scan("side_input"), probe=_bid_scan(),
             build_key="key", probe_key="auction",
             take=(("value", "value"),),
             unique_build=True),  # catalog fact: side-input keys are unique
        (("auction", "auction"), ("bidder", "bidder"), ("price", "price"),
         ("b_date_time", "b_date_time"), ("value", "value")),
    )
    return QuerySpec(13, plan, ("elementwise",), ("bid", "side_input"),
                     Schema(["auction", "bidder", "price", "b_date_time", "value"],
                            timestamp_cols=("b_date_time",)))


QUERIES = {q().number: q() for q in (q0, q1, q2, q3, q4, q5, q6, q7, q8, q9,
                                     q10, q11, q12, q13)}


def get_query(n: int) -> QuerySpec:
    return QUERIES[n]
