"""Tier-C tests: distributed SPMD execution ≡ single-device execution.

The analogue of the reference's distributed-without-a-cluster tests
(flock/src/launcher/aws/mod.rs:279-844): run the real partitioned kernels and
collectives on an 8-virtual-device CPU mesh and assert row equality with the
LocalExecutor ground truth.
"""

import numpy as np
import pytest

from flock_tpu.parallel.executor import DistributedExecutor
from flock_tpu.queries.nexmark import get_query
from flock_tpu.queries.ysb import campaign_table, generate_ysb_epochs, ysb_query
from flock_tpu.datagen.ysb import YsbConfig
from flock_tpu.runtime.executor import LocalExecutor, materialize_columns
from flock_tpu.runtime.stream import generate_epoch_parts
from flock_tpu.runtime.tables import concat_relations, default_side_input

N_SHARDS = 8
SECONDS = 3
EPS = 1000
GENERATORS = 8


@pytest.fixture(scope="module")
def epoch_parts():
    return generate_epoch_parts(SECONDS, EPS, GENERATORS)


def rows(cols, names):
    arrays = [np.asarray(cols[n]) for n in names]
    if not len(arrays) or not len(arrays[0]):
        return []
    return sorted(zip(*(a.tolist() for a in arrays)))


def shard_window(epoch_parts, rng, relations, broadcast=None):
    """Merge the window's per-generator parts; generator p → shard p % N."""
    shards = [[] for _ in range(N_SHARDS)]
    for t in rng:
        for p, part in enumerate(epoch_parts[t]):
            shards[p % N_SHARDS].append(part)
    out = []
    for i, parts in enumerate(shards):
        tables = dict(concat_relations(parts, relations))
        if broadcast:
            for rel, cols in broadcast.items():
                # bounded side tables live on shard 0; broadcast-gather joins
                # see the union, so other shards hold empty copies
                tables[rel] = cols if i == 0 else \
                    {k: v[:0] for k, v in cols.items()}
        out.append(tables)
    return out


def _augment(tables):
    """Executor-level stand-ins for driver-attached columns: __session (q11,
    synthetic ids — real sessionization is covered by test_dist_stream) and
    p_time (q12)."""
    bid = dict(tables["bid"])
    bid["__session"] = (bid["bidder"] % 7).astype(np.int32)
    # per-row-deterministic (shard-independent) synthetic processing time
    bid["p_time"] = (bid["b_date_time"] // 1000 % 100_000).astype(
        np.int32) * 1000
    tables = dict(tables)
    tables["bid"] = bid
    return tables


@pytest.mark.parametrize("qnum", sorted(range(14)))
def test_distributed_matches_local(qnum, epoch_parts):
    spec = get_query(qnum)
    rels = tuple(r for r in spec.relations if r != "side_input")
    rng = range(SECONDS)

    merged_parts = [p for t in rng for p in epoch_parts[t]]
    tables = dict(concat_relations(merged_parts, rels))
    broadcast = {}
    if "side_input" in spec.relations:
        broadcast["side_input"] = default_side_input()
        tables["side_input"] = broadcast["side_input"]
    if qnum in (11, 12):
        tables = _augment(tables)

    local = LocalExecutor(spec)
    got_local = local.materialize(local.execute_window(tables))

    shard_tables = shard_window(epoch_parts, rng, rels, broadcast)
    if qnum in (11, 12):
        shard_tables = [_augment(st) for st in shard_tables]
    dist = DistributedExecutor(spec, N_SHARDS)
    got_dist = materialize_columns(spec, dist.execute_window(shard_tables))

    names = spec.schema.names
    assert rows(got_dist, names) == rows(got_local, names), f"q{qnum}"


@pytest.mark.parametrize("qnum", [3, 4, 6, 9])
def test_distributed_duplicate_build_keys(qnum):
    """Duplicate auction ids (misaligned G=3) through the DISTRIBUTED path:
    the broadcast-gathered build side carries the duplicates to every shard,
    each shard's fused pass escapes to the fan-out join + multi-key partial,
    and the shuffled finals stay row-exact vs the LocalExecutor (which runs
    the same duplicate machinery single-device — itself oracle-validated in
    test_sqlite_oracle.test_engine_duplicate_auction_rows)."""
    parts = generate_epoch_parts(10, 350, 3)
    spec = get_query(qnum)
    rels = tuple(r for r in spec.relations if r != "side_input")
    rng = range(10)
    merged = [p for t in rng for p in parts[t]]
    tables = dict(concat_relations(merged, rels))
    local = LocalExecutor(spec)
    got_local = local.materialize(local.execute_window(tables))
    shard_tables = shard_window(parts, rng, rels)
    dist = DistributedExecutor(spec, N_SHARDS)
    got_dist = materialize_columns(spec, dist.execute_window(shard_tables))
    names = spec.schema.names
    assert rows(got_dist, names) == rows(got_local, names), f"q{qnum}"


def test_distributed_sql_sort(epoch_parts):
    """SQL-lowered plans containing Sort (ORDER BY) execute distributed:
    the Sort lowers to a coalesce-to-one-partition gather (DataFusion
    SortExec semantics) and stays row-exact vs local."""
    from flock_tpu.sql.catalog import nexmark_catalog
    from flock_tpu.sql.lower import sql_to_spec

    sql = ("SELECT auction, price FROM bid WHERE auction % 123 = 0 "
           "ORDER BY price DESC, auction;")
    spec = sql_to_spec(sql, nexmark_catalog())
    rng = range(SECONDS)
    merged_parts = [p for t in rng for p in epoch_parts[t]]
    tables = dict(concat_relations(merged_parts, ("bid",)))

    local = LocalExecutor(spec)
    got_local = local.materialize(local.execute_window(tables))
    dist = DistributedExecutor(spec, N_SHARDS)
    got_dist = materialize_columns(
        spec, dist.execute_window(shard_window(epoch_parts, rng, ("bid",))))
    names = spec.schema.names
    assert rows(got_dist, names) == rows(got_local, names)


def test_distributed_range_sort_is_globally_ordered():
    """Above the small-input threshold, Sort lowers to the sampled
    range-partitioned path (sample → splitters → all_to_all by range →
    local sort) instead of gather-everything: per-shard work is O(local
    rows) regardless of mesh width.  The shard-major merged output must be
    globally ORDERED (stronger than sorted-set equality) and row-exact vs
    the single-device sort."""
    from flock_tpu.batch import Schema
    from flock_tpu.plan import Scan, Sort
    from flock_tpu.queries.nexmark import QuerySpec

    spec = QuerySpec(
        99, Sort(Scan("bid"), ("price", "auction"), (True, False)),
        ("elementwise",), ("bid",), Schema(["price", "auction"]))
    rng = np.random.default_rng(7)
    n_per = 9_000  # 8 shards × 9k rows > the 64k gather-everything threshold
    shard_tables = []
    for i in range(N_SHARDS):
        shard_tables.append({"bid": {
            "price": rng.integers(0, 50_000, n_per).astype(np.int64),
            "auction": rng.integers(0, 10_000, n_per).astype(np.int64),
        }})
    merged = {k: np.concatenate([st["bid"][k] for st in shard_tables])
              for k in ("price", "auction")}

    local = LocalExecutor(spec)
    want = local.materialize(local.execute_window({"bid": merged}))
    dist = DistributedExecutor(spec, N_SHARDS)
    got = materialize_columns(spec, dist.execute_window(shard_tables))

    want_rows = list(zip(want["price"].tolist(), want["auction"].tolist()))
    got_rows = list(zip(got["price"].tolist(), got["auction"].tolist()))
    assert got_rows == want_rows  # IN ORDER, not sorted-compare


def test_distributed_ysb_matches_local():
    spec = ysb_query()
    cfg = YsbConfig(seconds=2, events_per_second=4000, threads=8)
    epochs = generate_ysb_epochs(cfg)
    camp = campaign_table(cfg)

    events = {k: np.concatenate([e["ad_event"][k] for e in epochs])
              for k in epochs[0]["ad_event"]}
    local = LocalExecutor(spec)
    got_local = local.materialize(local.execute_window(
        {"ad_event": events, "campaign": camp}))

    # shard by row blocks (round-robin over event order)
    n = len(events["ad_id"])
    shard_tables = []
    for i in range(N_SHARDS):
        sel = np.arange(n) % N_SHARDS == i
        st = {"ad_event": {k: v[sel] for k, v in events.items()},
              "campaign": camp if i == 0 else {k: v[:0] for k, v in camp.items()}}
        shard_tables.append(st)
    dist = DistributedExecutor(spec, N_SHARDS)
    got_dist = materialize_columns(spec, dist.execute_window(shard_tables))

    names = spec.schema.names
    assert rows(got_dist, names) == rows(got_local, names)


def test_shuffle_byte_tally_trace_time():
    """The collective byte tally (parallel/shuffle.TALLY) records exact
    per-shard ICI bytes at trace time — the contract bench/scaling_model.py
    builds SCALING artifacts on."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    import flock_tpu.parallel.shuffle as shuffle
    from flock_tpu.parallel.mesh import AXIS, make_mesh

    mesh = make_mesh(4)
    cap = 256

    def local(cols_k, valid):
        out, v, ovf = shuffle.all_to_all_shuffle(
            {"k": cols_k[0]}, valid[0], ["k"], 4)
        return out["k"][None], v[None], ovf.reshape(1, 1)

    fm = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(P(AXIS, None), P(AXIS, None)),
        out_specs=P(AXIS, None)))
    shuffle.TALLY = records = []
    try:
        jax.eval_shape(fm,
                       jax.ShapeDtypeStruct((4, cap), jnp.int32),
                       jax.ShapeDtypeStruct((4, cap), jnp.bool_))
    finally:
        shuffle.TALLY = None
    a2a = [r for r in records if r["op"] == "all_to_all"]
    assert len(a2a) == 2                      # key col + valid
    # per-shard i32 buffer = n_shards*per_dest_cap*4B; moved = (n-1)/n of it
    assert a2a[0]["ici_bytes_per_shard"] == 4 * cap * 4 * 3 // 4
