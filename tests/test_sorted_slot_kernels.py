"""Tests for the scatter-free aggregation/join paths added for q3/q6/q8:

* sorted_segment_aggregate — segmented-scan grouped aggregation over rows
  already sorted by the group key (post-Rank/Sort), invalid rows interspersed;
* slot_join — shifted-copy join of two dense-slot aggregate outputs;
* plan-level detection (_sorted_by / _slot_dense) on the q6/q8 shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np

from flock_tpu.ops import kernels
from flock_tpu import plan as P


def _np_group(keys, valid, vals):
    out = {}
    for k in np.unique(keys[valid]):
        sel = valid & (keys == k)
        out[int(k)] = vals[sel]
    return out


def test_sorted_segment_aggregate_matches_numpy():
    rng = np.random.default_rng(2)
    n = 4096
    keys = np.sort(rng.integers(100, 900, n)).astype(np.int32)
    valid = rng.random(n) < 0.8
    vals = rng.integers(-(10**6), 10**6, n).astype(np.int32)
    out, ovalid, ovf = jax.jit(
        lambda c, v: kernels.sorted_segment_aggregate(
            c, v, "k", [("v", "sum", "s"), ("v", "min", "lo"),
                        ("v", "max", "hi"), (None, "count", "c")])
    )({"k": jnp.asarray(keys), "v": jnp.asarray(vals)}, jnp.asarray(valid))
    out = {k: np.asarray(v) for k, v in out.items()}
    ovalid = np.asarray(ovalid)
    assert not bool(ovf)

    want = _np_group(keys, valid, vals)
    got_rows = {int(out["k"][i]): i for i in range(n) if ovalid[i]}
    assert set(got_rows) == set(want)
    for k, i in got_rows.items():
        assert int(out["s"][i]) == int(want[k].astype(np.int64).sum())
        assert int(out["lo"][i]) == int(want[k].min())
        assert int(out["hi"][i]) == int(want[k].max())
        assert int(out["c"][i]) == len(want[k])


def test_sorted_segment_aggregate_all_invalid_group():
    keys = np.array([1, 1, 2, 2, 3], np.int32)
    valid = np.array([True, True, False, False, True])
    vals = np.arange(5, dtype=np.int32)
    out, ovalid, _ = kernels.sorted_segment_aggregate(
        {"k": jnp.asarray(keys), "v": jnp.asarray(vals)},
        jnp.asarray(valid), "k", [("v", "sum", "s")])
    ovalid = np.asarray(ovalid)
    got = {int(np.asarray(out["k"])[i]): int(np.asarray(out["s"])[i])
           for i in range(5) if ovalid[i]}
    assert got == {1: 1, 3: 4}  # key 2's group fully filtered → no output row


def _slotted(m, cap, present_idx, vals):
    """Build a dense-slot relation: slot i ↔ key m+i."""
    key = (m + np.arange(cap)).astype(np.int32)
    valid = np.zeros(cap, bool)
    valid[present_idx] = True
    col = np.zeros(cap, np.int32)
    col[present_idx] = vals
    return key, valid, col


def test_slot_join_matches_reference_join():
    rng = np.random.default_rng(3)
    bcap, pcap = 512, 768
    bk, bv, bcol = _slotted(1000, bcap, rng.choice(bcap, 300, replace=False),
                            rng.integers(0, 99, 300).astype(np.int32))
    pk, pv, pcol = _slotted(1100, pcap, rng.choice(pcap, 400, replace=False),
                            rng.integers(0, 99, 400).astype(np.int32))
    out, hit, ovf = jax.jit(lambda b, p: kernels.slot_join(
        {"bk": b[0], "val": b[2]}, b[1], "bk",
        {"pk": p[0], "pc": p[2]}, p[1], "pk", {"val": "taken"}))(
        tuple(map(jnp.asarray, (bk, bv, bcol))),
        tuple(map(jnp.asarray, (pk, pv, pcol))))
    hit = np.asarray(hit)
    taken = np.asarray(out["taken"])
    assert not bool(ovf)

    build_map = {int(k): int(v) for k, v, ok in zip(bk, bcol, bv) if ok}
    for i in range(pcap):
        if pv[i] and int(pk[i]) in build_map:
            assert hit[i] and int(taken[i]) == build_map[int(pk[i])], i
        else:
            assert not hit[i], i


def test_slot_join_disjoint_domains_all_miss():
    bk, bv, bcol = _slotted(0, 128, [0, 5], np.array([7, 8], np.int32))
    pk, pv, pcol = _slotted(10**6, 128, [1, 2], np.array([1, 2], np.int32))
    _, hit, _ = kernels.slot_join(
        {"bk": jnp.asarray(bk), "val": jnp.asarray(bcol)}, jnp.asarray(bv),
        "bk", {"pk": jnp.asarray(pk)}, jnp.asarray(pv), "pk", {"val": "v"})
    assert not np.asarray(hit).any()


def test_plan_detection_q6_q8_shapes():
    from flock_tpu.queries.nexmark import get_query

    # q8's join sides are slot-dense aggregates over person ids
    q8_join = get_query(8).plan.child
    assert isinstance(q8_join, P.Join)
    assert P._slot_dense(q8_join.build, q8_join.build_key)
    assert P._slot_dense(q8_join.probe, q8_join.probe_key)

    # q6's per-seller aggregate sits on Filter(Rank(group=seller)) → sorted
    q6_agg = get_query(6).plan.child
    assert isinstance(q6_agg, P.Aggregate)
    assert P._sorted_by(q6_agg.child, "seller")
    # ... and therefore must NOT be treated as slot-dense
    assert not P._slot_dense(q6_agg, "seller")


def test_lookup_join_build_slotted_equivalence():
    # build side given pre-slotted vs raw rows: same join result
    rng = np.random.default_rng(4)
    bcap = 256
    bk, bv, bcol = _slotted(500, bcap, rng.choice(bcap, 100, replace=False),
                            rng.integers(1, 99, 100).astype(np.int32))
    pk = rng.integers(450, 850, 1024).astype(np.int32)
    pv = rng.random(1024) < 0.9
    probe = {"pk": jnp.asarray(pk), "x": jnp.arange(1024, dtype=jnp.int32)}

    out1, hit1, _ = kernels.lookup_join(
        {"bk": jnp.asarray(bk), "val": jnp.asarray(bcol)}, jnp.asarray(bv),
        "bk", probe, jnp.asarray(pv), "pk", {"val": "v"}, build_slotted=True)
    # raw (unslotted) build: only present rows, arbitrary order
    idx = np.flatnonzero(bv)
    perm = rng.permutation(len(idx))
    raw_cap = 128
    raw_k = np.full(raw_cap, 0, np.int32)
    raw_c = np.zeros(raw_cap, np.int32)
    raw_v = np.zeros(raw_cap, bool)
    raw_k[:len(idx)] = bk[idx][perm]
    raw_c[:len(idx)] = bcol[idx][perm]
    raw_v[:len(idx)] = True
    out2, hit2, ovf2 = kernels.lookup_join(
        {"bk": jnp.asarray(raw_k), "val": jnp.asarray(raw_c)},
        jnp.asarray(raw_v), "bk", probe, jnp.asarray(pv), "pk", {"val": "v"})
    np.testing.assert_array_equal(np.asarray(hit1), np.asarray(hit2))
    h = np.asarray(hit1)
    np.testing.assert_array_equal(np.asarray(out1["v"])[h],
                                  np.asarray(out2["v"])[h])
