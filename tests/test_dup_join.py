"""Unit tests for duplicate-build-key join fan-out and the wmin winner-carry
aggregate (kernels.lookup_join dup branch / kernels._scatter_aggs).

The reference's hash join is duplicate-faithful (DataFusion joins every
duplicate build row; stage.rs:307 splits q4.sql's INNER JOIN around it);
these pin the engine's equivalents at kernel level with synthetic inputs —
the query-level coverage lives in test_sqlite_oracle (G=3 engine matrix)
and test_large_window (misaligned-G seed).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from flock_tpu.ops import kernels as K


def _join(build, probe, out_capacity=None, **kw):
    bk = jnp.asarray(np.asarray(build["k"], np.int32))
    bv = jnp.asarray(np.asarray(build["valid"], bool))
    bval = jnp.asarray(np.asarray(build["v"], np.int32))
    pk = jnp.asarray(np.asarray(probe["k"], np.int32))
    pv = jnp.asarray(np.asarray(probe["valid"], bool))
    ptag = jnp.asarray(np.asarray(probe["tag"], np.int32))
    out, hit, ovf = K.lookup_join(
        {"k": bk, "v": bval}, bv, "k",
        {"k": pk, "tag": ptag}, pv, "k",
        {"v": "bval"}, out_capacity=out_capacity, **kw)
    hit = np.asarray(hit)
    o = {c: np.asarray(a) for c, a in out.items()}
    rows = sorted((int(o["k"][i]), int(o["tag"][i]), int(o["bval"][i]))
                  for i in range(len(hit)) if hit[i])
    return rows, bool(ovf)


def _numpy_join(build, probe):
    rows = []
    for i in range(len(probe["k"])):
        if not probe["valid"][i]:
            continue
        for j in range(len(build["k"])):
            if build["valid"][j] and build["k"][j] == probe["k"][i]:
                rows.append((int(probe["k"][i]), int(probe["tag"][i]),
                             int(build["v"][j])))
    return sorted(rows)


def test_fanout_matches_numpy_reference():
    rng = np.random.default_rng(7)
    n_b, n_p = 64, 128
    build = {"k": rng.integers(100, 120, n_b), "v": rng.integers(0, 1000, n_b),
             "valid": rng.random(n_b) < 0.9}
    probe = {"k": rng.integers(95, 125, n_p), "tag": np.arange(n_p),
             "valid": rng.random(n_p) < 0.9}
    rows, ovf = _join(build, probe, out_capacity=n_p * 8)
    assert not ovf
    assert rows == _numpy_join(build, probe)


def test_fanout_unbounded_multiplicity():
    # one key duplicated 6x: sort-merge expansion has no layer bound
    build = {"k": [10, 11, 11] + [12] * 6 + [0],
             "v": [100, 200, 201, 300, 301, 302, 303, 304, 305, 0],
             "valid": [True] * 9 + [False]}
    probe = {"k": [11, 12, 10, 13, 12] + [0] * 27,
             "tag": list(range(32)),
             "valid": [True] * 5 + [False] * 27}
    rows, ovf = _join(build, probe, out_capacity=48)
    assert not ovf
    assert rows == _numpy_join(build, probe)


def test_fanout_overflow_when_extras_exceed_free_slots():
    build = {"k": [10] * 8, "v": list(range(8)), "valid": [True] * 8}
    probe = {"k": [10, 10, 10, 10], "tag": [0, 1, 2, 3],
             "valid": [True] * 4}
    # 4 probes x 7 extras = 28 extras, zero free slots at capacity 4
    rows, ovf = _join(build, probe, out_capacity=4)
    assert ovf
    # and fits once the caller widens (the driver's retry posture)
    rows, ovf = _join(build, probe, out_capacity=64)
    assert not ovf
    assert len(rows) == 32


def test_unique_build_declaration_flags_duplicates():
    build = {"k": [10, 10, 11, 12], "v": [1, 2, 3, 4], "valid": [True] * 4}
    probe = {"k": [10, 11], "tag": [0, 1], "valid": [True] * 2}
    _, ovf = _join(build, probe, dup_expand=False)
    assert ovf, "declared-unique build with duplicates must overflow"
    build["k"] = [10, 13, 11, 12]
    _, ovf = _join(build, probe, dup_expand=False)
    assert not ovf


def test_wmin_winner_carry_scatter():
    # groups: key 5 -> orders [9, 9, 4] carries [30, 20, 1] => winner min 20
    #         key 6 -> orders [7]       carries [40]        => 40
    cols = {"g": jnp.asarray(np.array([5, 5, 5, 6], np.int32)),
            "o": jnp.asarray(np.array([9, 9, 4, 7], np.int32)),
            "s": jnp.asarray(np.array([30, 20, 1, 40], np.int32))}
    valid = jnp.asarray(np.array([True] * 4))
    out, ovalid, ovf = K.group_aggregate(
        cols, valid, ["g"], [("o", "max", "o"), ("s", "wmin:o", "s")], 8)
    ovalid = np.asarray(ovalid)
    got = {int(np.asarray(out["g"])[i]): (int(np.asarray(out["o"])[i]),
                                          int(np.asarray(out["s"])[i]))
           for i in range(8) if ovalid[i]}
    assert got == {5: (9, 20), 6: (7, 40)}


def test_wmin_multikey_sorted_path():
    # multi-key grouping exercises the sort-based _scatter_aggs path
    cols = {"g": jnp.asarray(np.array([1, 1, 1, 2], np.int32)),
            "h": jnp.asarray(np.array([0, 0, 1, 0], np.int32)),
            "o": jnp.asarray(np.array([5, 8, 8, 3], np.int32)),
            "s": jnp.asarray(np.array([7, 9, 2, 4], np.int32))}
    valid = jnp.asarray(np.array([True] * 4))
    out, ovalid, _ = K.group_aggregate(
        cols, valid, ["g", "h"], [("o", "max", "o"), ("s", "wmin:o", "s")], 8)
    ovalid = np.asarray(ovalid)
    got = sorted((int(np.asarray(out["g"])[i]), int(np.asarray(out["h"])[i]),
                  int(np.asarray(out["o"])[i]), int(np.asarray(out["s"])[i]))
                 for i in range(8) if ovalid[i])
    assert got == [(1, 0, 8, 9), (1, 1, 8, 2), (2, 0, 3, 4)]


def test_wmin_int64_order_rebase():
    # int64 order column rides the rebase path; wmin recursion stays exact
    big = np.int64(3) << 40
    cols = {"g": jnp.asarray(np.array([1, 1, 2], np.int32)),
            "o": jnp.asarray(np.array([big + 5, big + 5, big + 1], np.int64)),
            "s": jnp.asarray(np.array([12, 11, 30], np.int32))}
    valid = jnp.asarray(np.array([True] * 3))
    out, ovalid, _ = K.group_aggregate(
        cols, valid, ["g"], [("o", "max", "o"), ("s", "wmin:o", "s")], 4)
    ovalid = np.asarray(ovalid)
    got = {int(np.asarray(out["g"])[i]): (int(np.asarray(out["o"])[i]),
                                          int(np.asarray(out["s"])[i]))
           for i in range(4) if ovalid[i]}
    assert got == {1: (int(big + 5), 11), 2: (int(big + 1), 30)}
