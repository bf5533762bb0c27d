"""Direct tests of the blocked one-hot kernels, including sum exactness under
hot-key concentration (8-bit limb regression: a 16-bit limb summed over a
4096-row block exceeds f32's 2^24 exact range)."""

import jax
import jax.numpy as jnp
import numpy as np

from flock_tpu.ops import kernels


def _agg(cols, valid, key, aggs, cap):
    f = jax.jit(lambda c, v: kernels.group_aggregate(c, v, [key], aggs, cap),
                static_argnums=())
    out, ovalid, ovf = f(cols, valid)
    return ({k: np.asarray(v) for k, v in out.items()},
            np.asarray(ovalid), bool(ovf))


def test_hot_key_sum_exact_blocked():
    # one hot key receives thousands of large prices within single blocks
    n = 16384
    rng = np.random.default_rng(0)
    keys = np.where(rng.random(n) < 0.6, 5000,
                    5000 + (np.arange(n) // 8) % 800).astype(np.int32)
    vals = rng.integers(9 * 10**7, 10**8, n).astype(np.int32)
    valid = np.ones(n, bool)
    out, ovalid, ovf = _agg(
        {"k": jnp.asarray(keys), "v": jnp.asarray(vals)},
        jnp.asarray(valid), "k",
        [("v", "sum", "s"), (None, "count", "c")], 8192)
    assert not ovf
    m = int(keys.min())
    for key_val in (5000, 5001, 5400):
        idx = key_val - m
        want_sum = int(vals[keys == key_val].astype(np.int64).sum())
        want_cnt = int((keys == key_val).sum())
        if want_cnt:
            assert int(out["s"][idx]) == want_sum, key_val
            assert int(out["c"][idx]) == want_cnt


def test_hot_key_sum_exact_full_onehot():
    # small span → full one-hot path; >4096 rows on one key
    n = 12288
    rng = np.random.default_rng(1)
    keys = np.full(n, 7, np.int32)
    keys[::5] = 3
    vals = rng.integers(5 * 10**7, 10**8, n).astype(np.int32)
    out, ovalid, ovf = _agg(
        {"k": jnp.asarray(keys), "v": jnp.asarray(vals)},
        jnp.asarray(np.ones(n, bool)), "k",
        [("v", "sum", "s")], 64)
    assert not ovf
    for key_val in (3, 7):
        want = int(vals[keys == key_val].astype(np.int64).sum())
        assert int(out["s"][key_val - 3]) == want


def test_fused_float_agg_falls_back():
    # min/max over a float column can't ride the integer fused kernel; the
    # lowering must statically take the unfused path and stay correct
    import jax.numpy as jnp

    from flock_tpu.batch import Batch
    from flock_tpu.plan import Aggregate, Join, Project, Scan, compile_plan

    join = Join(build=Scan("b"), probe=Scan("p"), build_key="k",
                probe_key="k", take=(("w", "w"),))
    proj = Project(join, (("k", "k"), ("fv", lambda c: c["v"].astype(jnp.float32) * 0.5)))
    agg = Aggregate(proj, group_keys=("k",), aggs=(("fv", "max", "m"),))

    rng = np.random.default_rng(3)
    n = 512
    build = {"k": np.arange(100, 200, dtype=np.int32),
             "w": np.ones(100, np.int32)}
    probe = {"k": rng.integers(100, 200, n).astype(np.int32),
             "v": rng.integers(1, 1000, n).astype(np.int32)}
    tables = {"b": Batch.from_numpy(build), "p": Batch.from_numpy(probe)}
    out, ovf = jax.jit(compile_plan(agg, 4096))(tables)
    assert not bool(ovf)
    got = {k: np.asarray(v)[np.asarray(out.valid)]
           for k, v in out.columns.items()}
    for kv in (100, 150, 199):
        sel = probe["k"] == kv
        if sel.any():
            want = (probe["v"][sel].astype(np.float32) * 0.5).max()
            assert np.isclose(got["m"][got["k"] == kv][0], want), kv


def test_float_key_join_uses_sorted_fallback():
    # a float join key has no dense slot span: the lowering must route
    # through kernels.sorted_lookup_join (sort build + binary-search probes)
    # and produce the same rows a dense-key join would
    from flock_tpu.batch import Batch
    from flock_tpu.plan import Join, Scan, compile_plan

    rng = np.random.default_rng(7)
    bk = (np.arange(50, dtype=np.float32) * 2.5 + 10.0)
    build = {"fk": bk, "payload": np.arange(50, dtype=np.int32) * 3}
    n = 256
    probe_keys = bk[rng.integers(0, 50, n)]
    probe_keys[::7] = -1.0  # misses
    probe = {"fk": probe_keys.astype(np.float32),
             "v": rng.integers(0, 100, n).astype(np.int32)}

    join = Join(build=Scan("b"), probe=Scan("p"), build_key="fk",
                probe_key="fk", take=(("payload", "payload"),))
    tables = {"b": Batch.from_numpy(build), "p": Batch.from_numpy(probe)}
    out, ovf = jax.jit(compile_plan(join, 4096))(tables)
    assert not bool(ovf)
    got_valid = np.asarray(out.valid)
    got = {k: np.asarray(v) for k, v in out.columns.items()}
    # every probe row with a matching build key joins; misses drop
    lut = {float(k): int(p) for k, p in zip(bk, build["payload"])}
    for i in range(n):
        pk = float(probe["fk"][i])
        if pk in lut:
            assert got_valid[i]
            assert int(got["payload"][i]) == lut[pk]
        else:
            assert not got_valid[i]


def test_dense_agg_int64_rebase():
    """int64 aggregation columns (timestamps) rebase to window-relative int32
    internally (min/max/sum shift back exactly); a window whose int64 range
    exceeds int32 falls back to the scatter path, never wrong."""
    rng = np.random.default_rng(11)
    n, span = 16384, 8192
    keys = np.clip(np.arange(n) // 4 + rng.integers(-200, 50, n),
                   0, span - 1).astype(np.int32)
    base_ms = 1_436_918_400_000
    ts = (base_ms + rng.integers(0, 10**6, n)).astype(np.int64)
    valid = rng.random(n) < 0.9
    aggs = [("t", "min", "lo"), ("t", "max", "hi"), ("t", "sum", "s"),
            (None, "count", "c")]
    out, ovalid, ovf = jax.jit(lambda c, v: kernels.dense_group_aggregate(
        c, v, "k", aggs, span))({"k": jnp.asarray(keys),
                                 "t": jnp.asarray(ts)}, jnp.asarray(valid))
    assert not bool(ovf)
    m = keys[valid].min()
    for kv in np.unique(keys[valid])[:50]:
        sel = valid & (keys == kv)
        i = kv - m
        assert np.asarray(ovalid)[i]
        assert int(out["lo"][i]) == int(ts[sel].min())
        assert int(out["hi"][i]) == int(ts[sel].max())
        assert int(out["s"][i]) == int(ts[sel].astype(np.int64).sum())
        assert int(out["c"][i]) == int(sel.sum())
    # int64 range wider than int32: must still be exact (scatter fallback)
    ts2 = ts.copy()
    ts2[7] = base_ms + (1 << 40)
    valid2 = valid.copy()
    valid2[7] = True
    out2, ovalid2, ovf2 = jax.jit(lambda c, v: kernels.dense_group_aggregate(
        c, v, "k", [("t", "max", "hi")], span))(
        {"k": jnp.asarray(keys), "t": jnp.asarray(ts2)}, jnp.asarray(valid2))
    assert not bool(ovf2)
    i7 = keys[7] - keys[valid2].min()
    assert int(out2["hi"][i7]) == int(ts2[valid2 & (keys == keys[7])].max())
