"""Pallas kernel tests (interpret mode on CPU; compiled path runs on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from flock_tpu.pallas.agg import pallas_count_max_agg


def test_pallas_agg_matches_reference():
    rng = np.random.default_rng(1)
    n, span = 8192, 4096
    keys = ((np.arange(n) // 3) + rng.integers(-50, 20, n)).clip(0).astype(np.int32)
    vals = rng.integers(1, 10**8, n).astype(np.int32)
    valid = rng.random(n) < 0.85
    m = jnp.int32(int(keys[valid].min()))
    cnt, mx, esc = pallas_count_max_agg(
        jnp.asarray(keys), jnp.asarray(valid), jnp.asarray(vals), m, span,
        interpret=True)
    assert not int(np.asarray(esc)[0])
    ref_cnt = np.zeros(span, np.int64)
    ref_max = np.full(span, -2**31, np.int64)
    for k, v, ok in zip(keys, vals, valid):
        if ok:
            i = k - int(m)
            ref_cnt[i] += 1
            ref_max[i] = max(ref_max[i], v)
    assert np.array_equal(np.asarray(cnt), ref_cnt)
    assert np.array_equal(np.asarray(mx), ref_max)


def test_pallas_agg_escape_flag():
    # keys violating block locality must raise the escape flag
    rng = np.random.default_rng(2)
    n, span = 4096, 8192
    keys = rng.integers(0, span, n).astype(np.int32)  # fully random
    vals = np.ones(n, np.int32)
    valid = np.ones(n, bool)
    cnt, mx, esc = pallas_count_max_agg(
        jnp.asarray(keys), jnp.asarray(valid), jnp.asarray(vals),
        jnp.int32(0), span, interpret=True)
    assert int(np.asarray(esc)[0]) == 1


def test_pallas_fused_join_agg_matches_xla():
    from flock_tpu.ops import blocked
    from flock_tpu.pallas import join_agg

    rng = np.random.default_rng(7)
    span, n = 5000, 8192
    present = rng.random(span) < 0.8
    ats = rng.integers(0, 500, span).astype(np.int32)
    exp = (ats + rng.integers(10, 400, span)).astype(np.int32)
    m = np.int32(10_000)
    key = (m + np.clip(np.arange(n) // 2 + rng.integers(-64, 64, n),
                       0, span - 1)).astype(np.int32)
    price = rng.integers(1, 10**6, n).astype(np.int32)
    bts = rng.integers(0, 900, n).astype(np.int32)
    pv = rng.random(n) < 0.9

    def replay(bc, pair):
        return bc, pair & (bc["b_ts"] >= bc["ats"]) & (bc["b_ts"] <= bc["exp"])

    aggs = [("price", "max", "final"), ("b_ts", "min", "first")]
    slots = {"ats": jnp.asarray(ats), "exp": jnp.asarray(exp)}
    pcols = {"k": jnp.asarray(key), "price": jnp.asarray(price),
             "b_ts": jnp.asarray(bts)}
    assert join_agg.supported(pcols, slots, aggs)

    o1, v1, e1 = blocked.blocked_join_aggregate(
        slots, jnp.asarray(present), jnp.asarray(m), pcols, jnp.asarray(pv),
        "k", replay, aggs, span, block=1024, s_loc=1024, margin=128)
    o2, v2, e2 = join_agg.fused_join_aggregate(
        slots, jnp.asarray(present), jnp.asarray(m), pcols, jnp.asarray(pv),
        "k", replay, aggs, block=1024, s_loc=1024, interpret=True)
    assert not bool(e1) and not bool(e2)
    v1, v2 = np.asarray(v1), np.asarray(v2)
    np.testing.assert_array_equal(v1, v2)
    for c in ("final", "first", "__key"):
        np.testing.assert_array_equal(np.asarray(o1[c])[v1],
                                      np.asarray(o2[c])[v2])


def test_pallas_fused_join_agg_escape():
    from flock_tpu.pallas import join_agg

    rng = np.random.default_rng(8)
    span, n = 8192, 4096
    present = np.ones(span, bool)
    key = rng.integers(0, span, n).astype(np.int32)  # fully random: escapes
    pcols = {"k": jnp.asarray(key), "v": jnp.ones(n, jnp.int32)}
    out, valid, esc = join_agg.fused_join_aggregate(
        {"x": jnp.zeros(span, jnp.int32)}, jnp.asarray(present),
        jnp.int32(0), pcols, jnp.ones(n, bool), "k",
        lambda bc, pair: (bc, pair), [("v", "max", "vm")], interpret=True)
    assert bool(esc)


def test_pallas_rebased_int64_matches_xla():
    """int64 timestamp columns rebase to window-relative int32 exactly
    (the q4/q9 interval-predicate shape)."""
    from flock_tpu.ops import blocked
    from flock_tpu.pallas import join_agg

    rng = np.random.default_rng(11)
    span, n = 4096, 8192
    base_ms = 1_436_918_400_000
    present = rng.random(span) < 0.8
    ats = (base_ms + rng.integers(0, 500, span)).astype(np.int64)
    exp = ats + rng.integers(10, 400, span).astype(np.int64)
    m = np.int32(10_000)
    key = (m + np.clip(np.arange(n) // 2 + rng.integers(-64, 64, n),
                       0, span - 1)).astype(np.int32)
    price = rng.integers(1, 10**6, n).astype(np.int32)
    bts = (base_ms + rng.integers(0, 900, n)).astype(np.int64)
    pv = rng.random(n) < 0.9

    def replay(bc, pair):
        return bc, pair & (bc["b_ts"] >= bc["ats"]) & (bc["b_ts"] <= bc["exp"])

    aggs = [("price", "max", "final"), (None, "count", "cnt")]
    slots = {"ats": jnp.asarray(ats), "exp": jnp.asarray(exp)}
    pcols = {"k": jnp.asarray(key), "price": jnp.asarray(price),
             "b_ts": jnp.asarray(bts)}
    assert join_agg.eligible(slots, pcols, replay, aggs)
    assert not join_agg.supported(pcols, slots, aggs)  # int64 needs rebasing

    o1, v1, e1 = blocked.blocked_join_aggregate(
        slots, jnp.asarray(present), jnp.asarray(m), pcols, jnp.asarray(pv),
        "k", replay, aggs, span, block=1024, s_loc=1024, margin=128)
    o2, v2, e2 = join_agg.fused_join_aggregate_rebased(
        slots, jnp.asarray(present), jnp.asarray(m), pcols, jnp.asarray(pv),
        "k", replay, aggs, block=1024, s_loc=1024, interpret=True)
    assert not bool(e1) and not bool(e2)
    v1, v2 = np.asarray(v1), np.asarray(v2)
    np.testing.assert_array_equal(v1, v2)
    for c in ("final", "cnt", "__key"):
        np.testing.assert_array_equal(np.asarray(o1[c])[v1],
                                      np.asarray(o2[c])[v2])


def test_q4_pallas_path_matches_default(monkeypatch):
    """End-to-end q4 through the plan lowering with the Pallas fused kernel
    (interpret mode) must equal the XLA blocked path."""
    from jax.experimental.pallas import tpu as pltpu

    from flock_tpu.batch import Batch
    from flock_tpu.plan import compile_plan
    from flock_tpu.queries.nexmark import get_query
    import __graft_entry__ as ge

    tables = {rel: Batch.from_numpy(cols)
              for rel, cols in ge._example_tables().items()}
    spec = get_query(4)

    out_ref, ovf_ref = jax.jit(compile_plan(spec.plan, agg_capacity=1024))(tables)
    assert not bool(ovf_ref)

    monkeypatch.setenv("FLOCK_TPU_PALLAS", "2")  # fused pallas is opt-in
    with pltpu.force_tpu_interpret_mode():
        out_p, ovf_p = compile_plan(spec.plan, agg_capacity=1024)(tables)
    assert not bool(ovf_p)

    vr, vp = np.asarray(out_ref.valid), np.asarray(out_p.valid)
    np.testing.assert_array_equal(vr, vp)
    for c in out_ref.columns:
        np.testing.assert_array_equal(np.asarray(out_ref.columns[c])[vr],
                                      np.asarray(out_p.columns[c])[vp])


def test_pallas_local_agg_matches_blocked_all_fns():
    """General VMEM-resident aggregation (count/sum/min/max/count_sum) ≡ the
    XLA blocked path, including exact limb-based integer sums."""
    from flock_tpu.ops import blocked
    from flock_tpu.pallas.agg import local_eligible, pallas_local_agg

    rng = np.random.default_rng(11)
    span, n = 6000, 8192
    keys = np.clip(np.arange(n) // 2 + rng.integers(-100, 100, n),
                   0, span - 1).astype(np.int32) + 500
    valid = rng.random(n) < 0.9
    vals = rng.integers(0, 2**31 - 1, n).astype(np.int32)
    aggs = [(None, "count", "c"), ("v", "sum", "s"), ("v", "min", "lo"),
            ("v", "max", "hi"), ("v", "count_sum", "cs")]
    assert local_eligible(aggs, n)

    o1, v1, e1 = blocked.blocked_local_agg(
        jnp.asarray(keys), jnp.asarray(valid), {"v": jnp.asarray(vals)},
        aggs, span, block=1024, s_loc=1024)
    o2, v2, e2 = pallas_local_agg(
        jnp.asarray(keys), jnp.asarray(valid), {"v": jnp.asarray(vals)},
        aggs, span, block=1024, s_loc=1024, interpret=True)
    assert not bool(e1) and not bool(e2)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    m1 = np.asarray(v1)
    for c in ("c", "s", "lo", "hi", "cs", "__key"):
        np.testing.assert_array_equal(np.asarray(o1[c])[m1],
                                      np.asarray(o2[c])[m1], err_msg=c)
    # exact int64 sum vs numpy oracle
    exp = np.zeros(span, np.int64)
    np.add.at(exp, keys[valid] - keys[valid].min(), vals[valid].astype(np.int64))
    np.testing.assert_array_equal(np.asarray(o2["s"])[m1], exp[m1])


def test_pallas_local_agg_unaligned_s_loc_and_capacity():
    """s_loc hints that aren't VMEM-tile multiples (e.g. S_LOC_DENSE_IDS=4608)
    round up internally; odd capacities pad and slice back."""
    from flock_tpu.pallas.agg import pallas_local_agg

    rng = np.random.default_rng(12)
    span, n = 9000, 4096
    keys = np.clip(np.arange(n) + rng.integers(-2000, 2000, n),
                   0, span - 1).astype(np.int32)
    valid = np.ones(n, bool)
    vals = rng.integers(0, 10**6, n).astype(np.int32)
    out, ovalid, esc = pallas_local_agg(
        jnp.asarray(keys), jnp.asarray(valid), {"v": jnp.asarray(vals)},
        [("v", "sum", "s"), (None, "count", "c")], span,
        block=1024, s_loc=4608, interpret=True)
    assert not bool(esc)
    exp_c = np.bincount(keys, minlength=span)
    exp_s = np.zeros(span, np.int64)
    np.add.at(exp_s, keys, vals.astype(np.int64))
    np.testing.assert_array_equal(np.asarray(out["c"]), exp_c)
    np.testing.assert_array_equal(np.asarray(out["s"]), exp_s)
    np.testing.assert_array_equal(np.asarray(ovalid), exp_c > 0)


def test_pallas_fused_sum_matches_xla():
    """Fused join+aggregate with integer sums (limb accumulators) ≡ XLA."""
    from flock_tpu.ops import blocked
    from flock_tpu.pallas import join_agg

    rng = np.random.default_rng(13)
    span, n = 4000, 8192
    present = rng.random(span) < 0.8
    weight = rng.integers(1, 1000, span).astype(np.int32)
    m = np.int32(777)
    key = (m + np.clip(np.arange(n) // 2 + rng.integers(-64, 64, n),
                       0, span - 1)).astype(np.int32)
    price = rng.integers(0, 10**8, n).astype(np.int32)
    pv = rng.random(n) < 0.9

    def replay(bc, pair):
        return bc, pair & (bc["price"] % 3 != 0)

    aggs = [("price", "sum", "total"), (None, "count", "cnt"),
            ("price", "max", "top")]
    slots = {"weight": jnp.asarray(weight)}
    pcols = {"k": jnp.asarray(key), "price": jnp.asarray(price)}
    assert join_agg.supported(pcols, slots, aggs)
    assert join_agg.eligible(slots, pcols, replay, aggs)

    o1, v1, e1 = blocked.blocked_join_aggregate(
        slots, jnp.asarray(present), jnp.asarray(m), pcols, jnp.asarray(pv),
        "k", replay, aggs, span, block=1024, s_loc=1024, margin=128)
    o2, v2, e2 = join_agg.fused_join_aggregate(
        slots, jnp.asarray(present), jnp.asarray(m), pcols, jnp.asarray(pv),
        "k", replay, aggs, block=1024, s_loc=1024, interpret=True)
    assert not bool(e1) and not bool(e2)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    mk = np.asarray(v1)
    assert o2["total"].dtype == jnp.int64
    for c in ("total", "cnt", "top", "__key"):
        np.testing.assert_array_equal(np.asarray(o1[c])[mk],
                                      np.asarray(o2[c])[mk], err_msg=c)


def test_dense_group_aggregate_dispatches_to_pallas(monkeypatch):
    """kernels.dense_group_aggregate routes blocked-span aggregations to the
    FACTORED Pallas kernel when enabled (and to the legacy VMEM kernel when
    factored is disabled), with identical results."""
    from jax.experimental.pallas import tpu as pltpu

    from flock_tpu.ops import kernels
    from flock_tpu.pallas import agg as pallas_agg
    from flock_tpu.pallas import factored

    rng = np.random.default_rng(14)
    span, n = 8192, 8192
    keys = np.clip(np.arange(n) + rng.integers(-300, 300, n),
                   0, span - 1).astype(np.int32)
    valid = rng.random(n) < 0.95
    vals = rng.integers(0, 10**6, n).astype(np.int32)
    cols = {"k": jnp.asarray(keys), "v": jnp.asarray(vals)}
    aggs = [("v", "sum", "s"), (None, "count", "c")]

    out_ref, valid_ref, ovf_ref = kernels.dense_group_aggregate(
        cols, jnp.asarray(valid), "k", aggs, span, s_loc=1024)
    mr = np.asarray(valid_ref)

    monkeypatch.setenv("FLOCK_TPU_PALLAS", "1")
    for env, mod, name in ((None, factored, "pallas_factored_agg"),
                           ("1", pallas_agg, "pallas_local_agg")):
        if env is not None:
            monkeypatch.setenv("FLOCK_TPU_NO_FACTORED", env)
        called = []
        orig = getattr(mod, name)

        def spy(*a, _orig=orig, **kw):
            called.append(True)
            return _orig(*a, **kw)

        monkeypatch.setattr(mod, name, spy)
        with pltpu.force_tpu_interpret_mode():
            out_p, valid_p, ovf_p = kernels.dense_group_aggregate(
                cols, jnp.asarray(valid), "k", aggs, span, s_loc=1024)
        monkeypatch.setattr(mod, name, orig)
        assert called, f"{name} was not dispatched"
        assert not bool(ovf_ref) and not bool(ovf_p)
        np.testing.assert_array_equal(mr, np.asarray(valid_p))
        for c in ("s", "c", "k"):
            np.testing.assert_array_equal(np.asarray(out_ref[c])[mr],
                                          np.asarray(out_p[c])[mr],
                                          err_msg=c)


# -- factored hi⊗lo kernels (pallas/factored.py) ------------------------------


def test_factored_agg_all_fns():
    """count/sum/min/max over a dense span ≡ numpy, incl. invalid rows,
    negative values, and exact int64 sums."""
    from flock_tpu.pallas import factored

    rng = np.random.default_rng(21)
    n, span = 16384, 8192
    frontier = (np.arange(n, dtype=np.int64) * (span - 2048) // n).astype(np.int32)
    keys = (frontier + rng.integers(-120, 10, n)).clip(0).astype(np.int32) + 5
    vals = rng.integers(-(10**8), 10**8, n).astype(np.int32)
    # sum column includes NEGATIVE values: the stacked limb decomposition
    # keeps the top limb signed (factored._stacked_agg_matmul); a masked top
    # limb would reconstruct sums mod 2^32 (+2^32 per negative row)
    vals2 = rng.integers(-(10**6), 10**6, n).astype(np.int32)
    valid = rng.random(n) < 0.9
    aggs = [(None, "count", "c"), ("v2", "sum", "s"), ("v", "max", "mx"),
            ("v", "min", "mn")]
    assert factored.agg_eligible(aggs, n, 1024)
    out, ovalid, esc = factored.pallas_factored_agg(
        jnp.asarray(keys), jnp.asarray(valid),
        {"v": jnp.asarray(vals), "v2": jnp.asarray(vals2)}, aggs, span,
        s_loc=1024, interpret=True)
    assert not bool(esc)
    m = keys[valid].min()
    rel = (keys - m)[valid]
    cnt = np.zeros(span, np.int64)
    sm = np.zeros(span, np.int64)
    mx = np.full(span, -(2**63), np.int64)
    mn = np.full(span, 2**63 - 1, np.int64)
    np.add.at(cnt, rel, 1)
    np.add.at(sm, rel, vals2[valid].astype(np.int64))
    np.maximum.at(mx, rel, vals[valid])
    np.minimum.at(mn, rel, vals[valid])
    occ = cnt > 0
    np.testing.assert_array_equal(np.asarray(out["c"]), cnt)
    np.testing.assert_array_equal(np.asarray(out["s"]), sm)
    np.testing.assert_array_equal(np.asarray(out["mx"]).astype(np.int64)[occ],
                                  mx[occ])
    np.testing.assert_array_equal(np.asarray(out["mn"]).astype(np.int64)[occ],
                                  mn[occ])
    np.testing.assert_array_equal(np.asarray(ovalid), occ)


def test_factored_agg_escape_and_overflow():
    from flock_tpu.pallas import factored

    n, span = 8192, 8192
    keys = (np.arange(n) // 4).astype(np.int32)
    vals = np.ones(n, np.int32)
    valid = np.ones(n, bool)
    # locality break: one row teleports beyond its block's window
    k2 = keys.copy()
    k2[100] += 4000
    _, _, esc = factored.pallas_factored_agg(
        jnp.asarray(k2), jnp.asarray(valid), {"v": jnp.asarray(vals)},
        [("v", "sum", "s")], span, s_loc=1024, interpret=True)
    assert bool(esc)
    # capacity overflow: keys beyond out_capacity must flag, not drop
    _, _, esc2 = factored.pallas_factored_agg(
        jnp.asarray(keys), jnp.asarray(valid), {"v": jnp.asarray(vals)},
        [("v", "sum", "s")], 1024, s_loc=1024, interpret=True)
    assert bool(esc2)


def test_factored_gather_matches_blocked():
    """Factored matmul gather ≡ blocked_local_join, incl. signed build
    values, misses and absent slots."""
    from flock_tpu.ops import blocked
    from flock_tpu.pallas import factored

    rng = np.random.default_rng(22)
    span, n = 8192, 16384
    pres = rng.random(span) < 0.9
    a = rng.integers(-(2**31), 2**31, span).astype(np.int32)
    b = rng.integers(0, 100, span).astype(np.int32)
    key = np.clip(np.arange(n) // 16 + rng.integers(-100, 50, n),
                  -50, span + 50).astype(np.int32)   # some misses
    pv = rng.random(n) < 0.95

    slots = {"a": jnp.asarray(a), "b": jnp.asarray(b)}
    g1, h1, e1 = blocked.blocked_local_join(
        slots, jnp.asarray(pres), jnp.int32(0), jnp.asarray(key),
        jnp.asarray(pv), ["a", "b"], block=4096, s_loc=512)
    # plane budget: one dot per kernel (MAX_GATHER_PLANES) — col b's small
    # range rides a 1-limb hint, runtime-verified
    g2, h2, e2 = factored.pallas_factored_gather(
        slots, jnp.asarray(pres), jnp.int32(0), jnp.asarray(key),
        jnp.asarray(pv), ["a", "b"], s_loc=512, interpret=True,
        limbs={"b": 1})
    assert not bool(e1) and not bool(e2)
    h1, h2 = np.asarray(h1), np.asarray(h2)
    np.testing.assert_array_equal(h1, h2)
    for c in ("a", "b"):
        np.testing.assert_array_equal(np.asarray(g1[c])[h1],
                                      np.asarray(g2[c])[h2], err_msg=c)


def test_factored_join_agg_matches_blocked_rebased():
    """Row-wise factored join-agg ≡ blocked broadcast formulation on the
    q4 shape (int64 interval predicate + count/max/sum)."""
    from flock_tpu.ops import blocked
    from flock_tpu.pallas import factored

    rng = np.random.default_rng(23)
    span, n = 4096, 16384
    base_ms = 1_436_918_400_000
    present = rng.random(span) < 0.8
    ats = (base_ms + rng.integers(0, 500, span)).astype(np.int64)
    exp = ats + rng.integers(10, 400, span).astype(np.int64)
    m = np.int32(10_000)
    key = (m + np.clip(np.arange(n) // 8 + rng.integers(-64, 64, n),
                       0, span - 1)).astype(np.int32)
    price = rng.integers(1, 10**6, n).astype(np.int32)
    bts = (base_ms + rng.integers(0, 900, n)).astype(np.int64)
    pv = rng.random(n) < 0.9

    def replay(bc, pair):
        return bc, pair & (bc["b_ts"] >= bc["ats"]) & (bc["b_ts"] <= bc["exp"])

    aggs = [("price", "max", "final"), (None, "count", "cnt"),
            ("price", "sum", "total")]
    slots = {"ats": jnp.asarray(ats), "exp": jnp.asarray(exp)}
    pcols = {"k": jnp.asarray(key), "price": jnp.asarray(price),
             "b_ts": jnp.asarray(bts)}
    limbs = {"ats": 3, "exp": 3}   # rebased ms offsets < 2^24
    assert factored.join_agg_eligible(slots, pcols, replay, aggs, limbs)

    o1, v1, e1 = blocked.blocked_join_aggregate(
        slots, jnp.asarray(present), jnp.asarray(m), pcols, jnp.asarray(pv),
        "k", replay, aggs, span, block=4096, s_loc=1024)
    o2, v2, e2 = factored.factored_join_agg_rebased(
        slots, jnp.asarray(present), jnp.asarray(m), pcols, jnp.asarray(pv),
        "k", replay, aggs, s_loc=1024, interpret=True, limbs=limbs)
    assert not bool(e1) and not bool(e2)
    v1, v2 = np.asarray(v1), np.asarray(v2)
    np.testing.assert_array_equal(v1, v2)
    assert o2["total"].dtype == jnp.int64
    for c in ("final", "cnt", "total", "__key"):
        np.testing.assert_array_equal(np.asarray(o1[c])[v1],
                                      np.asarray(o2[c])[v2], err_msg=c)


def test_q4_factored_path_matches_default(monkeypatch):
    """End-to-end q4 through the plan lowering with the FACTORED pallas
    kernels (interpret mode) ≡ the XLA blocked path."""
    from jax.experimental.pallas import tpu as pltpu

    from flock_tpu.batch import Batch
    from flock_tpu.plan import compile_plan
    from flock_tpu.queries.nexmark import get_query
    import __graft_entry__ as ge

    tables = {rel: Batch.from_numpy(cols)
              for rel, cols in ge._example_tables().items()}
    spec = get_query(4)

    out_ref, ovf_ref = jax.jit(compile_plan(spec.plan, agg_capacity=1024))(tables)
    assert not bool(ovf_ref)

    monkeypatch.setenv("FLOCK_TPU_PALLAS", "1")
    monkeypatch.setenv("FLOCK_TPU_FACTORED", "1")  # join path is opt-in
    with pltpu.force_tpu_interpret_mode():
        out_p, ovf_p = compile_plan(spec.plan, agg_capacity=1024)(tables)
    assert not bool(ovf_p)
    vr, vp = np.asarray(out_ref.valid), np.asarray(out_p.valid)
    np.testing.assert_array_equal(vr, vp)
    for c in out_ref.columns:
        np.testing.assert_array_equal(np.asarray(out_ref.columns[c])[vr],
                                      np.asarray(out_p.columns[c])[vp])


def test_bcast_join_agg_matches_blocked():
    """Experimental broadcast-window fused kernel (not dispatched; see its
    docstring) stays row-exact vs the XLA blocked formulation."""
    from flock_tpu.ops import blocked
    from flock_tpu.pallas import factored

    rng = np.random.default_rng(5)
    span, n = 8192, 16384
    pres = rng.random(span) < 0.85
    blo = rng.integers(0, 500, span).astype(np.int32)
    bhi = (blo + rng.integers(10, 1000, span)).astype(np.int32)
    # per-4096-block key span ~ 512+130: inside BOTH kernels' windows
    fr = (np.arange(n, dtype=np.int64) * (span - 6144) // n).astype(np.int32)
    key = (fr + rng.integers(-120, 10, n)).clip(0).astype(np.int32)
    price = rng.integers(1, 10**6, n).astype(np.int32)
    pt = rng.integers(0, 1500, n).astype(np.int32)
    pv = rng.random(n) < 0.9

    def replay(bc, pair):
        return bc, pair & (bc["pt"] >= bc["blo"]) & (bc["pt"] <= bc["bhi"])

    aggs = [("price", "max", "final"), (None, "count", "cnt"),
            ("price", "sum", "total")]
    slots = {"blo": jnp.asarray(blo), "bhi": jnp.asarray(bhi)}
    pcols = {"k": jnp.asarray(key), "price": jnp.asarray(price),
             "pt": jnp.asarray(pt)}
    o1, v1, e1 = blocked.blocked_join_aggregate(
        slots, jnp.asarray(pres), jnp.int32(0), pcols, jnp.asarray(pv),
        "k", replay, aggs, span, block=4096, s_loc=1024)
    o2, v2, e2 = factored.pallas_bcast_join_agg(
        slots, jnp.asarray(pres), jnp.int32(0), pcols, jnp.asarray(pv),
        "k", replay, aggs, s_loc=512, interpret=True)
    assert not bool(e1) and not bool(e2)
    v1, v2 = np.asarray(v1), np.asarray(v2)
    np.testing.assert_array_equal(v1, v2)
    for c in ("final", "cnt", "total", "__key"):
        np.testing.assert_array_equal(np.asarray(o1[c])[v1],
                                      np.asarray(o2[c])[v2], err_msg=c)
