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
