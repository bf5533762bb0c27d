"""Tier-A tests: the rand-0.8.3 SmallRng replica.

The xoshiro256++ step and SplitMix64 seeding are validated against the
published reference vectors from the xoshiro authors (prng.di.unimi.it) /
rand 0.8.3's own unit tests, plus distributional sanity checks for the
Lemire range sampler.
"""

import numpy as np

from flock_tpu.utils.rng import SmallRng


def test_xoshiro256pp_reference_vector():
    # rand 0.8.3 src/rngs/xoshiro256plusplus.rs test: with explicit state
    # [1, 2, 3, 4] the first outputs are the reference sequence below.
    rng = SmallRng(0)
    rng.s0, rng.s1, rng.s2, rng.s3 = 1, 2, 3, 4
    expected = [
        41943041, 58720359, 3588806011781223, 3591011842654386,
        9228616714210784205, 9973669472204895162, 14011001112246962877,
        12406186145184390807, 15849039046786891736, 10450023813501588000,
    ]
    got = [rng.next_u64() for _ in range(10)]
    assert got == expected


def test_seed_from_u64_splitmix():
    # SplitMix64(0) produces the well-known first outputs; seed_from_u64
    # fills s0..s3 with them.
    rng = SmallRng(0)
    assert rng.s0 == 0xE220A8397B1DCDAF
    assert rng.s1 == 0x6E789E6AA1B965F4
    assert rng.s2 == 0x06C45D188009454F
    assert rng.s3 == 0xF88BB8A8724C81EC


def test_determinism_and_streams_differ():
    a = SmallRng(42)
    b = SmallRng(42)
    assert [a.next_u64() for _ in range(8)] == [b.next_u64() for _ in range(8)]
    c = SmallRng(43)
    assert c.next_u64() != SmallRng(42).next_u64()


def test_next_u32_is_high_half():
    a = SmallRng(7)
    b = SmallRng(7)
    assert a.next_u32() == b.next_u64() >> 32


def test_gen_range_bounds_and_distribution():
    rng = SmallRng(123)
    vals64 = [rng.gen_range_u64(50) for _ in range(5000)]
    assert min(vals64) == 0 and max(vals64) == 49
    # uniformity: each bucket within 4 sigma
    counts = np.bincount(vals64, minlength=50)
    assert counts.min() > 100 - 4 * 10 and counts.max() < 100 + 4 * 10

    vals32 = [rng.gen_range_u32(13) for _ in range(1000)]
    assert min(vals32) >= 0 and max(vals32) <= 12


def test_gen_f32_range():
    rng = SmallRng(5)
    vals = [rng.gen_f32() for _ in range(1000)]
    assert all(0.0 <= v < 1.0 for v in vals)
    # 24-bit granularity
    assert all((v * (1 << 24)) == int(v * (1 << 24)) for v in vals)
