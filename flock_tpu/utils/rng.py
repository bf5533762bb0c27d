"""Bit-exact replica of Rust ``rand 0.8.3`` ``SmallRng`` (64-bit: Xoshiro256++).

The reference engine (flock-lab/flock) derives every NEXMark event purely from its
event id: ``SmallRng::seed_from_u64(id)`` (reference: flock/src/datasource/nexmark/
event.rs:89).  Row-exact output parity therefore requires reproducing, bit for bit:

* ``seed_from_u64`` — SplitMix64 expansion of the u64 seed into 4x u64 state
  (rand 0.8.3 src/rngs/xoshiro256plusplus.rs, per the xoshiro authors' reference).
* ``next_u64`` — xoshiro256++ step.
* ``next_u32`` — upper 32 bits of ``next_u64`` (rand discards the low half because
  of weak low-bit linearity).
* ``gen_range(0..n)`` — Lemire widening-multiply rejection sampling
  (rand 0.8.3 ``UniformInt::sample_single_inclusive``) in both the 64-bit (usize)
  and 32-bit (i32/u32, and ``SliceRandom::choose`` via ``gen_index``) flavors.
* ``gen::<f32>()`` — Standard distribution: 24 high bits of ``next_u32`` scaled
  by 2^-24.

This module is the *scalar reference* implementation (pure Python, exact).  The
C++ native generator (flock_tpu/native/flockgen.cpp) is the fast path; tests
assert the two agree.
"""

from __future__ import annotations

MASK64 = (1 << 64) - 1
MASK32 = (1 << 32) - 1


def _rotl64(x: int, k: int) -> int:
    return ((x << k) | (x >> (64 - k))) & MASK64


class SmallRng:
    """rand 0.8.3 SmallRng (Xoshiro256PlusPlus) replica."""

    __slots__ = ("s0", "s1", "s2", "s3")

    def __init__(self, seed: int):
        # seed_from_u64: SplitMix64 expansion (xoshiro256plusplus.rs seed_from_u64).
        state = seed & MASK64
        out = []
        for _ in range(4):
            state = (state + 0x9E3779B97F4A7C15) & MASK64
            z = state
            z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & MASK64
            z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & MASK64
            z = z ^ (z >> 31)
            out.append(z)
        # from_seed maps the all-zero seed to seed_from_u64(0); SplitMix64 never
        # produces all-zero state from a u64 seed, so no special case is needed.
        self.s0, self.s1, self.s2, self.s3 = out

    def next_u64(self) -> int:
        s0, s1, s2, s3 = self.s0, self.s1, self.s2, self.s3
        result = (_rotl64((s0 + s3) & MASK64, 23) + s0) & MASK64
        t = (s1 << 17) & MASK64
        s2 ^= s0
        s3 ^= s1
        s1 ^= s2
        s0 ^= s3
        s2 ^= t
        s3 = _rotl64(s3, 45)
        self.s0, self.s1, self.s2, self.s3 = s0, s1, s2, s3
        return result

    def next_u32(self) -> int:
        return self.next_u64() >> 32

    # -- gen_range --------------------------------------------------------------

    def gen_range_u64(self, n: int) -> int:
        """``gen_range(0..n)`` for usize/u64/i64 ranges (rand 0.8.3 Lemire)."""
        if n <= 0:
            raise ValueError("empty range")
        range_ = n & MASK64
        # sample_single_inclusive(0, n-1): range = n; zone = (range << lz) - 1
        lz = 64 - range_.bit_length()
        zone = ((range_ << lz) - 1) & MASK64
        while True:
            v = self.next_u64()
            m = v * range_
            hi, lo = m >> 64, m & MASK64
            if lo <= zone:
                return hi

    def gen_range_u32(self, n: int) -> int:
        """``gen_range(0..n)`` for i32/u32 ranges and ``gen_index`` (choose)."""
        if n <= 0:
            raise ValueError("empty range")
        range_ = n & MASK32
        lz = 32 - range_.bit_length()
        zone = ((range_ << lz) - 1) & MASK32
        while True:
            v = self.next_u32()
            m = v * range_
            hi, lo = m >> 32, m & MASK32
            if lo <= zone:
                return hi

    def gen_f32(self) -> float:
        """``gen::<f32>()``: value in [0,1) from 24 high bits of next_u32."""
        return (self.next_u32() >> 8) * (1.0 / (1 << 24))

    def choose_index(self, length: int) -> int:
        """``SliceRandom::choose``: ``gen_index`` uses the u32 path for short slices."""
        if length <= MASK32:
            return self.gen_range_u32(length)
        return self.gen_range_u64(length)
