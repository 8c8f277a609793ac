"""Exact shuffle steering — hash repartitioning with chosen targets.

`df.repartitionByRange(...)` silently runs a SAMPLING JOB that executes
the child plan (including blob columns) just to pick range boundaries —
at 2M docs that pass is a measurable slice of the build's fixed serial
share (BENCH/BASELINE.md Amdahl fit). But the merge stage doesn't need
data-dependent ranges: the target partition of every row is a pure
FUNCTION of (bucket, term_hash, grp). This module turns that function
into an exact `repartition(n, col)` with zero sampling:

Spark's HashPartitioning places a row at pmod(murmur3(col), n). We
precompute, for each desired partition i, a "steering value" v_i with
pmod(murmur3(v_i), n) == i (a few hundred deterministic probes), map
pid -> v_pid with an array literal, and repartition on that column —
every row lands exactly where the pid says, no sampling job, no range
skew, bucket purity preserved by construction.

hash_long is a bit-exact Python port of Spark's Murmur3_x86_32.hashLong
(seed 42) — the same function F.hash applies to a single BIGINT column;
parity is asserted in tests/test_xxhash.py.
"""

from __future__ import annotations

from functools import lru_cache

_M = 0xFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M


def _mix_k1(k1: int) -> int:
    k1 = (k1 * 0xCC9E2D51) & _M
    k1 = _rotl(k1, 15)
    return (k1 * 0x1B873593) & _M


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _M


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M
    h1 ^= h1 >> 16
    return h1


def hash_long(value: int, seed: int = 42) -> int:
    """Spark Murmur3_x86_32.hashLong — what F.hash computes for one
    BIGINT column. Returns a signed int32."""
    value &= (1 << 64) - 1
    h1 = _mix_h1(seed, _mix_k1(value & _M))
    h1 = _mix_h1(h1, _mix_k1((value >> 32) & _M))
    r = _fmix(h1, 8)
    return r - (1 << 32) if r >= (1 << 31) else r


@lru_cache(maxsize=32)
def steering_values(n: int) -> tuple[int, ...]:
    """v such that pmod(murmur3(v[i]), n) == i for each partition i —
    deterministic (ascending probe), cached per n. Expected ~n·ln(n)
    probes (coupon collector); n=1000 finds all targets in ~10^4."""
    found: dict[int, int] = {}
    v = 0
    while len(found) < n:
        p = hash_long(v) % n  # Python % is already non-negative
        if p not in found:
            found[p] = v
        v += 1
    return tuple(found[i] for i in range(n))
