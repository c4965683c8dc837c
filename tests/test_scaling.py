"""Pin the cardinality-derived parameter defaults to their documented
targets (scaling.py module docstring). Pure functions — no Spark."""

from url_pattern_algorithm_spark.scaling import (
    derive_bloom_buckets,
    derive_bloom_m_bits,
    derive_n_planes,
    derive_pending_hbuckets,
)


def test_bloom_buckets_targets():
    assert derive_bloom_buckets(10**10) == 4096  # the docstring promise
    assert derive_bloom_buckets(10**6) == 64     # sandbox clamp
    assert derive_bloom_buckets(0) == 64
    # power of two at every scale
    for n in (10**7, 10**8, 10**9, 10**11):
        b = derive_bloom_buckets(n)
        assert b & (b - 1) == 0 and 64 <= b <= 65536


def test_bloom_m_bits_targets():
    assert derive_bloom_m_bits(10**10, 4096) == 1 << 25  # ~4 MiB bitmaps
    assert derive_bloom_m_bits(10**5, 64) == 1 << 17     # sandbox clamp
    # >= bits_per_key x keys/bucket (never undersized)
    m = derive_bloom_m_bits(10**9, 1024)
    assert m >= (10**9 / 1024) * 10


def test_n_planes_targets():
    assert derive_n_planes(10**9) == 18
    assert derive_n_planes(500) == 8    # the sandbox default
    assert derive_n_planes(10**12) == 28  # clamp: 2^28 buckets is plenty
    # occupancy target: n / 2^planes <= 2 * target
    for n in (10**6, 10**8, 10**10):
        p = derive_n_planes(n)
        assert n / (1 << p) <= 2 * 4096


def test_pending_hbuckets_targets():
    assert derive_pending_hbuckets(10**10) == 8192
    assert derive_pending_hbuckets(10**5) == 16  # sandbox clamp
    b = derive_pending_hbuckets(10**8)
    assert b & (b - 1) == 0
