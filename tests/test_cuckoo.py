"""Partitioned cuckoo-filter prefilter: no false negatives, delete, update.

The cuckoo path is the north rule's "Bloom/cuckoo" alternative (Fan et al.,
CoNEXT 2014). Tests pin the SEMANTIC contract — membership set, fp rate at
design sizing, delete/update interactions — not the table bytes (layout is
build-order-dependent by construction, unlike the Bloom bitmaps).
"""

import numpy as np
from pyspark.sql import functions as F

from url_pattern_algorithm_spark.operators.cuckoo import (
    SLOTS,
    build_cuckoo,
    cuckoo_maybe_seen,
    delete_from_cuckoos,
    derive_cuckoo_nb,
    seen_filter_cuckoo,
    update_cuckoos,
)


def _seen(spark, n, start=0):
    return spark.range(start, start + n).select(
        F.xxhash64("id").alias("url_hash"),
        F.lit("c").alias("url_canon"), F.lit(0).alias("first_iter"),
    )


def test_cuckoo_no_false_negatives_and_fp_rate(spark):
    seen = _seen(spark, 5000)
    filters = build_cuckoo(seen, n_buckets=16)
    cand = spark.range(8000).filter(
        (F.col("id") < 2000) | (F.col("id") >= 5000)
    ).select(F.xxhash64("id").alias("url_hash"), F.lit("u").alias("url"))
    tagged = cuckoo_maybe_seen(cand, filters, n_buckets=16)
    seen_side = tagged.join(seen.select("url_hash"), "url_hash", "left_semi")
    assert seen_side.filter(~F.col("maybe_seen")).count() == 0
    unseen = tagged.join(seen.select("url_hash"), "url_hash", "left_anti")
    # 16-bit fingerprints: design fp ~= 2*SLOTS/2^16 ~= 0.012%, two decades
    # below the Bloom path's ~1% — assert an order-of-magnitude bound.
    fp = unseen.filter(F.col("maybe_seen")).count() / unseen.count()
    assert fp < 0.005


def test_seen_filter_cuckoo_equals_plain(spark):
    seen = _seen(spark, 3000)
    cand = spark.range(1000, 7000).select(
        F.xxhash64("id").alias("url_hash"),
        F.concat(F.lit("u"), F.col("id")).alias("url"),
    )
    filters = build_cuckoo(seen, n_buckets=8)
    with_f = set(r.url for r in
                 seen_filter_cuckoo(cand, seen, filters, n_buckets=8).collect())
    plain = set(r.url for r in seen_filter_cuckoo(cand, seen, None).collect())
    assert with_f == plain


def test_cuckoo_incremental_update_matches_full_build(spark):
    """update_cuckoos(build(part1), part2) and build(all) accept the same
    membership set (table bytes may differ — layout is order-dependent)."""
    nb = 1 << 12
    part1, part2 = _seen(spark, 2000), _seen(spark, 2000, start=2000)
    full = build_cuckoo(part1.unionByName(part2), n_buckets=8, nb=nb)
    incr = update_cuckoos(build_cuckoo(part1, n_buckets=8, nb=nb),
                          part2.select("url_hash"), n_buckets=8, nb=nb)
    probe = spark.range(6000).select(
        F.xxhash64("id").alias("url_hash"), F.col("id"))
    for filters in (full, incr):
        tagged = cuckoo_maybe_seen(probe, filters, n_buckets=8)
        misses = tagged.filter((F.col("id") < 4000) & ~F.col("maybe_seen"))
        assert misses.count() == 0  # no false negatives either way
    full_set = set(r.id for r in cuckoo_maybe_seen(probe, full, 8)
                   .filter("maybe_seen").collect())
    incr_set = set(r.id for r in cuckoo_maybe_seen(probe, incr, 8)
                   .filter("maybe_seen").collect())
    # both contain all 4000 true members; fp sets may differ but stay tiny
    assert set(range(4000)) <= full_set and set(range(4000)) <= incr_set
    assert len(full_set - set(range(4000))) <= 5
    assert len(incr_set - set(range(4000))) <= 5


def test_cuckoo_delete_then_update(spark):
    """Delete makes keys non-members (the anti-Bloom capability); a later
    incremental insert into the deleted-from table must NOT lose survivors
    (update compacts mid-row holes before reusing slots)."""
    nb = 1 << 11
    seen = _seen(spark, 2000)
    filters = build_cuckoo(seen, n_buckets=4, nb=nb)
    dels = spark.range(800).select(F.xxhash64("id").alias("url_hash"))
    after_del = delete_from_cuckoos(filters, dels, n_buckets=4)
    probe = spark.range(2000).select(
        F.xxhash64("id").alias("url_hash"), F.col("id"))
    tagged = cuckoo_maybe_seen(probe, after_del, n_buckets=4)
    # deleted keys: non-members (a same-fingerprint collider could in
    # principle keep one alive; with 16-bit fps at n=2000 that's ~0)
    assert tagged.filter((F.col("id") < 800) & F.col("maybe_seen")).count() == 0
    # survivors: still members, no false negatives
    assert tagged.filter((F.col("id") >= 800) & ~F.col("maybe_seen")).count() == 0
    # now insert a fresh delta into the holey table
    delta = _seen(spark, 1000, start=5000).select("url_hash")
    updated = update_cuckoos(after_del, delta, n_buckets=4, nb=nb)
    probe2 = spark.range(800, 2000).union(spark.range(5000, 6000)).select(
        F.xxhash64("id").alias("url_hash"), F.col("id"))
    tagged2 = cuckoo_maybe_seen(probe2, updated, n_buckets=4)
    assert tagged2.filter(~F.col("maybe_seen")).count() == 0


def test_cuckoo_overload_stash_keeps_no_false_negatives(spark):
    """A deliberately undersized filter (load > 1) must degrade in space
    (stash) only — membership stays exact on the seen side."""
    seen = _seen(spark, 4000)
    filters = build_cuckoo(seen, n_buckets=2, nb=256)  # capacity 2048 < 4000
    rows = filters.collect()
    assert any(len(r.stash) > 0 for r in rows)  # stash actually engaged
    tagged = cuckoo_maybe_seen(
        seen.select("url_hash", F.lit("u").alias("url")), filters, n_buckets=2)
    assert tagged.filter(~F.col("maybe_seen")).count() == 0


def test_cuckoo_fp_rate_regression_at_derived_sizing(spark):
    """Measured fp rate at derive_cuckoo_nb sizing stays ~design (0.012%);
    the 0.2% bound is 16x slack for sampling noise, and any position-
    derivation regression (e.g. losing the remix) blows past it."""
    n, n_buckets = 50_000, 16
    nb = derive_cuckoo_nb(n, n_buckets)
    assert nb * SLOTS * n_buckets >= n  # capacity covers design load
    seen = _seen(spark, n)
    filters = build_cuckoo(seen, n_buckets=n_buckets, nb=nb)
    unseen = spark.range(n, 2 * n).select(
        F.xxhash64("id").alias("url_hash"), F.lit("u").alias("url"))
    tagged = cuckoo_maybe_seen(unseen, filters, n_buckets=n_buckets)
    # xxhash64 collisions between ranges are ~0; treat all probes as unseen
    fp = tagged.filter(F.col("maybe_seen")).count() / float(n)
    assert fp < 0.002


def test_cuckoo_overloaded_update_degrades_in_space_not_time(spark):
    """Incremental insert into an already-loaded filter must stay cheap
    even when the table cannot hold the delta: the fill gate / batch kick
    budget route the overflow straight to the exact stash instead of
    burning MAX_KICKS python steps per key (the failure mode that made an
    end-to-end mis-sized crawl 2.4x slower than Bloom before r5's fix).
    Membership stays exact; the bound asserted here is the kick WORK, via
    wall time generous enough for CI noise but far below the pathological
    regime (~30s at this shape pre-fix)."""
    import time

    nb = 256  # capacity 2 buckets x 256 x 4 = 2048 << 6000 keys
    seen = _seen(spark, 3000)
    delta = spark.range(3000, 6000).select(
        F.xxhash64("id").alias("url_hash"))
    filters = build_cuckoo(seen, n_buckets=2, nb=nb).persist()
    filters.count()
    t0 = time.time()
    upd = update_cuckoos(filters, delta, n_buckets=2, nb=nb).persist()
    upd.count()
    wall = time.time() - t0
    allk = seen.select("url_hash").unionByName(delta).select(
        "url_hash", F.lit("u").alias("url"))
    assert cuckoo_maybe_seen(allk, upd, 2).filter(
        ~F.col("maybe_seen")).count() == 0
    rows = upd.collect()
    assert any(len(r.stash) > 0 for r in rows)
    assert wall < 10, wall
    filters.unpersist()
    upd.unpersist()
