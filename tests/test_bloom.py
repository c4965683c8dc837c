"""Partitioned-Bloom seen-prefilter: no false negatives, plumbing intact."""

from pyspark.sql import functions as F

from url_pattern_algorithm_spark.operators.frontier import (
    bloom_maybe_seen,
    build_bloom,
    seen_filter,
)


def test_bloom_no_false_negatives(spark):
    seen = spark.range(5000).select(
        (F.xxhash64("id")).alias("url_hash"),
        F.lit("c").alias("url_canon"), F.lit(0).alias("first_iter"),
    )
    blooms = build_bloom(seen, n_buckets=16)
    # candidates: 2000 seen + 3000 unseen
    cand = spark.range(8000).filter((F.col("id") < 2000) | (F.col("id") >= 5000)).select(
        F.xxhash64("id").alias("url_hash"), F.lit("u").alias("url")
    )
    tagged = bloom_maybe_seen(cand, blooms, n_buckets=16)
    # every actually-seen candidate MUST be flagged maybe_seen (no false negatives)
    seen_ids = tagged.join(seen.select("url_hash"), "url_hash", "left_semi")
    assert seen_ids.filter(~F.col("maybe_seen")).count() == 0
    # false-positive rate on the unseen side stays tiny (~1% design point)
    unseen = tagged.join(seen.select("url_hash"), "url_hash", "left_anti")
    fp = unseen.filter(F.col("maybe_seen")).count() / unseen.count()
    assert fp < 0.05


def test_seen_filter_bloom_equals_plain(spark):
    seen = spark.range(3000).select(
        F.xxhash64("id").alias("url_hash"),
        F.lit("c").alias("url_canon"), F.lit(0).alias("first_iter"),
    )
    cand = spark.range(1000, 7000).select(
        F.xxhash64("id").alias("url_hash"), F.concat(F.lit("u"), F.col("id")).alias("url")
    )
    blooms = build_bloom(seen, n_buckets=8)
    with_bloom = set(
        r.url for r in seen_filter(cand, seen, blooms, n_buckets=8).collect()
    )
    plain = set(r.url for r in seen_filter(cand, seen, None).collect())
    assert with_bloom == plain


def test_catalog_compact_preserves_rows(spark, tmp_path):
    from url_pattern_algorithm_spark.sources.catalog import Catalog
    import os
    from pyspark.sql import functions as F

    cat = Catalog(spark, str(tmp_path))
    df = spark.range(1000).select(F.col("id"), F.xxhash64("id").alias("url_hash"))
    cat.write_checkpoint(df.repartition(16), "seen_x", "r", 1)
    before = sorted(r.id for r in cat.read("seen_x").collect())
    cat.compact("seen_x", 2)
    after = sorted(r.id for r in cat.read("seen_x").collect())
    assert before == after
    files = [f for f in os.listdir(tmp_path / "seen_x") if f.endswith(".parquet")]
    assert len(files) <= 2


def test_update_blooms_equals_rebuild(spark):
    # incremental state' = state | bloom(delta) must equal a from-scratch
    # build over the union, bit for bit (fixed m)
    from pyspark.sql import functions as F

    from url_pattern_algorithm_spark.operators.frontier import update_blooms

    M = 1 << 13
    old = spark.range(3000).select(F.xxhash64("id").alias("url_hash"))
    delta = spark.range(3000, 4000).select(F.xxhash64("id").alias("url_hash"))
    state = build_bloom(old, n_buckets=8, m_bits=M)
    inc = {
        r.bucket: (r.m_bits, bytes(r.bitmap))
        for r in update_blooms(state, delta, n_buckets=8, m_bits=M).collect()
    }
    full = {
        r.bucket: (r.m_bits, bytes(r.bitmap))
        for r in build_bloom(old.unionByName(delta), n_buckets=8,
                             m_bits=M).collect()
    }
    assert inc == full


def test_update_blooms_m_mismatch_raises(spark):
    from pyspark.sql import functions as F

    import pytest as _pytest

    from url_pattern_algorithm_spark.operators.frontier import update_blooms

    old = spark.range(100).select(F.xxhash64("id").alias("url_hash"))
    delta = spark.range(100, 120).select(F.xxhash64("id").alias("url_hash"))
    state = build_bloom(old, n_buckets=4, m_bits=1 << 12)
    with _pytest.raises(Exception, match="m_bits"):
        update_blooms(state, delta, n_buckets=4, m_bits=1 << 13).collect()


def test_fp_rate_at_design_load():
    """Measured false-positive rate at the derived sizing: 10 bits/key,
    k=7 (BLOOM_BITS_PER_KEY/BLOOM_HASHES — theoretical fp ~0.8%). Pure
    numpy on the same _set_bits/probe kernels the Spark UDFs run; asserts
    the <2% bound the scaling.py derivations promise."""
    import numpy as np

    from url_pattern_algorithm_spark.operators.frontier import (
        BLOOM_BITS_PER_KEY,
        _probe_bits,
        _set_bits,
    )

    m = 1 << 20
    n_keys = m // BLOOM_BITS_PER_KEY  # exactly the design load
    rng = np.random.default_rng(42)
    keys = rng.integers(0, 1 << 63, size=n_keys, dtype=np.int64).astype(np.uint64)
    bits = np.zeros(m // 8, dtype=np.uint8)
    _set_bits(bits, keys, m)

    probes = rng.integers(0, 1 << 63, size=200_000, dtype=np.int64).astype(np.uint64)
    probes = np.setdiff1d(probes, keys)  # disjoint from the inserted set
    # _probe_bits is the SAME kernel bloom_maybe_seen runs inside its
    # cogroup UDF — removing the remix (or any schedule drift between
    # builder and prober) re-measures here as >2% fp
    fp = _probe_bits(bits, probes, m).mean()
    assert fp < 0.02, fp
    # inserted keys must all hit (no false negatives, probe mirrors set)
    assert _probe_bits(bits, keys, m).all()


def test_bloom_fp_rate_at_derived_sizing(spark):
    # r4 verdict item 6: a MEASURED fp-rate assertion at the derived sizing
    # (scaling.derive_bloom_m_bits: ~10 bits/key design load, 7 hashes ->
    # ~0.9% expected fp), so future m_bits/hash-count changes can't
    # silently degrade the prefilter that routes the steady-state majority
    # of candidates around the seen anti-join.
    from url_pattern_algorithm_spark.scaling import (
        derive_bloom_buckets,
        derive_bloom_m_bits,
    )

    # 64 buckets x ~13107 keys: keys/bucket x 10 lands exactly at the 2^17
    # per-bucket clamp floor, so this is the WORST-CASE (fullest) load the
    # derivation ever produces — larger corpora derive proportionally
    # larger m at the same ~10 bits/key
    n_keys = 838_860
    n_buckets = derive_bloom_buckets(n_keys)
    m_bits = derive_bloom_m_bits(n_keys, n_buckets)
    assert n_buckets == 64 and m_bits == 1 << 17
    bits_per_key = m_bits * n_buckets / n_keys
    assert 10.0 <= bits_per_key < 11.0  # the documented design load

    seen = spark.range(n_keys).select(F.xxhash64("id").alias("url_hash"))
    blooms = build_bloom(seen, n_buckets, m_bits=m_bits)
    n_probe = 200_000
    unseen = spark.range(n_keys, n_keys + n_probe).select(
        F.xxhash64("id").alias("url_hash")
    )
    tagged = bloom_maybe_seen(unseen, blooms, n_buckets=n_buckets)
    fp = tagged.filter(F.col("maybe_seen")).count() / n_probe
    assert fp < 0.02, f"fp rate {fp:.4f} exceeds 2% at derived sizing"
    # and still zero false negatives at this load
    tagged_seen = bloom_maybe_seen(seen, blooms, n_buckets=n_buckets)
    assert tagged_seen.filter(~F.col("maybe_seen")).count() == 0
