"""Cuckoo-vs-Bloom seen-prefilter micro-benchmark (same load, same layout).

Both prefilters share the outer-bucket cogroup layout (one filter per
``url_hash % n_buckets`` bucket, built in one applyInPandas task, probed by
cogroup), so this probe isolates the DATA-STRUCTURE trade at a fixed design
load:

- build wall (filters materialized via a count over the builder output),
- probe wall (maybe_seen tagging of a candidate set, half seen / half not),
- serialized filter bytes,
- measured false-positive rate on the definitely-unseen half,
- false negatives (must be 0 for both, by construction).

Expectation: cuckoo pays ~1.6x the bytes (16 bits/key at ~0.8 load vs 10
bits/key) to buy a ~100x lower fp rate plus deletability; probe cost is
comparable (both are one vectorized numpy pass per bucket task).

Usage: python tools/cuckoo_probe.py [n_keys] [reps] -> BENCH/cuckoo_vs_bloom.json
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from url_pattern_algorithm_spark.operators.cuckoo import (
    build_cuckoo,
    cuckoo_maybe_seen,
    derive_cuckoo_nb,
)
from url_pattern_algorithm_spark.operators.frontier import (
    bloom_maybe_seen,
    build_bloom,
)
from url_pattern_algorithm_spark.scaling import derive_bloom_m_bits
from url_pattern_algorithm_spark.session import get_spark

N_BUCKETS = 64


def main() -> None:
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("cuckooprobe")
    spark.sparkContext.setLogLevel("ERROR")

    seen = spark.range(n_keys).select(
        F.xxhash64("id").alias("url_hash")).persist()
    # candidates: half seen, half fresh — the steady-state crawl mix
    cand = spark.range(n_keys // 2, n_keys + n_keys // 2).select(
        F.xxhash64("id").alias("url_hash"),
        (F.col("id") < n_keys).alias("is_seen"),
    ).persist()
    seen.count(), cand.count()

    m_bits = derive_bloom_m_bits(n_keys, N_BUCKETS)
    nb = derive_cuckoo_nb(n_keys, N_BUCKETS)
    out: dict = {"n_keys": n_keys, "n_buckets": N_BUCKETS, "reps": reps,
                 "bloom_m_bits": m_bits, "cuckoo_nb": nb}

    for kind, build, probe in (
        ("bloom",
         lambda: build_bloom(seen, N_BUCKETS, m_bits=m_bits),
         lambda flt: bloom_maybe_seen(cand, flt, N_BUCKETS)),
        ("cuckoo",
         lambda: build_cuckoo(seen, N_BUCKETS, nb=nb),
         lambda flt: cuckoo_maybe_seen(cand, flt, N_BUCKETS)),
    ):
        build_walls, probe_walls = [], []
        flt = None
        for _ in range(reps):
            t0 = time.time()
            flt = build().persist()
            flt.count()
            build_walls.append(round(time.time() - t0, 3))
            t0 = time.time()
            tagged = probe(flt)
            agg = tagged.agg(
                F.sum(F.when(F.col("is_seen") & ~F.col("maybe_seen"), 1)
                      .otherwise(0)).alias("fn"),
                F.sum(F.when(~F.col("is_seen") & F.col("maybe_seen"), 1)
                      .otherwise(0)).alias("fp"),
                F.sum(F.when(~F.col("is_seen"), 1).otherwise(0)).alias("neg"),
            ).collect()[0]
            probe_walls.append(round(time.time() - t0, 3))
            if _ < reps - 1:
                flt.unpersist()
        size_col = (F.length("bitmap") if kind == "bloom"
                    else F.length("table") + F.length("stash"))
        total_bytes = flt.agg(F.sum(size_col)).collect()[0][0]
        flt.unpersist()
        out[kind] = {
            "build_sec_best": min(build_walls), "build_sec": build_walls,
            "probe_sec_best": min(probe_walls), "probe_sec": probe_walls,
            "filter_bytes": int(total_bytes),
            "bits_per_key": round(8.0 * total_bytes / n_keys, 2),
            "false_negatives": int(agg.fn),
            "fp_rate": round(agg.fp / max(agg.neg, 1), 6),
        }
        assert agg.fn == 0, f"{kind}: false negatives!"

    seen.unpersist(), cand.unpersist()
    with open("BENCH/cuckoo_vs_bloom.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
