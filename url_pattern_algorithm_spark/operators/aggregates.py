"""Key/value distribution aggregates (SURVEY.md §2.4) as DataFrame transforms.

The reference computes every one of these as a hand-rolled HashMap loop over
``List<ProcessedUrl>``; here each is a ``groupBy().agg()`` over the exploded
``(host, url, key, value)`` relation so Catalyst gets partial aggregation
(map-side combine) and whole-stage codegen for free. Inside the per-host tree
builder the same math runs on pandas (kernel/tree.py); these relational forms
are the corpus-wide/distributed variants and the oracle-checkable surface.

Reference parity targets (file:line in /root/reference):
- Shannon entropy per key     — CalculateUtil.java:197-209,212-252
- "mosted" keys (>0.9 support)— CalculateUtil.java:432-490
- majority value (>0.7)       — ProcessedUrl.java:248-286
- common keys (forall URLs)   — ProcessedUrl.java:353-382
- distinct folded values      — ProcessedUrl.java:210-229 (+ numeric fold
                                 CalculateUtil.java:234-235)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from url_pattern_algorithm_spark.functions.udfs import tokenize_light_udf
from url_pattern_algorithm_spark.scaling import gated_dim as _gated_dim


def explode_kv(urls: DataFrame, url_col: str = "url",
               tokenizer=tokenize_light_udf) -> DataFrame:
    """(host, url) -> one row per (host, url, key, value) pair.

    The Arrow boundary is crossed once (one tokenizer UDF call); the explode
    and everything downstream stay in codegen.
    """
    kv = urls.withColumn("_kv", tokenizer(F.col(url_col)))
    return (
        kv.filter(F.col("_kv").isNotNull())
        .select("host", F.col(url_col).alias("url"), F.explode("_kv").alias("p"))
        .select("host", "url", F.col("p.key").alias("key"),
                F.col("p.value").alias("value"))
    )


def fold_value(value_col=None):
    """Value folding for distinct-count purposes: all-numeric -> literal
    '\\d*' (CalculateUtil.java:234-235); '#letters$digits#' -> 'letters#'
    (ProcessedUrl.java:215-218)."""
    if value_col is None:
        value_col = F.col("value")
    folded = F.when(
        value_col.rlike(r"^\d+$"), F.lit("\\d*")
    ).when(
        value_col.rlike(r"^#[^\d]+\$\d+#$"),
        F.concat(F.regexp_extract(value_col, r"^#([^\d]+)\$\d+#$", 1), F.lit("#")),
    ).otherwise(value_col)
    return folded


def key_entropy(kv: DataFrame, fold: bool = True) -> DataFrame:
    """Shannon entropy of the (folded) value distribution per (host, key):
    H = -sum p*log2(p)  (CalculateUtil.java:197-209). Two-level aggregate —
    both levels get map-side partial aggregation."""
    val = fold_value() if fold else F.col("value")
    counts = (
        kv.withColumn("v", val)
        .groupBy("host", "key", "v")
        .agg(F.count("*").alias("c"))
    )
    totals = Window.partitionBy("host", "key")
    p = F.col("c") / F.sum("c").over(totals)
    return (
        counts.withColumn("p", p)
        .groupBy("host", "key")
        .agg(
            F.count("*").alias("n_values"),
            (-F.sum(F.col("p") * F.log2("p"))).alias("entropy"),
        )
    )


def key_support(kv: DataFrame, urls_per_host: DataFrame,
                est_hosts: int | None = None) -> DataFrame:
    """(host, key, support) where support = fraction of the host's URLs
    containing the key at least once. The per-host totals dimension grows
    with DISTINCT HOSTS -> size-gated broadcast hint (r3 verdict class;
    past the gate the equi-join is left to AQE)."""
    per_key = kv.groupBy("host", "key").agg(
        F.countDistinct("url").alias("n_urls_with_key")
    )
    return per_key.join(_gated_dim(urls_per_host, est_hosts), "host").select(
        "host", "key",
        (F.col("n_urls_with_key") / F.col("n_urls")).alias("support"),
    )


def mosted_keys(kv: DataFrame, threshold: float = 0.9) -> DataFrame:
    """Keys present in > threshold of a host's URLs
    (CalculateUtil.java:465-490, threshold 0.9 at :484)."""
    n_urls = kv.groupBy("host").agg(F.countDistinct("url").alias("n_urls"))
    sup = key_support(kv, n_urls)
    return sup.filter(F.col("support") > threshold)


def common_keys(kv: DataFrame) -> DataFrame:
    """Keys present in EVERY URL of a host (ProcessedUrl.java:353-382)."""
    n_urls = kv.groupBy("host").agg(F.countDistinct("url").alias("n_urls"))
    per_key = kv.groupBy("host", "key").agg(
        F.countDistinct("url").alias("n_with")
    )
    return (
        per_key.join(_gated_dim(n_urls, None), "host")
        .filter(F.col("n_with") == F.col("n_urls"))
        .select("host", "key")
    )


def majority_value(kv: DataFrame, threshold: float = 0.7,
                   fold: bool = False) -> DataFrame:
    """Per (host, key): the value holding > threshold of occurrences, if any
    (ProcessedUrl.java:248-286, threshold at :277). Window argmax, ties by
    value ASC (deterministic replacement for HashMap order)."""
    val = fold_value() if fold else F.col("value")
    counts = (
        kv.withColumn("v", val)
        .groupBy("host", "key", "v")
        .agg(F.count("*").alias("c"))
    )
    tot = Window.partitionBy("host", "key")
    ranked = counts.withColumn(
        "ratio", F.col("c") / F.sum("c").over(tot)
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("host", "key").orderBy(
                F.col("c").desc(), F.col("v").asc()
            )
        ),
    )
    return (
        ranked.filter((F.col("rn") == 1) & (F.col("ratio") > threshold))
        .select("host", "key", F.col("v").alias("value"), "ratio")
    )


def most_frequent_key(
    kv: DataFrame,
    exclude: list[str] | None = None,
    min_ratio: float = 0.99,
    abs_min: int | None = None,
) -> DataFrame:
    """Per host: the key with the most PAIR occurrences (multiplicity counts,
    not per-URL presence), kept if count/n_urls > min_ratio OR (abs_min set
    and count > abs_min).

    Parity: getMostedKey (CalculateUtil.java:492-527, ratio 0.99) and
    getMostedKeyForNoSplitKey (CalculateUtil.java:528-566, abs>100 or
    ratio>0.5 — pass min_ratio=0.5, abs_min=100). Ties break by key ASC
    (deterministic replacement for HashMap order).
    """
    filtered = kv
    if exclude:
        filtered = kv.filter(~F.col("key").isin(*exclude))
    n_urls = kv.groupBy("host").agg(F.countDistinct("url").alias("n_urls"))
    counts = filtered.groupBy("host", "key").agg(F.count("*").alias("c"))
    ranked = counts.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("host").orderBy(F.col("c").desc(), F.col("key"))
        ),
    ).filter(F.col("rn") == 1)
    out = ranked.join(_gated_dim(n_urls, None), "host").withColumn(
        "ratio", F.col("c") / F.col("n_urls")
    )
    keep = F.col("ratio") > min_ratio
    if abs_min is not None:
        keep = keep | (F.col("c") > abs_min)
    return out.filter(keep).select("host", "key", "c", "ratio")


def pattern_sanity(pattern_col, host_col):
    """Boolean Column: the reject-degenerate-patterns predicate
    (Main.checkPattern, Main.java:47-69): pattern longer than 5 chars AND
    longer than host+6; a single-alternation pattern must additionally have
    some '#'-delimited part (beyond the first) longer than 3 chars."""
    c1 = F.length(pattern_col) > 5
    c2 = F.length(pattern_col) > F.length(host_col) + 6
    single = F.size(F.split(pattern_col, r"\|")) == 1
    tail_parts = F.slice(
        F.split(pattern_col, "#"), 2, 1_000_000
    )  # Java loop starts at part[1]
    has_long = F.exists(tail_parts, lambda p: F.length(p) > 3)
    return c1 & c2 & (~single | has_long)


def distinct_values(kv: DataFrame, fold: bool = True) -> DataFrame:
    """Distinct (folded) value count per (host, key)
    (ProcessedUrl.java:210-229)."""
    val = fold_value() if fold else F.col("value")
    return (
        kv.withColumn("v", val)
        .groupBy("host", "key")
        .agg(F.countDistinct("v").alias("n_distinct"))
    )
