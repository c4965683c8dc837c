"""URL-shape page classification (EP3 parity, SURVEY.md §2.7).

Two classifiers:
- structural: a page is THEME_PAGE iff any leaf pattern of its host's tree
  structurally matches its URL (ThemePageUrlPatternJob.java:275-294) —
  broadcast the per-host leaf patterns into a pandas UDF;
- regex: match the canonical URL against the host's leaf alternation
  (TreeNode.java:547-560) — pure ``regexp_like``, stays in codegen;
- support-ratio variant (ContentPageAnalyzer.java:25-58): support = sum of
  matched-leaf sizes / sum of leaf sizes >= min_support — relational join.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from url_pattern_algorithm_spark.kernel.tokenize import tokenize_full
from url_pattern_algorithm_spark.kernel.tree import structural_match
from url_pattern_algorithm_spark.scaling import broadcast_if_small, gated_dim


def classify_structural(
    spark: SparkSession, pages: DataFrame, nodes: DataFrame,
    out_col: str = "page_type",
    max_side_rows: int = 1_000_000,
) -> DataFrame:
    """pages(host, url, ...) + nodes -> + page_type column.

    The per-host leaf patternStr lists are a small dimension: collected once,
    broadcast into the UDF closure (the reference's setup()-side-input
    pattern, GarbagePageUrlPatternJob.java:216-253). Pattern-tree tables are
    bounded by hosts x leaves, not by corpus size — but at web scale (10^7+
    hosts) the full dimension would still flood the driver, so the collect is
    (a) scoped by a semi-join to hosts actually present in this batch and
    (b) size-guarded: past ``max_side_rows`` the caller must switch to the
    fully relational path (classify_regex / support_ratio joins).

    NB: the host-scoping collect evaluates ``pages``' lineage once in
    addition to the classification action — persist an expensive ``pages``
    input before calling.
    """
    leaves = nodes.filter("is_leaf").select("host", "pattern")
    batch_hosts = pages.select("host").distinct()
    scoped = leaves.join(batch_hosts, "host", "left_semi")
    leaf_rows = scoped.limit(max_side_rows + 1).collect()
    if len(leaf_rows) > max_side_rows:
        raise ValueError(
            f"classify_structural side input exceeds {max_side_rows} rows "
            "after host scoping; use classify_regex (broadcast-join) or "
            "support_ratio (membership join) instead"
        )
    by_host: dict[str, list[str]] = {}
    for r in leaf_rows:
        by_host.setdefault(r["host"], []).append(r["pattern"])
    bc = spark.sparkContext.broadcast(by_host)

    @pandas_udf("string")
    def classify(hosts: pd.Series, urls: pd.Series) -> pd.Series:
        patterns = bc.value

        def one(host, url):
            pats = patterns.get(host)
            if not pats:
                return "OTHER_PAGE"
            pairs = tokenize_full(url)
            if pairs is None:
                return "OTHER_PAGE"
            for p in pats:
                if structural_match(p, pairs, star="*"):
                    return "THEME_PAGE"
            return "OTHER_PAGE"

        return pd.Series([one(h, u) for h, u in zip(hosts, urls)])

    return pages.withColumn(out_col, classify(F.col("host"), F.col("url")))


def classify_regex(pages_with_canon: DataFrame, alternations: DataFrame,
                   out_col: str = "page_type",
                   est_rows: int | None = None) -> DataFrame:
    """Canonical-regex classification: broadcast-join the per-host
    alternation and regexp_like in codegen (no Python).

    The alternation dimension is one row per GATED HOST — post-gate it is
    usually tiny, but at 10^7+-host scale the hint is a hazard, so it is
    size-gated (scaling.broadcast_if_small). Callers that already count the
    persisted alternation frame (plans/theme_pages.py) pass ``est_rows`` so
    no extra job runs; ``None`` probes — persist ``alternations`` first if
    its lineage includes the tree UDF."""
    j = pages_with_canon.join(
        broadcast_if_small(alternations, est_rows), "host", "left"
    )
    return j.withColumn(
        out_col,
        F.when(
            F.col("patterns").isNotNull()
            & F.regexp_like(F.col("url_canon"), F.col("patterns")),
            F.lit("THEME_PAGE"),
        ).otherwise(F.lit("OTHER_PAGE")),
    ).drop("patterns", "n_leaves")


def support_ratio(membership: DataFrame, nodes: DataFrame,
                  min_support: float = 0.5,
                  est_hosts: int | None = None) -> DataFrame:
    """ContentPageAnalyzer.java:25-58: per URL, (sum of sizes of matched
    leaves) / (sum of all leaf sizes for the host) >= min_support.
    Matched leaves come from the membership table (equi-join, no scan).
    The per-host totals dimension is size-gated like classify_regex's."""
    leaves = nodes.filter("is_leaf").select(
        "host", "node_id", F.col("url_count").alias("leaf_size")
    )
    totals = leaves.groupBy("host").agg(F.sum("leaf_size").alias("total"))
    matched = membership.join(leaves, ["host", "node_id"])
    per_url = matched.groupBy("host", "url").agg(
        F.sum("leaf_size").alias("matched_size")
    )
    return (
        per_url.join(gated_dim(totals, est_hosts), "host")
        .withColumn("support", F.col("matched_size") / F.col("total"))
        .withColumn("is_theme", F.col("support") >= min_support)
    )
