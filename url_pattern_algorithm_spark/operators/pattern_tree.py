"""Per-host pattern-tree mining as a grouped-map pandas UDF (EP2 parity).

Distribution strategy matches the reference exactly: the tree recursion runs
once per host inside one task (the reference runs it inside one reducer per
host key — PatternJob.java:268-271), with per-host URL counts bounded by the
sampling caps (operators/sampling.py) so a group always fits a task
(SURVEY.md §4.3). Everything around the recursion — gating, sampling, leaf
collection, alternation assembly, match-rate evaluation — is relational.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from url_pattern_algorithm_spark.kernel.tree import (
    TreeBuilder,
    Url,
    flatten_nodes,
    membership_rows,
)
from url_pattern_algorithm_spark.scaling import broadcast_if_small

TREE_SCHEMA = (
    "host string, node_id int, parent_id int, depth int, partition_key string, "
    "partition_value string, pattern string, pattern_output string, "
    "url_count long, is_leaf boolean, child_has_star boolean, urls_type int, "
    "example_urls array<string>"
)

MEMBERSHIP_SCHEMA = "host string, url string, node_id int"


def build_trees(urls: DataFrame, min_host_urls: int = 0,
                example_cap: int = 300, sort_urls: bool = False) -> DataFrame:
    """(host, url) -> flattened per-host pattern-tree node table.

    ``min_host_urls`` is the reducer gate (100000 in PatternJob.java:263-265,
    50 in GarbagePageUrlPatternJob.java:285-287); enforced INSIDE the UDF
    (cheap: the group is already materialized) and also worth pre-filtering
    with gate_min_host_size when most hosts are tiny, so they never cross
    the Python boundary.

    ``sort_urls=True`` pins the recursion's input to sorted-URL order: node
    ids, sibling order, and tie-broken split choices all follow first-
    encounter order (Fun.java consumes file order), and the row order a
    shuffle delivers to applyInPandas is not stable across partitionings or
    task retries. Sorted input makes the node table a pure function of the
    URL SET — required by the fixed-corpus driver oracles, recommended
    anywhere the output feeds a persisted artifact.
    """

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        host = pdf["host"].iloc[0]
        col = pdf["url"].drop_duplicates()
        if sort_urls:
            col = col.sort_values(kind="mergesort")
        parsed = [Url.parse(u) for u in col]
        parsed = [p for p in parsed if p is not None]
        if len(parsed) < min_host_urls or not parsed:
            return pd.DataFrame(
                columns=[f.split()[0] for f in TREE_SCHEMA.split(", ")]
            )
        b = TreeBuilder()
        b.build(parsed)
        rows = flatten_nodes(b, example_cap=example_cap)
        out = pd.DataFrame(rows)
        out.insert(0, "host", host)
        return out

    return urls.groupBy("host").applyInPandas(build, TREE_SCHEMA)


def build_membership(urls: DataFrame, min_host_urls: int = 0,
                     sort_urls: bool = False) -> DataFrame:
    """(host, url) -> (host, url, node_id) membership rows — the relational
    replacement for belongToNodeList (Fun.java:323-341). ``sort_urls`` pins
    input order exactly as in build_trees."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        host = pdf["host"].iloc[0]
        col = pdf["url"].drop_duplicates()
        if sort_urls:
            col = col.sort_values(kind="mergesort")
        parsed = [Url.parse(u) for u in col]
        parsed = [p for p in parsed if p is not None]
        if len(parsed) < min_host_urls or not parsed:
            return pd.DataFrame(columns=["host", "url", "node_id"])
        b = TreeBuilder()
        b.build(parsed)
        rows = membership_rows(b)
        return pd.DataFrame(
            {"host": host, "url": [r[0] for r in rows],
             "node_id": [r[1] for r in rows]}
        )

    return urls.groupBy("host").applyInPandas(build, MEMBERSHIP_SCHEMA)


def collapsed_leaves(nodes: DataFrame) -> DataFrame:
    """Relational star-collapse leaf selection (Main.java:242-287).

    A leaf is emitted unless its parent (a) has childHasStarFlag, (b) has
    only leaf children, and (c) this leaf is not the parent's first child
    (min node_id — creation order). Pure joins over the small nodes table —
    no tree walk.
    """
    children = nodes.select(
        "host",
        F.col("parent_id").alias("p_id"),
        F.col("node_id").alias("c_id"),
        F.col("is_leaf").alias("c_leaf"),
    ).filter(F.col("p_id").isNotNull())
    par_stats = children.groupBy("host", "p_id").agg(
        F.min("c_id").alias("first_child"),
        F.min(F.col("c_leaf").cast("int")).alias("all_leaf"),
    )
    parents = nodes.select(
        "host", F.col("node_id").alias("p_id"),
        F.col("child_has_star").alias("p_star"),
    ).join(par_stats, ["host", "p_id"])
    leaves = nodes.filter("is_leaf")
    j = leaves.join(
        parents,
        (leaves["host"] == parents["host"])
        & (leaves["parent_id"] == parents["p_id"]),
        "left",
    ).drop(parents["host"])
    collapse = (
        F.col("p_star") & (F.col("all_leaf") == 1)
        & (F.col("node_id") != F.col("first_child"))
    )
    return j.filter(~F.coalesce(collapse, F.lit(False))).select(nodes.columns)


def leaf_alternations(nodes: DataFrame) -> DataFrame:
    """(host, patterns) — '|'-joined escaped leaf output patterns in BFS
    order ((depth, node_id) == the reference's queue order)."""
    leaves = collapsed_leaves(nodes)
    escaped = F.regexp_replace(F.col("pattern_output"), r"\*", ".*")
    # NB: patternOutputStr's '*' only ever appears inside '.*' already; the
    # reference's char-wise escape therefore produces '..*' — replicated by
    # replacing the single '*' char.
    ordered = leaves.withColumn("esc", escaped).withColumn(
        "bfs",
        F.row_number().over(
            Window.partitionBy("host").orderBy("depth", "node_id")
        ),
    )
    return (
        ordered.groupBy("host")
        .agg(
            F.concat_ws(
                "|",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("bfs", "esc"))),
                    lambda s: s.esc,
                ),
            ).alias("patterns"),
            F.count("*").alias("n_leaves"),
        )
    )


def match_rate(urls_with_canon: DataFrame, alternations: DataFrame,
               est_rows: int | None = None) -> DataFrame:
    """Coverage self-check (Main.java:142-153): fraction of a host's
    canonical URLs matched by the host's leaf alternation regex. Relational:
    per-host pattern table joined under a size-gated broadcast hint
    (one row per gated host — tiny post-gate, a hazard at 10^7+ hosts),
    regexp in codegen. Pass ``est_rows`` when the alternation frame is
    already counted (plans do); ``None`` probes — persist first if the
    lineage includes the tree UDF."""
    j = urls_with_canon.join(broadcast_if_small(alternations, est_rows), "host")
    hit = F.when(
        F.regexp_like(F.col("url_canon"), F.col("patterns")), F.lit(1.0)
    ).otherwise(F.lit(0.0))
    return j.groupBy("host").agg(F.avg(hit).alias("match_rate"))
