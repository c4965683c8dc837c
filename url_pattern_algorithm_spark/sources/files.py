"""Text-file sources/sinks of the reference's on-disk formats (SURVEY.md §2.1).

The reference moves URL lists, pre-tokenized URLs, duplicate clusters, and
learned rules through ad-hoc text files; these readers/writers reproduce each
format as DataFrame ops so the EP1/EP2 flows can consume the same artifacts.
Line order within a single text file is recovered via
``monotonically_increasing_id`` — valid because the text source assigns
splits in file-offset order (documented assumption; these files are small
side inputs, never the 10^10-row frontier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from url_pattern_algorithm_spark.functions.udfs import tokenize_full_udf


def read_url_file(spark: SparkSession, path: str) -> DataFrame:
    """URL-per-line scan (InputUtil.java:113-131): text -> (url, kvs).
    Unparsable URLs (no scheme) get null kvs and are dropped, mirroring the
    reference's catch-and-skip."""
    lines = spark.read.text(path).select(F.col("value").alias("url"))
    out = lines.withColumn("kvs", tokenize_full_udf(F.col("url")))
    return out.filter(F.col("kvs").isNotNull())


def read_url_pairs_file(spark: SparkSession, path: str) -> DataFrame:
    """Pre-tokenized URL scan (InputUtil.java:81-111): a URL line (starts
    with '/' or ' ') followed by one 'key value' line per pair ->
    (url, kvs:array<struct<key,value>>).

    The stateful line-walk becomes a running-record-id window + grouped
    collect; pair order inside a record is preserved by line number.
    """
    lines = spark.read.text(path).select(
        F.monotonically_increasing_id().alias("line_no"),
        F.col("value").alias("line"),
    )
    is_url = F.col("line").startswith("/") | F.col("line").startswith(" ")
    w = Window.orderBy("line_no")
    tagged = lines.withColumn(
        "rec", F.sum(is_url.cast("int")).over(w)
    ).filter(F.col("rec") > 0)
    urls = tagged.filter(is_url).select(
        "rec", F.col("line").alias("url")
    )
    pairs = (
        tagged.filter(~is_url)
        .withColumn("part", F.split(F.col("line"), " "))
        .select(
            "rec", "line_no",
            F.struct(
                F.col("part")[0].alias("key"), F.col("part")[1].alias("value")
            ).alias("kv"),
        )
    )
    agg = pairs.groupBy("rec").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("line_no", "kv"))),
            lambda s: s.kv,
        ).alias("kvs")
    )
    return urls.join(agg, "rec", "left").select("url", "kvs")


def read_cluster_file(spark: SparkSession, path: str) -> DataFrame:
    """'#'-delimited duplicate-cluster scan (InputUtil.java:169-186) ->
    (host, cluster_id, url). Size gates (>10 URLs) are applied downstream by
    learn_rules, matching the reference's split of concerns."""
    from url_pattern_algorithm_spark.operators.rewrite import (
        cluster_rows_from_text,
    )

    lines = spark.read.text(path).select(
        F.monotonically_increasing_id().alias("line_no"),
        F.col("value").alias("line"),
    )
    return cluster_rows_from_text(spark, lines)


RULES_SEP = "$$"


def read_rules_file(spark: SparkSession, path: str) -> DataFrame:
    """'pattern$$rule' lines (Fun.java:603-644 output; RewriteTool.java:29-48
    input) -> (rule_id, pattern, rule), id = file order = match precedence."""
    lines = spark.read.text(path).select(
        F.monotonically_increasing_id().alias("line_no"),
        F.col("value").alias("line"),
    )
    w = Window.orderBy("line_no")
    parts = F.split(F.col("line"), r"\$\$")
    return (
        lines.filter(F.length("line") > 0)
        .withColumn("rule_id", F.row_number().over(w) - 1)
        .select(
            "rule_id",
            parts[0].alias("pattern"),
            parts[1].alias("rule"),
        )
    )


def write_rules_file(rules: DataFrame, path: str) -> None:
    """rules (host, rule_id, pattern, rule) -> 'pattern$$rule' text lines
    in (host, rule_id) order (single file: rules tables are tiny)."""
    (
        rules.orderBy("host", "rule_id")
        .select(F.concat_ws(RULES_SEP, "pattern", "rule").alias("value"))
        .coalesce(1)
        .write.mode("overwrite")
        .text(path)
    )


def write_patterns_file(alternations: DataFrame, path: str) -> None:
    """(host, patterns) -> 'host<TAB>patterns' lines (PatternJob-style
    per-host pattern sink)."""
    (
        alternations.orderBy("host")
        .select(F.concat_ws("\t", "host", "patterns").alias("value"))
        .coalesce(1)
        .write.mode("overwrite")
        .text(path)
    )


def read_properties(path: str) -> dict[str, str]:
    """Java-properties config source (InputUtil.java:188-207) — driver-side
    (it configures the job; never distributed)."""
    out: dict[str, str] = {}
    with open(path, encoding="utf-8") as f:
        for raw in f:
            line = raw.strip()
            if not line or line.startswith(("#", "!")):
                continue
            for sep in ("=", ":"):
                if sep in line:
                    k, v = line.split(sep, 1)
                    out[k.strip()] = v.strip()
                    break
    return out
