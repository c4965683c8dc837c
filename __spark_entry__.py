"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``  — flagship frontier-scheduling slice at sf0.001;
- ``queries()``     — one entry per implemented operator family
  (SURVEY.md §2), each (spark, sf_dir) -> DataFrame;
- ``oracle_sql()``  — DuckDB-runnable ANSI SQL stating each query's expected
  result on the same parquet tables.

Every registered query carries an oracle (r5): the registry is capped at 50
entries so the driver's sweep window covers ALL of it;
tools/verify_sweep.py checks a driver-recorded sweep against the registry. The sf-corpus
UDF-recursion projections with no SQL statement (raw node/alternation
tables) live as pytest coverage; their hard driver signal is the
tree_invariants / *_fixed oracle queries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from url_pattern_algorithm_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: normalize -> dedup -> politeness -> salted priority
    top-k scheduling over the derived URL corpus at sf0.001."""
    return QUERIES["frontier_schedule"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
