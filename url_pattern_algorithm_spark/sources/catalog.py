"""Checkpoint-table catalog: Iceberg-shaped table ops over a storage root.

The north_rule materializes frontier state as Iceberg checkpoint tables with
per-partition lineage. This sandbox has no Iceberg runtime jar, so the
catalog writes parquet directories with identical table semantics (append /
overwrite / read-by-name / partitioned layout). On a cluster, swap
``_FORMAT = "iceberg"`` and point ``root`` at a catalog namespace — every
caller goes through this interface, nothing else changes.

Lineage columns stamped on every checkpoint write (FIXTURES.md F2):
``run_id``, ``iteration``, ``partition_id`` (physical writing partition via
``spark_partition_id()``), plus a per-write row-count metric appended to the
``_metrics`` table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_FORMAT = "parquet"


class Catalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        p = self.path(name)
        return os.path.isdir(p) and any(
            f.endswith(".parquet") or f == "_SUCCESS" for f in os.listdir(p)
        )

    def read(self, name: str) -> DataFrame:
        return self.spark.read.format(_FORMAT).load(self.path(name))

    def write(
        self,
        df: DataFrame,
        name: str,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
    ) -> None:
        w = df.write.format(_FORMAT).mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.save(self.path(name))

    def append(self, df: DataFrame, name: str,
               partition_by: list[str] | None = None) -> None:
        self.write(df, name, mode="append", partition_by=partition_by)

    def write_checkpoint(
        self,
        df: DataFrame,
        name: str,
        run_id: str,
        iteration: int,
        partition_by: list[str] | None = None,
    ) -> int:
        """Write a lineage-stamped checkpoint table; returns row count.

        The count comes from a single pass (count + write of a cached plan)
        and lands in the ``_metrics`` table — the per-partition lineage the
        north_rule asks for is queryable as
        ``GROUP BY run_id, iteration, partition_id``.
        """
        stamped = (
            df.withColumn("run_id", F.lit(run_id))
            .withColumn("iteration", F.lit(iteration))
            .withColumn("partition_id", F.spark_partition_id())
        )
        stamped = stamped.persist()
        n = stamped.count()
        self.write(stamped, name, partition_by=partition_by)
        metrics = self.spark.createDataFrame(
            [(run_id, iteration, name, n)],
            "run_id string, iteration int, table string, rows long",
        )
        self.append(metrics, "_metrics")
        stamped.unpersist()
        return n
