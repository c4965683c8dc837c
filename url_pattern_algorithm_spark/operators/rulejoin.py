"""Relational (join-based) formulations of the reference's nested-loop
node-pair computations (SURVEY.md §2.3) — the distributed path used when
node/cluster tables span hosts and no longer fit one task.

- node_pair_overlap: identifyDuplicateNodes (TreeNode.java:756-802) as a
  membership equi-join + self-join, with the cheap upper-bound prune
  (TreeNode.java:771-774) applied BEFORE the expensive distinct-count agg so
  Catalyst prunes most pairs without touching the url rows.
- key_mapping_argmax: findKeyToKeyMapping (TreeNode.java:821-839) as
  explode -> value equi-join -> window argmax.

The in-task pandas variants (kernel/rules.py) stay bit-faithful to the Java
iteration order; these relational twins define deterministic total orders
(documented divergence: lexicographic tie-breaks replace Java list order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from url_pattern_algorithm_spark.scaling import gated_dim


def node_pair_overlap(
    clusters: DataFrame,
    membership: DataFrame,
    node_sizes: DataFrame,
    threshold: float = 0.5,
) -> DataFrame:
    """(cluster_id, n1, n2, overlap) for node pairs with overlap >= threshold.

    clusters: (cluster_id, url); membership: (node_id, url);
    node_sizes: (node_id, size). overlap = |cluster ∩ (n1 ∪ n2)| /
    (size1 + size2), per TreeNode.java:666-696.
    """
    rel = clusters.join(membership, "url").select("cluster_id", "node_id", "url")
    nodes_per = rel.select("cluster_id", "node_id").distinct()
    a = nodes_per.select("cluster_id", F.col("node_id").alias("n1"))
    b = nodes_per.select("cluster_id", F.col("node_id").alias("n2"))
    pairs = a.join(b, "cluster_id").filter(F.col("n1") < F.col("n2"))
    csize = clusters.groupBy("cluster_id").agg(F.count("*").alias("c_size"))
    s1 = node_sizes.select(F.col("node_id").alias("n1"), F.col("size").alias("s1"))
    s2 = node_sizes.select(F.col("node_id").alias("n2"), F.col("size").alias("s2"))
    pruned = (
        # cluster/node-size dims grow with hosts x nodes at web scale ->
        # size-gated hints (r3 verdict class; bounded probe, AQE fallback)
        pairs.join(gated_dim(csize), "cluster_id")
        .join(gated_dim(s1), "n1")
        .join(gated_dim(s2), "n2")
        # upper bound |cluster|/(s1+s2) — prune before touching url rows
        .filter(F.col("c_size") / (F.col("s1") + F.col("s2")) >= threshold)
    )
    hits = (
        pruned.select("cluster_id", "n1", "n2", "s1", "s2")
        .join(rel, "cluster_id")
        .filter((F.col("node_id") == F.col("n1")) | (F.col("node_id") == F.col("n2")))
        .select("cluster_id", "n1", "n2", "s1", "s2", "url")
        .distinct()
        .groupBy("cluster_id", "n1", "n2", "s1", "s2")
        .agg(F.count("*").alias("n_hit"))
    )
    return (
        hits.withColumn("overlap", F.col("n_hit") / (F.col("s1") + F.col("s2")))
        .filter(F.col("overlap") >= threshold)
        .select("cluster_id", "n1", "n2", "overlap")
    )


def key_mapping_argmax(
    node_kv: DataFrame,
    node_sizes: DataFrame,
    pairs: DataFrame,
    threshold: float = 0.5,
) -> DataFrame:
    """(s, t, key1, key2, rate): per (pair, key2-of-t), the key1-of-s with
    the highest shared-distinct-value rate, kept when rate >= threshold.

    node_kv: (node_id, key, value); node_sizes: (node_id, size);
    pairs: (s, t). rate = shared / (size_s + size_t - shared), per
    TreeNode.java:805-818. Tie-break: key1 ASC (deterministic replacement
    for Java key order).
    """
    dv = node_kv.select("node_id", "key", "value").distinct()
    keys = dv.select("node_id", "key").distinct()
    ks = keys.select(F.col("node_id").alias("s"), F.col("key").alias("key1"))
    kt = keys.select(F.col("node_id").alias("t"), F.col("key").alias("key2"))
    combos = pairs.join(ks, "s").join(kt, "t")
    va = dv.select(F.col("node_id").alias("s"), F.col("key").alias("key1"), "value")
    vb = dv.select(F.col("node_id").alias("t"), F.col("key").alias("key2"), "value")
    shared = (
        pairs.join(va, "s")
        .join(vb, ["t", "value"])
        .groupBy("s", "t", "key1", "key2")
        .agg(F.count("*").alias("shared"))
    )
    zs = node_sizes.select(F.col("node_id").alias("s"), F.col("size").alias("size_s"))
    zt = node_sizes.select(F.col("node_id").alias("t"), F.col("size").alias("size_t"))
    rated = (
        combos.join(shared, ["s", "t", "key1", "key2"], "left")
        .na.fill({"shared": 0})
        .join(gated_dim(zs), "s")
        .join(gated_dim(zt), "t")
        .withColumn(
            "rate",
            F.col("shared") / (F.col("size_s") + F.col("size_t") - F.col("shared")),
        )
    )
    w = Window.partitionBy("s", "t", "key2").orderBy(
        F.col("rate").desc(), F.col("key1").asc()
    )
    return (
        rated.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("rate") >= threshold))
        .select("s", "t", "key1", "key2", "rate")
    )
