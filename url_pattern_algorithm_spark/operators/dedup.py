"""Document deduplication operators for the training-data pipeline.

No reference analogue (the reference dedups *URLs* via rewrite rules,
SURVEY.md §2.8); these are the content-side companions a 100 TB corpus
needs. All hashing uses the cross-engine-deterministic 60-bit md5 prefix
(``queries.h60``) so every operator is oracle-checkable in DuckDB — the hot
path stays entirely in whole-stage codegen (split/transform/explode/groupBy:
no Python UDFs anywhere in this module).

Scale notes:
- shingling explodes ~n_words rows per doc; Spark's columnar shuffle with
  map-side partial min() keeps the signature aggregation one shuffle;
- LSH banding turns the quadratic all-pairs problem into an equi-join on
  (band, band_key) — the classic shuffle-friendly formulation; hot buckets
  (boilerplate shingles) are bounded because band keys hash 4 signature
  values together;
- exact-verify (ngram_jaccard) runs only on LSH candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MINHASH_P = 2147483647  # 2^31 - 1, prime
N_PERMS = 16
BAND_ROWS = 4  # 4 bands x 4 rows

# (j, a, b) — fixed public constants; a*h+b mod P with a,b,h < 2^31 never
# overflows int64. Same literals are inlined into the DuckDB oracle.
PERMS = [
    (j, (j * 2654435761 + 1) % MINHASH_P, (j * 40503 + 7) % MINHASH_P)
    for j in range(N_PERMS)
]


def _h60(col):
    """60-bit md5-prefix hash (cross-engine deterministic)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def word_shingles(docs: DataFrame, n: int = 3, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """(doc_id, shingle): distinct n-word shingles per document.

    Docs with fewer than n words produce no shingles (dropped — identical
    rule in the oracle). Pure JVM expressions: split/sequence/transform/
    slice/explode, no Python.
    """
    words = F.split(F.col(text_col), " ")
    idx = F.sequence(F.lit(0), F.size(words) - n)
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)))
    return (
        docs.filter(F.size(words) >= n)
        .select(F.col(id_col).alias("doc_id"),
                F.explode(F.array_distinct(sh)).alias("shingle"))
    )


def minhash_signatures(shingles: DataFrame) -> DataFrame:
    """(doc_id, j, sig): N_PERMS-row MinHash signature per doc.

    One explode (x16) + one groupBy(min) — partial aggregation makes the
    shuffle carry only (doc, perm) minima.
    """
    perms = F.explode(F.array(*[
        F.struct(F.lit(j).alias("j"), F.lit(a).alias("a"), F.lit(b).alias("b"))
        for j, a, b in PERMS
    ]))
    h = F.pmod(_h60(F.col("shingle")), F.lit(MINHASH_P))
    return (
        shingles.withColumn("h", h)
        .select("doc_id", "h", perms.alias("p"))
        .select(
            "doc_id", F.col("p.j").alias("j"),
            F.pmod(F.col("p.a") * F.col("h") + F.col("p.b"),
                   F.lit(MINHASH_P)).alias("hv"),
        )
        .groupBy("doc_id", "j")
        .agg(F.min("hv").alias("sig"))
    )


def lsh_candidate_pairs(sigs: DataFrame, band_rows: int = BAND_ROWS) -> DataFrame:
    """(doc_a, doc_b): pairs sharing at least one LSH band.

    band_key packs the band's signature values in j order; the self-join is
    an equi-join on (band, band_key) — shuffle on small keys, no cartesian.
    """
    banded = (
        sigs.withColumn("band", (F.col("j") / band_rows).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("j", "sig"))),
                    lambda s: s.sig.cast("string"),
                ),
            ).alias("band_key")
        )
    )
    a = banded.select("band", "band_key", F.col("doc_id").alias("doc_a"))
    b = banded.select("band", "band_key", F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def minhash_near_duplicates(docs: DataFrame, threshold: float = 0.5,
                            n: int = 3) -> DataFrame:
    """(doc_a, doc_b, est_jaccard): LSH candidates whose full-signature
    agreement >= threshold. est_jaccard = fraction of equal sig positions."""
    sh = word_shingles(docs, n=n)
    sigs = minhash_signatures(sh)
    pairs = lsh_candidate_pairs(sigs)
    sa = sigs.select(F.col("doc_id").alias("doc_a"), "j",
                     F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), "j",
                     F.col("sig").alias("sig_b"))
    est = (
        pairs.join(sa, "doc_a").join(sb, ["doc_b", "j"])
        .groupBy("doc_a", "doc_b")
        .agg(
            (F.sum((F.col("sig_a") == F.col("sig_b")).cast("int"))
             / F.lit(N_PERMS)).alias("est_jaccard")
        )
    )
    return est.filter(F.col("est_jaccard") >= threshold)


def exact_jaccard(docs: DataFrame, pairs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_a, doc_b, jaccard): exact n-gram Jaccard for given pairs —
    the verify stage after LSH candidate generation."""
    sh = word_shingles(docs, n=n)
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    na = sh.groupBy(F.col("doc_id").alias("doc_a")).agg(
        F.count("*").alias("n_a"))
    nb = sh.groupBy(F.col("doc_id").alias("doc_b")).agg(
        F.count("*").alias("n_b"))
    inter = (
        pairs.join(sa, "doc_a").join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        pairs.join(inter, ["doc_a", "doc_b"], "left").na.fill({"n_inter": 0})
        .join(na, "doc_a").join(nb, "doc_b")
        .select(
            "doc_a", "doc_b",
            (F.col("n_inter")
             / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))).alias("jaccard"),
        )
    )


def simhash16(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """(doc_id, simhash): 16-bit SimHash over distinct words.

    bit b of the output is 1 iff at least half the doc's words have bit b
    set in their 16-bit word hash — the majority-vote construction, all in
    codegen (no shiftright-by-column in Spark, so the bit test is the
    integer-exact floor(w / 2^b) % 2 form)."""
    words = (
        docs.select(F.col(id_col).alias("doc_id"),
                    F.explode(F.array_distinct(
                        F.split(F.col(text_col), " "))).alias("w"))
    )
    w16 = F.pmod(_h60(F.col("w")), F.lit(65536))
    bits = words.withColumn("w16", w16).select(
        "doc_id", "w16",
        F.explode(F.sequence(F.lit(0), F.lit(15))).alias("b"),
    ).select(
        "doc_id", "b",
        (F.floor(F.col("w16") / F.pow(F.lit(2.0), F.col("b"))).cast("long")
         % 2).alias("bit"),
    )
    votes = bits.groupBy("doc_id", "b").agg(
        F.sum("bit").alias("ones"), F.count("*").alias("n")
    )
    return votes.groupBy("doc_id").agg(
        F.sum(
            F.when(2 * F.col("ones") >= F.col("n"),
                   F.pow(F.lit(2.0), F.col("b")).cast("long")).otherwise(0)
        ).alias("simhash")
    )


def fingerprint(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, fingerprint): single-perm MinHash content fingerprint —
    min 60-bit shingle hash, stable under word-order-preserving edits
    outside the minimal shingle."""
    sh = word_shingles(docs, n=n)
    return sh.groupBy("doc_id").agg(F.min(_h60(F.col("shingle"))).alias("fingerprint"))


def connected_components(pairs: DataFrame, a_col: str = "doc_a",
                         b_col: str = "doc_b",
                         max_iters: int = 50) -> DataFrame:
    """(node, component): connected components of an undirected pair set —
    the cluster-resolution step after near-dup pair generation (LSH emits
    PAIRS; dedup policy needs per-doc cluster ids to pick canonical
    representatives). component = MIN node id in the component.

    Min-label propagation: each round every node takes the min label over
    itself and its neighbors (one join + one groupBy-min per round),
    converging in O(component diameter) rounds — near-dup graphs are
    dense/shallow (diameter 2-4 typical), so a handful of shuffles total.
    Scale shape: labels and edges stay DataFrames end-to-end; the only
    driver-side value per round is the 1-row changed-label count (the same
    convergence-probe pattern as the reference's iterative MR jobs), and
    each round's labels go through ``localCheckpoint`` — iterative joins
    MUST truncate lineage, or the logical plan deepens every round and the
    driver OOMs analyzing it (persist alone does not truncate; a cluster
    deployment with executor churn would use a reliable checkpoint dir
    instead). Raises past ``max_iters`` rather than silently truncating
    (no-silent-caps rule).
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    try:
        for _ in range(max_iters):
            msgs = (
                edges.join(labels, edges["src"] == labels["node"])
                .groupBy(F.col("dst").alias("node"))
                .agg(F.min("component").alias("nbr_min"))
            )
            nxt = (
                labels.join(msgs, "node", "left")
                .select(
                    "node",
                    F.least(
                        F.col("component"),
                        F.coalesce(F.col("nbr_min"), F.col("component")),
                    ).alias("component"),
                    (F.coalesce(F.col("nbr_min"), F.col("component"))
                     < F.col("component")).alias("_changed"),
                )
                .localCheckpoint()  # eager: truncates this round's lineage
            )
            changed = nxt.filter(F.col("_changed")).limit(1).count()
            labels = nxt.drop("_changed")
            if changed == 0:
                return labels
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds — "
            "component diameter exceeds the bound; raise max_iters"
        )
    finally:
        edges.unpersist()


def dedup_cluster_assignments(docs: DataFrame, threshold: float = 0.5,
                              n: int = 3) -> DataFrame:
    """(doc_id, cluster_id, is_representative): end-to-end near-dup
    cluster resolution — MinHash/LSH pairs -> connected components ->
    canonical representative (min doc_id per cluster). Docs with no
    near-duplicate are their own singleton cluster (left join, not
    dropped), so the output is a total dedup policy over the corpus:
    keep rows where is_representative."""
    pairs = minhash_near_duplicates(docs, threshold=threshold, n=n)
    comp = connected_components(pairs)
    return (
        docs.select("doc_id")
        .join(comp, F.col("doc_id") == F.col("node"), "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("cluster_id"),
        )
        .withColumn(
            "is_representative", F.col("doc_id") == F.col("cluster_id")
        )
    )
