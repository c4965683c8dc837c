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
