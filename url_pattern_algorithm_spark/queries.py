"""Driver-facing query registry: named queries + DuckDB oracle SQL.

Every entry exercises one operator family from SURVEY.md §2 against the
driver's synthetic parquet tables (/root/testdata/sf*/). URL-shaped inputs
don't exist in that star schema, so a deterministic URL corpus is *derived*
from ``orders`` with arithmetic both engines can reproduce exactly; the
oracle SQL re-derives the same corpus and states the expected result in pure
ANSI SQL. UDF-only operators (pattern-tree recursion, rewrite-rule learning)
ship without oracle SQL — the driver records a rows-only check and their
bit-parity is covered by the pure-python oracle in tests/.

Cross-engine determinism rules used throughout:
- hashes that must match DuckDB use md5 (``H60``: first 15 hex chars as a
  60-bit int); Spark-only hot paths keep the built-in ``xxhash64``;
- every float output is rounded; every ranking has a total order;
- no rand()/current_time anywhere.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from url_pattern_algorithm_spark.functions.udfs import (
    normalize_url_udf,
    with_url_columns,
)
from url_pattern_algorithm_spark.operators import aggregates as agg
from url_pattern_algorithm_spark.operators import sampling
from url_pattern_algorithm_spark.operators.classify import classify_regex
from url_pattern_algorithm_spark.operators.frontier import (
    politeness_budgets,
    robots_filter,
    schedule_top_k,
    seen_filter,
)
from url_pattern_algorithm_spark.operators.pattern_tree import (
    build_trees,
    leaf_alternations,
)
from url_pattern_algorithm_spark.operators.rewrite import (
    apply_rules,
    compression_metric,
    learn_rules,
)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def h60(col: Column) -> Column:
    """60-bit deterministic hash reproducible in DuckDB:
    Spark  conv(substr(md5(x),1,15),16,10)::long
    DuckDB cast(concat('0x',substr(md5(x),1,15)) as bigint)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


H60_SQL = "CAST(concat('0x', substr(md5({x}), 1, 15)) AS BIGINT)"


# ---------------------------------------------------------------------------
# Derived URL corpus (from orders) — identical in Spark and DuckDB
# ---------------------------------------------------------------------------
# Raw URLs deliberately contain every normalization hazard the frontier must
# fold away: uppercase hosts, explicit :80 default ports, unsorted query
# params (ref before page), and session-id params — so the canonical form is
# a *real* transformation, stated in closed form by the oracle.

def urls_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    ok, ck = F.col("o_orderkey"), F.col("o_custkey")
    hostnum = F.when(ok % 10 < 3, F.lit(0)).otherwise(ck % 39 + 1)
    host_l = F.concat(F.lit("www.host"), hostnum.cast("string"), F.lit(".com"))
    host_raw = F.when(ok % 11 == 0, F.upper(host_l)).otherwise(host_l)
    port = F.when(ok % 13 == 0, F.lit(":80")).otherwise(F.lit(""))
    cat = F.concat(F.lit("cat"), (ok % 7).cast("string"))
    item = F.concat(F.lit("item"), (ok % 997).cast("string"))
    page = F.when(ok % 10 < 8, F.lit(1).cast("long")).otherwise(ok % 7)
    has_ref = F.col("o_orderstatus") == "O"
    ref = F.concat(F.lit("r"), (ck % 3).cast("string"))
    url = F.concat(
        F.lit("http://"), host_raw, port,
        F.lit("/"), cat, F.lit("/"), item, F.lit("?"),
        F.when(has_ref, F.concat(F.lit("ref="), ref, F.lit("&"))).otherwise(F.lit("")),
        F.lit("page="), page.cast("string"),
        F.when(ok % 4 == 0, F.concat(F.lit("&sid=s"), ok.cast("string"))).otherwise(F.lit("")),
    )
    return o.select(
        ok.alias("ok"),
        url.alias("url"),
        F.lower(host_l).alias("host"),
        hostnum.alias("hostnum"),
    )


# The same corpus in DuckDB. `canon` states the expected canonical form in
# closed form: session ids stripped, host lowercased, :80 dropped, params
# sorted path-first then lexicographically (page < ref).
URLS_SQL = """
WITH u0 AS (
  SELECT o_orderkey AS ok, o_custkey AS ck, o_orderstatus AS status,
         CASE WHEN o_orderkey % 10 < 3 THEN 0 ELSE o_custkey % 39 + 1 END AS hostnum
  FROM orders
), u1 AS (
  SELECT ok, hostnum,
         'www.host' || hostnum || '.com' AS host,
         'cat' || (ok % 7) AS cat,
         'item' || (ok % 997) AS item,
         CASE WHEN ok % 10 < 8 THEN 1 ELSE ok % 7 END AS page,
         (status = 'O') AS has_ref,
         'r' || (ck % 3) AS ref
  FROM u0
), urls AS (
  SELECT ok, hostnum, host, cat, item, page, has_ref, ref,
         'http://' ||
           CASE WHEN ok % 11 = 0 THEN upper(host) ELSE host END ||
           CASE WHEN ok % 13 = 0 THEN ':80' ELSE '' END ||
           '/' || cat || '/' || item || '?' ||
           CASE WHEN has_ref THEN 'ref=' || ref || '&' ELSE '' END ||
           'page=' || page ||
           CASE WHEN ok % 4 = 0 THEN '&sid=s' || ok ELSE '' END AS url,
         'http://' || host || '/' || cat || '/' || item ||
           '?page=' || page ||
           CASE WHEN has_ref THEN '&ref=' || ref ELSE '' END AS canon
  FROM u1
)
"""

# Distinct canonical URLs with their defining attributes (1:1 with canon).
# NB: ref is blanked when has_ref is false — otherwise rows that normalize to
# the same canonical URL would split into distinct groups by an attribute the
# canonical form no longer contains.
CANON_SQL = URLS_SQL + """
, canon AS (
  SELECT canon AS url_canon, host, cat, item, page, has_ref,
         CASE WHEN has_ref THEN ref ELSE '' END AS ref,
         max(ok) AS pri
  FROM urls
  GROUP BY 1, 2, 3, 4, 5, 6, 7
)
"""

# Light-tokenizer kv pairs of each distinct canonical URL, stated directly.
KV_SQL = CANON_SQL + """
, kv AS (
  SELECT host, url_canon AS url, 'path0' AS key, host AS value FROM canon
  UNION ALL SELECT host, url_canon, 'path1', cat FROM canon
  UNION ALL SELECT host, url_canon, 'path2', item FROM canon
  UNION ALL SELECT host, url_canon, 'page', CAST(page AS VARCHAR) FROM canon
  UNION ALL SELECT host, url_canon, 'ref', ref FROM canon WHERE has_ref
)
"""


def _canon_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct canonical URLs via the real normalization chain, with a
    unique deterministic priority (max source order key)."""
    u = urls_raw(spark, sf_dir)
    c = u.withColumn("url_canon", normalize_url_udf(F.col("url")))
    return c.groupBy("url_canon", "host").agg(F.max("ok").alias("pri"))


def _kv_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    canon = _canon_df(spark, sf_dir).select(
        "host", F.col("url_canon").alias("url")
    )
    return agg.explode_kv(canon)


# ---------------------------------------------------------------------------
# A. URL normalization + frontier operators
# ---------------------------------------------------------------------------

def q_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full normalization chain (strip-session -> RFC-3986 -> canonical sort)
    on every raw URL; the oracle states the closed-form expected canonical."""
    u = urls_raw(spark, sf_dir)
    return u.select(
        "url", normalize_url_udf(F.col("url")).alias("url_canon")
    ).distinct()


SQL_URL_NORMALIZE = URLS_SQL + """
SELECT DISTINCT url, canon AS url_canon FROM urls
"""


def q_frontier_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship slice: normalize -> dedup -> politeness budgets -> salted
    two-phase priority top-k (SURVEY.md §7 'minimum end-to-end slice')."""
    canon = _canon_df(spark, sf_dir)
    pending = canon.select(
        "host",
        "url_canon",
        F.col("pri").cast("double").alias("priority"),
        F.xxhash64("url_canon").alias("url_hash"),
    )
    host_state = pending.select("host").distinct().select(
        "host",
        F.lit(2.5).alias("tokens"),
        F.lit(1.0).alias("crawl_delay"),
    )
    budgets = politeness_budgets(host_state, refill=1.0, cap=4.0)
    frontier = pending.join(F.broadcast(budgets), "host")
    sched = schedule_top_k(frontier, F.col("budget"), salts=16)
    return sched.select(
        "host", "url_canon", F.col("priority").cast("long").alias("priority"),
        "sched_rank",
    )


# budget = floor(min(4.0, 2.5 + 1.0)) = 3; unique priority => total order.
SQL_FRONTIER_SCHEDULE = CANON_SQL + """
SELECT host, url_canon, pri AS priority,
       CAST(row_number() OVER (PARTITION BY host ORDER BY pri DESC, url_canon) AS INT)
         AS sched_rank
FROM canon
QUALIFY sched_rank <= 3
"""


def q_url_seen_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-seen anti-join on the 64-bit canonical hash (north_rule seen
    filter; SURVEY.md §2.3 frontier joins)."""
    canon = _canon_df(spark, sf_dir)
    seen = canon.filter(F.col("pri") % 3 == 0).select(
        F.xxhash64("url_canon").alias("url_hash"),
    )
    cand = canon.filter(F.col("pri") % 3 != 0).select(
        "host", "url_canon", F.xxhash64("url_canon").alias("url_hash")
    )
    unseen = seen_filter(cand, seen)
    return unseen.select("host", "url_canon")


SQL_URL_SEEN_ANTIJOIN = CANON_SQL + """
SELECT c.host, c.url_canon
FROM canon c
WHERE c.pri % 3 <> 0
  AND NOT EXISTS (SELECT 1 FROM canon s WHERE s.pri % 3 = 0
                  AND s.url_canon = c.url_canon)
"""


def q_politeness_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-bucket advance (tokens' = min(cap, t + refill/delay); budget =
    floor) — the per-host politeness state transition."""
    c = _t(spark, sf_dir, "customer")
    host_state = c.select(
        F.concat(F.lit("www.host"), (F.col("c_custkey") % 40).cast("string"),
                 F.lit(".com")).alias("host"),
        ((F.col("c_custkey") % 5) * 0.7).alias("tokens"),
        (1.0 + (F.col("c_custkey") % 3)).alias("crawl_delay"),
    ).groupBy("host").agg(
        F.min("tokens").alias("tokens"), F.min("crawl_delay").alias("crawl_delay")
    )
    b = politeness_budgets(host_state, refill=1.0, cap=4.0)
    return b.select("host", F.round("tokens_avail", 6).alias("tokens_avail"),
                    "budget")


SQL_POLITENESS_BUDGET = """
WITH hs AS (
  SELECT 'www.host' || (c_custkey % 40) || '.com' AS host,
         min((c_custkey % 5) * 0.7) AS tokens,
         min(1.0 + (c_custkey % 3)) AS crawl_delay
  FROM customer GROUP BY 1
)
SELECT host, round(least(4.0, tokens + 1.0 / crawl_delay), 6) AS tokens_avail,
       CAST(floor(least(4.0, tokens + 1.0 / crawl_delay)) AS INT) AS budget
FROM hs
"""


def q_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast robots disallow-prefix join: even hosts disallow /cat0 and
    /cat1, odd hosts disallow /cat2; count surviving URLs per host."""
    u = urls_raw(spark, sf_dir)
    hosts = u.select("host", "hostnum").distinct()
    robots = hosts.select(
        "host",
        F.when(F.col("hostnum") % 2 == 0, F.array(F.lit("/cat0"), F.lit("/cat1")))
        .otherwise(F.array(F.lit("/cat2"))).alias("prefixes"),
    ).select("host", F.explode("prefixes").alias("prefix"),
             F.lit(False).alias("allow"))
    allowed = robots_filter(u, robots)
    return allowed.groupBy("host").agg(F.count("*").alias("n_allowed"))


SQL_ROBOTS_FILTER = URLS_SQL + """
SELECT host, count(*) AS n_allowed
FROM urls
WHERE NOT (CASE WHEN hostnum % 2 = 0 THEN cat IN ('cat0','cat1')
                ELSE cat = 'cat2' END)
GROUP BY host
"""


def q_host_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host URL counts above a reporting threshold
    (StatisticJob.java:209-211 shape, threshold scaled to the corpus)."""
    u = urls_raw(spark, sf_dir)
    return sampling.big_hosts_report(u, threshold=250)


SQL_HOST_COUNTS = URLS_SQL + """
SELECT host, count(*) AS url_count FROM urls GROUP BY host HAVING count(*) > 250
"""


def q_url_sample_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host cap sampling, deterministic keep-hash variant
    (PatternJob.java:250-262; hash keep-rule replaces Random)."""
    u = urls_raw(spark, sf_dir).select("host", "url").distinct()
    keep_hash = F.pmod(h60(F.col("url")), F.lit(1_000_000))
    return sampling.cap_per_host(u, cap=150, keep_hash=keep_hash).select(
        "host", "url"
    )


SQL_URL_SAMPLE_CAP = URLS_SQL + """
, du AS (SELECT DISTINCT host, url FROM urls),
cnt AS (SELECT host, count(*) AS n FROM du GROUP BY host)
SELECT du.host, du.url
FROM du JOIN cnt ON du.host = cnt.host
WHERE ({h} % 1000000) < least(1.0, 150.0 / cnt.n) * 1000000
""".format(h=H60_SQL.format(x="du.url"))


def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 75/25 per-host split (GarbagePageUrlPatternJob.java:296-304),
    deterministic order = url ASC."""
    u = _canon_df(spark, sf_dir).select("host", F.col("url_canon").alias("url"))
    return sampling.train_test_split(u, order_col=F.col("url").asc())


SQL_TRAIN_TEST_SPLIT = CANON_SQL + """
, du AS (SELECT host, url_canon AS url FROM canon)
SELECT host, url,
       row_number() OVER (PARTITION BY host ORDER BY url)
         <= ceil(count(*) OVER (PARTITION BY host) * 0.75) AS is_train
FROM du
"""


# ---------------------------------------------------------------------------
# B. KV-distribution aggregates (SURVEY.md §2.4)
# ---------------------------------------------------------------------------

def q_kv_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    kv = _kv_df(spark, sf_dir)
    e = agg.key_entropy(kv, fold=True)
    return e.select("host", "key", "n_values", F.round("entropy", 6).alias("entropy"))


SQL_KV_ENTROPY = KV_SQL + """
, folded AS (
  SELECT host, key,
         CASE WHEN regexp_matches(value, '^\\d+$') THEN '\\d*' ELSE value END AS v
  FROM kv
), counts AS (
  SELECT host, key, v, count(*) AS c FROM folded GROUP BY 1,2,3
), withp AS (
  SELECT host, key, c * 1.0 / sum(c) OVER (PARTITION BY host, key) AS p
  FROM counts
)
SELECT host, key, count(*) AS n_values, round(-sum(p * log2(p)), 6) AS entropy
FROM withp GROUP BY host, key
"""


def q_kv_mosted_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    kv = _kv_df(spark, sf_dir)
    m = agg.mosted_keys(kv, threshold=0.9)
    return m.select("host", "key", F.round("support", 6).alias("support"))


SQL_KV_MOSTED_KEYS = KV_SQL + """
, n AS (SELECT host, count(DISTINCT url) AS n_urls FROM kv GROUP BY host)
SELECT kv.host, key, round(count(DISTINCT url) * 1.0 / any_value(n_urls), 6)
         AS support
FROM kv JOIN n ON kv.host = n.host
GROUP BY kv.host, key
HAVING count(DISTINCT url) * 1.0 / any_value(n_urls) > 0.9
"""


def q_kv_majority_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    kv = _kv_df(spark, sf_dir)
    m = agg.majority_value(kv, threshold=0.7)
    return m.select("host", "key", "value", F.round("ratio", 6).alias("ratio"))


SQL_KV_MAJORITY_VALUE = KV_SQL + """
, counts AS (SELECT host, key, value AS v, count(*) AS c FROM kv GROUP BY 1,2,3),
ranked AS (
  SELECT host, key, v, c,
         c * 1.0 / sum(c) OVER (PARTITION BY host, key) AS ratio,
         row_number() OVER (PARTITION BY host, key ORDER BY c DESC, v) AS rn
  FROM counts
)
SELECT host, key, v AS value, round(ratio, 6) AS ratio
FROM ranked WHERE rn = 1 AND ratio > 0.7
"""


def q_kv_common_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg.common_keys(_kv_df(spark, sf_dir))


SQL_KV_COMMON_KEYS = KV_SQL + """
, n AS (SELECT host, count(DISTINCT url) AS n_urls FROM kv GROUP BY host)
SELECT kv.host, key
FROM kv JOIN n ON kv.host = n.host
GROUP BY kv.host, key, n_urls
HAVING count(DISTINCT url) = n_urls
"""


def q_kv_distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg.distinct_values(_kv_df(spark, sf_dir), fold=True)


SQL_KV_DISTINCT_VALUES = KV_SQL + """
SELECT host, key,
       count(DISTINCT CASE WHEN regexp_matches(value, '^\\d+$')
                           THEN '\\d*' ELSE value END) AS n_distinct
FROM kv GROUP BY host, key
"""


# ---------------------------------------------------------------------------
# C. Classification / pattern matching
# ---------------------------------------------------------------------------

def q_pattern_match_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-regex page classification (classify_regex / match-rate eval,
    Main.java:142-153): per-host alternation matched in codegen."""
    canon = _canon_df(spark, sf_dir)
    hostnum = F.regexp_extract(F.col("host"), r"www\.host(\d+)\.com", 1)
    alternations = canon.select("host").distinct().select(
        "host",
        F.concat(
            F.lit(r"^http://www\.host"), hostnum,
            F.lit(r"\.com/cat[0-3]/.*"),
        ).alias("patterns"),
        F.lit(1).alias("n_leaves"),
    )
    pages = canon.select("host", "url_canon")
    out = classify_regex(pages, alternations)
    return out.groupBy("host", "page_type").agg(F.count("*").alias("n"))


SQL_PATTERN_MATCH_CLASSIFY = CANON_SQL + """
SELECT host,
       CASE WHEN cat IN ('cat0','cat1','cat2','cat3')
            THEN 'THEME_PAGE' ELSE 'OTHER_PAGE' END AS page_type,
       count(*) AS n
FROM canon GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# D. Pattern-tree + rewrite-rule pipelines (UDF recursion — no SQL oracle;
#    bit-parity is covered by the pure-python oracle tests in tests/)
# ---------------------------------------------------------------------------

def q_pattern_tree_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    canon = _canon_df(spark, sf_dir).select("host", F.col("url_canon").alias("url"))
    nodes = build_trees(canon, min_host_urls=50)
    return nodes.select(
        "host", "node_id", "parent_id", "depth", "partition_key",
        "partition_value", "pattern_output", "url_count", "is_leaf",
    )


def q_leaf_alternations(spark: SparkSession, sf_dir: str) -> DataFrame:
    canon = _canon_df(spark, sf_dir).select("host", F.col("url_canon").alias("url"))
    nodes = build_trees(canon, min_host_urls=50)
    return leaf_alternations(nodes)


def _cluster_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster corpus for rewrite learning (EP1): every page is
    reachable under two URL shapes, each alias carrying a unique junk param —
    the duplicate-page signal the reference mines rewrite rules from.
    Cluster = (host, page); its members span both shapes, so the per-page
    leaf nodes of the two shapes overlap the cluster at rate 1.0 (>= the 0.5
    threshold, TreeNode.java:775-778) and a view->doc rewrite rule emerges."""
    o = _t(spark, sf_dir, "orders")
    ok, ck = F.col("o_orderkey"), F.col("o_custkey")
    host = F.concat(F.lit("www.site"), (ck % 2).cast("string"), F.lit(".com"))
    pages = F.array(*[F.lit(p) for p in
                      ("alpha", "beta", "gamma", "delta", "epsilon")])
    # skewed page + shape distributions: the reference's trivial/salient
    # classifier treats an all-equal histogram as all-trivial (bubbleSort
    # isSameArray, CalculateUtil.java:117-123), so exact uniformity would
    # stop the split; page 'epsilon' absorbs 6/10 of the mass and doc:view
    # is 6:4, keeping every per-page count over the >50 salient override.
    m = F.floor(ok / 10).cast("long") % 10
    page = F.element_at(pages, (F.least(m, F.lit(4)) + 1).cast("int"))
    url = F.when(
        ok % 10 < 6,
        F.concat(F.lit("http://"), host, F.lit("/doc/"), page,
                 F.lit("?s="), ok.cast("string")),
    ).otherwise(
        F.concat(F.lit("http://"), host, F.lit("/view?id="), page,
                 F.lit("&t="), ok.cast("string")),
    )
    return o.select(
        host.alias("host"),
        F.concat(host, F.lit("#"), page).alias("cluster_id"),
        url.alias("url"),
    ).distinct()


def q_rewrite_rules_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    clusters = _cluster_urls(spark, sf_dir)
    return learn_rules(clusters, min_cluster_size=2)


def q_rewrite_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    clusters = _cluster_urls(spark, sf_dir)
    rules = learn_rules(clusters, min_cluster_size=2)
    rewritten = apply_rules(spark, clusters.select("host", "url"), rules)
    m = compression_metric(rewritten)
    return m.select(
        "host", "n_urls", "n_rewritten",
        F.round("compression_ratio", 6).alias("compression_ratio"),
    )


# ---------------------------------------------------------------------------
# E. Training-data pipeline: documents
# ---------------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash: every doc tagged with its duplicate-group
    size and whether it is the canonical (min doc_id) representative."""
    d = _t(spark, sf_dir, "documents")
    g = d.withColumn("text_hash", F.md5("text"))
    w = Window.partitionBy("text_hash")
    return g.select(
        "doc_id",
        F.count("*").over(w).alias("dup_group_size"),
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("is_canonical"),
    )


SQL_DEDUP_EXACT = """
SELECT doc_id,
       count(*) OVER (PARTITION BY md5(text)) AS dup_group_size,
       doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS is_canonical
FROM documents
"""


def q_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting + length stats per source bucket."""
    d = _t(spark, sf_dir, "documents")
    toks = F.size(F.split(F.col("text"), " "))
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(toks).alias("total_tokens"),
        F.round(F.avg(toks), 6).alias("avg_tokens"),
        F.round(F.avg(F.length("text")), 6).alias("avg_chars"),
    )


SQL_DOC_TOKEN_STATS = """
SELECT source, count(*) AS n_docs,
       sum(len(string_split(text, ' '))) AS total_tokens,
       round(avg(len(string_split(text, ' '))), 6) AS avg_tokens,
       round(avg(length(text)), 6) AS avg_chars
FROM documents GROUP BY source
"""


def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quality scoring: token count, stopword ratio, mean token
    length, blended score — the length/stopword heuristics of a training-data
    quality gate."""
    d = _t(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_tok = F.size(words)
    stop = F.size(F.filter(words, lambda w: w.isin("the", "a", "of", "and", "to")))
    stop_ratio = stop / n_tok
    mean_len = (F.length("text") - (n_tok - 1)) / n_tok
    score = (
        0.3 * F.least(F.lit(1.0), n_tok / F.lit(100.0))
        + 0.4 * (1 - stop_ratio)
        + 0.3 * F.least(F.lit(1.0), mean_len / F.lit(6.0))
    )
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


SQL_DOC_QUALITY = """
WITH w AS (
  SELECT doc_id, text, string_split(text, ' ') AS words,
         len(string_split(text, ' ')) AS n_tok
  FROM documents
), s AS (
  SELECT doc_id, text, n_tok,
         len(list_filter(words, x -> x IN ('the','a','of','and','to'))) AS stop
  FROM w
)
SELECT doc_id, n_tok AS n_tokens,
       round(stop * 1.0 / n_tok, 6) AS stopword_ratio,
       round(0.3 * least(1.0, n_tok / 100.0)
             + 0.4 * (1 - stop * 1.0 / n_tok)
             + 0.3 * least(1.0, ((length(text) - (n_tok - 1)) * 1.0 / n_tok) / 6.0),
             6) AS quality_score
FROM s
"""


# ---------------------------------------------------------------------------
# F. Events rollup
# ---------------------------------------------------------------------------

def q_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    hour = F.date_format(F.col("ts"), "yyyy-MM-dd HH")
    return e.groupBy(F.col("event_type"), hour.alias("hour")).agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


SQL_EVENTS_ROLLUP = """
SELECT event_type, strftime(ts, '%Y-%m-%d %H') AS hour, count(*) AS n,
       round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "url_normalize": q_url_normalize,
    "frontier_schedule": q_frontier_schedule,
    "url_seen_antijoin": q_url_seen_antijoin,
    "politeness_budget": q_politeness_budget,
    "robots_filter": q_robots_filter,
    "host_counts": q_host_counts,
    "url_sample_cap": q_url_sample_cap,
    "train_test_split": q_train_test_split,
    "kv_entropy": q_kv_entropy,
    "kv_mosted_keys": q_kv_mosted_keys,
    "kv_majority_value": q_kv_majority_value,
    "kv_common_keys": q_kv_common_keys,
    "kv_distinct_values": q_kv_distinct_values,
    "pattern_match_classify": q_pattern_match_classify,
    "pattern_tree_nodes": q_pattern_tree_nodes,
    "leaf_alternations": q_leaf_alternations,
    "rewrite_rules_learn": q_rewrite_rules_learn,
    "rewrite_compression": q_rewrite_compression,
    "dedup_exact": q_dedup_exact,
    "doc_token_stats": q_doc_token_stats,
    "doc_quality": q_doc_quality,
    "events_rollup": q_events_rollup,
}

ORACLES: dict[str, str] = {
    "url_normalize": SQL_URL_NORMALIZE,
    "frontier_schedule": SQL_FRONTIER_SCHEDULE,
    "url_seen_antijoin": SQL_URL_SEEN_ANTIJOIN,
    "politeness_budget": SQL_POLITENESS_BUDGET,
    "robots_filter": SQL_ROBOTS_FILTER,
    "host_counts": SQL_HOST_COUNTS,
    "url_sample_cap": SQL_URL_SAMPLE_CAP,
    "train_test_split": SQL_TRAIN_TEST_SPLIT,
    "kv_entropy": SQL_KV_ENTROPY,
    "kv_mosted_keys": SQL_KV_MOSTED_KEYS,
    "kv_majority_value": SQL_KV_MAJORITY_VALUE,
    "kv_common_keys": SQL_KV_COMMON_KEYS,
    "kv_distinct_values": SQL_KV_DISTINCT_VALUES,
    "pattern_match_classify": SQL_PATTERN_MATCH_CLASSIFY,
    "dedup_exact": SQL_DEDUP_EXACT,
    "doc_token_stats": SQL_DOC_TOKEN_STATS,
    "doc_quality": SQL_DOC_QUALITY,
    "events_rollup": SQL_EVENTS_ROLLUP,
    # pattern_tree_nodes / leaf_alternations / rewrite_* : UDF recursion,
    # no SQL equivalent — rows-only check; python-oracle parity in tests/.
}
