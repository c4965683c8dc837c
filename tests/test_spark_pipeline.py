"""Spark integration tests: the distributed pattern-tree / classify / rewrite
pipelines must agree with the (golden-tested) pure kernel per host."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from url_pattern_algorithm_spark.functions.udfs import with_url_columns
from url_pattern_algorithm_spark.kernel.rules import Cluster
from url_pattern_algorithm_spark.kernel.tree import (
    TreeBuilder,
    Url,
    leaf_alternation,
)
from url_pattern_algorithm_spark.operators.classify import (
    classify_regex,
    classify_structural,
    support_ratio,
)
from url_pattern_algorithm_spark.operators.pattern_tree import (
    build_membership,
    build_trees,
    leaf_alternations,
    match_rate,
)
from url_pattern_algorithm_spark.operators.rewrite import (
    apply_rules,
    compression_metric,
    learn_rules,
)
from url_pattern_algorithm_spark.operators.sampling import (
    cap_per_host,
    gate_min_host_size,
    train_test_split,
)

CATS = ["news", "sport", "tech"]


def fixture_urls():
    urls = []
    for h, host in enumerate(["a.example.com", "b.example.com"]):
        for c in CATS:
            for i in range(40 + 10 * h):
                urls.append((host, f"http://{host}/cat/{c}/{i}"))
        for i in range(35):
            urls.append((host, f"http://{host}/list/page{i}.html"))
    return urls


@pytest.fixture(scope="module")
def urls_df(spark):
    return spark.createDataFrame(fixture_urls(), "host string, url string")


def kernel_tree(host):
    rows = [u for h, u in fixture_urls() if h == host]
    # drop_duplicates order parity with the Spark path
    seen, uniq = set(), []
    for u in rows:
        if u not in seen:
            seen.add(u)
            uniq.append(u)
    b = TreeBuilder()
    b.build([Url.parse(u) for u in uniq])
    return b


def test_build_trees_matches_kernel(spark, urls_df):
    nodes = build_trees(urls_df).orderBy("host", "node_id").collect()
    for host in ("a.example.com", "b.example.com"):
        got = [
            (r["node_id"], r["parent_id"], r["pattern"], r["url_count"],
             r["is_leaf"])
            for r in nodes
            if r["host"] == host
        ]
        b = kernel_tree(host)
        want = [
            (n.id, n.parent.id if n.parent else None, n.pattern_str,
             len(n.urls), n.is_leaf)
            for n in b.nodes
        ]
        assert got == want


def test_leaf_alternations_match_kernel(spark, urls_df):
    nodes = build_trees(urls_df)
    alts = {r["host"]: r["patterns"] for r in leaf_alternations(nodes).collect()}
    for host in alts:
        assert alts[host] == leaf_alternation(kernel_tree(host).root)


def test_match_rate_high(spark, urls_df):
    nodes = build_trees(urls_df)
    alts = leaf_alternations(nodes)
    canon = with_url_columns(urls_df)
    rates = {r["host"]: r["match_rate"] for r in match_rate(canon, alts).collect()}
    assert set(rates) == {"a.example.com", "b.example.com"}
    # /cat/... urls match; /list/pageN.html urls do NOT: the full tokenizer
    # splits '.html' into a '/html'-rendered key but the canonical (light)
    # form keeps 'pageN.html' whole — a faithful reference quirk
    # (ProcessedUrl.java:100 vs ProcessedUrl1.java:83; SURVEY.md §2.6)
    assert rates["a.example.com"] == pytest.approx(120 / 155)
    assert rates["b.example.com"] == pytest.approx(150 / 185)


def test_classifiers(spark):
    # host whose leaves carry '*'-valued keys so the structural match
    # (raw-literal compare, TreeNode.java:562-596) can succeed: uneven cat
    # counts -> salient word children; trailing word+digit tokens stay '*'
    words = ["alpha", "bravo", "gamma", "delta", "epsil", "zeta", "eta", "theta"]
    rows = []
    for c, n in (("news", 60), ("sport", 50), ("tech", 40)):
        for i in range(n):
            rows.append(
                ("c.example.com", f"http://c.example.com/cat/{c}/{words[i % 8]}{i}")
            )
    urls_c = spark.createDataFrame(rows, "host string, url string")
    nodes = build_trees(urls_c)
    pages = spark.createDataFrame(
        [
            ("c.example.com", "http://c.example.com/cat/news/other99"),
            ("c.example.com", "http://c.example.com/totally/else?x=1&y=2&z=3"),
            ("zz.example.com", "http://zz.example.com/cat/news/alpha7"),
        ],
        "host string, url string",
    )
    got = {
        r["url"]: r["page_type"]
        for r in classify_structural(spark, pages, nodes).collect()
    }
    assert got["http://c.example.com/cat/news/other99"] == "THEME_PAGE"
    assert got["http://c.example.com/totally/else?x=1&y=2&z=3"] == "OTHER_PAGE"
    assert got["http://zz.example.com/cat/news/alpha7"] == "OTHER_PAGE"  # no tree
    # regex variant agrees
    got2 = {
        r["url"]: r["page_type"]
        for r in classify_regex(
            with_url_columns(pages), leaf_alternations(nodes)
        ).collect()
    }
    assert got2["http://c.example.com/cat/news/other99"] == "THEME_PAGE"
    assert got2["http://zz.example.com/cat/news/alpha7"] == "OTHER_PAGE"


def test_membership_and_support(spark, urls_df):
    nodes = build_trees(urls_df)
    membership = build_membership(urls_df)
    # every URL belongs to its host's root node (node_id 0)
    n_urls = urls_df.distinct().count()
    roots = membership.filter("node_id = 0").count()
    assert roots == n_urls
    sup = support_ratio(membership, nodes)
    # support in (0, 1]
    row = sup.agg(F.min("support"), F.max("support")).collect()[0]
    assert 0.0 < row[0] <= row[1] <= 1.0


def test_rewrite_pipeline(spark):
    # F5 fixture distributed over two hosts
    rows = []
    for host in ("h7.example.com", "h8.example.com"):
        for i in range(100):
            rows.append((host, 0, f"http://{host}/cat/{i}/view"))
        for i in range(120):
            rows.append((host, 0, f"http://{host}/view?c={i}"))
    clusters = spark.createDataFrame(rows, "host string, cluster_id int, url string")
    rules = learn_rules(clusters)
    assert rules.count() > 0
    urls = clusters.select("host", "url").distinct()
    rewritten = apply_rules(spark, urls, rules)
    comp = {
        r["host"]: r["compression_ratio"]
        for r in compression_metric(rewritten).collect()
    }
    for host, ratio in comp.items():
        assert ratio < 1.0, host
    # the intended replace-op rule (query form -> path form) is learned; at
    # apply time first-match order may route through a broader rule first
    # (the reference's HashMap-order first-match, CalculateUtil.java:665-679,
    # made deterministic here), so assert the rule exists and produces the
    # path form when applied directly
    from url_pattern_algorithm_spark.kernel.rules import apply_rule
    from url_pattern_algorithm_spark.kernel.tokenize import tokenize_full

    rule_list = [r["rule"] for r in rules.filter("host = 'h7.example.com'").collect()]
    replace_rules = [r for r in rule_list if r.startswith("path2:c/")]
    assert replace_rules
    got = apply_rule(
        replace_rules[0], tokenize_full("http://h7.example.com/view?c=42")
    )
    assert got == "http://h7.example.com/cat/42/view"
    # apply_rules is deterministic: rerun gives identical output
    again = apply_rules(spark, urls, rules)
    assert rewritten.orderBy("url").collect() == again.orderBy("url").collect()


def test_sampling_ops(spark, urls_df):
    capped1 = sorted(r["url"] for r in cap_per_host(urls_df, cap=50).collect())
    capped2 = sorted(r["url"] for r in cap_per_host(urls_df, cap=50).collect())
    assert capped1 == capped2  # deterministic, no rand()
    assert 0 < len(capped1) < urls_df.count()
    gated = gate_min_host_size(urls_df, 10**9)
    assert gated.count() == 0
    split = train_test_split(urls_df)
    frac = split.agg(F.avg(F.col("is_train").cast("double"))).collect()[0][0]
    assert 0.70 < frac < 0.80


def test_side_input_collect_guards(spark):
    # web-scale guard: the setup()-style side-input collects in
    # classify_structural / apply_rules are scoped to hosts present in the
    # batch and refuse to materialize past max_side_rows on the driver.
    from pyspark.sql import functions as F

    from url_pattern_algorithm_spark.operators.classify import classify_structural
    from url_pattern_algorithm_spark.operators.rewrite import apply_rules

    nodes = spark.createDataFrame(
        [("h1.com", 1, "path0:h1.com/", True), ("h2.com", 2, "path0:h2.com/", True),
         ("h3.com", 3, "path0:h3.com/", True)],
        "host string, node_id int, pattern string, is_leaf boolean",
    )
    pages = spark.createDataFrame(
        [("h1.com", "http://h1.com/a")], "host string, url string"
    )
    # host scoping: only h1's single leaf is collected -> bound of 1 passes
    out = classify_structural(spark, pages, nodes, max_side_rows=1)
    assert out.count() == 1
    import pytest as _pytest

    all_pages = spark.createDataFrame(
        [(f"h{i}.com", f"http://h{i}.com/a") for i in (1, 2, 3)],
        "host string, url string",
    )
    with _pytest.raises(ValueError, match="side input exceeds"):
        classify_structural(spark, all_pages, nodes, max_side_rows=1)

    rules = spark.createDataFrame(
        [("h1.com", 0, "path0:.*/", "path0:#x/"),
         ("h2.com", 0, "path0:.*/", "path0:#x/")],
        "host string, rule_id int, pattern string, rule string",
    )
    urls1 = pages
    assert apply_rules(spark, urls1, rules, max_side_rows=1).count() == 1
    # past the guard apply_rules no longer raises: it switches to the
    # host-cogrouped relational path — byte-identical to broadcast (r3)
    via_broadcast = sorted(
        map(tuple, apply_rules(spark, all_pages, rules).collect())
    )
    via_cogroup = sorted(
        map(tuple, apply_rules(spark, all_pages, rules,
                               max_side_rows=1).collect())
    )
    assert via_cogroup == via_broadcast
    assert len(via_cogroup) == 3


def test_robots_longest_match_precedence(spark):
    # standard robots.txt precedence: longest matching prefix wins; allow
    # wins prefix-length ties; no match = allowed
    from url_pattern_algorithm_spark.operators.frontier import robots_filter

    robots = spark.createDataFrame(
        [
            ("h.com", "/private", False),
            ("h.com", "/private/pub", True),   # allow carve-out
            ("h.com", "/x", False),
            ("h.com", "/x", True),             # tie -> allow wins
        ],
        "host string, prefix string, allow boolean",
    )
    cand = spark.createDataFrame(
        [
            ("h.com", "http://h.com/private/a"),      # blocked
            ("h.com", "http://h.com/private/pub/a"),  # carved out -> kept
            ("h.com", "http://h.com/x/1"),            # tie -> kept
            ("h.com", "http://h.com/open"),           # no rule -> kept
            ("other.com", "http://other.com/private/a"),  # no host rules
        ],
        "host string, url string",
    )
    got = {r.url for r in robots_filter(cand, robots, longest_match=True).collect()}
    assert got == {
        "http://h.com/private/pub/a",
        "http://h.com/x/1",
        "http://h.com/open",
        "http://other.com/private/a",
    }
    # default (parity) mode still drops anything under a disallow prefix
    got_plain = {r.url for r in robots_filter(cand, robots).collect()}
    assert got_plain == {"http://h.com/open", "http://other.com/private/a"}


def test_robots_longest_match_deterministic(spark):
    # r2 keyed the precedence window on monotonically_increasing_id, which
    # is not stable under task retry — the r3 rewrite has no row identity
    # at all. Pin: (a) identical output across repeated computations of the
    # same lineage under different partitionings; (b) duplicate candidate
    # rows survive independently (a window keyed on url would merge them).
    from pyspark.sql import functions as F

    from url_pattern_algorithm_spark.operators.frontier import robots_filter

    robots = spark.createDataFrame(
        [("h.com", "/a", False), ("h.com", "/a/b", True)],
        "host string, prefix string, allow boolean",
    )
    cand = spark.range(200).select(
        F.lit("h.com").alias("host"),
        F.concat(
            F.lit("http://h.com/a/b/"), (F.col("id") % 100).cast("string")
        ).alias("url"),  # each url appears exactly twice
    )
    out = robots_filter(cand, robots, longest_match=True)
    runs = [
        sorted(r.url for r in out.collect()),
        sorted(r.url for r in out.repartition(7).collect()),
        sorted(r.url for r in out.coalesce(1).collect()),
    ]
    assert runs[0] == runs[1] == runs[2]
    assert len(runs[0]) == 200  # duplicates preserved, all carved out
    # and the plan has no window: the decision is a scalar expression
    assert "Window" not in out._jdf.queryExecution().executedPlan().toString()


def test_build_trees_sort_urls_order_invariant(spark):
    # sort_urls=True pins the recursion's first-encounter order to the URL
    # sort, so the node table is a pure function of the URL SET: two
    # deliveries of the same set in different row orders (and different
    # partitionings) must produce identical node tables — including node
    # ids and sibling order, which ARE order-sensitive under file order.
    rows = fixture_urls()
    fwd = spark.createDataFrame(rows, "host string, url string")
    rev = spark.createDataFrame(rows[::-1], "host string, url string").repartition(7)
    cols = ["host", "node_id", "parent_id", "depth", "partition_key",
            "partition_value", "pattern", "url_count", "is_leaf"]
    a = sorted(map(tuple, build_trees(fwd, sort_urls=True).select(cols).collect()))
    b = sorted(map(tuple, build_trees(rev, sort_urls=True).select(cols).collect()))
    assert a == b and len(a) > 0


def test_robots_wildcard_patterns_longest_match(spark):
    # Google robots spec realism (r3 verdict missing #5): '*' spans any
    # character run (including '/'), trailing '$' anchors the end, other
    # regex metachars are LITERAL, longest raw pattern wins, allow breaks
    # length ties; a plain prefix behaves exactly like startswith.
    from url_pattern_algorithm_spark.operators.frontier import robots_filter

    cand = spark.createDataFrame(
        [("h", f"http://h{p}") for p in (
            "/docs/a.pdf",        # blocked: /*.pdf$ (len 7) beats /docs allow? see rules
            "/docs/a.pdfx",       # kept: $ anchor does not match
            "/private/x",         # blocked: plain prefix /priv
            "/a+b/c",             # blocked: literal '+' pattern
            "/aab/c",             # kept: '+' is not a regex quantifier here
            "/free/anything",     # kept: no rule matches
        )],
        "host string, url string",
    )
    robots = spark.createDataFrame(
        [
            ("h", "/*.pdf$", False),
            ("h", "/priv", False),
            ("h", "/a+b", False),
        ],
        "host string, prefix string, allow boolean",
    )
    got = sorted(r.url for r in robots_filter(cand, robots,
                                              longest_match=True).collect())
    assert got == sorted([
        "http://h/docs/a.pdfx", "http://h/aab/c", "http://h/free/anything",
    ])

    # longest-wins + allow tie-break: disallow /cat, allow /cat*/item1,
    # disallow /cat*/item1$ — survivors are item1-prefixed except item1
    cand2 = spark.createDataFrame(
        [("h", f"http://h/cat7/{i}") for i in
         ("item1", "item10", "item152", "item2", "item99")],
        "host string, url string",
    )
    robots2 = spark.createDataFrame(
        [("h", "/cat", False), ("h", "/cat*/item1", True),
         ("h", "/cat*/item1$", False)],
        "host string, prefix string, allow boolean",
    )
    got2 = sorted(r.url for r in robots_filter(cand2, robots2,
                                               longest_match=True).collect())
    assert got2 == ["http://h/cat7/item10", "http://h/cat7/item152"]


def test_schedule_top_k_salting_bounds(spark):
    # r4 verdict item 4 (PredictFssJob.java:155-185 pattern): under a hot
    # host holding ~50% of the frontier, phase 1 of the salted two-phase
    # top-k must (a) spread the hot host across ALL `salts` window
    # partitions and (b) bound phase-1 survivors at salts x budget per
    # host, so no single window task ever ranks the whole hot host.
    from url_pattern_algorithm_spark.operators.frontier import schedule_top_k

    salts, budget, n_hot, n_cold = 16, 50, 5000, 200
    rng = spark.range(n_hot + n_cold)
    frontier = rng.select(
        F.when(F.col("id") < n_hot, F.lit("hot.example.com"))
        .otherwise(F.lit("cold.example.com")).alias("host"),
        F.col("id").cast("double").alias("priority"),
        F.xxhash64("id").alias("url_hash"),
        F.lit(budget).alias("budget"),
    )
    # phase-1 replica: the same salt derivation the operator uses
    salted = frontier.withColumn(
        "salt", F.pmod(F.col("url_hash"), F.lit(salts)).cast("int")
    )
    per_salt = (
        salted.filter(F.col("host") == "hot.example.com")
        .groupBy("salt").count().collect()
    )
    assert len(per_salt) == salts  # hot host spreads over every salt
    # deterministic hash split: no salt partition holds a skewed share
    assert max(r["count"] for r in per_salt) < 3 * n_hot / salts

    sched = schedule_top_k(frontier, F.col("budget"), salts=salts)
    got = sched.groupBy("host").count().collect()
    counts = {r["host"]: r["count"] for r in got}
    assert counts["hot.example.com"] == budget
    assert counts["cold.example.com"] == budget
    # exact top-k: ranks are the TRUE per-host priority order
    top = (
        sched.filter(F.col("host") == "hot.example.com")
        .orderBy("sched_rank").select("priority").collect()
    )
    assert [r["priority"] for r in top] == [
        float(p) for p in range(n_hot - 1, n_hot - 1 - budget, -1)
    ]
    # the two-phase shape is planned as WindowGroupLimit (rank pushdown):
    # phase 1 never materializes a full per-host sort of the hot host
    plan = sched._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_sf_corpus_tree_projections_nonempty(spark):
    # pattern_tree_nodes / leaf_alternations left the driver registry in
    # the r5 sweep-window consolidation (their hard signal lives in
    # tree_invariants + the *_fixed closed-form oracles); keep the raw
    # sf-corpus projections exercised here so the code paths stay covered.
    from url_pattern_algorithm_spark.queries import (
        q_leaf_alternations,
        q_pattern_tree_nodes,
    )

    sf_dir = "/root/testdata/sf0.001"
    nodes = q_pattern_tree_nodes(spark, sf_dir)
    assert nodes.count() > 0
    alts = q_leaf_alternations(spark, sf_dir)
    rows = alts.collect()
    assert rows and all(r["patterns"] for r in rows)
