"""File-format sources/sinks (§2.1) + remaining aggregate operators."""

import os

import pytest
from pyspark.sql import functions as F

from url_pattern_algorithm_spark.operators.aggregates import (
    most_frequent_key,
    pattern_sanity,
)
from url_pattern_algorithm_spark.sources.files import (
    read_cluster_file,
    read_properties,
    read_rules_file,
    read_url_file,
    read_url_pairs_file,
    write_patterns_file,
    write_rules_file,
)


def test_read_url_file(spark, tmp_path):
    p = tmp_path / "urls.txt"
    p.write_text("http://a.com/x/1\nnot-a-url\nhttp://b.com/y?k=v\n")
    out = read_url_file(spark, str(p)).collect()
    assert len(out) == 2  # unparsable line dropped
    by_url = {r.url: r.kvs for r in out}
    assert by_url["http://a.com/x/1"][0].asDict() == {"key": "path0", "value": "a.com"}


def test_read_url_pairs_file(spark, tmp_path):
    p = tmp_path / "pairs.txt"
    p.write_text(
        "/first/url\npath0 a.com\npath1 first\n/second/url\npath0 b.com\n"
    )
    out = {r.url: [kv.asDict() for kv in r.kvs]
           for r in read_url_pairs_file(spark, str(p)).collect()}
    assert out["/first/url"] == [
        {"key": "path0", "value": "a.com"}, {"key": "path1", "value": "first"}
    ]
    assert out["/second/url"] == [{"key": "path0", "value": "b.com"}]


def test_read_cluster_file(spark, tmp_path):
    p = tmp_path / "clusters.txt"
    p.write_text("#\nhttp://a.com/1\nhttp://a.com/2\n#\nhttp://b.com/1\n")
    out = read_cluster_file(spark, str(p)).collect()
    ids = {(r.host, r.cluster_id) for r in out}
    assert ids == {("a.com", 1), ("b.com", 2)}


def test_rules_file_roundtrip(spark, tmp_path):
    rules = spark.createDataFrame(
        [("h", 0, "p0:a/p1:b/", "p0:#a/p1:*b/"), ("h", 1, "x/", "y/")],
        "host string, rule_id int, pattern string, rule string",
    )
    path = str(tmp_path / "rules")
    write_rules_file(rules, path)
    back = read_rules_file(spark, path).orderBy("rule_id").collect()
    assert [(r.rule_id, r.pattern, r.rule) for r in back] == [
        (0, "p0:a/p1:b/", "p0:#a/p1:*b/"), (1, "x/", "y/")
    ]


def test_write_patterns_file(spark, tmp_path):
    alts = spark.createDataFrame(
        [("h1", "a|b"), ("h2", "c")], "host string, patterns string"
    )
    path = str(tmp_path / "pats")
    write_patterns_file(alts, path)
    files = [f for f in os.listdir(path) if f.startswith("part-")]
    text = open(os.path.join(path, files[0])).read()
    assert text == "h1\ta|b\nh2\tc\n"


def test_read_properties(tmp_path):
    p = tmp_path / "job.properties"
    p.write_text("# comment\nminTreeSize=30\nhost.cap : 500000\n\n")
    assert read_properties(str(p)) == {
        "minTreeSize": "30", "host.cap": "500000"
    }


@pytest.fixture(scope="module")
def kv_df(spark):
    # host h: 3 urls; key 'a' on all (once each), key 'b' twice in one url,
    # key 'c' on one url
    rows = [
        ("h", "u1", "a", "1"), ("h", "u2", "a", "2"), ("h", "u3", "a", "3"),
        ("h", "u1", "b", "x"), ("h", "u1", "b", "y"),
        ("h", "u2", "c", "z"),
    ]
    return spark.createDataFrame(rows, "host string, url string, key string, value string")


def test_most_frequent_key(spark, kv_df):
    out = most_frequent_key(kv_df, min_ratio=0.99).collect()
    assert [(r.host, r.key) for r in out] == [("h", "a")]  # 3/3 = 1.0 > 0.99
    # pair-occurrence multiplicity: 'b' has 2 occurrences over 3 urls
    out2 = most_frequent_key(kv_df, exclude=["a"], min_ratio=0.5).collect()
    assert [(r.host, r.key) for r in out2] == [("h", "b")]  # 0.667 > 0.5
    out3 = most_frequent_key(kv_df, exclude=["a"], min_ratio=0.7).collect()
    assert out3 == []  # 0.667 < 0.7
    out4 = most_frequent_key(kv_df, exclude=["a"], min_ratio=0.7, abs_min=1).collect()
    assert [(r.host, r.key) for r in out4] == [("h", "b")]  # abs override


def test_pattern_sanity_predicate(spark):
    rows = [
        ("short", "a.com"),                      # len<=5 -> reject
        ("a.com/*", "a.com"),                    # <= host+6 -> reject
        ("http://a.com/cat/#p$12#/x", "a.com"),  # single alt, long part -> ok
        ("http://a.com/#a#b#c#", "a.com"),       # single alt, short parts -> reject
        ("http://a.com/#a#|http://a.com/#b#", "a.com"),  # multi-alt -> ok
    ]
    df = spark.createDataFrame(rows, "pattern string, host string")
    got = [
        r.ok
        for r in df.select(
            pattern_sanity(F.col("pattern"), F.col("host")).alias("ok")
        ).collect()
    ]
    assert got == [False, False, True, False, True]


def test_cluster_scan_distributed_equals_single_bucket(spark):
    # r3 verdict item 5: the cluster scan's running cluster-id must NOT be
    # a single-task global window. Byte-equality across bucket sizes on a
    # multi-partition input, and no single-partition exchange in the plan.
    from url_pattern_algorithm_spark.operators.rewrite import (
        cluster_rows_from_text,
    )

    rows = []
    n = 0
    for c in range(37):
        rows.append((n, "#")); n += 1
        for u in range((c % 5) + 1):
            rows.append((n, f"http://host{c % 7}.com/c{c}/u{u}")); n += 1
    lines = spark.createDataFrame(rows, "line_no long, line string").repartition(8)

    big = cluster_rows_from_text(spark, lines)  # one bucket (default size)
    small = cluster_rows_from_text(spark, lines, rows_per_bucket=16)
    key = lambda r: (r["cluster_id"], r["url"])
    got_big = sorted(map(tuple, big.select("host", "cluster_id", "url").collect()))
    got_small = sorted(map(tuple, small.select("host", "cluster_id", "url").collect()))
    assert got_big == got_small and len(got_big) == n - 37

    plan = small._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
