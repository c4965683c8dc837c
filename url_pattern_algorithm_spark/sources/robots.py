"""robots.txt source: per-host bodies -> the structured robots table.

Input shape is the scale-correct one: a DataFrame ``(host, robots_txt)``
with ONE row per host (10^8 rows at north_rule scale — far too big for
driver-side parsing, so the kernel runs inside ``mapInPandas``, one Arrow
batch at a time, nothing collected). Output rows ``(host, prefix, allow,
crawl_delay)`` plug directly into ``operators/frontier.robots_filter``
(both modes, wildcards included) and ``host_crawl_delays``.

A host whose body sets only a Crawl-delay (no rules) emits one empty-
prefix ALLOW row to carry the delay: a zero-length allow is a no-op in
both filter modes (lowest possible longest-match precedence; allow rows
are ignored by the prefix mode), and host_crawl_delays reads the delay
off any row.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from url_pattern_algorithm_spark.kernel.robots import parse_robots_txt

ROBOTS_SCHEMA = "host string, prefix string, allow boolean, crawl_delay double"


def robots_rules_from_bodies(bodies: DataFrame, agent: str = "*",
                             body_col: str = "robots_txt") -> DataFrame:
    """(host, robots_txt) -> (host, prefix, allow, crawl_delay) rule rows."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hosts: list[str] = []
            prefixes: list[str] = []
            allows: list[bool] = []
            delays: list[float | None] = []
            for host, body in zip(pdf["host"], pdf[body_col]):
                rules, delay = parse_robots_txt(body, agent)
                if not rules and delay is not None:
                    rules = [("", True)]  # delay carrier; no-op rule
                for prefix, allow in rules:
                    hosts.append(host)
                    prefixes.append(prefix)
                    allows.append(allow)
                    delays.append(delay)
            # nullable Float64: missing delays must be GENUINE nulls in the
            # Arrow batch, not NaN-coerced floats — Spark orders NaN above
            # all doubles, so a NaN surviving into host_crawl_delays' MAX
            # would defeat the coalesce-default (r4 ADVICE)
            yield pd.DataFrame({
                "host": hosts, "prefix": prefixes, "allow": allows,
                "crawl_delay": pd.array(delays, dtype="Float64"),
            })

    return bodies.mapInPandas(parse, ROBOTS_SCHEMA)
