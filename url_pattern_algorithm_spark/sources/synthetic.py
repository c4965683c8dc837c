"""Deterministic synthetic interleaved-docs table + seeds + robots (F1/F2).

Schema fixed by BASELINE.json.input_hint:
``doc_id:string, spans:array<struct<kind:string,text:string,media_ref:string,offset:int>>``

Everything derives from a splittable counter-based PRNG (no global RNG
state), so generation is:
- deterministic: doc i is the same bytes on every run, any partitioning;
- distributed: ``spark.range(n) -> mapInPandas`` — each task generates its
  own slice; nothing is collected on the driver (scales to 10^10 rows);
- skewed on purpose: host 0 is 'hot' with ~50x the average doc share to
  exercise salting (FIXTURES.md F1, cf. PredictFssJob.java:155-185).

The embedded link grammar exercises every normalization/tree branch: salient
path categories, numeric ids, letters+digits pages, '/?'-style queries,
duplicate forms (path form vs query form of the same page), session ids,
scheme/host case noise, and robots-disallowed paths.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField(
            "spans",
            ArrayType(
                StructType(
                    [
                        StructField("kind", StringType()),
                        StructField("text", StringType()),
                        StructField("media_ref", StringType()),
                        StructField("offset", IntegerType()),
                    ]
                )
            ),
        ),
    ]
)

_CATS = ["news", "sport", "tech", "life", "auto", "book", "food", "game"]
_WORDS = [
    "alpha", "bravo", "delta", "echo", "fox", "golf", "hotel", "india",
    "kilo", "lima", "mike", "oscar", "papa", "romeo", "tango", "zulu",
]


def _mix(*parts: int) -> int:
    """splitmix64-style counter hash — the splittable PRNG core."""
    x = 0
    for p in parts:
        x = (x ^ (p + 0x9E3779B97F4A7C15)) * 0xBF58476D1CE4E5B9 % (1 << 64)
        x ^= x >> 31
    return x


def host_of(i: int, n_hosts: int, hot_factor: int = 50) -> str:
    """Doc -> host assignment with host 0 hot (hot_factor x average share)."""
    j = _mix(7, i) % (hot_factor + n_hosts - 1)
    h = 0 if j < hot_factor else j - hot_factor + 1
    return f"site{h}.example.com"


def _link(i: int, k: int, host: str) -> str:
    """Deterministic candidate URL #k for doc i on `host`."""
    r = _mix(11, i, k)
    form = r % 10
    ident = (r >> 8) % 500
    cat = _CATS[(r >> 16) % len(_CATS)]
    word = _WORDS[(r >> 24) % len(_WORDS)]
    page = (r >> 32) % 40
    if form <= 3:  # path form: /cat/{cat}/{id}
        return f"http://{host}/cat/{cat}/{ident}"
    if form <= 5:  # query form of the SAME page (duplicate-cluster signal)
        return f"http://{host}/view?c={ident}&cat={cat}"
    if form == 6:  # letters+digits page
        return f"http://{host}/list/page{page}.html"
    if form == 7:  # '/?' style
        return f"http://{host}/?p={ident}&sort={page}"
    if form == 8:  # normalization noise: case + session id + dot-segment
        return (
            f"HTTP://{host.upper()}/a/../cat/{cat}/{ident}"
            f";jsessionid=S{r % 997}?PHPSESSID=k{page}"
        )
    # robots-disallowed area
    return f"http://{host}/private/{word}/{ident}"


def gen_doc(i: int, n_hosts: int) -> tuple[str, list[dict]]:
    """Pure kernel: deterministic document #i (doc_id, spans)."""
    host = host_of(i, n_hosts)
    r = _mix(3, i)
    n_spans = 3 + r % 6
    spans: list[dict] = []
    offset = 0
    n_links = 0
    for s in range(n_spans):
        rs = _mix(5, i, s)
        kind_roll = rs % 10
        if kind_roll < 4:
            txt = " ".join(
                _WORDS[(rs >> (4 * w)) % len(_WORDS)] for w in range(1, 5)
            )
            if kind_roll == 0:  # text span with an embedded absolute URL
                txt += " see " + _link(i, 100 + s, host)
                n_links += 1
            spans.append(
                {"kind": "text", "text": txt, "media_ref": None, "offset": offset}
            )
        elif kind_roll < 8:
            spans.append(
                {
                    "kind": "link",
                    "text": _link(i, s, host),
                    "media_ref": None,
                    "offset": offset,
                }
            )
            n_links += 1
        elif kind_roll == 8:
            spans.append(
                {
                    "kind": "image",
                    "text": None,
                    "media_ref": f"http://{host}/img/{rs % 10_000}.jpg",
                    "offset": offset,
                }
            )
        else:
            spans.append(
                {
                    "kind": "video",
                    "text": None,
                    "media_ref": f"media://blob/{rs % 100_000}",  # non-http: ignored
                    "offset": offset,
                }
            )
        offset += 1 + (rs >> 8) % 900
    if n_links == 0:  # every doc links somewhere: keep the frontier fed
        spans.append(
            {"kind": "link", "text": _link(i, 0, host), "media_ref": None,
             "offset": offset}
        )
    return f"doc{i:010d}", spans


def docs_pdf(n_docs: int, n_hosts: int = 8, start: int = 0) -> pd.DataFrame:
    """Driver-side (oracle/test) generation of docs [start, start+n_docs)."""
    rows = [gen_doc(i, n_hosts) for i in range(start, start + n_docs)]
    return pd.DataFrame({"doc_id": [r[0] for r in rows], "spans": [r[1] for r in rows]})


def docs_df(spark: SparkSession, n_docs: int, n_hosts: int = 8,
            partitions: int | None = None) -> DataFrame:
    """Distributed generation: spark.range -> mapInPandas (no driver data)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].tolist()
            rows = [gen_doc(int(i), n_hosts) for i in ids]
            yield pd.DataFrame(
                {"doc_id": [r[0] for r in rows], "spans": [r[1] for r in rows]}
            )

    rng = spark.range(n_docs, numPartitions=partitions)
    return rng.mapInPandas(gen, DOCS_SCHEMA)


def seeds_df(spark: SparkSession, n_hosts: int = 8) -> DataFrame:
    """Seed list (F2): root + one category page per host, priority by host
    index (hot host first) — deterministic."""
    rows = []
    for h in range(n_hosts):
        host = f"site{h}.example.com"
        rows.append((f"http://{host}/", 1.0 - h * 0.01))
        rows.append((f"http://{host}/cat/news/1", 0.5 - h * 0.01))
    return spark.createDataFrame(rows, "url string, priority double")


def robots_df(spark: SparkSession, n_hosts: int = 8,
              with_delays: bool = False,
              with_allow: bool = False) -> DataFrame:
    """Synthetic robots rules (F2): '/private' disallowed everywhere; hot
    host additionally disallows '/list'. ``with_delays=True`` adds the
    per-host Crawl-delay directive column (1.0 + h % 3 — non-uniform, so
    politeness budgets diverge across hosts). ``with_allow=True`` adds an
    Allow '/private/alpha' row per host — a longer, more specific rule
    that re-admits one '/private' subtree under longest-match precedence
    but is IGNORED by the any-disallow parity mode, so the two
    ``robots_mode``s provably diverge on the same corpus."""
    rows = robots_rules(n_hosts, with_delays, with_allow)
    schema = "host string, prefix string, allow boolean"
    if with_delays:
        schema += ", crawl_delay double"
    return spark.createDataFrame(rows, schema)


def robots_rules(n_hosts: int = 8, with_delays: bool = False,
                 with_allow: bool = False) -> list[tuple]:
    """Driver-side copy of the same rules (for the oracle / broadcast)."""
    rows: list[tuple] = []
    for h in range(n_hosts):
        host = f"site{h}.example.com"
        delay = (1.0 + h % 3,) if with_delays else ()
        rows.append((host, "/private", False) + delay)
        if h == 0:
            rows.append((host, "/list", False) + delay)
        if with_allow:
            rows.append((host, "/private/alpha", True) + delay)
    return rows
