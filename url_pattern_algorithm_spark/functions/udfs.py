"""Scalar pandas UDFs for URL normalization and tokenization.

Each UDF is an Arrow-batched wrapper over the pure kernel (SURVEY.md §2.13).
The string kernels are per-string Python loops *inside* a batch — acceptable
at the Spark boundary (one Arrow transfer per ~10k rows, no per-row pickling);
they are the irreducible custom logic the reference defines character-by-
character (ProcessedUrl.java:85-190), not something `pyspark.sql.functions`
can express.

The 64-bit frontier seen-key is NOT a UDF: use the built-in
``F.xxhash64(canonical)`` so hashing stays in whole-stage codegen.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

from url_pattern_algorithm_spark.kernel.canonical import canonical_url
from url_pattern_algorithm_spark.kernel.rfc3986 import (
    normalize_frontier_url,
    rfc3986_normalize,
    strip_session_ids,
)
from url_pattern_algorithm_spark.kernel.tokenize import (
    get_host,
    tokenize_full,
    tokenize_light,
)

KV_SCHEMA = ArrayType(
    StructType(
        [StructField("key", StringType()), StructField("value", StringType())]
    )
)


@pandas_udf(KV_SCHEMA)
def tokenize_full_udf(urls: pd.Series) -> pd.Series:
    """Full tokenizer (ProcessedUrl.java:85-190) -> array<struct<key,value>>.
    Unparsable URLs yield null."""
    return urls.map(
        lambda u: None
        if u is None or (p := tokenize_full(u)) is None
        else [{"key": k, "value": v} for k, v in p]
    )


@pandas_udf(KV_SCHEMA)
def tokenize_light_udf(urls: pd.Series) -> pd.Series:
    """Light tokenizer (ProcessedUrl1.java:80-120)."""
    return urls.map(
        lambda u: None
        if u is None
        else [{"key": k, "value": v} for k, v in tokenize_light(u)]
    )


@pandas_udf(StringType())
def canonical_url_udf(urls: pd.Series) -> pd.Series:
    """Reference canonical sorted form (CalculateUtil.java:411-430)."""
    return urls.map(lambda u: None if u is None else canonical_url(u))


@pandas_udf(StringType())
def rfc3986_udf(urls: pd.Series) -> pd.Series:
    """RFC-3986 syntax normalization (rebuild layer)."""
    return urls.map(lambda u: None if u is None else rfc3986_normalize(u))


@pandas_udf(StringType())
def strip_session_udf(urls: pd.Series) -> pd.Series:
    """Session-id stripping (rebuild layer)."""
    return urls.map(lambda u: None if u is None else strip_session_ids(u))


@pandas_udf(StringType())
def normalize_url_udf(urls: pd.Series) -> pd.Series:
    """The full frontier normalization chain in ONE Arrow pass:
    strip_session_ids -> rfc3986_normalize -> canonical_url.
    One UDF instead of three keeps two JVM<->Python round-trips off the hot
    path (SURVEY.md §1.3). Scheme-less/unparsable URLs yield null (the
    reference skips URLs whose host parse fails, ProcessedUrl.java:90-96;
    the crawl oracle does the same)."""
    return urls.map(
        lambda u: None if u is None else normalize_frontier_url(u)
    )


@pandas_udf(StringType())
def host_udf(urls: pd.Series) -> pd.Series:
    """Host per java.net.URL semantics (GarbagePageUrlPatternJob.java:179).
    Prefer the built-in ``F.parse_url(url, 'HOST')`` where its semantics
    suffice; this UDF exists for byte-parity with the reference host parse."""
    return urls.map(lambda u: None if u is None else get_host(u))


def with_url_columns(df, url_col: str = "url"):
    """Standard frontier projection: url -> (url_canon, url_hash, host).

    url_hash = built-in xxhash64 over the canonical form (stays JVM-side,
    whole-stage codegen). host via built-in parse_url + lower — JVM-side; the
    UDF host parse is reserved for parity tests.
    """
    # try_parse_url: ANSI-mode parse_url THROWS on malformed input — at
    # web scale garbage candidate URLs are a certainty, so the null-safe
    # variant is mandatory on this path
    parse_host = getattr(F, "try_parse_url", F.parse_url)
    return (
        df.withColumn("url_canon", normalize_url_udf(F.col(url_col)))
        .withColumn("url_hash", F.xxhash64("url_canon"))
        .withColumn("host", F.lower(parse_host(F.col(url_col), F.lit("HOST"))))
    )
