"""Vectorized pandas/Arrow UDFs wrapping the pure kernels (input_hint: no
per-row Python at the Spark boundary — every kernel crosses as Arrow batches)."""

from url_pattern_algorithm_spark.functions.udfs import (  # noqa: F401
    KV_SCHEMA,
    canonical_url_udf,
    host_udf,
    normalize_url_udf,
    rfc3986_udf,
    strip_session_udf,
    tokenize_full_udf,
    tokenize_light_udf,
)
from url_pattern_algorithm_spark.functions.links import extract_links_udf  # noqa: F401
