"""Pure-python/pandas kernel: reference-parity URL algorithms, no Spark imports.

Everything here is unit-testable without a SparkSession and doubles as the
single-process oracle for the distributed pipelines.
"""

from url_pattern_algorithm_spark.kernel.tokenize import (  # noqa: F401
    get_host,
    tokenize_full,
    tokenize_light,
)
from url_pattern_algorithm_spark.kernel.canonical import (  # noqa: F401
    canonical_url,
    is_path_key,
    sort_keys,
)
from url_pattern_algorithm_spark.kernel.rfc3986 import (  # noqa: F401
    rfc3986_normalize,
    strip_session_ids,
)
