"""PySpark-native URL frontier + fetch scheduler.

A from-scratch rebuild of the algorithmic capabilities of the reference
URL-pattern-tree library (pattern-tree learning per host, URL-normalization
rule learning from duplicate clusters, URL-shape classification), re-expressed
Spark-first:

- ``kernel``    — pure pandas/python reference-parity algorithms (no Spark).
- ``functions`` — vectorized pandas/Arrow UDF wrappers around the kernel.
- ``sources``   — deterministic synthetic interleaved-docs generator,
                  checkpoint-table catalog, cluster-file scan.
- ``operators`` — DataFrame operators: frontier (seen-filter, politeness,
                  priority top-k), pattern-tree build, classification, rewrite,
                  sampling/skew, dedup, similarity, text analysis.
- ``plans``     — end-to-end pipelines mirroring the reference entry points.

All reference citations in docstrings point into /root/reference (file:line).
"""

__version__ = "0.1.0"
