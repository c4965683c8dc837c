"""Explain-plan audit: dump `.explain('formatted')` for the headline queries.

Writes BENCH/plans/<query>.txt so plan properties are reviewable offline:
parquet PushedFilters / ReadSchema (pruned columns), WholeStageCodegen
spans, broadcast-join selection, WindowGroupLimit on the top-k windows,
Arrow-eval (pandas UDF) placement.

Usage: python tools/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "url_normalize", "frontier_schedule", "url_seen_antijoin",
    "kv_entropy", "theme_page_classify", "garbage_page_report",
    "rewrite_apply_fixed", "rewrite_compression",
    "dedup_minhash", "ann_multiprobe", "ann_ivf", "dedup_embedding_cosine",
    "doc_quality",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or DEFAULT_QUERIES
    from url_pattern_algorithm_spark.queries import QUERIES
    from url_pattern_algorithm_spark.session import get_spark

    spark = get_spark("explain", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "plans")
    os.makedirs(out_dir, exist_ok=True)
    import re

    for name in names:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        text = buf.getvalue()
        # with AQE on, codegen ids and runtime re-planning only exist in the
        # FINAL adaptive plan — execute this exact DataFrame, then read its
        # finalized physical plan off the same QueryExecution
        df.collect()
        final = df._jdf.queryExecution().executedPlan().toString()
        text += "\n== Final Adaptive Plan (after execution) ==\n" + final
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(text)
        marks = {
            # final plan marks codegen stages '*(n)'; formatted pre-exec
            # mode uses '[codegen id : N]'
            "codegen": len(set(re.findall(r"\*\(\d+\)", final)))
            or text.count("[codegen id :"),
            "pushed": "PushedFilters: [" in text
                      and "PushedFilters: []" not in text,
            "broadcast": "BroadcastHashJoin" in text,
            "windowlimit": "WindowGroupLimit" in text,
            "arrow": "ArrowEvalPython" in text or "FlatMapGroupsInPandas"
                     in text or "MapInPandas" in text,
        }
        print(f"{name}: {marks}")
    spark.stop()


if __name__ == "__main__":
    main()
