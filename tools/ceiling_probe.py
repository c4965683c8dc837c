"""Machine-ceiling calibration for 8-vs-32-worker comparisons.

Drives the pure-python normalization kernel over synthetic URLs with a
plain ``multiprocessing.Pool`` — no Spark, no Arrow, no shuffle: the most
scalable execution this box can host. The 8->32-proc speedup it reports is
the achievable cycle ratio for ANY local[8] vs local[32] comparison here
(host overcommit + frequency scaling cap it well under the naive 4x), and
it MOVES with co-tenant load — recalibrate in the same session as any
scaling probe you intend to grade against it.

Usage: python tools/ceiling_probe.py [n_urls] -> BENCH/hw_ceiling.json
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _urls(n: int) -> list[str]:
    return [
        f"HTTP://www.Host{i % 997}.com:80/a/./b{i % 31}/../c"
        f"?z={i}&a=1&jsessionid=s{i}"
        for i in range(n)
    ]


def _work(chunk: list[str]) -> int:
    from url_pattern_algorithm_spark.kernel.rfc3986 import (
        normalize_frontier_url,
    )

    s = 0
    for u in chunk:
        r = normalize_frontier_url(u)
        s += len(r) if r else 0
    return s


def run(procs: int, urls: list[str], chunks: int = 256) -> float:
    size = (len(urls) + chunks - 1) // chunks
    parts = [urls[i:i + size] for i in range(0, len(urls), size)]
    with mp.Pool(procs) as pool:
        t0 = time.time()
        pool.map(_work, parts)
        return len(urls) / (time.time() - t0)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    out_name = sys.argv[4] if len(sys.argv) > 4 else "hw_ceiling.json"
    urls = _urls(n)
    out = {}
    # interleave to keep both legs under the same co-tenant load
    best = {lo: 0.0, hi: 0.0}
    for _ in range(2):
        for procs in (lo, hi):
            best[procs] = max(best[procs], run(procs, urls))
    out = {str(k): int(v) for k, v in best.items()}
    out[f"speedup_{lo}_to_{hi}"] = round(best[hi] / best[lo], 3)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", out_name)
    with open(path, "w") as f:
        json.dump(out, f)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
