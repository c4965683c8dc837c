"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
against the same sf directory, then compares row count, column names, and an
order-insensitive value multiset (columns sorted by name, rows sorted).

Usage: python tools/check_oracles.py [sf_dir] [query ...]

Env: SPARK_GRAFT_ORACLE_JSON=<path> additionally writes the per-query result
map (the CORRECTNESS_r{N}.json shape) to <path>.

Sweep-completeness contract (r4 verdict item 1): the registry asserts <= 50
oracle-bearing entries so the driver's sweep window covers all of it, and
``tools/verify_sweep.py CORRECTNESS_rNN.json`` checks a DRIVER-recorded
sweep against the registry (a silent drop like r4's 50-of-52 then fails
loudly — this tool itself iterates the registry, so checking itself would
be tautological).
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, ".")

from __spark_entry__ import oracle_sql, queries  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        return round(v, 9)
    return v


def df_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    from url_pattern_algorithm_spark.session import get_spark

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    qs, oracles = queries(), oracle_sql()
    n_fail = 0
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None, "err": None}
        results[name] = rec
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = [c.lower() for c in sdf.columns]
            srows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(srows)
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            rec["err"] = f"spark: {e}"
            n_fail += 1
            continue
        if name not in oracles:
            rec["err"] = "no_oracle"
            print(f"ok   {name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s)")
            if not srows:
                print(f"WARN {name}: empty result")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = [c.lower() for c in rel.columns]
            orows = rel.fetchall()
            rec["oracle_rows"] = len(orows)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            rec["err"] = f"oracle: {e}"
            n_fail += 1
            continue
        problems = []
        rec["schema_match"] = sorted(scols) == sorted(ocols)
        if not rec["schema_match"]:
            problems.append(f"columns {scols} vs {ocols}")
        rec["rows_match"] = len(srows) == len(orows)
        if not rec["rows_match"]:
            problems.append(f"rowcount {len(srows)} vs {len(orows)}")
        if not problems:
            sm = df_multiset(scols, srows)
            om = df_multiset(ocols, orows)
            rec["hash_match"] = sm == om
            if sm != om:
                diff = [(a, b) for a, b in zip(sm, om) if a != b][:3]
                problems.append(f"values differ, first diffs: {diff}")
        else:
            rec["hash_match"] = False
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"ok   {name}: {len(srows)} rows match "
                  f"({time.time()-t0:.1f}s)")
    # NB: sweep-completeness of THIS tool is trivially true (it iterates
    # the registry); the check that matters is the DRIVER's sweep vs the
    # registry — run `python tools/verify_sweep.py CORRECTNESS_rNN.json`
    # against the driver's recorded results for that.
    out_path = os.environ.get("SPARK_GRAFT_ORACLE_JSON")
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {out_path} ({len(results)} queries)")
    print("ALL OK" if n_fail == 0 else f"{n_fail} FAILURES")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
