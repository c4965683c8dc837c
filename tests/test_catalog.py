"""Iceberg-semantics conformance for the Catalog stand-in.

The sandbox has no Iceberg runtime jar, so Catalog writes parquet
directories while promising Iceberg-shaped semantics (catalog.py module
docstring). These tests pin the promises against Iceberg's documented
behavior so the ``_FORMAT = "iceberg"`` swap stays honest:

- dynamic overwrite = overwrite-by-filter: only partitions present in the
  incoming frame are replaced; absent partitions survive;
- an EMPTY dynamic delta is a no-op (no partitions to replace);
- re-running the same dynamic write is idempotent;
- rewrite (rewrite_data_files) preserves the row multiset and is
  re-runnable;
- a crash inside rewrite's two-rename swap window is healed by the next
  read/exists (live data is parked under ``name__compact_old``).

Documented divergence (snapshot isolation): an Iceberg reader pinned to a
pre-rewrite snapshot keeps reading it; the parquet stand-in resolves files
at action time, so a pre-rewrite DataFrame must be re-read after a rewrite.
Callers (compact_seen) already re-read by name.
"""

import os

import pytest

from url_pattern_algorithm_spark.sources.catalog import Catalog


@pytest.fixture()
def cat(spark, tmp_path):
    return Catalog(spark, str(tmp_path / "cat"))


def _rows(cat, name):
    return sorted(
        (r["bucket"], r["k"]) for r in cat.read(name).collect()
    )


def _write_buckets(cat, name, pairs, mode="overwrite", dynamic=False):
    df = cat.spark.createDataFrame(pairs, "bucket int, k string")
    cat.write(df, name, mode=mode, partition_by=["bucket"], dynamic=dynamic)


def test_dynamic_overwrite_replaces_only_present_partitions(cat):
    _write_buckets(cat, "t", [(0, "a"), (1, "b"), (2, "c")])
    # delta touches bucket 1 only -> buckets 0 and 2 must survive
    _write_buckets(cat, "t", [(1, "B1"), (1, "B2")], dynamic=True)
    assert _rows(cat, "t") == [(0, "a"), (1, "B1"), (1, "B2"), (2, "c")]


def test_dynamic_overwrite_rerun_idempotent(cat):
    _write_buckets(cat, "t", [(0, "a"), (1, "b")])
    for _ in range(2):  # the seen-delta re-run case (resume replays a write)
        _write_buckets(cat, "t", [(1, "B")], dynamic=True)
        assert _rows(cat, "t") == [(0, "a"), (1, "B")]


def test_dynamic_overwrite_empty_delta_is_noop(cat):
    _write_buckets(cat, "t", [(0, "a"), (1, "b")])
    empty = cat.spark.createDataFrame([], "bucket int, k string")
    cat.write(empty, "t", partition_by=["bucket"], dynamic=True)
    assert _rows(cat, "t") == [(0, "a"), (1, "b")]


def test_rewrite_preserves_multiset_and_reruns(cat):
    _write_buckets(cat, "t", [(0, "a"), (0, "a"), (1, "b")])
    before = _rows(cat, "t")
    cat.compact("t", target_partitions=1, partition_by=["bucket"])
    assert _rows(cat, "t") == before
    cat.compact("t", target_partitions=1, partition_by=["bucket"])
    assert _rows(cat, "t") == before
    assert not os.path.isdir(cat.path("t__compact_old"))
    assert not os.path.isdir(cat.path("t__compact_tmp"))


def test_rewrite_crash_mid_swap_recovers_on_read(cat):
    _write_buckets(cat, "t", [(0, "a"), (1, "b")])
    before = _rows(cat, "t")
    # simulate a crash between rename(final, old) and rename(tmp, final):
    # live data only under t__compact_old, nothing under t
    os.rename(cat.path("t"), cat.path("t__compact_old"))
    assert not os.path.isdir(cat.path("t"))
    assert cat.exists("t")  # exists() heals
    assert _rows(cat, "t") == before
    assert not os.path.isdir(cat.path("t__compact_old"))
    # and a subsequent rewrite over the healed table works
    cat.compact("t", target_partitions=1, partition_by=["bucket"])
    assert _rows(cat, "t") == before
