"""The frontier crawl loop: iterative batch over checkpoint tables (north_rule).

One iteration (all DataFrame ops, nothing frontier-scale on the driver):

    pending ⋈ politeness budgets -> salted priority top-k  = scheduled batch
    scheduled -> deterministic fetch (url_hash -> doc)     = fetched docs
    docs -> extract_links -> normalize -> robots filter
         -> Bloom + anti-join seen filter                  = new frontier rows
    state' = (pending - scheduled + new, seen + new, token buckets debited)

State-table I/O is sized for a 10^10-key frontier:

- ``seen`` is ONE append-only table partitioned by ``(epoch, bucket)``:
  every iteration writes ONLY its delta (dynamic partition overwrite of
  ``epoch=i`` — idempotent on re-run, so resume never duplicates), and
  ``read_seen(cat, k)`` reconstructs the set as of any iteration by
  epoch-pruned read. Per-iteration write volume is O(delta), not O(seen) —
  the previous snapshot-per-iteration design wrote the full seen table every
  iteration (quadratic cumulative I/O over a long crawl).
- Bloom bitmaps are maintained INCREMENTALLY: ``bloom_i = bloom_{i-1} |
  bloom(delta)`` in one fused cogroup pass (operators.frontier.update_blooms)
  at fixed per-bucket size ``bloom_m_bits``. Maintenance cost is
  O(delta keys + bitmap bytes); bitmap bytes are ~10 *bits* per seen key.
- ``compact_seen`` collapses old epochs into the single ``epoch=-1``
  partition on a cadence (``compact_every``), bounding file counts exactly
  like Iceberg's rewrite_data_files; ``first_iter`` is a data column, so
  compaction never loses lineage.
- ``pending``/``host_state`` stay per-iteration snapshots (they are the
  live working set, not an accumulating log); pending is written
  partitioned by a host-hash bucket for pruned per-host reads.

The 'web' is simulated deterministically: fetching a URL returns the synthetic
doc with index splitmix(url_hash) — same function in the pure-python oracle
(kernel/crawl_oracle.py), which this pipeline must match row-for-row.
"""

from __future__ import annotations

from collections.abc import Iterator
from concurrent.futures import ThreadPoolExecutor

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from url_pattern_algorithm_spark.functions.links import extract_normalize_udf
from url_pattern_algorithm_spark.functions.udfs import with_url_columns
from url_pattern_algorithm_spark.operators.cuckoo import (
    build_cuckoo,
    seen_filter_cuckoo,
    update_cuckoos,
)
from url_pattern_algorithm_spark.operators.frontier import (
    build_bloom,
    host_crawl_delays,
    politeness_budgets,
    robots_filter,
    schedule_top_k,
    seen_filter,
    update_blooms,
)
from url_pattern_algorithm_spark.scaling import (
    BROADCAST_MAX_ROWS,
    broadcast_if_small,
)
from url_pattern_algorithm_spark.sources.catalog import Catalog
from url_pattern_algorithm_spark.sources.synthetic import _mix

TOKENS_INIT = 2.0
TOKENS_CAP = 4.0
REFILL = 1.0

BLOOM_M_BITS = 1 << 17  # fixed per-bucket bitmap bits (incremental OR mode)
PENDING_HBUCKETS = 16  # host-hash partition count for pending snapshots


def _run_writers(writers) -> None:
    """Run the iteration's independent state-write jobs.

    Default: submit them as CONCURRENT Spark jobs from driver threads — the
    standard multi-executor driver pattern (independent output jobs fill
    scheduler slots a single ~32-task write leaves idle). Each writer targets
    a disjoint table and reads only cached/parquet inputs, so ordering is
    immaterial; crash semantics are unchanged (any subset of the iteration's
    tables may exist after a failure, and resume re-runs the whole iteration
    idempotently). ``SPARK_GRAFT_SEQ_WRITES=1`` forces sequential submission
    (the A/B lever for tools/writes_ab_probe.py).
    """
    import os

    if os.environ.get("SPARK_GRAFT_SEQ_WRITES") == "1":
        for w in writers:
            w()
        return
    with ThreadPoolExecutor(max_workers=len(writers)) as pool:
        # .result() re-raises the first writer failure on the driver thread
        for fut in [pool.submit(w) for w in writers]:
            fut.result()


class Politeness:
    """Per-host token-bucket parameters (defaults = parity-test values;
    benches raise them to schedule large batches per iteration)."""

    def __init__(self, tokens_init: float = TOKENS_INIT,
                 tokens_cap: float = TOKENS_CAP, refill: float = REFILL):
        self.tokens_init = tokens_init
        self.tokens_cap = tokens_cap
        self.refill = refill


DEFAULT_POLITENESS = Politeness()

PENDING_COLS = ["url", "url_canon", "url_hash", "host", "priority", "discovered_iter"]
SEEN_COLS = ["url_hash", "url_canon", "first_iter"]


def _with_crawl_delay(hosts: DataFrame, delays: DataFrame | None,
                      est_robots: int | None) -> DataFrame:
    """+ ``crawl_delay`` on a (host, ...) frame: the per-host robots
    Crawl-delay when the table carries one (size-gated broadcast join,
    hosts without a directive default to 1.0), else the 1.0 constant."""
    if delays is None:
        return hosts.withColumn("crawl_delay", F.lit(1.0))
    return (
        hosts.join(broadcast_if_small(delays, est_robots), "host", "left")
        .na.fill({"crawl_delay": 1.0})
    )


def fetch_doc_index_udf(n_docs: int):
    """url_hash -> deterministic synthetic doc index (the simulated web)."""

    def fn(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            yield s.map(lambda h: _mix(13, int(h) & ((1 << 64) - 1)) % n_docs)

    return F.pandas_udf(fn, "long")


# ---------------------------------------------------------------------------
# seen-table management (append-only deltas + epoch compaction)
# ---------------------------------------------------------------------------


def read_seen(cat: Catalog, upto: int) -> DataFrame:
    """Seen set as of iteration ``upto`` from the append-only table.

    ``epoch <= upto`` prunes future-iteration partition dirs at plan time
    (compacted history lives in epoch=-1, always included); the row-level
    ``first_iter <= upto`` makes the as-of exact after compaction merges
    epochs."""
    s = cat.read("seen")
    return s.filter((F.col("epoch") <= upto) & (F.col("first_iter") <= upto))


def _write_seen_delta(cat: Catalog, rows: DataFrame, run_id: str,
                      iteration: int, n_buckets: int) -> int:
    """Append one iteration's delta: dynamic overwrite of ``epoch=i`` only.

    The delta is repartitioned by bucket first so each (epoch, bucket)
    partition gets exactly one file per iteration."""
    delta = rows.select(
        "url_hash", "url_canon",
        F.lit(iteration).alias("first_iter"),
        F.pmod(F.col("url_hash"), F.lit(n_buckets)).cast("int").alias("bucket"),
        F.lit(iteration).alias("epoch"),
    ).repartition(n_buckets, "bucket")
    return cat.write_checkpoint(
        delta, "seen", run_id, iteration,
        partition_by=["epoch", "bucket"], dynamic=True,
    )


def compact_seen(cat: Catalog, upto: int, n_buckets: int = 64) -> None:
    """Collapse seen epochs <= ``upto`` into the ``epoch=-1`` partition
    (file-count control for the append-heavy table; Iceberg's
    rewrite_data_files analogue, crash-safe via Catalog.rewrite).

    Like Iceberg snapshot expiry, compacting THROUGH iteration ``upto``
    expires resume points before it: re-running an already-compacted
    iteration would duplicate its rows (epoch=-1 + the re-written epoch).
    A watermark row records the boundary; run_crawl refuses stale resumes.
    Reading as-of any iteration stays exact (first_iter row filter)."""

    def collapse(df: DataFrame) -> DataFrame:
        merged = df.withColumn(
            "epoch",
            F.when(F.col("epoch") <= upto, F.lit(-1)).otherwise(F.col("epoch")),
        )
        return merged.repartition(n_buckets, "bucket")

    # the rewrite lock is held across BOTH steps: a compaction refused by
    # in-flight seen writers (or a rival compactor) must fail BEFORE the
    # watermark lands — a watermark for a compaction that never ran would
    # block valid resumes. Within the lock, watermark still goes FIRST
    # (fail-safe direction): a crash between the two steps then refuses
    # some resumes that would still have been valid, instead of permitting
    # a resume into already-compacted history (duplicate rows).
    with cat.rewrite_lock("seen"):
        wm = cat.spark.createDataFrame([(upto,)], "upto int")
        cat.append(wm, "_compaction")
        cat.rewrite_locked("seen", collapse, partition_by=["epoch", "bucket"])


def prune_checkpoint_history(cat: Catalog, upto: int) -> list[str]:
    """Drop per-iteration state snapshots made dead by ``compact_seen(upto)``.

    run_crawl refuses resumes below the compaction watermark, so snapshots
    before it are unreachable dead weight — without pruning a 10^5-iteration
    crawl leaves 4x10^5 checkpoint dirs. Drops ``bloom_N`` / ``cuckoo_N`` /
    ``pending_N`` /
    ``host_state_N`` for N < upto (N == upto is the live resume point) and
    ``scheduled_N`` for N <= upto (scheduled is write-only w.r.t. later
    iterations — it is the per-iteration OUTPUT log; callers that consume it
    downstream should copy batches out before the compaction cadence, or
    run with ``prune_history=False``). Returns the dropped table names.
    """
    dropped = []
    for name in cat.table_names():
        base = _base_table_name(name)
        for prefix in ("bloom_", "cuckoo_", "pending_", "host_state_",
                       "scheduled_"):
            if base.startswith(prefix):
                try:
                    n = int(base[len(prefix):])
                except ValueError:
                    continue
                limit = upto + 1 if prefix == "scheduled_" else upto
                if n < limit:
                    cat.drop(name)
                    dropped.append(name)
    return dropped


# the aux naming scheme is owned by the catalog (Catalog.AUX_SUFFIXES);
# the wipe/prune sites below resolve through it
_base_table_name = Catalog.base_table_name


def compaction_watermark(cat: Catalog) -> int:
    """Latest compacted-through iteration (-1 if never compacted)."""
    if not cat.exists("_compaction"):
        return -1
    row = cat.read("_compaction").agg(F.max("upto").alias("m")).collect()[0]
    return int(row["m"]) if row["m"] is not None else -1


def _read_crawl_meta(cat: Catalog) -> dict:
    import json
    import os

    with open(os.path.join(cat.root, "_run_meta.json")) as f:
        return json.load(f)


def unsee_urls(spark: SparkSession, ckpt_root: str, urls: DataFrame,
               run_id: str = "unsee") -> int:
    """Purge URLs from the crawl's seen state so future organic discovery
    re-admits them (takedown / right-to-be-forgotten) — the Iceberg DELETE
    analogue over the seen table, plus the matching prefilter snapshot
    update. Run between iterations; returns rows purged. For an explicit
    refetch (recrawl scheduling) use :func:`reenqueue_urls` instead — it
    puts the URL back on the frontier directly.

    ``urls``: DataFrame with a ``url_hash`` column, or a ``url`` column
    (projected through the same normalize kernel the loop uses, so the
    hash always matches what the loop stored).

    Hashes still in the latest pending snapshot are SKIPPED: a pending URL
    is already awaiting its first fetch, and removing its seen row would
    break the loop's ``pending ⊆ seen`` invariant (a re-discovered
    candidate would be admitted again and duplicate the frontier).

    The seen rows are removed under the table's rewrite lock (copy-on-
    write via Catalog.rewrite — a real Iceberg deployment swaps this for
    positional deletes; the lock also refuses to race an in-flight
    iteration's writers, same as compact_seen). Seen is purged FIRST,
    then the prefilter snapshot at the run's last iteration is brought in
    line — that order is crash-safe: a stale-POSITIVE prefilter is exact
    (maybe-seen candidates route through the anti-join, whose rows are
    gone), whereas updating the filter before the rows are gone would
    open a false-negative window. For the same reason resumes from
    earlier snapshots, whose filters still contain the purged keys, stay
    exact.

    Prefilter update, by kind (run meta):

    - cuckoo: O(|purged|) incremental ``delete_from_cuckoos`` — the
      capability the cuckoo kind was added for. Only hashes actually
      present in seen are deleted (semi-join guard): deleting a
      never-inserted key could evict a colliding fingerprint and turn a
      prefilter false-positive into a FALSE NEGATIVE for a still-seen
      URL (the Fan et al. delete caveat).
    - bloom: bits cannot be cleared, so the stale snapshot is DROPPED and
      the next iteration rebuilds it from the post-purge seen table
      (full-scan rebuild — the cost asymmetry that motivates cuckoo for
      delete-heavy deployments).
    """
    from url_pattern_algorithm_spark.operators.cuckoo import (
        delete_from_cuckoos,
    )

    cat = Catalog(spark, ckpt_root)
    meta = _read_crawl_meta(cat)
    n_buckets = int(meta["bloom_buckets"])
    last = int(meta.get("last_iteration", 0))
    kind = meta.get("prefilter_kind", "bloom")
    if "url_hash" not in urls.columns:
        urls = with_url_columns(urls)
    hashes = urls.select("url_hash").distinct()
    with cat.rewrite_lock("seen"):
        # hashes actually stored and NOT awaiting first fetch (bounded by
        # the purge request, not the corpus): the delete guard AND the
        # purge row count in one frame
        present = (
            cat.read("seen").join(hashes, "url_hash", "semi")
            .join(cat.read(f"pending_{last}").select("url_hash"),
                  "url_hash", "left_anti")
            .select("url_hash").distinct().persist()
        )
        try:
            n = present.count()
            if n:
                cat.rewrite_locked(
                    "seen",
                    lambda df: df.join(present, "url_hash", "left_anti")
                                 .repartition(n_buckets, "bucket"),
                    partition_by=["epoch", "bucket"],
                )
                snap = f"{kind}_{last}"
                if kind == "cuckoo" and cat.exists(snap):
                    # rename-aside rewrite, not an in-place overwrite: a
                    # crash mid-write must leave a readable snapshot
                    cat.rewrite(
                        snap,
                        lambda df: delete_from_cuckoos(
                            df.select("bucket", "nb", "table", "stash"),
                            present, n_buckets,
                        ).withColumn("run_id", F.lit(run_id))
                         .withColumn("iteration", F.lit(last))
                         .withColumn("partition_id", F.spark_partition_id())
                         .coalesce(4),
                    )
                elif kind == "bloom" and cat.exists(snap):
                    cat.drop(snap)
        finally:
            present.unpersist()
    return n


def reenqueue_urls(spark: SparkSession, ckpt_root: str, urls: DataFrame,
                   priority: float = 2.0, run_id: str = "recrawl") -> int:
    """Schedule URLs for an explicit refetch (recrawl scheduling): append
    them to the latest pending snapshot so the next iteration's priority
    top-k considers them. Run between iterations; returns rows enqueued.

    ``priority`` defaults above every organic discovery priority
    (1/(iter+1) <= 1.0), so recrawls jump the per-host queue — still
    subject to the same politeness budgets as everything else. Hashes
    already pending are skipped (a duplicate pending row could be
    scheduled twice in one batch).

    URLs missing from seen — e.g. just purged by :func:`unsee_urls` — have
    their seen rows and prefilter fingerprints RESTORED first:
    ``pending ⊆ seen`` is the loop invariant that stops re-discovered
    candidates from duplicating the frontier. Restore order is prefilter
    THEN seen (a crash in between leaves a stale-positive filter, which is
    exact; the reverse order would leave a seen row the filter routes
    AROUND the anti-join — a false negative). The cuckoo restore is an
    O(|restored|) incremental insert; keys are guaranteed absent (they
    were deleted when unseen), so the insert-once contract holds.

    ``urls`` accepts the same shapes as :func:`unsee_urls`.
    """
    from url_pattern_algorithm_spark.operators.cuckoo import update_cuckoos

    cat = Catalog(spark, ckpt_root)
    meta = _read_crawl_meta(cat)
    n_buckets = int(meta["bloom_buckets"])
    m_bits = int(meta["bloom_m_bits"])
    last = int(meta.get("last_iteration", 0))
    kind = meta.get("prefilter_kind", "bloom")
    nb = meta.get("cuckoo_nb")
    if "url_hash" not in urls.columns:
        urls = with_url_columns(urls)
    if "url_canon" not in urls.columns:
        raise ValueError(
            "reenqueue_urls needs a 'url' column or both "
            "('url_hash', 'url_canon'): pending rows carry the canonical "
            "URL and host, which a bare hash cannot reconstruct"
        )
    parse_host = getattr(F, "try_parse_url", F.parse_url)
    req = (
        urls.select("url_hash", "url_canon").distinct()
        .withColumn("host", F.lower(parse_host(F.col("url_canon"),
                                               F.lit("HOST"))))
    )
    pname = f"pending_{last}"
    # no table-wide lock here: each append registers a writer marker, which
    # already excludes a concurrent compaction (and the filter rewrite takes
    # its own snapshot lock). Like compact_seen, this is a between-iterations
    # maintenance op with a single actor — two concurrent reenqueues of the
    # same URL could both pass the pending anti-join and double-pend it.
    todo = req.join(
        cat.read(pname).select("url_hash"), "url_hash", "left_anti"
    ).persist()
    try:
        n = todo.count()
        if not n:
            return 0
        restore = todo.join(
            cat.read("seen").select("url_hash"), "url_hash", "left_anti"
        ).persist()
        try:
            if restore.count():
                snap = f"{kind}_{last}"
                if cat.exists(snap):
                    delta = restore.select("url_hash")
                    if kind == "cuckoo":
                        upd = lambda df: update_cuckoos(  # noqa: E731
                            df.select("bucket", "nb", "table", "stash"),
                            delta, n_buckets, nb=int(nb),
                        )
                    else:
                        upd = lambda df: update_blooms(  # noqa: E731
                            df.select("bucket", "m_bits", "bitmap"),
                            delta, n_buckets, m_bits,
                        )
                    cat.rewrite(snap, lambda df: (
                        upd(df)
                        .withColumn("run_id", F.lit(run_id))
                        .withColumn("iteration", F.lit(last))
                        .withColumn("partition_id",
                                    F.spark_partition_id())
                        .coalesce(4)
                    ))
                seen_cols = cat.read("seen").columns
                seen_delta = (
                    restore.select(
                        "url_hash", "url_canon",
                        F.lit(last).alias("first_iter"),
                        F.pmod(F.col("url_hash"), F.lit(n_buckets))
                         .cast("int").alias("bucket"),
                        F.lit(last).alias("epoch"),
                        F.lit(run_id).alias("run_id"),
                        F.lit(last).alias("iteration"),
                        F.spark_partition_id().alias("partition_id"),
                    ).select(*seen_cols)
                )
                # append, NOT the loop's dynamic epoch overwrite — the
                # epoch=last partition already holds that iteration's
                # organic delta and must survive
                cat.append(seen_delta, "seen",
                           partition_by=["epoch", "bucket"])
        finally:
            restore.unpersist()
        pend_cols = cat.read(pname).columns
        rows = _with_hbucket(
            todo.select(
                F.col("url_canon").alias("url"), "url_canon",
                "url_hash", "host",
                F.lit(float(priority)).alias("priority"),
                F.lit(last).alias("discovered_iter"),
            ),
            # hbucket is file-layout only (reads select PENDING_COLS by
            # name), so the default bucket count is safe even when the
            # run derived a different pending_hbuckets
            hbuckets=PENDING_HBUCKETS,
        ).select(*[
            c if c not in ("run_id", "iteration", "partition_id")
            else {
                "run_id": F.lit(run_id).alias("run_id"),
                "iteration": F.lit(last).alias("iteration"),
                "partition_id":
                    F.spark_partition_id().alias("partition_id"),
            }[c]
            for c in pend_cols
        ])
        cat.append(rows, pname, partition_by=["hbucket"])
    finally:
        todo.unpersist()
    return n


def _seen_count_from_metrics(cat: Catalog) -> int | None:
    """Total seen-set size from the lineage metrics table (one tiny file
    read, no data scan): seen deltas are exact-once inserts, so the sum of
    per-iteration 'seen' row counts IS the table size. unsee_urls removals
    and reenqueue restores bypass metrics, so the figure can overestimate
    slightly after purges — conservative in the direction growth sizing
    wants."""
    if not cat.exists("_metrics"):
        return None
    row = (cat.read("_metrics").filter(F.col("table") == "seen")
           .agg(F.sum("rows").alias("n")).collect()[0]["n"])
    return int(row) if row is not None else None


def _maybe_grow_prefilter(cat: Catalog, it: int, n_buckets: int,
                          m_bits: int, nb: int, kind: str,
                          run_id: str) -> tuple[int, int]:
    """Compaction-time prefilter rescale: re-derive the per-bucket filter
    size from the ACTUAL seen count and rebuild the snapshot if it grew.

    Initial sizing derives from ``n_docs``, but the seen set is URLs and
    grows without bound in a long crawl — a filter pinned at start-time
    size eventually saturates: the bloom's fp rate decays toward 1 (the
    prefilter routes everything into the anti-join — correct, useless)
    and the cuckoo degrades to stash (exact, bytes grow linearly,
    operators/cuckoo.py overload guards). Riding the compaction schedule
    gives the rebuild the same amortization and the same watermark
    semantics: resumes before this point are already refused, and the run
    meta re-pins the grown size so later resumes adopt it
    (run_crawl ``None`` params read the meta).

    Growth only — shrink would invalidate the incremental OR/insert chain
    for nothing. Returns the (possibly grown) (m_bits, nb)."""
    from url_pattern_algorithm_spark.operators.cuckoo import derive_cuckoo_nb
    from url_pattern_algorithm_spark.scaling import derive_bloom_m_bits

    n_seen = _seen_count_from_metrics(cat)
    if n_seen is None:
        return m_bits, nb
    new_m = max(m_bits, derive_bloom_m_bits(n_seen, n_buckets))
    new_nb = max(nb, derive_cuckoo_nb(n_seen, n_buckets))

    def _stamp(df: DataFrame) -> DataFrame:
        return (df.withColumn("run_id", F.lit(run_id))
                .withColumn("iteration", F.lit(it))
                .withColumn("partition_id", F.spark_partition_id())
                .coalesce(4))

    # rename-aside rewrite, NOT an in-place overwrite: meta already
    # records iteration ``it`` as completed, so a crash mid-write must
    # leave a READABLE snapshot (old or new, both exact) — a resume then
    # self-heals any size mismatch against the meta
    # (_heal_prefilter_size_mismatch)
    if kind == "cuckoo" and new_nb > nb:
        cat.rewrite(f"cuckoo_{it}", lambda _old: _stamp(
            build_cuckoo(read_seen(cat, it), n_buckets, nb=new_nb)
        ))
        return m_bits, new_nb
    if kind == "bloom" and new_m > m_bits:
        cat.rewrite(f"bloom_{it}", lambda _old: _stamp(
            build_bloom(read_seen(cat, it), n_buckets, m_bits=new_m)
        ))
        return new_m, nb
    return m_bits, nb


def _heal_prefilter_size_mismatch(cat: Catalog, iteration: int, kind: str,
                                  m_bits: int, nb: int) -> None:
    """Resume-time self-heal for the one crash window compaction-time
    rescaling leaves: a crash between the snapshot rebuild and the meta
    re-pin (either order) makes the stored snapshot's per-bucket size
    disagree with the size the resume adopted from the meta. The probe
    kernels tolerate per-row sizes, but the incremental update kernels
    refuse a mismatch (loud, not silent) — so a mismatched snapshot is
    DROPPED here and the first resumed iteration rebuilds it from the
    seen table at the adopted size (_read_prefilter fallback, exact
    either way). One 1-row read of a bucket-count-sized table."""
    snap = f"{kind}_{iteration}"
    if not cat.exists(snap):
        return
    col = "nb" if kind == "cuckoo" else "m_bits"
    expected = nb if kind == "cuckoo" else m_bits
    row = cat.read(snap).select(col).limit(1).collect()
    if row and int(row[0][col]) != expected:
        cat.drop(snap)


def _write_run_meta(cat: Catalog, bloom_buckets: int, bloom_m_bits: int,
                    last_iteration: int = 0,
                    robots_mode: str = "any_disallow",
                    prefilter_kind: str = "bloom",
                    cuckoo_nb: int | None = None) -> None:
    """Persist the run's structural parameters (driver-side file, no Spark
    job): the bucket count is baked into every stored bloom bitmap and seen
    bucket column, so resuming with different values would silently produce
    Bloom false negatives — validated on resume instead.
    ``last_iteration`` (updated after every completed iteration) bounds
    resume_from: a reused checkpoint root can hold LATER pending/host_state
    snapshots from a longer previous run, and resuming past this run's end
    would silently mix the two runs' states."""
    import json
    import os

    os.makedirs(cat.root, exist_ok=True)
    # meta is rewritten after EVERY iteration: write-to-temp + atomic
    # os.replace so a crash mid-write can't leave truncated JSON that
    # blocks the resume path
    from url_pattern_algorithm_spark.operators.frontier import BLOOM_FORMAT

    final = os.path.join(cat.root, "_run_meta.json")
    tmp = final + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"bloom_buckets": bloom_buckets,
                   "bloom_m_bits": bloom_m_bits,
                   "bloom_format": BLOOM_FORMAT,
                   "robots_mode": robots_mode,
                   "prefilter_kind": prefilter_kind,
                   "cuckoo_nb": cuckoo_nb,
                   "last_iteration": last_iteration}, f)
    os.replace(tmp, final)


def _check_run_meta(cat: Catalog, bloom_buckets: int, bloom_m_bits: int,
                    resume_from: int | None = None,
                    use_bloom: bool = True,
                    robots_mode: str = "any_disallow",
                    prefilter_kind: str = "bloom",
                    cuckoo_nb: int | None = None) -> None:
    import json
    import os

    path = os.path.join(cat.root, "_run_meta.json")
    if not os.path.exists(path):
        return  # pre-meta checkpoint dirs stay resumable
    with open(path) as f:
        try:
            meta = json.load(f)
        except json.JSONDecodeError as e:
            raise ValueError(
                f"corrupt {path} ({e}): the run meta is written atomically "
                "(temp + os.replace), so this checkpoint root predates that "
                "fix or was damaged externally — delete the file to resume "
                "an otherwise-intact checkpoint (parameters then unchecked)"
            ) from e
    if (meta.get("bloom_buckets") != bloom_buckets
            or meta.get("bloom_m_bits") != bloom_m_bits):
        raise ValueError(
            f"resume with bloom_buckets={bloom_buckets}/"
            f"bloom_m_bits={bloom_m_bits} does not match the checkpoint's "
            f"{meta}: stored bitmaps and seen buckets are keyed by these — "
            "resume with the original values or start a fresh run"
        )
    from url_pattern_algorithm_spark.operators.frontier import BLOOM_FORMAT

    stored_kind = meta.get("prefilter_kind", "bloom")  # pre-cuckoo metas
    if use_bloom and stored_kind != prefilter_kind:
        raise ValueError(
            f"resume with prefilter_kind={prefilter_kind!r} does not match "
            f"the checkpoint's {stored_kind!r}: the stored {stored_kind}_N "
            "snapshots are the incremental state this resume would extend — "
            "resume with the original kind (or use_bloom=False to continue "
            "without a prefilter; the exact anti-join semantics are "
            "identical either way)"
        )
    if (use_bloom and prefilter_kind == "cuckoo"
            and meta.get("cuckoo_nb") is not None
            and meta.get("cuckoo_nb") != cuckoo_nb):
        raise ValueError(
            f"resume with cuckoo_nb={cuckoo_nb} does not match the "
            f"checkpoint's {meta.get('cuckoo_nb')}: stored cuckoo tables "
            "are keyed by their bucket count — resume with the original "
            "value or start a fresh run"
        )
    stored_format = meta.get("bloom_format", 1)  # pre-r5 metas: raw-hash
    if stored_format != BLOOM_FORMAT:
        if use_bloom and prefilter_kind == "bloom":
            raise ValueError(
                f"checkpoint bloom bitmaps use position format "
                f"{stored_format}, this build probes format {BLOOM_FORMAT} "
                "(r5 remix): probing them would produce SILENT false "
                "negatives past the seen anti-join — start a fresh run, or "
                "resume with use_bloom=False (stale-format bitmaps are then "
                "dropped and rebuild from the seen table when re-enabled)"
            )
        # bloom disabled: the stale-format snapshots must not survive to be
        # probed by a LATER use_bloom=True resume — drop them (derived
        # data; _read_blooms rebuilds from the seen table when needed)
        for name in cat.table_names():
            if _base_table_name(name).startswith("bloom_"):
                cat.drop(name)
    stored_mode = meta.get("robots_mode", "any_disallow")  # pre-r5 metas
    if stored_mode != robots_mode:
        raise ValueError(
            f"resume with robots_mode={robots_mode!r} does not match the "
            f"checkpoint's {stored_mode!r}: the stored seen/pending state "
            "was admitted under the other policy, so continuing would "
            "silently mix two filtering policies in one crawl — resume "
            "with the original mode or start a fresh run"
        )
    last = meta.get("last_iteration")
    if (resume_from is not None and last is not None
            and resume_from > last):
        raise ValueError(
            f"resume_from={resume_from} is beyond this run's last completed "
            f"iteration {last}: any pending_/host_state_ snapshots past it "
            "belong to a previous run in this checkpoint root"
        )


def _read_blooms(cat: Catalog, iteration: int, n_buckets: int,
                 m_bits: int) -> DataFrame:
    """Bloom state as of ``iteration``: the stored snapshot when present,
    else rebuilt once from the seen table (e.g. resuming a run that was
    started with use_bloom=False)."""
    name = f"bloom_{iteration}"
    if cat.exists(name):
        return cat.read(name).select("bucket", "m_bits", "bitmap")
    return build_bloom(read_seen(cat, iteration), n_buckets, m_bits=m_bits)


def _read_prefilter(cat: Catalog, iteration: int, kind: str, n_buckets: int,
                    m_bits: int, cuckoo_nb: int) -> DataFrame:
    """Seen-prefilter state as of ``iteration`` for the run's configured
    kind ('bloom' | 'cuckoo'): stored snapshot when present, else rebuilt
    once from the seen table (resuming a run started with use_bloom=False,
    or after a stale-format bloom drop)."""
    if kind == "cuckoo":
        name = f"cuckoo_{iteration}"
        if cat.exists(name):
            return cat.read(name).select("bucket", "nb", "table", "stash")
        return build_cuckoo(read_seen(cat, iteration), n_buckets,
                            nb=cuckoo_nb)
    return _read_blooms(cat, iteration, n_buckets, m_bits)


def _with_hbucket(pending: DataFrame,
                  hbuckets: int = PENDING_HBUCKETS) -> DataFrame:
    """Host-hash partition column + repartition on it: the repartition
    bounds the partitioned write at one file per hbucket dir (without it,
    every write task emits a file into every dir it touches — tasks x dirs
    small files per snapshot)."""
    return pending.withColumn(
        "hbucket",
        F.pmod(F.xxhash64("host"), F.lit(hbuckets)).cast("int"),
    ).repartition(hbuckets, "hbucket")


def _new_frontier_rows(
    spark: SparkSession,
    raw_candidates: DataFrame,
    robots: DataFrame,
    seen: DataFrame | None,
    blooms: DataFrame | None,
    discovered_iter: int,
    bloom_buckets: int = 64,
    est_robots: int | None = None,
    robots_mode: str = "any_disallow",
    prefilter_kind: str = "bloom",
) -> DataFrame:
    """candidates -> normalized, robots-filtered, unseen, deduped rows.

    Accepts either raw (url) rows or pre-normalized (url, url_canon, host)
    rows from the fused extract+normalize UDF (one Arrow pass on the hot
    path). ``est_robots``: robots row count threaded from run_crawl's
    once-per-run probe so the robots broadcast size gate costs no
    per-iteration job. ``robots_mode``: 'any_disallow' (parity default) or
    'longest_match' (Google-spec precedence, operators/frontier.py)."""
    if "url_canon" not in raw_candidates.columns:
        cand = with_url_columns(raw_candidates)
    else:
        cand = raw_candidates.withColumn("url_hash", F.xxhash64("url_canon"))
    cand = cand.filter(F.col("url_canon").isNotNull())
    cand = robots_filter(cand, robots, est_rows=est_robots,
                         longest_match=robots_mode == "longest_match")
    if prefilter_kind == "cuckoo":
        cand = seen_filter_cuckoo(cand, seen, blooms, bloom_buckets)
    else:
        cand = seen_filter(cand, seen, blooms, bloom_buckets)
    # batch-internal dedup on the canonical hash; deterministic representative
    dedup = cand.groupBy("url_hash").agg(
        F.min("url").alias("url"),
        F.min("url_canon").alias("url_canon"),
        F.min("host").alias("host"),
    )
    return dedup.select(
        "url",
        "url_canon",
        "url_hash",
        "host",
        F.lit(1.0 / (discovered_iter + 1.0)).alias("priority"),
        F.lit(discovered_iter).alias("discovered_iter"),
    )


def init_state(
    spark: SparkSession,
    seeds: DataFrame,
    robots: DataFrame,
    cat: Catalog,
    run_id: str,
    pol: Politeness = DEFAULT_POLITENESS,
    use_bloom: bool = True,
    bloom_buckets: int = 64,
    bloom_m_bits: int = BLOOM_M_BITS,
    est_robots: int | None = None,
    stats: dict | None = None,
    hbuckets: int = PENDING_HBUCKETS,
    delays: DataFrame | None = None,
    robots_mode: str = "any_disallow",
    prefilter_kind: str = "bloom",
    cuckoo_nb: int = 1 << 14,
) -> None:
    """Iteration 0: seed list -> pending snapshot + seen delta + the
    iteration-0 seen-prefilter snapshot (bloom_0 or cuckoo_0).

    ``stats`` (when given) receives ``n_hosts`` = host_state_0 row count,
    which run_crawl threads into iteration 1's politeness size gate."""
    cand = with_url_columns(seeds).filter(F.col("url_canon").isNotNull())
    cand = robots_filter(cand, robots, est_rows=est_robots,
                         longest_match=robots_mode == "longest_match")
    pending = cand.groupBy("url_hash").agg(
        F.min("url").alias("url"),
        F.min("url_canon").alias("url_canon"),
        F.min("host").alias("host"),
        F.max("priority").alias("priority"),
    ).select(*PENDING_COLS[:5], F.lit(0).alias("discovered_iter"))
    # one UDF pass: pending feeds four checkpoint writes. pending_0 runs
    # first (pays the UDF cost, fills the cache); the remaining three read
    # only the cache and target disjoint tables -> concurrent driver jobs,
    # same pattern as run_iteration's state writes.
    pending = pending.persist()
    cat.write_checkpoint(
        _with_hbucket(pending, hbuckets), "pending_0", run_id, 0,
        partition_by=["hbucket"],
    )

    def write_seen() -> None:
        _write_seen_delta(cat, pending, run_id, 0, bloom_buckets)

    def write_prefilter() -> None:
        if prefilter_kind == "cuckoo":
            flt0 = build_cuckoo(
                pending.select("url_hash"), bloom_buckets, nb=cuckoo_nb
            )
            cat.write_checkpoint(flt0.coalesce(4), "cuckoo_0", run_id, 0)
        else:
            flt0 = build_bloom(
                pending.select("url_hash"), bloom_buckets, m_bits=bloom_m_bits
            )
            cat.write_checkpoint(flt0.coalesce(4), "bloom_0", run_id, 0)

    def write_host_state() -> None:
        host_state = _with_crawl_delay(
            pending.select("host").distinct(), delays, est_robots
        ).select(
            "host",
            F.lit(pol.tokens_init).alias("tokens"),
            F.lit(0).alias("last_iter"),
            "crawl_delay",
        )
        n = cat.write_checkpoint(host_state, "host_state_0", run_id, 0)
        if stats is not None:
            stats["n_hosts"] = n

    writers = [write_seen, write_host_state]
    if use_bloom:
        writers.append(write_prefilter)
    _run_writers(writers)
    cat.flush_metrics()
    pending.unpersist()


def run_iteration(
    spark: SparkSession,
    docs: DataFrame,
    robots: DataFrame,
    cat: Catalog,
    run_id: str,
    iteration: int,
    n_docs: int,
    salts: int = 16,
    use_bloom: bool = True,
    bloom_buckets: int = 64,
    bloom_m_bits: int = BLOOM_M_BITS,
    pol: Politeness = DEFAULT_POLITENESS,
    est_hosts: int | None = None,
    est_robots: int | None = None,
    stats: dict | None = None,
    hbuckets: int = PENDING_HBUCKETS,
    delays: DataFrame | None = None,
    robots_mode: str = "any_disallow",
    prefilter_kind: str = "bloom",
    cuckoo_nb: int = 1 << 14,
) -> int:
    """Advance one iteration from state as of ``iteration-1``; returns the
    number of scheduled URLs.

    ``est_hosts``/``est_robots``: known dimension cardinalities for the
    politeness/robots broadcast size gates (run_crawl threads the previous
    iteration's host_state write count and a once-per-run robots probe, so
    warm iterations pay zero extra jobs; ``None`` falls back to a bounded
    probe). ``stats`` (when given) receives ``n_hosts`` = this iteration's
    host_state row count for the next iteration's gate."""
    prev = iteration - 1
    pending = cat.read(f"pending_{prev}").select(*PENDING_COLS)
    seen = read_seen(cat, prev).select("url_hash")
    host_state = cat.read(f"host_state_{prev}").select(
        "host", "tokens", "last_iter", "crawl_delay"
    )

    # 1. politeness budgets + salted priority top-k
    budgets = politeness_budgets(host_state, pol.refill, pol.tokens_cap)
    # size-gated: at 10^8 hosts a forced broadcast of every known host's
    # budget would exceed the 8 GB cap; past the gate AQE plans the
    # equi-join (budgets is a pure projection of host_state, so the
    # threaded host_state count IS the budgets count)
    frontier = pending.join(
        broadcast_if_small(budgets, est_hosts), "host", "inner"
    )
    scheduled = schedule_top_k(frontier, F.col("budget"), salts=salts)
    scheduled = scheduled.persist()
    n_scheduled = cat.write_checkpoint(
        scheduled.select(*PENDING_COLS, "sched_rank"),
        f"scheduled_{iteration}",
        run_id,
        iteration,
    )

    # 2. debit token buckets; unknown hosts keep state
    spent = scheduled.groupBy("host").agg(F.count("*").alias("n_sched"))
    new_host_state = (
        budgets.join(spent, "host", "left")
        .na.fill({"n_sched": 0})
        .select(
            "host",
            (F.col("tokens_avail") - F.col("n_sched")).alias("tokens"),
            F.lit(iteration).alias("last_iter"),
        )
        .join(host_state.select("host", "crawl_delay"), "host", "inner")
    )

    # 3. fetch + extract + normalize + filter
    fetched = scheduled.withColumn(
        "doc_index", fetch_doc_index_udf(n_docs)(F.col("url_hash"))
    )
    # docs must carry a deterministic doc_index (run_crawl derives it from
    # doc_id); never monotonically_increasing_id — that's partition-dependent
    pages = fetched.join(docs, "doc_index", "inner")
    raw_candidates = pages.select(
        F.explode(extract_normalize_udf(F.col("spans"))).alias("l")
    ).select("l.url", "l.url_canon", "l.host")
    blooms = (
        _read_prefilter(cat, prev, prefilter_kind, bloom_buckets,
                        bloom_m_bits, cuckoo_nb)
        if use_bloom
        else None
    )
    new_rows = _new_frontier_rows(
        spark, raw_candidates, robots, seen, blooms, iteration, bloom_buckets,
        est_robots=est_robots, robots_mode=robots_mode,
        prefilter_kind=prefilter_kind,
    )
    # the candidate pipeline (links UDF -> normalize UDF -> robots -> seen
    # filter -> dedup shuffle) feeds pending_N, the seen delta, bloom_N and
    # host_state_N: persist so it runs once, not four times
    new_rows = new_rows.persist()

    # 4. next state: pending/host_state snapshots + seen/bloom DELTAS only.
    # The seen-delta write runs FIRST: it is the cheapest job that touches
    # every partition of the persisted candidate pipeline, so it pays the
    # one-time UDF/dedup cost and leaves new_rows fully cached. The three
    # remaining state writes read only cached/parquet inputs and target
    # disjoint tables -> _run_writers submits them as concurrent driver jobs.
    _write_seen_delta(cat, new_rows, run_id, iteration, bloom_buckets)

    def write_pending() -> None:
        remaining = pending.join(
            scheduled.select("url_hash"), "url_hash", "left_anti"
        ).select(*PENDING_COLS)
        next_pending = remaining.unionByName(new_rows.select(*PENDING_COLS))
        cat.write_checkpoint(
            _with_hbucket(next_pending, hbuckets), f"pending_{iteration}",
            run_id, iteration, partition_by=["hbucket"],
        )

    def write_prefilter() -> None:
        # one cogroup pass builds the delta AND folds it into the stored
        # state (OR-merge for bloom, true insert for cuckoo); coalesce:
        # n_buckets rows never need 32 files
        if prefilter_kind == "cuckoo":
            next_flt = update_cuckoos(
                blooms, new_rows.select("url_hash"), bloom_buckets, cuckoo_nb
            )
            name = f"cuckoo_{iteration}"
        else:
            next_flt = update_blooms(
                blooms, new_rows.select("url_hash"), bloom_buckets,
                bloom_m_bits
            )
            name = f"bloom_{iteration}"
        cat.write_checkpoint(next_flt.coalesce(4), name, run_id, iteration)

    def write_host_state() -> None:
        new_hosts = _with_crawl_delay(
            new_rows.select("host").distinct()
            .join(new_host_state.select("host"), "host", "left_anti"),
            delays, est_robots,
        ).select(
            "host",
            F.lit(pol.tokens_init).alias("tokens"),
            F.lit(iteration).alias("last_iter"),
            "crawl_delay",
        )
        n = cat.write_checkpoint(
            new_host_state.select("host", "tokens", "last_iter", "crawl_delay")
            .unionByName(new_hosts),
            f"host_state_{iteration}",
            run_id,
            iteration,
        )
        if stats is not None:
            stats["n_hosts"] = n

    writers = [write_pending, write_host_state]
    if use_bloom:
        writers.append(write_prefilter)
    _run_writers(writers)
    cat.flush_metrics()
    new_rows.unpersist()
    scheduled.unpersist()
    return n_scheduled


def run_crawl(
    spark: SparkSession,
    docs: DataFrame,
    seeds: DataFrame,
    robots: DataFrame,
    ckpt_root: str,
    n_docs: int,
    iterations: int = 3,
    run_id: str = "run1",
    resume_from: int | None = None,
    salts: int | None = 16,
    use_bloom: bool = True,
    bloom_buckets: int | None = 64,
    bloom_m_bits: int | None = BLOOM_M_BITS,
    compact_every: int = 0,
    prune_history: bool = False,
    pol: Politeness = DEFAULT_POLITENESS,
    pending_hbuckets: int | None = None,
    robots_mode: str = "any_disallow",
    prefilter_kind: str = "bloom",
    cuckoo_nb: int | None = None,
) -> dict[int, int]:
    """Run (or resume) the crawl; returns {iteration: n_scheduled}.

    ``resume_from=k`` skips init and iterations <= k, reading state as of k —
    byte-identical continuation (F6 resume test; the seen delta write is
    idempotent, so a re-run of iteration k+1 overwrites exactly its own
    epoch). ``compact_every=K`` collapses seen epochs every K iterations.
    ``prune_history=True`` additionally drops the per-iteration snapshots
    compaction made unreachable (prune_checkpoint_history) — the long-crawl
    retention mode: the checkpoint root then holds O(1) snapshot tables per
    state kind instead of one per iteration forever. Off by default because
    it also drops the scheduled_N output log through the watermark.

    ``bloom_buckets=None`` / ``bloom_m_bits=None`` derive both from the
    ``n_docs`` universe estimate (scaling.derive_bloom_*): at the 10^10-URL
    north_rule scale that lands on 4096 buckets x 2^25-bit bitmaps; the
    sandbox sizes clamp down to the tested constants. The per-bucket
    filter SIZE additionally rescales at each compaction point from the
    actual seen count (_maybe_grow_prefilter: rebuild + meta re-pin riding
    the compaction watermark) — the seen set is URLs and outgrows any
    start-time estimate in a long crawl; on resume, ``None`` size params
    adopt the checkpoint's stored (possibly grown) values. The BUCKET
    count never changes (it is baked into the seen table layout). ``pending_hbuckets``
    (the pending snapshots' host-hash partition count) likewise derives from
    ``n_docs`` by default — 8192 dirs at 10^10, the 16 sandbox constant
    below ~10^7. ``salts=None`` derives the top-k salt factor the same way
    (scaling.derive_salts under a worst-case one-host-holds-half skew
    assumption: 4096-way at 10^10, the reference's 80-way analogue); the
    schedule OUTPUT is salt-count invariant (tests pin it), so the tested
    16 stays the explicit default.

    ``robots_mode``: 'any_disallow' (the reference-parity default: a
    candidate dies if ANY disallow rule matches; allow rows ignored) or
    'longest_match' (Google robots spec precedence incl. wildcards —
    operators/frontier.robots_filter longest_match=True). Both modes are
    oracle-parity-tested end-to-end (tests/test_crawl_parity.py).

    ``prefilter_kind`` (active when ``use_bloom=True``): 'bloom' (default —
    OR-mergeable bitmaps, order-independent snapshot bytes) or 'cuckoo'
    (operators/cuckoo.py: ~10x lower fp routes more steady-state candidates
    around the anti-join shuffle, plus deletability, at ~2x the filter
    bytes). Both are exact-safe prefilters over the same outer-bucket
    cogroup layout — scheduled batches and the seen set are identical
    across kinds (tests pin it). The kind is pinned in the run meta;
    resume refuses the other kind (its incremental snapshots are the state
    being extended). ``cuckoo_nb=None`` derives the per-bucket cuckoo size
    from ``n_docs`` like the bloom sizes.
    """
    from url_pattern_algorithm_spark.operators.cuckoo import derive_cuckoo_nb
    from url_pattern_algorithm_spark.scaling import (
        derive_bloom_buckets,
        derive_bloom_m_bits,
        derive_pending_hbuckets,
        derive_salts,
    )

    if robots_mode not in ("any_disallow", "longest_match"):
        raise ValueError(f"unknown robots_mode: {robots_mode!r}")
    if prefilter_kind not in ("bloom", "cuckoo"):
        raise ValueError(f"unknown prefilter_kind: {prefilter_kind!r}")
    if salts is None:
        # worst-case skew assumption: one host could hold half the universe
        # (the synthetic hot host holds ~50%; salting is cheap to oversize —
        # schedule results are salt-count-invariant, only partitioning moves)
        salts = derive_salts(n_docs // 2)
    cat = Catalog(spark, ckpt_root)
    # a resume adopts the checkpoint's stored prefilter sizes for any the
    # caller left None: compaction-time rescaling (_maybe_grow_prefilter)
    # may have grown them past the n_docs derivation, and re-deriving here
    # would then refuse a perfectly valid resume
    stored_meta: dict = {}
    if resume_from is not None:
        import os

        if os.path.exists(os.path.join(cat.root, "_run_meta.json")):
            stored_meta = _read_crawl_meta(cat)
    if bloom_buckets is None:
        bloom_buckets = stored_meta.get("bloom_buckets") or \
            derive_bloom_buckets(n_docs)
    if bloom_m_bits is None:
        bloom_m_bits = stored_meta.get("bloom_m_bits") or \
            derive_bloom_m_bits(n_docs, bloom_buckets)
    if pending_hbuckets is None:
        pending_hbuckets = derive_pending_hbuckets(n_docs)
    if cuckoo_nb is None:
        cuckoo_nb = stored_meta.get("cuckoo_nb") or \
            derive_cuckoo_nb(n_docs, bloom_buckets)
    # accept raw robots.txt bodies directly: a (host, robots_txt) frame is
    # parsed into the structured rule table (sources/robots) — same rows a
    # caller would get by pre-parsing, so parity/oracles are unaffected
    parsed_robots = None
    if "robots_txt" in robots.columns:
        from url_pattern_algorithm_spark.sources.robots import (
            robots_rules_from_bodies,
        )

        # persist for the run: the parsed table is immutable and read by
        # the gate probe, host_crawl_delays, init_state, and every
        # iteration's robots_filter — unpersisted, the mapInPandas body
        # parse would re-execute 2+ times per iteration. Released in the
        # finally below — repeated run_crawl calls in one session must not
        # accumulate run-scoped caches (r4 ADVICE).
        parsed_robots = robots_rules_from_bodies(robots).persist()
        robots = parsed_robots
    try:
        return _run_crawl_inner(
            spark, docs, seeds, robots, cat, n_docs, iterations, run_id,
            resume_from, salts, use_bloom, bloom_buckets, bloom_m_bits,
            compact_every, prune_history, pol, pending_hbuckets, robots_mode,
            prefilter_kind, cuckoo_nb,
        )
    finally:
        if parsed_robots is not None:
            parsed_robots.unpersist()


def _run_crawl_inner(
    spark: SparkSession,
    docs: DataFrame,
    seeds: DataFrame,
    robots: DataFrame,
    cat: Catalog,
    n_docs: int,
    iterations: int,
    run_id: str,
    resume_from: int | None,
    salts: int,
    use_bloom: bool,
    bloom_buckets: int,
    bloom_m_bits: int,
    compact_every: int,
    prune_history: bool,
    pol: Politeness,
    pending_hbuckets: int,
    robots_mode: str = "any_disallow",
    prefilter_kind: str = "bloom",
    cuckoo_nb: int = 1 << 14,
) -> dict[int, int]:
    if "doc_index" not in docs.columns:
        docs = docs.withColumn(
            "doc_index",
            F.col("doc_id").substr(F.lit(4), F.lit(10)).cast("long"),
        )
    counts: dict[int, int] = {}
    start = 1
    # one bounded probe per RUN sizes the robots broadcast gate for every
    # iteration; the politeness gate is sized by threading each iteration's
    # host_state write count into the next (est_hosts). A resume's first
    # iteration has no threaded count and probes once.
    est_robots = robots.limit(BROADCAST_MAX_ROWS + 1).count()
    est_hosts: int | None = None
    # per-host Crawl-delay directives (None when the robots table has no
    # crawl_delay column — every host then refills at the 1.0 default)
    delays = host_crawl_delays(robots)
    if resume_from is None:
        # fresh run: wipe EVERYTHING a crawl writes — the append-style
        # tables (seen, blooms, compaction watermark, metrics) would
        # silently merge with a prior run's state, and a longer prior
        # run's per-iteration snapshots (pending_N/host_state_N/
        # scheduled_N for N past this run's end) would otherwise survive
        # and corrupt a later out-of-range resume
        for name in cat.table_names():
            # a crash inside Catalog.rewrite's swap window leaves the live
            # data under <base>__compact_old; wipe by BASE name so a prior
            # run's seen table can't be resurrected by _recover mid-run
            # (likewise stale writer markers / rewrite locks)
            base = _base_table_name(name)
            if (base in ("seen", "_compaction", "_metrics")
                    or base.startswith(("bloom_", "cuckoo_", "pending_",
                                        "host_state_", "scheduled_"))):
                cat.drop(name)
        _write_run_meta(cat, bloom_buckets, bloom_m_bits,
                        robots_mode=robots_mode,
                        prefilter_kind=prefilter_kind, cuckoo_nb=cuckoo_nb)
        init_stats: dict = {}
        init_state(spark, seeds, robots, cat, run_id, pol,
                   use_bloom=use_bloom, bloom_buckets=bloom_buckets,
                   bloom_m_bits=bloom_m_bits, est_robots=est_robots,
                   stats=init_stats, hbuckets=pending_hbuckets,
                   delays=delays, robots_mode=robots_mode,
                   prefilter_kind=prefilter_kind, cuckoo_nb=cuckoo_nb)
        est_hosts = init_stats.get("n_hosts")
    else:
        _check_run_meta(cat, bloom_buckets, bloom_m_bits, resume_from,
                        use_bloom=use_bloom, robots_mode=robots_mode,
                        prefilter_kind=prefilter_kind, cuckoo_nb=cuckoo_nb)
        if use_bloom:
            _heal_prefilter_size_mismatch(cat, resume_from, prefilter_kind,
                                          bloom_m_bits, cuckoo_nb)
        wm = compaction_watermark(cat)
        if resume_from < wm:
            raise ValueError(
                f"resume_from={resume_from} predates the compaction "
                f"watermark {wm}: compacted iterations cannot be re-run "
                f"(Iceberg snapshot-expiry semantics); resume from >= {wm}"
            )
        start = resume_from + 1
    for it in range(start, iterations + 1):
        it_stats: dict = {}
        counts[it] = run_iteration(
            spark, docs, robots, cat, run_id, it, n_docs, salts, use_bloom,
            bloom_buckets=bloom_buckets, bloom_m_bits=bloom_m_bits, pol=pol,
            est_hosts=est_hosts, est_robots=est_robots, stats=it_stats,
            hbuckets=pending_hbuckets, delays=delays, robots_mode=robots_mode,
            prefilter_kind=prefilter_kind, cuckoo_nb=cuckoo_nb,
        )
        est_hosts = it_stats.get("n_hosts")
        _write_run_meta(cat, bloom_buckets, bloom_m_bits, it,
                        robots_mode=robots_mode,
                        prefilter_kind=prefilter_kind, cuckoo_nb=cuckoo_nb)
        if compact_every and it % compact_every == 0:
            compact_seen(cat, it, bloom_buckets)
            if prune_history:
                prune_checkpoint_history(cat, it)
            if use_bloom:
                grown_m, grown_nb = _maybe_grow_prefilter(
                    cat, it, bloom_buckets, bloom_m_bits, cuckoo_nb,
                    prefilter_kind, run_id,
                )
                if (grown_m, grown_nb) != (bloom_m_bits, cuckoo_nb):
                    bloom_m_bits, cuckoo_nb = grown_m, grown_nb
                    # re-pin immediately: later resumes (and the stale-
                    # format check) must see the grown sizes
                    _write_run_meta(cat, bloom_buckets, bloom_m_bits, it,
                                    robots_mode=robots_mode,
                                    prefilter_kind=prefilter_kind,
                                    cuckoo_nb=cuckoo_nb)
    return counts
