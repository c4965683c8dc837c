"""F6 end-to-end crawl parity: Spark pipeline vs pure-python oracle.

Asserts, for a fixed seed list + politeness budget over the deterministic
synthetic docs:
- exact scheduled order per iteration (priority DESC, url_hash ASC);
- identical final URL-seen set;
- resume-from-checkpoint reproduces the uninterrupted run exactly.
"""

import pytest

from url_pattern_algorithm_spark.kernel.crawl_oracle import run_oracle_crawl
from url_pattern_algorithm_spark.plans.crawl import read_seen, run_crawl
from url_pattern_algorithm_spark.sources.catalog import Catalog
from url_pattern_algorithm_spark.sources.synthetic import (
    docs_df,
    robots_df,
    robots_rules,
    seeds_df,
)

N_DOCS = 400
N_HOSTS = 6
ITERS = 3


@pytest.fixture(scope="module")
def crawl_run(spark, tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    docs = docs_df(spark, N_DOCS, N_HOSTS, partitions=4)
    seeds = seeds_df(spark, N_HOSTS)
    robots = robots_df(spark, N_HOSTS)
    counts = run_crawl(
        spark, docs, seeds, robots, ckpt, N_DOCS, iterations=ITERS
    )
    seeds_local = [(r["url"], r["priority"]) for r in seeds.collect()]
    oracle = run_oracle_crawl(seeds_local, robots_rules(N_HOSTS), N_DOCS,
                              N_HOSTS, ITERS)
    return spark, ckpt, counts, oracle, docs, seeds, robots


def _spark_scheduled(spark, ckpt, it):
    cat = Catalog(spark, ckpt)
    rows = (
        cat.read(f"scheduled_{it}")
        .orderBy("host", "sched_rank")
        .select("url", "url_canon", "url_hash", "host", "sched_rank")
        .collect()
    )
    return [(r["url"], r["url_canon"], r["url_hash"], r["host"], r["sched_rank"])
            for r in rows]


def test_scheduled_order_matches_oracle(crawl_run):
    spark, ckpt, counts, oracle, *_ = crawl_run
    for it in range(1, ITERS + 1):
        got = _spark_scheduled(spark, ckpt, it)
        want = [(r[0], r[1], r[2], r[3], r[6]) for r in oracle.scheduled[it]]
        assert got == want, f"iteration {it} mismatch"
        assert counts[it] == len(want)
        assert counts[it] > 0


def test_seen_set_matches_oracle(crawl_run):
    spark, ckpt, _, oracle, *_ = crawl_run
    cat = Catalog(spark, ckpt)
    got = {
        (r["url_hash"], r["first_iter"])
        for r in read_seen(cat, ITERS).select("url_hash", "first_iter").collect()
    }
    want = set(oracle.seen.items())
    assert got == want
    # append-only layout: one epoch partition dir per iteration, url rows
    # written exactly once (delta writes, not snapshot rewrites)
    assert cat.read("seen").count() == len(want)


def test_seen_as_of_prunes_future_iterations(crawl_run):
    spark, ckpt, _, oracle, *_ = crawl_run
    cat = Catalog(spark, ckpt)
    upto1 = {r["url_hash"] for r in read_seen(cat, 1).collect()}
    want1 = {h for h, it in oracle.seen.items() if it <= 1}
    assert upto1 == want1


def test_compaction_preserves_seen_set(crawl_run, tmp_path):
    spark, ckpt, counts, oracle, docs, seeds, robots = crawl_run
    ckpt2 = str(tmp_path / "compacted")
    counts2 = run_crawl(
        spark, docs, seeds, robots, ckpt2, N_DOCS, iterations=ITERS,
        compact_every=2,
    )
    assert counts2 == counts
    cat = Catalog(spark, ckpt2)
    got = {
        (r["url_hash"], r["first_iter"])
        for r in read_seen(cat, ITERS).select("url_hash", "first_iter").collect()
    }
    assert got == set(oracle.seen.items())
    # epochs 0..2 collapsed into epoch=-1; epoch=3 still a delta
    epochs = {r["epoch"] for r in cat.read("seen").select("epoch").distinct().collect()}
    assert epochs == {-1, ITERS}
    # scheduled batches identical to the uncompacted run
    for it in range(1, ITERS + 1):
        assert _spark_scheduled(spark, ckpt2, it) == _spark_scheduled(
            spark, ckpt, it
        )


def test_resume_from_checkpoint(crawl_run, tmp_path):
    spark, ckpt, counts, oracle, docs, seeds, robots = crawl_run
    # resume from snapshot 2 and re-run iteration 3; scheduled_3 must be
    # byte-identical to the uninterrupted run
    before = _spark_scheduled(spark, ckpt, ITERS)
    counts2 = run_crawl(
        spark, docs, seeds, robots, ckpt, N_DOCS,
        iterations=ITERS, resume_from=ITERS - 1, run_id="resumed",
    )
    after = _spark_scheduled(spark, ckpt, ITERS)
    assert after == before
    assert counts2[ITERS] == counts[ITERS]


def test_bloom_off_equivalence(crawl_run, tmp_path):
    # the Bloom prefilter is an optimization: disabling it must not change
    # any scheduled batch
    spark, ckpt, _, oracle, docs, seeds, robots = crawl_run
    ckpt2 = str(tmp_path / "nobloom")
    run_crawl(spark, docs, seeds, robots, ckpt2, N_DOCS,
              iterations=ITERS, use_bloom=False)
    for it in range(1, ITERS + 1):
        assert _spark_scheduled(spark, ckpt2, it) == _spark_scheduled(
            spark, ckpt, it
        )


def test_lineage_metrics(crawl_run):
    spark, ckpt, counts, *_ = crawl_run
    cat = Catalog(spark, ckpt)
    m = {
        (r["table"], r["iteration"]): r["rows"]
        for r in cat.read("_metrics").filter("run_id = 'run1'").collect()
    }
    for it in range(1, ITERS + 1):
        assert m[(f"scheduled_{it}", it)] == counts[it]
    # per-partition lineage columns present on checkpoints
    cols = set(cat.read("scheduled_1").columns)
    assert {"run_id", "iteration", "partition_id"} <= cols


def test_resume_before_compaction_watermark_refused(crawl_run, tmp_path):
    # compaction expires earlier resume points (Iceberg snapshot expiry);
    # a stale resume must be refused, a resume at/after the watermark works
    import pytest as _pytest

    spark, ckpt, counts, oracle, docs, seeds, robots = crawl_run
    ckpt2 = str(tmp_path / "wm")
    run_crawl(spark, docs, seeds, robots, ckpt2, N_DOCS, iterations=ITERS,
              compact_every=2)
    with _pytest.raises(ValueError, match="compaction watermark"):
        run_crawl(spark, docs, seeds, robots, ckpt2, N_DOCS,
                  iterations=ITERS, resume_from=1, run_id="stale")
    counts2 = run_crawl(spark, docs, seeds, robots, ckpt2, N_DOCS,
                        iterations=ITERS, resume_from=2, run_id="ok")
    assert counts2[ITERS] == counts[ITERS]


def test_fresh_run_wipes_stale_append_state(crawl_run, tmp_path):
    # a fresh run (resume_from=None) into a previously-used checkpoint root
    # must NOT inherit the prior run's seen/bloom/compaction state
    spark, ckpt, counts, oracle, docs, seeds, robots = crawl_run
    dirty = str(tmp_path / "dirty")
    run_crawl(spark, docs, seeds, robots, dirty, N_DOCS, iterations=ITERS,
              compact_every=2)
    n_clean = read_seen(Catalog(spark, ckpt), ITERS).count()
    # fresh re-run into the SAME dir: identical state as a clean dir
    counts2 = run_crawl(spark, docs, seeds, robots, dirty, N_DOCS,
                        iterations=ITERS, run_id="fresh2")
    assert counts2 == counts
    cat = Catalog(spark, dirty)
    assert read_seen(cat, ITERS).count() == n_clean
    # stale compaction watermark gone with the wipe
    for it in range(1, ITERS + 1):
        assert _spark_scheduled(spark, dirty, it) == _spark_scheduled(
            spark, ckpt, it
        )


def test_resume_with_mismatched_bloom_params_refused(crawl_run, tmp_path):
    import pytest as _pytest

    spark, ckpt, counts, oracle, docs, seeds, robots = crawl_run
    root = str(tmp_path / "meta")
    run_crawl(spark, docs, seeds, robots, root, N_DOCS, iterations=2,
              bloom_buckets=16, bloom_m_bits=1 << 14)
    with _pytest.raises(ValueError, match="does not match the checkpoint"):
        run_crawl(spark, docs, seeds, robots, root, N_DOCS, iterations=3,
                  resume_from=2, bloom_buckets=32, bloom_m_bits=1 << 14)
    counts2 = run_crawl(spark, docs, seeds, robots, root, N_DOCS,
                        iterations=3, resume_from=2, bloom_buckets=16,
                        bloom_m_bits=1 << 14)
    assert counts2[3] == counts[3]


def test_resume_beyond_fresh_runs_end_refused(crawl_run, tmp_path):
    # a reused checkpoint root can hold pending_N/host_state_N snapshots
    # from a LONGER previous run; resuming the (shorter) fresh run past its
    # own last iteration must be refused, not silently mix the two runs'
    # states (r2 ADVICE) — and the fresh-run wipe now drops the stale
    # snapshots too, so the guard is belt-and-braces
    import pytest as _pytest

    spark, ckpt, counts, oracle, docs, seeds, robots = crawl_run
    root = str(tmp_path / "mix")
    run_crawl(spark, docs, seeds, robots, root, N_DOCS, iterations=ITERS)
    # shorter fresh run into the same root
    run_crawl(spark, docs, seeds, robots, root, N_DOCS, iterations=2,
              run_id="short")
    cat = Catalog(spark, root)
    assert not cat.exists(f"pending_{ITERS}")  # stale snapshots wiped
    with _pytest.raises(ValueError, match="beyond this run's last"):
        run_crawl(spark, docs, seeds, robots, root, N_DOCS,
                  iterations=ITERS + 1, resume_from=ITERS, run_id="bad")
    # resuming AT the fresh run's end is fine
    counts2 = run_crawl(spark, docs, seeds, robots, root, N_DOCS,
                        iterations=ITERS, resume_from=2, run_id="ok")
    assert counts2[ITERS] == counts[ITERS]


def test_fresh_run_wipes_orphaned_compact_old(crawl_run, tmp_path):
    # a crash inside Catalog.rewrite's swap window leaves the live seen
    # table only under seen__compact_old; a fresh run into that root must
    # wipe it too, or Catalog._recover would resurrect the PRIOR run's
    # seen set as live state mid-run (r3 review finding)
    import os
    import shutil

    spark, ckpt, counts, oracle, docs, seeds, robots = crawl_run
    dirty = str(tmp_path / "dirty_swap")
    run_crawl(spark, docs, seeds, robots, dirty, N_DOCS, iterations=ITERS)
    # simulate the mid-swap crash: live table renamed aside, final missing
    os.rename(os.path.join(dirty, "seen"),
              os.path.join(dirty, "seen__compact_old"))
    shutil.rmtree(os.path.join(dirty, "scheduled_1"))
    counts2 = run_crawl(spark, docs, seeds, robots, dirty, N_DOCS,
                        iterations=ITERS, run_id="fresh3")
    assert counts2 == counts
    assert not os.path.isdir(os.path.join(dirty, "seen__compact_old"))
    cat = Catalog(spark, dirty)
    assert read_seen(cat, ITERS).count() == read_seen(
        Catalog(spark, ckpt), ITERS).count()


def test_sequential_writes_equivalence(crawl_run, tmp_path, monkeypatch):
    # SPARK_GRAFT_SEQ_WRITES flips _run_writers from concurrent driver jobs
    # to sequential submission; it must not change any state table
    spark, ckpt, _, oracle, docs, seeds, robots = crawl_run
    ckpt2 = str(tmp_path / "seqwrites")
    monkeypatch.setenv("SPARK_GRAFT_SEQ_WRITES", "1")
    run_crawl(spark, docs, seeds, robots, ckpt2, N_DOCS, iterations=ITERS)
    for it in range(1, ITERS + 1):
        assert _spark_scheduled(spark, ckpt2, it) == _spark_scheduled(
            spark, ckpt, it
        )
    cat, cat2 = Catalog(spark, ckpt), Catalog(spark, ckpt2)
    # semantic columns only: the shared ckpt's lineage stamps (run_id etc.)
    # may have been rewritten by test_resume_from_checkpoint
    for reader in (
        lambda c: read_seen(c, ITERS).select("url_hash", "first_iter"),
        lambda c: c.read(f"host_state_{ITERS}").select(
            "host", "tokens", "last_iter", "crawl_delay"),
        lambda c: c.read(f"pending_{ITERS}").select(
            "url", "url_canon", "url_hash", "host", "priority",
            "discovered_iter"),
    ):
        a = {tuple(r) for r in reader(cat).collect()}
        b = {tuple(r) for r in reader(cat2).collect()}
        assert a == b


def test_resume_after_partial_iteration_crash(crawl_run, tmp_path):
    # with concurrent state writes, a mid-iteration crash can leave ANY
    # subset of the iteration's tables written; _run_meta's last_iteration
    # is bumped only after all of them complete, so the documented recovery
    # (resume from the last recorded iteration) must rewrite the partial
    # iteration and converge to the uninterrupted run's state
    import json
    import os
    import shutil

    spark, ckpt, counts, oracle, docs, seeds, robots = crawl_run
    root = str(tmp_path / "crashed")
    run_crawl(spark, docs, seeds, robots, root, N_DOCS, iterations=ITERS)
    # simulate the crash inside iteration ITERS: the seen delta + pending
    # snapshot landed, host_state/bloom/scheduled did not, meta still at
    # ITERS-1 (it is only written after the writer pool joins)
    for name in (f"host_state_{ITERS}", f"bloom_{ITERS}",
                 f"scheduled_{ITERS}"):
        shutil.rmtree(os.path.join(root, name))
    meta_path = os.path.join(root, "_run_meta.json")
    meta = json.load(open(meta_path))
    meta["last_iteration"] = ITERS - 1
    json.dump(meta, open(meta_path, "w"))

    counts2 = run_crawl(spark, docs, seeds, robots, root, N_DOCS,
                        iterations=ITERS, resume_from=ITERS - 1,
                        run_id="recovered")
    assert counts2[ITERS] == counts[ITERS]
    assert _spark_scheduled(spark, root, ITERS) == _spark_scheduled(
        spark, ckpt, ITERS
    )
    cat = Catalog(spark, root)
    got = {
        (r["url_hash"], r["first_iter"])
        for r in read_seen(cat, ITERS).select("url_hash", "first_iter").collect()
    }
    assert got == set(oracle.seen.items())
    # the partial epoch was overwritten, not doubled
    assert cat.read("seen").count() == len(got)


def test_prune_history_bounds_snapshots_and_resumes(crawl_run, tmp_path):
    # long-crawl retention (r3 verdict item 3): with prune_history=True a
    # compacted run's checkpoint root holds O(1) snapshot tables per state
    # kind, and resume-from-watermark still equals the uninterrupted run
    spark, ckpt, counts, oracle, docs, seeds, robots = crawl_run
    LONG = 6
    full = str(tmp_path / "full")
    run_crawl(spark, docs, seeds, robots, full, N_DOCS, iterations=LONG)

    pruned = str(tmp_path / "pruned")
    run_crawl(spark, docs, seeds, robots, pruned, N_DOCS, iterations=4,
              compact_every=2, prune_history=True)
    cat = Catalog(spark, pruned)
    names = cat.table_names()
    for kind in ("bloom_", "pending_", "host_state_"):
        kept = [n for n in names if n.startswith(kind)]
        assert kept == [f"{kind}4"], (kind, kept)
    assert not [n for n in names if n.startswith("scheduled_")]

    # resume from the watermark: iterations 5-6 byte-identical to the
    # uninterrupted run's
    run_crawl(spark, docs, seeds, robots, pruned, N_DOCS, iterations=LONG,
              resume_from=4, run_id="resumed")
    for it in (5, 6):
        assert _spark_scheduled(spark, pruned, it) == _spark_scheduled(
            spark, full, it
        )


def test_crawl_parity_with_per_host_crawl_delays(crawl_run, tmp_path):
    # r3 verdict item 7: the robots Crawl-delay directive flows into
    # host_state (no more constant 1.0) and the Spark loop still matches
    # the oracle exactly under NON-UNIFORM per-host delays
    spark, *_ = crawl_run
    docs = docs_df(spark, N_DOCS, N_HOSTS, partitions=4)
    seeds = seeds_df(spark, N_HOSTS)
    robots = robots_df(spark, N_HOSTS, with_delays=True)
    ckpt = str(tmp_path / "delays")
    counts = run_crawl(spark, docs, seeds, robots, ckpt, N_DOCS,
                       iterations=ITERS)
    seeds_local = [(r["url"], r["priority"]) for r in seeds.collect()]
    oracle = run_oracle_crawl(seeds_local,
                              robots_rules(N_HOSTS, with_delays=True),
                              N_DOCS, N_HOSTS, ITERS)
    uniform = run_oracle_crawl(seeds_local, robots_rules(N_HOSTS),
                               N_DOCS, N_HOSTS, ITERS)
    assert oracle.scheduled != uniform.scheduled  # the delays actually bite
    for it in range(1, ITERS + 1):
        got = _spark_scheduled(spark, ckpt, it)
        want = [(r[0], r[1], r[2], r[3], r[6]) for r in oracle.scheduled[it]]
        assert got == want, f"iteration {it} mismatch under crawl delays"
        assert counts[it] == len(want)
    # the stored host_state carries the parsed delays
    cat = Catalog(spark, ckpt)
    hs = {r["host"]: r["crawl_delay"]
          for r in cat.read(f"host_state_{ITERS}").collect()}
    assert any(d != 1.0 for d in hs.values())


def test_crawl_parity_robots_longest_match_mode(crawl_run, tmp_path):
    # r4 verdict item 5: the Google-spec longest-match mode drives an
    # END-TO-END crawl (not just the standalone operator oracle). Rule set
    # adds Allow /private/alpha — a longer, more specific rule that
    # re-admits one /private subtree under longest-match precedence but is
    # ignored by the any-disallow parity mode, so the modes provably
    # diverge on the same corpus; both must match the oracle exactly.
    spark, *_ = crawl_run
    docs = docs_df(spark, N_DOCS, N_HOSTS, partitions=4)
    seeds = seeds_df(spark, N_HOSTS)
    robots = robots_df(spark, N_HOSTS, with_allow=True)
    seeds_local = [(r["url"], r["priority"]) for r in seeds.collect()]
    rules = robots_rules(N_HOSTS, with_allow=True)

    oracle_lm = run_oracle_crawl(seeds_local, rules, N_DOCS, N_HOSTS, ITERS,
                                 robots_mode="longest_match")
    oracle_any = run_oracle_crawl(seeds_local, rules, N_DOCS, N_HOSTS, ITERS,
                                  robots_mode="any_disallow")
    # the allow rule actually bites: longest-match admits /private/alpha
    assert set(oracle_lm.seen) != set(oracle_any.seen)
    assert any("/private/alpha" in u for u, *_ in oracle_lm.pending.values())

    for mode, oracle in (("longest_match", oracle_lm),
                         ("any_disallow", oracle_any)):
        ckpt = str(tmp_path / f"robots_{mode}")
        counts = run_crawl(spark, docs, seeds, robots, ckpt, N_DOCS,
                           iterations=ITERS, robots_mode=mode)
        for it in range(1, ITERS + 1):
            got = _spark_scheduled(spark, ckpt, it)
            want = [(r[0], r[1], r[2], r[3], r[6]) for r in oracle.scheduled[it]]
            assert got == want, f"{mode} iteration {it} mismatch"
            assert counts[it] == len(want)
        cat = Catalog(spark, ckpt)
        got_seen = {
            (r["url_hash"], r["first_iter"])
            for r in read_seen(cat, ITERS).select(
                "url_hash", "first_iter").collect()
        }
        assert got_seen == set(oracle.seen.items()), f"{mode} seen mismatch"


def test_run_crawl_rejects_unknown_robots_mode(crawl_run, tmp_path):
    spark, _, _, _, docs, seeds, robots = crawl_run
    with pytest.raises(ValueError, match="unknown robots_mode"):
        run_crawl(spark, docs, seeds, robots, str(tmp_path / "x"), N_DOCS,
                  iterations=1, robots_mode="strictest")


def test_resume_with_mismatched_robots_mode_refused(crawl_run, tmp_path):
    # the stored seen/pending state was admitted under one robots policy;
    # resuming under the other would silently mix two filtering policies in
    # one crawl (a URL the old mode blocked is absent from seen, so the new
    # mode would re-admit it mid-history). The run meta pins the mode.
    spark, ckpt, counts, oracle, docs, seeds, robots = crawl_run
    root = str(tmp_path / "mode")
    run_crawl(spark, docs, seeds, robots, root, N_DOCS, iterations=2,
              robots_mode="longest_match")
    with pytest.raises(ValueError, match="robots_mode"):
        run_crawl(spark, docs, seeds, robots, root, N_DOCS, iterations=3,
                  resume_from=2, robots_mode="any_disallow")
    # matching mode resumes fine
    counts2 = run_crawl(spark, docs, seeds, robots, root, N_DOCS,
                        iterations=3, resume_from=2,
                        robots_mode="longest_match")
    assert 3 in counts2


def test_resume_refuses_stale_bloom_format(crawl_run, tmp_path):
    # r5 review finding: the Bloom position remix changes what stored
    # bitmaps MEAN — resuming pre-remix bitmaps with remixed probes would
    # silently produce false negatives past the seen anti-join. The run
    # meta stamps a bloom_format; a mismatched resume must refuse with
    # use_bloom=True and drop the stale bitmaps with use_bloom=False.
    import json
    import os

    spark, ckpt, counts, oracle, docs, seeds, robots = crawl_run
    root = str(tmp_path / "fmt")
    run_crawl(spark, docs, seeds, robots, root, N_DOCS, iterations=2)
    meta_path = os.path.join(root, "_run_meta.json")
    meta = json.load(open(meta_path))
    assert meta["bloom_format"] == 2  # r5 remix format stamped
    meta["bloom_format"] = 1
    json.dump(meta, open(meta_path, "w"))

    with pytest.raises(ValueError, match="bloom bitmaps use position format"):
        run_crawl(spark, docs, seeds, robots, root, N_DOCS, iterations=3,
                  resume_from=2, run_id="stale_fmt")
    # bloom-off resume proceeds, drops the stale-format bitmaps, and the
    # bloomless continuation still matches the oracle exactly
    counts2 = run_crawl(spark, docs, seeds, robots, root, N_DOCS,
                        iterations=3, resume_from=2, run_id="nobloom",
                        use_bloom=False)
    assert not any(n.startswith("bloom_")
                   for n in Catalog(spark, root).table_names())
    got = _spark_scheduled(spark, root, 3)
    want = [(r[0], r[1], r[2], r[3], r[6]) for r in oracle.scheduled[3]]
    assert got == want and counts2[3] == len(want)


def test_cuckoo_prefilter_equivalence(crawl_run, tmp_path):
    # prefilter_kind='cuckoo' swaps the seen prefilter implementation only
    # (operators/cuckoo.py); like the Bloom it is exact-safe, so scheduled
    # batches AND the final seen set must be identical to the default run,
    # and the checkpoint must hold cuckoo_N snapshots instead of bloom_N.
    spark, ckpt, counts, oracle, docs, seeds, robots = crawl_run
    root = str(tmp_path / "cuckoo")
    counts2 = run_crawl(spark, docs, seeds, robots, root, N_DOCS,
                        iterations=ITERS, prefilter_kind="cuckoo")
    assert counts2 == counts
    for it in range(1, ITERS + 1):
        assert _spark_scheduled(spark, root, it) == _spark_scheduled(
            spark, ckpt, it
        )
    cat = Catalog(spark, root)
    got = {
        (r["url_hash"], r["first_iter"])
        for r in read_seen(cat, ITERS).select("url_hash", "first_iter").collect()
    }
    assert got == set(oracle.seen.items())
    names = set(cat.table_names())
    assert any(n.startswith("cuckoo_") for n in names)
    assert not any(n.startswith("bloom_") for n in names)


def test_cuckoo_resume_and_kind_pinned(crawl_run, tmp_path):
    # the run meta pins prefilter_kind: the stored cuckoo_N snapshots are
    # the incremental state a resume extends, so resuming with the bloom
    # kind must refuse; resuming with the matching kind reproduces the
    # uninterrupted run exactly.
    spark, ckpt, counts, oracle, docs, seeds, robots = crawl_run
    root = str(tmp_path / "cuckoo_resume")
    run_crawl(spark, docs, seeds, robots, root, N_DOCS, iterations=ITERS,
              prefilter_kind="cuckoo")
    with pytest.raises(ValueError, match="prefilter_kind"):
        run_crawl(spark, docs, seeds, robots, root, N_DOCS, iterations=ITERS,
                  resume_from=ITERS - 1, run_id="wrongkind")
    before = _spark_scheduled(spark, root, ITERS)
    counts2 = run_crawl(spark, docs, seeds, robots, root, N_DOCS,
                        iterations=ITERS, resume_from=ITERS - 1,
                        prefilter_kind="cuckoo", run_id="resumed")
    assert _spark_scheduled(spark, root, ITERS) == before
    assert counts2[ITERS] == counts[ITERS]
    # prefilter-off resume remains allowed (exact anti-join semantics are
    # kind-independent) and still matches the oracle
    counts3 = run_crawl(spark, docs, seeds, robots, root, N_DOCS,
                        iterations=ITERS, resume_from=ITERS - 1,
                        use_bloom=False, run_id="nofilter")
    assert _spark_scheduled(spark, root, ITERS) == before
    assert counts3[ITERS] == counts[ITERS]


def test_prefilter_rescale_at_compaction(crawl_run, tmp_path):
    # compaction-time rescale (_maybe_grow_prefilter): a deliberately tiny
    # initial prefilter must grow to the derived-from-seen floor at the
    # first compaction, the run meta re-pins the grown size, schedules
    # stay byte-identical (the prefilter is exact-safe at ANY size), and
    # a size-agnostic resume (None params) adopts the grown size instead
    # of refusing on a rederived-from-n_docs mismatch.
    import json
    import os

    spark, ckpt, counts, oracle, docs, seeds, robots = crawl_run
    for kind, param, key in (
        ("bloom", {"bloom_m_bits": 1 << 14}, "bloom_m_bits"),
        ("cuckoo", {"cuckoo_nb": 64}, "cuckoo_nb"),
    ):
        root = str(tmp_path / f"grow_{kind}")
        counts2 = run_crawl(spark, docs, seeds, robots, root, N_DOCS,
                            iterations=ITERS, compact_every=2,
                            prefilter_kind=kind, **param)
        assert counts2 == counts, kind
        for it in range(1, ITERS + 1):
            assert _spark_scheduled(spark, root, it) == _spark_scheduled(
                spark, ckpt, it
            ), (kind, it)
        meta = json.load(open(os.path.join(root, "_run_meta.json")))
        assert meta[key] > list(param.values())[0], kind
        cat = Catalog(spark, root)
        if kind == "cuckoo":
            sizes = {r["nb"] for r in cat.read("cuckoo_2").select("nb").collect()}
        else:
            sizes = {r["m_bits"]
                     for r in cat.read("bloom_2").select("m_bits").collect()}
        assert sizes == {meta[key]}, kind
        before = _spark_scheduled(spark, root, ITERS)
        run_crawl(spark, docs, seeds, robots, root, N_DOCS,
                  iterations=ITERS, resume_from=ITERS - 1,
                  prefilter_kind=kind, run_id="grown")
        assert _spark_scheduled(spark, root, ITERS) == before, kind


def test_prefilter_rescale_crash_window_self_heals(crawl_run, tmp_path):
    # the one crash window rescaling leaves: snapshot rebuilt at the grown
    # size but the meta re-pin never landed (or vice versa). Simulated by
    # reverting the meta sizes after a grown run; a size-agnostic resume
    # then adopts the (stale) meta size, detects the snapshot mismatch,
    # drops it, and rebuilds from seen at the adopted size — scheduled
    # output identical either way (the prefilter is exact at any size).
    import json
    import os

    spark, ckpt, counts, oracle, docs, seeds, robots = crawl_run
    root = str(tmp_path / "heal")
    run_crawl(spark, docs, seeds, robots, root, N_DOCS, iterations=ITERS,
              compact_every=2, prefilter_kind="cuckoo", cuckoo_nb=64)
    meta_path = os.path.join(root, "_run_meta.json")
    meta = json.load(open(meta_path))
    assert meta["cuckoo_nb"] > 64  # growth happened
    meta["cuckoo_nb"] = 64  # simulate crash-before-meta-repin
    json.dump(meta, open(meta_path, "w"))
    before = _spark_scheduled(spark, root, ITERS)
    counts2 = run_crawl(spark, docs, seeds, robots, root, N_DOCS,
                        iterations=ITERS, resume_from=ITERS - 1,
                        prefilter_kind="cuckoo", run_id="healed")
    assert _spark_scheduled(spark, root, ITERS) == before
    assert counts2[ITERS] == counts[ITERS]
    cat = Catalog(spark, root)
    sizes = {r["nb"]
             for r in cat.read(f"cuckoo_{ITERS}").select("nb").collect()}
    assert sizes == {64}  # rebuilt at the adopted (meta) size
    # and the re-grown path still works afterwards: rerun WITH compaction
    counts3 = run_crawl(spark, docs, seeds, robots, root, N_DOCS,
                        iterations=ITERS, resume_from=ITERS - 1,
                        prefilter_kind="cuckoo", run_id="regrow")
    assert counts3[ITERS] == counts[ITERS]
