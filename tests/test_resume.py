"""S7 / north_rule resume: killed-run semantics via per-bucket manifests.

A full run checkpoints every bucket; damaging the manifest (simulating a
kill mid-stage) and re-running must recompute ONLY the damaged buckets and
reproduce the identical final table.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from ner_spark import synth
from ner_spark.operators import consensus as C
from ner_spark.operators.clean import dedup_docs, normalize_docs
from ner_spark.plans.pipeline import KGPipeline
from ner_spark.plans.runner import Runner
from ner_spark.sources.catalog import Catalog

N_BUCKETS = 4


def _build(spark, out_dir):
    docs = synth.synth_docs(spark, 200, seed=42)
    gaz = synth.synth_gazetteer(spark)
    pat = synth.synth_patterns(spark)
    combos = [c["slots"] for c in synth.TRUSTED_COMBOS]
    pipe = KGPipeline(gazetteer=gaz, patterns=pat, trusted_combos=combos)
    runner = Runner(spark=spark, catalog=Catalog(str(out_dir)), n_buckets=N_BUCKETS)

    s0, fp0 = runner.stage("s0_normalize", docs, normalize_docs, key="doc_id",
                           input_fingerprint="synth:200:42")
    s1, fp1 = runner.stage("s1_dedup", s0, dedup_docs, key="text",
                           input_fingerprint=fp0)

    def consensus_transform(clean_part):
        fused = C.fuse_ranked(pipe.ranked_mentions(clean_part))
        return C.promote_trusted(C.priority_vote(fused), combos)

    s3, fp3 = runner.stage("s3_consensus", s1, consensus_transform,
                           key="doc_uid", input_fingerprint=fp1)
    return runner, s3


@pytest.fixture(scope="module")
def first_run(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("kg_resume")
    runner, s3 = _build(spark, out)
    rows = sorted(map(tuple, s3.select("doc_uid", "NE", "label", "start", "end", "method").collect()))
    return out, runner, rows


def test_full_rerun_skips_everything(spark, first_run):
    out, _, rows1 = first_run
    runner, s3 = _build(spark, out)
    for m in runner.metrics:
        assert m.computed_buckets == 0, m
        assert m.skipped_buckets == N_BUCKETS
    rows2 = sorted(map(tuple, s3.select("doc_uid", "NE", "label", "start", "end", "method").collect()))
    assert rows1 == rows2


def test_partial_resume_recomputes_only_damaged_buckets(spark, first_run):
    out, _, rows1 = first_run
    cat = Catalog(str(out))
    # simulate a kill: drop two buckets of s3 from the manifest
    damaged = {1, 3}
    kept = [
        r for r in cat.manifest_rows("s3_consensus") if r["bucket"] not in damaged
    ]
    with open(cat.manifest_path("s3_consensus"), "w", encoding="utf-8") as f:
        for r in kept:
            f.write(json.dumps(r) + "\n")

    runner, s3 = _build(spark, out)
    by_stage = {m.table: m for m in runner.metrics}
    assert by_stage["s0_normalize"].computed_buckets == 0
    assert by_stage["s1_dedup"].computed_buckets == 0
    assert by_stage["s3_consensus"].computed_buckets == len(damaged)
    assert by_stage["s3_consensus"].skipped_buckets == N_BUCKETS - len(damaged)
    rows2 = sorted(map(tuple, s3.select("doc_uid", "NE", "label", "start", "end", "method").collect()))
    assert rows1 == rows2


def test_fingerprint_change_wipes_stale_buckets(spark, tmp_path_factory):
    """Dynamic overwrite only rewrites buckets present in the new write: a
    fingerprint change whose transform emits zero rows for a bucket that
    previously had data must NOT leak the old rows into reads (the marker
    file added in round 2 resets the table dir on fingerprint change)."""
    out = tmp_path_factory.mktemp("kg_stale")
    docs = synth.synth_docs(spark, 50, seed=1)
    runner = Runner(spark=spark, catalog=Catalog(str(out)), n_buckets=N_BUCKETS)
    full, _ = runner.stage("s0_normalize", docs, normalize_docs, key="doc_id",
                           input_fingerprint="all")
    assert full.count() == 50

    # new fingerprint, transform keeps ONE doc -> 3 of 4 buckets are empty
    def keep_one(df):
        return normalize_docs(df).filter(F.col("doc_id") == "doc00000007")

    runner2 = Runner(spark=spark, catalog=Catalog(str(out)), n_buckets=N_BUCKETS)
    small, _ = runner2.stage("s0_normalize", docs, keep_one, key="doc_id",
                             input_fingerprint="one")
    got = [r["doc_id"] for r in small.select("doc_id").collect()]
    assert got == ["doc00000007"]  # no stale rows from the previous fingerprint


def test_changed_input_invalidates_downstream(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("kg_fp")
    docs = synth.synth_docs(spark, 50, seed=1)
    runner = Runner(spark=spark, catalog=Catalog(str(out)), n_buckets=N_BUCKETS)
    _, fp_a = runner.stage("s0_normalize", docs, normalize_docs, key="doc_id",
                           input_fingerprint="synth:50:1")
    # same stage, different input fingerprint -> full recompute
    runner2 = Runner(spark=spark, catalog=Catalog(str(out)), n_buckets=N_BUCKETS)
    _, fp_b = runner2.stage("s0_normalize", docs, normalize_docs, key="doc_id",
                            input_fingerprint="synth:50:2")
    assert fp_a != fp_b
    assert runner2.metrics[0].computed_buckets == N_BUCKETS


def test_global_stage_empty_result_resumes_without_recompute(spark, tmp_path_factory):
    """A legitimately-empty global-stage output must still record
    completion: the resume contract is zero recomputation, including for
    stages whose correct answer is an empty table."""
    out = tmp_path_factory.mktemp("empty_global")
    calls = {"n": 0}

    def compute():
        calls["n"] += 1
        return spark.range(0).selectExpr("id as src", "id as dst")

    r1 = Runner(spark=spark, catalog=Catalog(str(out)), n_buckets=N_BUCKETS)
    df1, fp = r1.global_stage("g_empty", compute, input_fingerprint="x")
    assert df1.count() == 0 and calls["n"] == 1

    r2 = Runner(spark=spark, catalog=Catalog(str(out)), n_buckets=N_BUCKETS)
    df2, fp2 = r2.global_stage("g_empty", compute, input_fingerprint="x")
    assert df2.count() == 0 and fp2 == fp
    assert calls["n"] == 1  # resume did NOT re-run the compute


def test_concurrent_runners_one_winner_zero_duplicates(spark, tmp_path_factory):
    """Round-4 directive 4: two Runner instances racing the SAME stage +
    fingerprint on one catalog must not interleave a torn write. The
    writer fence admits exactly one; the loser waits on the winner's
    manifest and reads. An injected pause inside the winner's transform
    holds the race window open long enough that, unfenced, both runners
    would be mid-write together (this test fails without the fence: both
    compute and the manifest gets duplicate bucket rows)."""
    import threading
    import time as _time

    out = tmp_path_factory.mktemp("kg_race")
    docs = synth.synth_docs(spark, 120, seed=7)
    started = threading.Barrier(2)
    in_transform = threading.Event()

    def paused_normalize(df):
        in_transform.set()
        _time.sleep(2.0)  # injected pause: widen the fenced write window
        return normalize_docs(df)

    results: dict[str, object] = {}

    def run(tag: str):
        runner = Runner(
            spark=spark, catalog=Catalog(str(out)), n_buckets=N_BUCKETS,
            writer_poll_sec=0.05,
        )
        started.wait()
        s0, _ = runner.stage(
            "s0_normalize", docs, paused_normalize, key="doc_id",
            input_fingerprint="race:120:7",
        )
        results[tag] = (runner.metrics[0], s0.count())

    t1 = threading.Thread(target=run, args=("a",))
    t2 = threading.Thread(target=run, args=("b",))
    t1.start(); t2.start(); t1.join(); t2.join()

    m_a, n_a = results["a"]
    m_b, n_b = results["b"]
    # exactly one winner computed; the loser skipped every bucket
    computed = sorted([m_a.computed_buckets, m_b.computed_buckets])
    assert computed == [0, N_BUCKETS], (m_a, m_b)
    # both see the identical full output
    expected = normalize_docs(docs).count()
    assert n_a == n_b == expected
    # zero duplicate manifest rows: one row per bucket per fingerprint
    cat = Catalog(str(out))
    seen = [(r["bucket"], r["fingerprint"]) for r in cat.manifest_rows("s0_normalize")]
    assert len(seen) == len(set(seen)) == N_BUCKETS, seen
    # zero duplicate data rows
    dup = (
        cat.read(spark, "s0_normalize")
        .groupBy("doc_id")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup == 0
    # the fence was actually exercised while the winner was inside its
    # transform (not a sequential fluke) and is released afterwards
    assert in_transform.is_set()
    import os

    assert not any(f.endswith(".writer.lock") for f in os.listdir(out))


def test_dead_writer_lease_is_taken_over(spark, tmp_path_factory):
    """A writer that died mid-run leaves its lock behind; a new Runner
    breaks the stale lease after writer_lease_sec and completes the
    remaining buckets instead of deadlocking."""
    out = tmp_path_factory.mktemp("kg_stale_lease")
    docs = synth.synth_docs(spark, 60, seed=9)
    cat = Catalog(str(out))
    runner = Runner(
        spark=spark, catalog=cat, n_buckets=N_BUCKETS,
        writer_lease_sec=0.5, writer_wait_sec=30.0, writer_poll_sec=0.05,
    )
    fp = "stale:60:9"
    # simulate the dead writer: its lock exists, no manifest progress
    import hashlib

    stage_fp = hashlib.sha256(
        "\x1f".join(["s0_normalize", fp, "", str(N_BUCKETS)]).encode()
    ).hexdigest()[:16]
    assert cat.try_acquire_writer("s0_normalize", stage_fp, lease_sec=0.5)
    import time as _time

    _time.sleep(0.6)  # let the lease expire
    s0, _ = runner.stage(
        "s0_normalize", docs, normalize_docs, key="doc_id", input_fingerprint=fp
    )
    assert runner.metrics[0].computed_buckets == N_BUCKETS
    assert s0.count() == normalize_docs(docs).count()


def test_torn_write_unmanifested_bucket_is_pruned_on_resume(spark, tmp_path_factory):
    """Round-5 hardening: a writer killed mid-write leaves parquet in
    bucket dirs it never manifested. Dynamic overwrite only replaces
    buckets present in the NEW write, so without pruning, a bucket whose
    recompute emits zero rows would leak the dead writer's stale rows
    into every later read (and into the manifest row count)."""
    import os

    out = tmp_path_factory.mktemp("torn_write")
    docs = synth.synth_docs(spark, 50, seed=5)
    cat = Catalog(str(out))
    runner = Runner(spark=spark, catalog=cat, n_buckets=N_BUCKETS)

    # transform keeps ONE doc -> most buckets legitimately emit zero rows
    def keep_one(df):
        return normalize_docs(df).filter(F.col("doc_id") == "doc00000007")

    full, fp = runner.stage("s0_normalize", docs, keep_one, key="doc_id",
                            input_fingerprint="torn:50:5")
    survivor_bucket = spark.read.parquet(cat.table_dir("s0_normalize")).filter(
        F.col("doc_id") == "doc00000007"
    ).select("_bucket").collect()[0][0]
    empty_bucket = next(b for b in range(N_BUCKETS) if b != survivor_bucket)

    # simulate the dead writer's torn write: full rows parked in a bucket
    # that the (re)computed stage will NOT rewrite, with no manifest row
    torn_dir = os.path.join(cat.table_dir("s0_normalize"), f"_bucket={empty_bucket}")
    normalize_docs(docs).limit(5).write.mode("overwrite").parquet(torn_dir)
    kept = [r for r in cat.manifest_rows("s0_normalize") if r["bucket"] != empty_bucket]
    with open(cat.manifest_path("s0_normalize"), "w", encoding="utf-8") as f:
        import json as _json

        for r in kept:
            f.write(_json.dumps(r) + "\n")

    runner2 = Runner(spark=spark, catalog=Catalog(str(out)), n_buckets=N_BUCKETS)
    resumed, _ = runner2.stage("s0_normalize", docs, keep_one, key="doc_id",
                               input_fingerprint="torn:50:5")
    got = [r["doc_id"] for r in resumed.select("doc_id").collect()]
    assert got == ["doc00000007"]  # stale torn-write rows did NOT leak
    # and the re-manifested bucket records zero rows, not the stale five
    rows_by_bucket = {
        r["bucket"]: r["rows"] for r in cat.manifest_rows("s0_normalize")
    }
    assert rows_by_bucket[empty_bucket] == 0


def test_stale_break_yields_exactly_one_owner(tmp_path_factory):
    """Round-5 ADVICE (medium): breaking a stale lease must not admit two
    writers. Many survivors of a dead writer race the break in the same
    poll window; with a plain getmtime+remove, two could both remove
    "the" stale lock and both acquire AND own. The tombstone-rename break
    with post-rename token verify guarantees: at least one racer is
    admitted (liveness), and exactly ONE holds on-disk ownership — the
    predicate the Runner verifies synchronously before every write, so
    only that one can write. Run several rounds to exercise the race."""
    import threading
    import time as _time

    for trial in range(5):
        out = tmp_path_factory.mktemp(f"lease_break{trial}")
        dead = Catalog(str(out))
        assert dead.try_acquire_writer("t", "fp", lease_sec=0.2)
        _time.sleep(0.25)  # lease now stale

        n = 8
        gate = threading.Barrier(n)
        cats = [Catalog(str(out)) for _ in range(n)]
        wins: list[bool] = [False] * n

        def racer(i: int) -> None:
            gate.wait()
            wins[i] = cats[i].try_acquire_writer("t", "fp", lease_sec=0.2)

        ts = [threading.Thread(target=racer, args=(i,)) for i in range(n)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert sum(wins) >= 1, wins  # the break is never orphaned
        owners = [i for i in range(n) if cats[i].owns_writer("t")]
        assert len(owners) == 1, (wins, owners)
        assert wins[owners[0]]  # the owner is among the admitted


def test_release_ignores_foreign_lock(tmp_path_factory):
    """Round-5 ADVICE (medium): release verifies the owner token. Writer A
    loses its lease (stall), writer B takes over; A's finally-block release
    must NOT delete B's live lock (which would admit a third writer C)."""
    import time as _time

    out = tmp_path_factory.mktemp("lease_owner")
    a = Catalog(str(out))
    b = Catalog(str(out))
    c = Catalog(str(out))
    assert a.try_acquire_writer("t", "fp", lease_sec=0.2)
    _time.sleep(0.3)  # A stalls past its lease
    assert b.try_acquire_writer("t", "fp", lease_sec=0.2)  # takeover
    assert not a.owns_writer("t") and b.owns_writer("t")
    assert not a.heartbeat_writer("t")  # A's heartbeat refuses to touch it
    a.release_writer("t", "fp")  # A's finally-block fires
    assert b.owns_writer("t")  # B's lock survived
    assert not c.try_acquire_writer("t", "fp", lease_sec=60.0)  # C stays out
    b.release_writer("t", "fp")
    assert c.try_acquire_writer("t", "fp", lease_sec=60.0)


def test_lost_lease_discards_write_then_recovers_from_dead_usurper(spark, tmp_path_factory):
    """A writer whose lease is broken and reissued mid-transform must NOT
    write (round-5 ADVICE: the pre-write token verify gates the write);
    it discards the attempt and re-enters acquire-or-wait. Here the
    usurper dies immediately (never heartbeats), so the original breaks
    the now-stale lock on its second attempt and completes — liveness and
    safety together: exactly one manifest row set, correct output."""
    import time as _time

    out = tmp_path_factory.mktemp("lease_lost")
    docs = synth.synth_docs(spark, 40, seed=3)
    cat = Catalog(str(out))
    runner = Runner(
        spark=spark, catalog=cat, n_buckets=N_BUCKETS,
        writer_lease_sec=0.3, writer_wait_sec=10.0, writer_poll_sec=0.05,
    )
    thief = Catalog(str(out))
    calls = {"n": 0}

    def stealing_normalize(df):
        calls["n"] += 1
        if calls["n"] == 1:
            # simulate a takeover: the thief yanks our lock and issues its
            # own while our transform still runs — then dies (no heartbeat)
            import os

            os.remove(cat.writer_lock_path("s0_normalize"))
            assert thief.try_acquire_writer("s0_normalize", lease_sec=60.0)
            _time.sleep(0.5)  # > one heartbeat interval: the loss is noticed
        return normalize_docs(df)

    s0, _ = runner.stage(
        "s0_normalize", docs, stealing_normalize, key="doc_id",
        input_fingerprint="steal:40:3",
    )
    assert calls["n"] == 2  # attempt 1 discarded, attempt 2 recomputed
    assert s0.count() == normalize_docs(docs).count()
    seen = [(r["bucket"], r["fingerprint"]) for r in cat.manifest_rows("s0_normalize")]
    assert len(seen) == len(set(seen)) == N_BUCKETS  # no duplicate writes


def test_lost_lease_waits_for_live_new_owner_then_times_out(spark, tmp_path_factory):
    """Same takeover, but the usurper stays LIVE (keeps its lease fresh)
    and never finishes: the dispossessed writer must not write, must not
    break the live lock, and must fail loudly after writer_wait_sec."""
    import os
    import threading
    import time as _time

    out = tmp_path_factory.mktemp("lease_lost_live")
    docs = synth.synth_docs(spark, 40, seed=3)
    cat = Catalog(str(out))
    runner = Runner(
        spark=spark, catalog=cat, n_buckets=N_BUCKETS,
        writer_lease_sec=0.3, writer_wait_sec=2.0, writer_poll_sec=0.05,
    )
    thief = Catalog(str(out))
    stop_beat = threading.Event()

    def stealing_normalize(df):
        os.remove(cat.writer_lock_path("s0_normalize"))
        assert thief.try_acquire_writer("s0_normalize", lease_sec=60.0)

        def beat():
            while not stop_beat.wait(0.1):
                thief.heartbeat_writer("s0_normalize")

        threading.Thread(target=beat, daemon=True).start()
        _time.sleep(0.5)
        return normalize_docs(df)

    try:
        with pytest.raises(TimeoutError, match="still held"):
            runner.stage(
                "s0_normalize", docs, stealing_normalize, key="doc_id",
                input_fingerprint="steal:40:3",
            )
    finally:
        stop_beat.set()
    assert cat.manifest_rows("s0_normalize") == []  # nothing was written
    assert thief.owns_writer("s0_normalize")  # thief's live lock untouched


def test_slow_live_writer_keeps_lease_via_heartbeat(spark, tmp_path_factory):
    """A winner whose stage outlives writer_lease_sec must NOT lose its
    lock to a waiting peer: the heartbeat refreshes the lease while the
    transform runs. Lease 0.4s, transform pause 2s — without the
    heartbeat the second Runner breaks the lease mid-write and both
    compute (duplicate manifest rows); with it there is still exactly one
    winner."""
    import threading
    import time as _time

    out = tmp_path_factory.mktemp("kg_heartbeat")
    docs = synth.synth_docs(spark, 80, seed=13)
    entered = threading.Event()

    def slow_normalize(df):
        entered.set()
        _time.sleep(2.0)  # > 4 lease periods
        return normalize_docs(df)

    results: dict[str, object] = {}

    def run(tag: str, delay: float):
        runner = Runner(
            spark=spark, catalog=Catalog(str(out)), n_buckets=N_BUCKETS,
            writer_lease_sec=0.4, writer_wait_sec=60.0, writer_poll_sec=0.05,
        )
        if delay:
            entered.wait(10.0)
            _time.sleep(delay)
        runner.stage(
            "s0_normalize", docs, slow_normalize, key="doc_id",
            input_fingerprint="hb:80:13",
        )
        results[tag] = runner.metrics[0]

    t1 = threading.Thread(target=run, args=("a", 0.0))
    t2 = threading.Thread(target=run, args=("b", 0.6))  # past the bare lease
    t1.start(); t2.start(); t1.join(); t2.join()

    computed = sorted([results["a"].computed_buckets, results["b"].computed_buckets])
    assert computed == [0, N_BUCKETS], (results["a"], results["b"])
    cat = Catalog(str(out))
    seen = [(r["bucket"], r["fingerprint"]) for r in cat.manifest_rows("s0_normalize")]
    assert len(seen) == len(set(seen)) == N_BUCKETS, seen
