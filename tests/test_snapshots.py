"""Snapshot-versioned parquet tables (sources/snapshots.py) — the
Iceberg-commit-semantics stand-in: atomic manifest commits, optimistic
concurrency, time travel, append-only rollback, and snapshot expiry with
data-file garbage collection."""

import json
import os
import time

import pytest

from hypertrace_ingester_spark.sources import snapshots as sn


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "id * 10 as v")


def test_append_overwrite_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    s1 = sn.commit(_df(spark, 0, 5), t)
    assert (s1.version, s1.rows, s1.operation) == (1, 5, "append")
    s2 = sn.commit(_df(spark, 5, 8), t)               # append
    assert (s2.version, s2.rows) == (2, 8)
    s3 = sn.commit(_df(spark, 100, 102), t, mode="overwrite")
    assert (s3.version, s3.rows) == (3, 2)

    # current read = overwritten content
    assert sorted(r["id"] for r in sn.read_snapshot(spark, t).collect()) \
        == [100, 101]
    # time travel by version
    assert sorted(r["id"] for r in
                  sn.read_snapshot(spark, t, version=2).collect()) \
        == list(range(8))
    assert sorted(r["id"] for r in
                  sn.read_snapshot(spark, t, version=1).collect()) \
        == list(range(5))
    # time travel by timestamp
    got = sn.read_snapshot(spark, t, as_of_ts=s2.ts + 1e-4)
    assert got.count() == 8
    # history is complete and ordered
    assert [s.version for s in sn.snapshots(t)] == [1, 2, 3]
    assert [s.parent for s in sn.snapshots(t)] == [None, 1, 2]


def test_rollback_is_append_only(spark, tmp_path):
    t = str(tmp_path / "tbl")
    sn.commit(_df(spark, 0, 4), t)
    sn.commit(_df(spark, 50, 51), t, mode="overwrite")
    rb = sn.rollback(t, 1)
    assert rb.version == 3 and rb.operation == "rollback-to-v1"
    assert sorted(r["id"] for r in sn.read_snapshot(spark, t).collect()) \
        == [0, 1, 2, 3]
    # the overwritten middle version is still readable (history kept)
    assert sn.read_snapshot(spark, t, version=2).count() == 1


def test_commit_conflict_and_cas(spark, tmp_path):
    t = str(tmp_path / "tbl")
    sn.commit(_df(spark, 0, 3), t)
    # a racing writer lands v2 between our read and our commit: the
    # manifest IS the commit (single source of truth), so a blind commit
    # simply builds on it — no wedge — while a CAS pinned to the stale
    # version conflicts
    shutil_src = os.path.join(t, "_snapshots", "v000001.json")
    v1 = json.load(open(shutil_src))
    v1["version"], v1["parent"] = 2, 1
    with open(os.path.join(t, "_snapshots", "v000002.json"), "w") as fh:
        json.dump(v1, fh)
    with pytest.raises(sn.CommitConflict, match="table moved"):
        sn.commit(_df(spark, 6, 9), t, expected_version=1)
    s = sn.commit(_df(spark, 3, 6), t)        # blind append builds on v2
    assert s.version == 3
    # the raw link race: two writers computing the SAME next version —
    # the second exclusive-create loses
    with pytest.raises(sn.CommitConflict, match="concurrently"):
        sn._commit_manifest(t, 3, dict(v1, version=3))
    # correct CAS expectation passes
    s2 = sn.commit(_df(spark, 6, 9), t, expected_version=3)
    assert s2.version == 4


def test_commit_point_is_atomic(spark, tmp_path):
    """CURRENT only ever names a fully-written manifest: after any number
    of commits, the pointer's target manifest exists and parses, and no
    stage directories survive."""
    t = str(tmp_path / "tbl")
    for i in range(4):
        sn.commit(_df(spark, i * 2, i * 2 + 2), t)
        v = sn.current_version(t)
        m = os.path.join(t, "_snapshots", f"v{v:06d}.json")
        assert os.path.exists(m) and json.load(open(m))["version"] == v
    assert not [d for d in os.listdir(t) if d.startswith("_stage-")]
    # every referenced file exists
    for s in sn.snapshots(t):
        for f in s.files:
            assert os.path.exists(os.path.join(t, f)), f


def test_expire_snapshots_gc(spark, tmp_path):
    t = str(tmp_path / "tbl")
    sn.commit(_df(spark, 0, 3), t)
    sn.commit(_df(spark, 100, 103), t, mode="overwrite")  # orphans v1 files
    sn.commit(_df(spark, 103, 104), t)
    before = sum(1 for f in os.listdir(os.path.join(t, "data")))
    out = sn.expire_snapshots(t, keep_last=2)
    assert out["expired_versions"] == [1]
    assert out["deleted_files"] >= 1                  # v1's files GC'd
    after = sum(1 for f in os.listdir(os.path.join(t, "data")))
    assert after == before - out["deleted_files"]
    # current + kept history still read fine; expired version raises
    assert sn.read_snapshot(spark, t).count() == 4
    assert sn.read_snapshot(spark, t, version=2).count() == 3
    with pytest.raises(ValueError, match="expired or never"):
        sn.read_snapshot(spark, t, version=1)
    # CURRENT is never expired even if keep_last would drop it
    sn.rollback(t, 2)
    out2 = sn.expire_snapshots(t, keep_last=1)
    assert sn.current_version(t) not in out2["expired_versions"]
    assert sn.read_snapshot(spark, t).count() == 3


def test_commit_stream_batch_is_idempotent(spark, tmp_path):
    """The exactly-once gate: a retry replay (same batch_id) no-ops; a
    later batch id lands; an OLDER id (impossible in practice, but the
    monotone contract) also no-ops."""
    t = str(tmp_path / "tbl")
    s = sn.commit_stream_batch(_df(spark, 0, 4), t, batch_id=0)
    assert s is not None and s.batch_id == 0
    assert sn.commit_stream_batch(_df(spark, 0, 4), t, batch_id=0) is None
    assert sn.read_snapshot(spark, t).count() == 4       # no double-append
    s2 = sn.commit_stream_batch(_df(spark, 4, 6), t, batch_id=1)
    assert s2.batch_id == 1
    assert sn.commit_stream_batch(_df(spark, 9, 10), t, batch_id=0) is None
    assert sn.read_snapshot(spark, t).count() == 6


def test_streaming_pipeline_snapshot_sink_exactly_once(spark, tmp_path):
    """End to end: snapshot_routed=True lands every micro-batch exactly
    once (row totals match the batch pipeline), and a manual replay of an
    already-committed batch through process_batch changes nothing."""
    from pyspark.sql import functions as F

    from hypertrace_ingester_spark import datagen
    from hypertrace_ingester_spark.operators import enrich as enrich_ops
    from hypertrace_ingester_spark.plans.pipeline import (
        PipelineConfig, run_pipeline)
    from hypertrace_ingester_spark.plans.streaming_pipeline import (
        process_batch, run_streaming_pipeline)

    seqs = datagen.generate_sequences(spark, 1500)
    in_dir = str(tmp_path / "snap_seqs")
    seqs.repartition(3).write.parquet(in_dir)
    stream = (
        spark.readStream.schema(seqs.schema)
        .option("maxFilesPerTrigger", 1).parquet(in_dir)
    )
    out = str(tmp_path / "snap_out")
    cfg = PipelineConfig(out_dir=out, snapshot_routed=True)
    run_streaming_pipeline(spark, stream, cfg).awaitTermination(180)

    table = out + "/routed_snap"
    hist = sn.snapshots(table)
    assert len(hist) >= 2                      # several micro-batches
    assert [s.batch_id for s in hist] == sorted(
        s.batch_id for s in hist)              # monotone ids recorded

    batch_out = str(tmp_path / "snap_batch_out")
    m = run_pipeline(spark, spark.read.parquet(in_dir),
                     PipelineConfig(out_dir=batch_out))
    got = {r["sink"]: r["n"] for r in
           sn.read_snapshot(spark, table).groupBy("sink")
           .agg(F.count("*").alias("n")).collect()}
    assert got == m["stages"]["route"]["sink_counts"]

    # replay an already-committed batch id: exactly-once means a no-op
    ctx = enrich_ops.EnrichContext(
        endpoints=datagen.endpoints_dim(spark),
        services=datagen.services_dim(spark),
        status_codes=datagen.status_codes_dim(spark),
    )
    before = sn.read_snapshot(spark, table).count()
    process_batch(spark.read.parquet(in_dir), hist[0].batch_id, cfg, ctx,
                  datagen.route_rules_dim(spark))
    assert sn.read_snapshot(spark, table).count() == before
    assert len(sn.snapshots(table)) == len(hist)


def test_schema_enforcement_and_empty_reads(spark, tmp_path):
    """Appends are schema-checked (Iceberg write contract): a mismatched
    frame raises instead of silently unioning; overwrite SETS the new
    schema; every version reads with ITS OWN schema (per-version
    evolution); an empty commit still reads typed."""
    t = str(tmp_path / "tbl")
    sn.commit(_df(spark, 0, 3), t)
    bad = spark.range(3, 5).selectExpr("id", "cast(id as string) as v")
    with pytest.raises(ValueError, match="schema mismatch"):
        sn.commit(bad, t)                       # append, wrong type for v
    sn.commit(bad, t, mode="overwrite")         # evolution via overwrite
    assert sn.read_snapshot(spark, t).schema["v"].dataType.simpleString() \
        == "string"
    # time travel returns the OLD schema
    assert sn.read_snapshot(spark, t, version=1) \
        .schema["v"].dataType.simpleString() == "bigint"
    # empty table: typed-empty frame from the pinned schema
    t2 = str(tmp_path / "empty")
    sn.commit(_df(spark, 0, 0), t2)
    out = sn.read_snapshot(spark, t2)
    assert out.count() == 0
    assert [f.name for f in out.schema] == ["id", "v"]


def test_merge_upsert_copy_on_write(spark, tmp_path):
    """MERGE INTO: matched keys replaced, new keys inserted, files whose
    footer range excludes every update key are carried by reference —
    byte-identical — and time travel still reads the pre-merge rows."""
    import hashlib

    t = str(tmp_path / "tbl")
    # two well-separated files so footer pruning has something to prune
    sn.commit(spark.range(0, 50).selectExpr("id", "id * 10 as v")
              .coalesce(1), t)
    sn.commit(spark.range(1000, 1050).selectExpr("id", "id * 10 as v")
              .coalesce(1), t)
    pre = sn.snapshots(t)[-1]
    hashes_before = {
        f: hashlib.md5(open(os.path.join(t, f), "rb").read()).hexdigest()
        for f in pre.files
    }

    updates = spark.createDataFrame(
        [(1000, -1), (1001, -2), (7777, -3)], "id long, v long")
    s = sn.merge_upsert(spark, updates, t, "id")
    assert s.operation == "merge" and s.rows == 101   # 100 - 2 + 3
    got = {r["id"]: r["v"] for r in sn.read_snapshot(spark, t).collect()}
    assert got[1000] == -1 and got[1001] == -2 and got[7777] == -3
    assert got[1002] == 10020 and got[0] == 0         # untouched rows kept
    assert len(got) == 101

    # the low-range file was carried by reference, byte-identical
    carried = [f for f in s.files if f in hashes_before]
    assert len(carried) == 1
    f = carried[0]
    assert hashlib.md5(
        open(os.path.join(t, f), "rb").read()).hexdigest() == \
        hashes_before[f]

    # time travel: pre-merge snapshot still shows the old values
    old = {r["id"]: r["v"] for r in
           sn.read_snapshot(spark, t, version=pre.version).collect()}
    assert old[1000] == 10000 and 7777 not in old

    # NULL-keyed update rows insert; NULL-keyed table rows survive a merge
    null_tbl = str(tmp_path / "nulls")
    sn.commit(spark.createDataFrame([(None, 1), (5, 2)], "id long, v long"),
              null_tbl)
    sn.merge_upsert(spark, spark.createDataFrame(
        [(5, 20), (None, 30)], "id long, v long"), null_tbl, "id")
    from collections import Counter

    rows = Counter((r["id"], r["v"]) for r in
                   sn.read_snapshot(spark, null_tbl).collect())
    assert rows == Counter([(None, 1), (None, 30), (5, 20)])

    # bounded-keys guard
    big = spark.range(0, 50).selectExpr("id", "id as v")
    with pytest.raises(ValueError, match="bounded update-key set"):
        sn.merge_upsert(spark, big, t, "id", max_keys=10)


def test_orphan_data_files_swept_after_grace(spark, tmp_path):
    """A crashed/conflict-losing commit leaves staged data files that no
    manifest references; the expiry orphan sweep removes them past the
    grace age and never touches referenced files or young orphans."""
    t = str(tmp_path / "tbl")
    sn.commit(_df(spark, 0, 4), t)
    orphan = os.path.join(t, "data", "c999999-dead0000-00000.parquet")
    _df(spark, 90, 92).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "o"))
    src = [f for f in os.listdir(str(tmp_path / "o"))
           if f.endswith(".parquet")][0]
    os.rename(os.path.join(str(tmp_path / "o"), src), orphan)
    # young orphan survives a guarded sweep
    out = sn.expire_snapshots(t, keep_last=5, orphan_grace_sec=3600)
    assert out["orphans_deleted"] == 0 and os.path.exists(orphan)
    # past the grace it is swept; the table still reads identically
    out = sn.expire_snapshots(t, keep_last=5, orphan_grace_sec=0)
    assert out["orphans_deleted"] == 1 and not os.path.exists(orphan)
    assert sn.read_snapshot(spark, t).count() == 4


def test_batch_seq_survives_expiry_and_maintenance(spark, tmp_path):
    """The exactly-once gate must hold after maintenance commits and
    snapshot expiry drop every batch_id-bearing manifest (review find:
    a history-scan gate was voided here). batch_seq rides every
    manifest."""
    t = str(tmp_path / "tbl")
    assert sn.commit_stream_batch(_df(spark, 0, 3), t, batch_id=0) is not None
    assert sn.commit_stream_batch(_df(spark, 3, 5), t, batch_id=1) is not None
    # maintenance: a merge and a rollback, both batch_id=None
    sn.merge_upsert(spark, _df(spark, 4, 6), t, "id")
    sn.rollback(t, sn.current_version(t) - 1)
    # expire everything but the tail: all batch-bearing manifests gone
    sn.expire_snapshots(t, keep_last=2, orphan_grace_sec=3600)
    assert all(s.batch_id is None for s in sn.snapshots(t))
    # the replay gate still holds
    n_before = sn.read_snapshot(spark, t).count()
    assert sn.commit_stream_batch(_df(spark, 3, 5), t, batch_id=1) is None
    assert sn.read_snapshot(spark, t).count() == n_before
    # and a genuinely new batch lands
    assert sn.commit_stream_batch(_df(spark, 50, 51), t, batch_id=2) is not None


def test_merge_rejects_duplicate_update_keys(spark, tmp_path):
    t = str(tmp_path / "tbl")
    sn.commit(_df(spark, 0, 3), t)
    dup = spark.createDataFrame([(1, 10), (1, 20)], "id long, v long")
    with pytest.raises(ValueError, match="duplicate update key"):
        sn.merge_upsert(spark, dup, t, "id")


def test_concurrent_writers_race_without_wedge(spark, tmp_path):
    """Two writers hammer the same table with CAS+retry loops: every
    version has exactly one winner, conflicts are always retryable (no
    permanent wedge — the round-5 hardening's point), and the final
    table contains every writer's rows exactly once."""
    import threading

    t = str(tmp_path / "race")
    sn.commit(_df(spark, 0, 1), t)
    per_writer, n_writers = 6, 2
    errors, conflicts = [], [0]

    def writer(wid):
        for i in range(per_writer):
            lo = 1000 * (wid + 1) + 10 * i
            df = spark.range(lo, lo + 2).selectExpr("id", "id * 10 as v")
            for _attempt in range(50):
                try:
                    cur = sn.current_version(t)
                    sn.commit(df, t, expected_version=cur)
                    break
                except sn.CommitConflict:
                    conflicts[0] += 1
            else:
                errors.append(f"writer {wid} step {i} starved")

    threads = [threading.Thread(target=writer, args=(w,))
               for w in range(n_writers)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    # exactly one manifest per version, contiguous history
    vs = [s.version for s in sn.snapshots(t)]
    assert vs == list(range(1, 1 + 1 + per_writer * n_writers))
    # every writer's rows landed exactly once
    got = sorted(r["id"] for r in sn.read_snapshot(spark, t).collect())
    want = sorted([0] + [1000 * (w + 1) + 10 * i + d
                         for w in range(n_writers)
                         for i in range(per_writer) for d in (0, 1)])
    assert got == want
    # rows bookkeeping agrees with reality
    assert sn.snapshots(t)[-1].rows == len(want)


def test_compact_rewrites_layout_not_content(spark, tmp_path):
    """rewrite_data_files analog: many per-batch files fold into few,
    rows and schema identical, history keeps the old layout, the
    exactly-once gate is undisturbed, and a second run no-ops."""
    t = str(tmp_path / "tbl")
    for b in range(5):
        sn.commit_stream_batch(
            _df(spark, b * 3, b * 3 + 3).repartition(2), t, batch_id=b)
    pre = sn.snapshots(t)[-1]
    assert len(pre.files) >= 10
    s = sn.compact(spark, t)
    assert s is not None and s.operation == "compact"
    assert len(s.files) < len(pre.files)
    assert s.rows == pre.rows == 15
    got = sorted(r["id"] for r in sn.read_snapshot(spark, t).collect())
    assert got == list(range(15))
    # old layout still time-travels; gate still holds; second run no-ops
    assert sn.read_snapshot(spark, t, version=pre.version).count() == 15
    assert sn.commit_stream_batch(_df(spark, 0, 3), t, batch_id=4) is None
    assert sn.compact(spark, t) is None


def test_manifest_stats_prune_scans(spark, tmp_path):
    """Manifest-level file statistics (Iceberg plan-time pruning): commits
    made with stats_cols record per-file [min,max]; scan_snapshot reads
    only intersecting files (observed via inputFiles) while results stay
    identical to the unpruned read + predicate; appends inherit the
    stats columns; compaction regenerates them."""
    t = str(tmp_path / "tbl")
    sn.commit(_df(spark, 0, 100).repartition(1), t, stats_cols=("id",))
    sn.commit(_df(spark, 1000, 1100).repartition(1), t)   # inherits
    sn.commit(_df(spark, 5000, 5100).repartition(1), t)
    snap = sn.snapshots(t)[-1]
    assert len(snap.files) == 3
    assert all(f in snap.file_stats and "id" in snap.file_stats[f]
               for f in snap.files)

    pruned = sn.scan_snapshot(spark, t, "id", lo=1000, hi=1099)
    assert len(pruned.inputFiles()) == 1
    got = sorted(r["id"] for r in
                 pruned.where("id between 1000 and 1099").collect())
    full = sorted(r["id"] for r in
                  sn.read_snapshot(spark, t)
                  .where("id between 1000 and 1099").collect())
    assert got == full == list(range(1000, 1100))
    # open-ended bounds
    assert len(sn.scan_snapshot(spark, t, "id", lo=4000).inputFiles()) == 1
    assert len(sn.scan_snapshot(spark, t, "id", hi=150).inputFiles()) == 1
    # prune-to-zero returns a typed empty frame
    none = sn.scan_snapshot(spark, t, "id", lo=2000, hi=2500)
    assert none.count() == 0 and [f.name for f in none.schema] == ["id", "v"]
    # compaction carries the stats machinery
    s = sn.compact(spark, t, target_file_mb=1)
    if s is not None:
        assert all("id" in st for st in s.file_stats.values())


def test_stats_on_timestamps_nested_shadow_and_maintenance(spark, tmp_path):
    """Round-5 review fixes: (a) timestamp stats serialize and prune with
    datetime bounds; (b) a nested struct field named like a top-level
    column cannot shadow its stats; (c) rollback and overwrite carry the
    stats machinery; (d) mismatched bound types raise a named error."""
    import datetime as dt

    # INT96 (Spark's legacy default) carries NO footer min/max — time
    # pruning needs the modern physical type
    spark.conf.set("spark.sql.parquet.outputTimestampType",
                   "TIMESTAMP_MICROS")
    t = str(tmp_path / "ts_tbl")
    df1 = spark.sql(
        "select id, timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id) as ts,"
        " named_struct('id', id + 100000) as s from range(0, 50)")
    sn.commit(df1.repartition(1), t, stats_cols=("ts", "id"))
    df2 = spark.sql(
        "select id, timestamp'2024-06-01 00:00:00' + make_interval(0,0,0,0,0,0,id) as ts,"
        " named_struct('id', id + 100000) as s from range(1000, 1050)")
    sn.commit(df2.repartition(1), t)                    # inherits both cols
    snap = sn.snapshots(t)[-1]
    assert len(snap.files) == 2
    for st in snap.file_stats.values():
        assert set(st) == {"ts", "id"}
    # (b) top-level id stats are the TOP-LEVEL values, not s.id's
    for st in snap.file_stats.values():
        assert st["id"][1] < 100000, st["id"]
    pruned = sn.scan_snapshot(spark, t, "id", lo=1000)
    assert len(pruned.inputFiles()) == 1
    # (a) datetime bounds prune the time range
    tp = sn.scan_snapshot(spark, t, "ts", lo=dt.datetime(2024, 5, 1))
    assert len(tp.inputFiles()) == 1
    assert tp.count() == 50
    # (d) mismatched bound type raises a named error
    with pytest.raises(TypeError, match="not comparable with column"):
        sn.scan_snapshot(spark, t, "ts", lo=5).inputFiles()
    # (c) rollback keeps stats; overwrite inherits them
    sn.rollback(t, 1)
    assert sn.snapshots(t)[-1].file_stats
    assert len(sn.scan_snapshot(spark, t, "id", lo=10_000).inputFiles()) \
        <= 1
    sn.commit(df2.repartition(1), t, mode="overwrite")
    last = sn.snapshots(t)[-1]
    assert last.file_stats and all(
        set(st) == {"ts", "id"} for st in last.file_stats.values())
