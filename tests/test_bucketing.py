"""Bucketed-layout plan property (P17 / north-rule partitioning story):
a bucketed fact table feeds groupBy/join on its bucket key with NO
Exchange, while the identical plain-parquet scan shuffles."""

import pytest
from pyspark.sql import functions as F

from hypertrace_ingester_spark.sources import bucketing


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory):
    import shutil

    plain_dir = str(tmp_path_factory.mktemp("bucketing") / "events_plain")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.write.mode("overwrite").parquet(plain_dir)
    spark.sql("DROP TABLE IF EXISTS events_bucketed")
    # a stale managed-table location from a previous session blocks CREATE
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/events_bucketed", ignore_errors=True)
    bucketing.write_bucketed(
        events, "events_bucketed", ["user_id"], 8, sort_cols=["user_id", "ts"]
    )
    yield plain_dir
    spark.sql("DROP TABLE IF EXISTS events_bucketed")


def _agg(df):
    return df.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("v")
    )


def test_bucketed_aggregate_has_no_exchange(spark, tables):
    bucketed_plan = _agg(
        bucketing.read_bucketed(spark, "events_bucketed")
    )._jdf.queryExecution().executedPlan().toString()
    plain_plan = _agg(
        spark.read.parquet(tables)
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in bucketed_plan  # bucket layout satisfies the agg
    assert "Exchange" in plain_plan  # the same agg shuffles without it

    # and the results are identical either way
    a = {r["user_id"]: (r["n"], round(r["v"], 6))
         for r in _agg(bucketing.read_bucketed(spark, "events_bucketed")).collect()}
    b = {r["user_id"]: (r["n"], round(r["v"], 6))
         for r in _agg(spark.read.parquet(tables)).collect()}
    assert a == b


def test_bucketed_self_join_has_no_shuffle(spark, tables):
    # at test scale AQE rightly broadcasts the tiny table; disable that to
    # expose the co-located sort-merge path a fact×fact join takes at scale
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        t = bucketing.read_bucketed(spark, "events_bucketed")
        joined = t.alias("a").join(
            t.alias("b"), F.col("a.user_id") == F.col("b.user_id")
        ).select(F.col("a.event_id"), F.col("b.event_id"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located join straight off the buckets: no shuffle on either side
        assert "ShuffleExchange" not in plan and "shuffle" not in plan.lower()
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)


def test_pipeline_bucketed_checkpoint_resume(spark, tmp_path):
    """Round-4 VERDICT #9: the parse checkpoint written as a bucketed
    external table (P17 pre-keyed layout) gives a resumed run's group stage
    a zero-Exchange plan, with manifest counts identical to the plain run
    and to the resume."""
    import json

    from hypertrace_ingester_spark import datagen
    from hypertrace_ingester_spark.operators import group as grp
    from hypertrace_ingester_spark.plans.pipeline import (
        PARSE_BUCKET_COLS,
        PipelineConfig,
        _manifest_path,
        _parse_ckpt_table,
        run_pipeline,
    )

    seq = datagen.generate_sequences(spark, 4000)
    out = str(tmp_path / "bucketed")
    cfg = PipelineConfig(
        out_dir=out, checkpoint_parse=True, bucket_parse_checkpoint=True,
        parse_buckets=8, session_stage=True,
    )
    m1 = run_pipeline(spark, seq, cfg)

    out_plain = str(tmp_path / "plain")
    m2 = run_pipeline(spark, seq, PipelineConfig(out_dir=out_plain, session_stage=True))
    assert m1["stages"]["route"]["sink_counts"] == m2["stages"]["route"]["sink_counts"]
    assert m1["stages"]["sessions"]["n_sessions"] == m2["stages"]["sessions"]["n_sessions"]
    assert m1["stages"]["parse"]["bucketed"] is True

    # simulate a NEW session (in-memory catalog lost) + force the session
    # stage to re-run on resume so it reads the bucketed checkpoint
    spark.sql(f"DROP TABLE IF EXISTS {_parse_ckpt_table(out)}")
    with open(_manifest_path(out)) as f:
        manifest = json.load(f)
    del manifest["stages"]["sessions"]
    with open(_manifest_path(out), "w") as f:
        json.dump(manifest, f)

    m3 = run_pipeline(spark, seq.limit(0), cfg, resume=True)
    assert m3["stages"]["route"]["sink_counts"] == m1["stages"]["route"]["sink_counts"]
    assert m3["stages"]["sessions"]["n_sessions"] == m1["stages"]["sessions"]["n_sessions"]

    # the plan property itself: the resumed group stage (window + summary
    # aggregate keyed on the bucket cols) runs with NO Exchange
    parsed = spark.table(_parse_ckpt_table(out))
    sess = grp.session_summary(
        grp.sessionize(parsed, group_col=PARSE_BUCKET_COLS, ts_ms_col="ts_ms",
                       tiebreak_col="doc_id"),
        group_col=PARSE_BUCKET_COLS, ts_ms_col="ts_ms",
    )
    plan = sess._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    spark.sql(f"DROP TABLE IF EXISTS {_parse_ckpt_table(out)}")


def test_resume_uses_recorded_bucket_count_and_preserves_manifest(spark, tmp_path):
    """Round-4 review finds: (a) a resume with a DIFFERENT cfg.parse_buckets
    must re-declare the checkpoint with the count it was WRITTEN with
    (manifest-recorded), never the current cfg's; (b) the resumed run must
    carry the parse checkpoint facts forward in the manifest instead of
    rewriting them from the current cfg (which would make the NEXT resume
    recompute parse from the caller's placeholder input); (c)
    ensure_bucketed_table must refuse a pre-existing catalog entry with a
    mismatched layout instead of silently accepting it."""
    import json

    import pytest

    from hypertrace_ingester_spark import datagen
    from hypertrace_ingester_spark.plans.pipeline import (
        PARSE_BUCKET_COLS,
        PipelineConfig,
        _parse_ckpt_table,
        run_pipeline,
    )
    from hypertrace_ingester_spark.sources import bucketing

    seq = datagen.generate_sequences(spark, 2000)
    out = str(tmp_path / "drift")
    m1 = run_pipeline(spark, seq, PipelineConfig(
        out_dir=out, checkpoint_parse=True, bucket_parse_checkpoint=True,
        parse_buckets=8,
    ))
    assert m1["stages"]["parse"]["buckets"] == 8

    # (c) mismatched re-declare against the LIVE catalog entry raises
    tbl = _parse_ckpt_table(out)
    ckpt = out + "/_checkpoints/parsed"
    ddl = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                    for f in spark.read.parquet(ckpt).schema)
    with pytest.raises(ValueError, match="buckets"):
        bucketing.ensure_bucketed_table(
            spark, tbl, ckpt, ddl, PARSE_BUCKET_COLS, 32)

    # (a)+(b): new session analog + resume with a DRIFTED default (32)
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    m2 = run_pipeline(spark, seq.limit(0), PipelineConfig(
        out_dir=out, parse_buckets=32,   # checkpoint flags all default/absent
    ), resume=True)
    assert m2["stages"]["route"]["sink_counts"] == m1["stages"]["route"]["sink_counts"]
    # manifest still records the on-disk truth after the resume
    with open(out + "/_manifest.json") as f:
        m_disk = json.load(f)["stages"]["parse"]
    assert m_disk["checkpoint"] is True
    assert m_disk["bucketed"] is True
    assert m_disk["buckets"] == 8
    # and the re-declared table carries the written layout
    n, cols = bucketing._bucket_spec(spark, tbl)
    assert n == 8 and cols == list(PARSE_BUCKET_COLS)
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
