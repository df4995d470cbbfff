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
