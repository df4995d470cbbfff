"""Streaming-face tests — RawSpansGrouperTest analog (SURVEY.md §5.2):
drive the streaming session/metric operators with a bounded micro-batch
stream and assert window semantics after the stream drains.
"""

import time

import pytest
from pyspark.sql import functions as F

from hypertrace_ingester_spark.streaming.jobs import (
    streaming_metrics,
    streaming_sessionize,
)


def _drain(query, timeout_s=60):
    deadline = time.time() + timeout_s
    while query.isActive and time.time() < deadline:
        query.processAllAvailable()
        break
    query.stop()


@pytest.fixture()
def stream_events(spark, tmp_path):
    """Bounded file stream: 2 users, two 30min-gapped sessions each."""
    rows = []
    base = 1_700_000_000_000
    for user in (1, 2):
        for s in range(2):
            for i in range(3):
                rows.append((user * 100 + s * 10 + i, base + s * 7_200_000 + i * 60_000, user, "click"))
    df = spark.createDataFrame(rows, "event_id long, ts_ms long, user_id long, event_type string")
    path = str(tmp_path / "stream_in")
    df.coalesce(1).write.parquet(path)
    schema = df.schema
    return (
        spark.readStream.schema(schema)
        .parquet(path)
        .withColumn("ts", F.timestamp_millis(F.col("ts_ms")))
    )


def test_streaming_sessionize(spark, stream_events):
    out = streaming_sessionize(stream_events, gap="30 minutes", watermark="0 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode only emits CLOSED windows; with a bounded stream the final
    # watermark never advances past the last session, so closed = sessions
    # strictly before the max event time seen. 2 users × first session close.
    res = spark.sql("select * from sessions_out").collect()
    by_user = {}
    for r in res:
        by_user.setdefault(r["user_id"], []).append(r)
    for user, sessions in by_user.items():
        for s in sessions:
            assert s["n_events"] == 3, s
    assert len(res) >= 2  # at least the first session per user closed


def test_streaming_metrics(spark, stream_events):
    out = streaming_metrics(stream_events, window="1 hour", watermark="0 seconds",
                            group_cols=("event_type",))
    q = (
        out.writeStream.format("memory")
        .queryName("metrics_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    res = spark.sql("select * from metrics_out").collect()
    # first 1h bucket (both users' session-0 events) must have closed: 6 rows
    assert any(r["num_rows"] == 6 for r in res), res
