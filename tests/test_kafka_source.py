"""Kafka source face (reference S1) — broker-free tests.

Structured Streaming transformations are identical on static and streaming
frames, so the decode projection is exercised on a static frame with
Kafka's exact wire schema; the broker-dependent reader is asserted to fail
with the documented error in this connector-less sandbox.
"""

import pytest
from pyspark.sql import functions as F

from hypertrace_ingester_spark import datagen
from hypertrace_ingester_spark.sources import kafka as ks


@pytest.fixture(scope="module")
def wire(spark):
    seqs = datagen.generate_sequences(spark, 300, partitions=4)
    return ks.encode_kafka_records(seqs, topic="sequences"), seqs


def test_round_trip_token_array_equality(spark, wire):
    """The per-row invariant (input_hint): token arrays survive the
    encode→decode round-trip bit-identically, along with every other
    sequence column."""
    encoded, seqs = wire
    decoded = ks.decode_kafka_records(encoded)
    assert decoded.filter(F.col("is_malformed")).count() == 0
    back = decoded.select("doc_id", "tokens", "n_tok", "source", "source_line")
    assert back.exceptAll(seqs).count() == 0
    assert seqs.exceptAll(back).count() == 0


def test_lineage_columns_survive_decode(spark, wire):
    """Per-partition lineage: (topic, partition, offset) ride along every
    decoded row — the replay cursor the manifest records per split."""
    encoded, _ = wire
    decoded = ks.decode_kafka_records(encoded)
    for c in ks.LINEAGE_COLS:
        assert c in decoded.columns
    row = decoded.filter(F.col("doc_id") == "doc-000000000000").first()
    assert row["kafka_topic"] == "sequences"
    assert 0 <= row["kafka_partition"] < 8
    # max-offset-per-partition is derivable (the micro-batch commit record)
    cur = decoded.groupBy("kafka_topic", "kafka_partition").agg(
        F.max("kafka_offset").alias("max_offset")
    )
    assert cur.count() == decoded.select("kafka_partition").distinct().count()


def test_malformed_values_dead_letter_not_crash(spark):
    rows = [
        (b"k1", b'{"doc_id": "doc-1", "tokens": [1, 2], "n_tok": 2, '
                b'"source": "src-0", "source_line": "ts=1"}', "t", 0, 0),
        (b"k2", b"not json at all", "t", 0, 1),
        (b"k3", b'{"no_doc_id": true}', "t", 0, 2),
        (b"k4", None, "t", 0, 3),
    ]
    wire = spark.createDataFrame(
        rows, "key binary, value binary, topic string, partition int, offset long"
    ).withColumn("timestamp", F.current_timestamp())
    out = ks.decode_kafka_records(wire)
    assert out.count() == 4  # nothing dropped
    bad = out.filter(F.col("is_malformed"))
    assert bad.count() == 3
    # dead-letter rows keep their raw bytes + lineage for audit
    assert bad.filter(F.col("raw_value").isNotNull()).count() == 2  # null value stays null
    assert bad.filter(F.col("kafka_offset").isin(1, 2, 3)).count() == 3
    good = out.filter(~F.col("is_malformed")).first()
    assert good["doc_id"] == "doc-1" and good["tokens"] == [1, 2]
    assert good["raw_value"] is None  # payload not duplicated for good rows


def test_decoded_frame_feeds_the_pipeline_parse_stage(spark, wire):
    """The decoded frame is a drop-in for the batch source: the parse stage
    consumes it unchanged (minus the kafka bookkeeping columns)."""
    from hypertrace_ingester_spark.operators import parse as parse_ops

    encoded, _ = wire
    decoded = ks.decode_kafka_records(encoded).filter(~F.col("is_malformed"))
    seqs = decoded.drop("is_malformed", "raw_value", *ks.LINEAGE_COLS)
    parsed = parse_ops.parse_sequences(seqs)
    assert parsed.count() == 300
    assert "tenant_id" in parsed.columns


def test_kafka_stream_raises_documented_error_without_connector(spark):
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        ks.kafka_stream(spark, "localhost:9092", "sequences")


def test_kafka_wire_stream_through_full_pipeline(spark, tmp_path):
    """End-to-end streaming integration: kafka-wire-shaped records arrive as
    a bounded file stream (identical columns to readStream.format('kafka')),
    are decoded mid-stream, and the full foreachBatch pipeline fans them out
    — the deployment shape of the production Kafka path, minus only the
    broker. Dead-letter rows are filtered to a quarantine sink with their
    lineage, and the routed token payload survives bit-identically."""
    from pyspark.sql import functions as F

    from hypertrace_ingester_spark import datagen
    from hypertrace_ingester_spark.plans.pipeline import PipelineConfig
    from hypertrace_ingester_spark.plans.streaming_pipeline import (
        run_streaming_pipeline,
    )

    seqs = datagen.generate_sequences(spark, 400, partitions=2)
    wire_path = str(tmp_path / "wire_in")
    wire = ks.encode_kafka_records(seqs).withColumn(
        "timestamp", F.lit(None).cast("timestamp")
    )
    # one malformed record rides along (undecodable value bytes)
    bad = spark.createDataFrame(
        [(b"bad", b"not json", "sequences", 0, -1, None)], wire.schema
    )
    wire.union(bad).write.parquet(wire_path)

    stream = (
        spark.readStream.schema(wire.schema).parquet(wire_path)
        .transform(ks.decode_kafka_records)
    )
    quarantine = stream.filter(F.col("is_malformed")).select(
        "raw_value", *ks.LINEAGE_COLS
    )
    qq = (
        quarantine.writeStream.format("memory").queryName("kafka_dead_letter")
        .outputMode("append").trigger(availableNow=True).start()
    )
    good = stream.filter(~F.col("is_malformed")).drop(
        "is_malformed", "raw_value", *ks.LINEAGE_COLS
    )
    out_dir = str(tmp_path / "out")
    q = run_streaming_pipeline(
        spark, good, PipelineConfig(out_dir=out_dir), trigger_available_now=True
    )
    q.awaitTermination(180)
    qq.awaitTermination(60)

    dead = spark.sql("select * from kafka_dead_letter").collect()
    assert len(dead) == 1 and dead[0]["kafka_offset"] == -1

    routed = spark.read.parquet(out_dir + "/routed")
    # pipeline invariant on the kafka path: routed token arrays equal the
    # original generator's for every surviving doc_id
    orig = seqs.select("doc_id", F.col("tokens").alias("orig_tokens"))
    joined = routed.join(orig, "doc_id")
    assert joined.count() == routed.count()
    assert joined.filter(F.col("tokens") != F.col("orig_tokens")).count() == 0
