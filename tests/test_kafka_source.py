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
