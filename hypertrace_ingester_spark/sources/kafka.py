"""Kafka source face — reference S1, the span-normalizer's topic consumer
(`span-normalizer/span-normalizer/src/main/java/org/hypertrace/core/
spannormalizer/SpanNormalizer.java:55-61`: Kafka Streams `buildTopology`
consuming the raw-spans input topic).

Structured Streaming's kafka source is the Spark-first analog:
``readStream.format("kafka")`` yields the fixed wire schema (key/value
binary, topic, partition, offset, timestamp, ...) and the pipeline's own
deserialization turns the value bytes into typed sequence rows. That split
makes the semantics testable without a broker:

- :func:`decode_kafka_records` — pure DataFrame projection from the wire
  schema to the sequences schema plus per-record lineage columns
  (topic/partition/offset — the per-partition lineage the manifest tracks).
  Structured Streaming's contract is that transformations behave
  identically on static and streaming frames, so tests drive this with a
  static frame shaped like Kafka's output and assert per-row token-array
  equality through the round-trip.
- :func:`kafka_stream` — builds the production reader with the
  backpressure/robustness options a 10^12-row deployment needs. The
  spark-sql-kafka connector jar is absent from this sandbox (probed per
  round, same constraint note as Iceberg in BENCH/BASELINE.md), so a
  missing connector surfaces as a documented RuntimeError instead of a
  raw ClassNotFound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: What the pipeline expects inside each Kafka record's value (JSON): the
#: input_hint sequence shape. `source_line` carries the raw bytes the grok
#: path parses, mirroring the reference's pass-through of the original span.
SEQUENCE_VALUE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
        T.StructField("source_line", T.StringType()),
    ]
)

#: Lineage columns appended by decode_kafka_records. Offsets are the
#: replay cursor: (topic, partition, max offset) per micro-batch is exactly
#: the resume manifest the batch pipeline records per input split.
LINEAGE_COLS = ("kafka_topic", "kafka_partition", "kafka_offset", "kafka_ts")


def decode_kafka_records(records: DataFrame) -> DataFrame:
    """Wire schema → typed sequence rows + lineage + dead-letter flag.

    Malformed values (undecodable JSON or a JSON object missing doc_id)
    keep their raw bytes in ``raw_value`` with ``is_malformed=true`` so the
    caller can route them to a dead-letter sink instead of crashing the
    stream — the reference drops undeserializable spans with a counter
    (span-normalizer's deserialization error handling); here the row
    survives with its lineage so the loss is auditable.
    """
    parsed = records.select(
        F.from_json(F.col("value").cast("string"), SEQUENCE_VALUE_SCHEMA).alias("seq"),
        F.col("value").alias("raw_value"),
        F.col("topic").alias("kafka_topic"),
        F.col("partition").alias("kafka_partition"),
        F.col("offset").alias("kafka_offset"),
        F.col("timestamp").alias("kafka_ts"),
    )
    malformed = F.col("seq").isNull() | F.col("seq.doc_id").isNull()
    return parsed.select(
        F.col("seq.doc_id").alias("doc_id"),
        F.col("seq.tokens").alias("tokens"),
        F.col("seq.n_tok").alias("n_tok"),
        F.col("seq.source").alias("source"),
        F.col("seq.source_line").alias("source_line"),
        malformed.alias("is_malformed"),
        F.when(malformed, F.col("raw_value")).alias("raw_value"),
        *[F.col(c) for c in LINEAGE_COLS],
    )


def encode_kafka_records(seqs: DataFrame, topic: str = "sequences") -> DataFrame:
    """Inverse projection (sequences → wire shape) for tests and for
    producing to a downstream topic: JSON value bytes keyed by doc_id.
    The synthesized offsets are globally unique but NOT a dense
    per-partition cursor (monotonically_increasing_id embeds the Spark
    partition in its high bits) — enough for fixture lineage/max-offset
    checks; a real broker assigns true per-partition offsets."""
    return seqs.select(
        F.col("doc_id").cast("binary").alias("key"),
        F.to_json(
            F.struct("doc_id", "tokens", "n_tok", "source", "source_line")
        ).cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
        F.pmod(F.xxhash64("doc_id"), F.lit(8)).cast("int").alias("partition"),
        F.monotonically_increasing_id().alias("offset"),
        F.current_timestamp().alias("timestamp"),
    )


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = 5_000_000,
    min_partitions: int | None = None,
) -> DataFrame:
    """Configured production reader: returns the decoded streaming frame.

    Options chosen for the 10^12-sequence deployment:
    - ``maxOffsetsPerTrigger`` bounds each micro-batch (backpressure; keeps
      the fan-out write's task memory flat regardless of topic backlog),
    - ``minPartitions`` splits oversized topic partitions across executors
      (the salting analog at the source: a hot topic partition otherwise
      pins one task),
    - ``failOnDataLoss=false``: retention-expired offsets log-and-continue
      instead of killing the always-on query (the reference's consumer
      semantics on a reset topic).
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "false")
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    if min_partitions is None:
        min_partitions = spark.sparkContext.defaultParallelism * 2
    reader = reader.option("minPartitions", str(min_partitions))
    try:
        wire = reader.load()
    except Exception as exc:
        # re-diagnose ONLY the missing-connector failure (DATA_SOURCE_NOT_FOUND
        # / ClassNotFound); any other load() error — bad options, malformed
        # offsets JSON — propagates untouched so the caller debugs the real
        # cause instead of chasing a packaging problem (round-4 review find)
        msg = str(exc)
        if not any(s in msg for s in (
            "DATA_SOURCE_NOT_FOUND", "Failed to find the data source",
            "Failed to find data source", "ClassNotFoundException",
        )):
            raise
        raise RuntimeError(
            "spark-sql-kafka connector not available in this runtime; "
            "deploy with --packages org.apache.spark:spark-sql-kafka-0-10_2.13 "
            "(decode path is broker-independent: see decode_kafka_records)"
        ) from exc
    return decode_kafka_records(wire)
