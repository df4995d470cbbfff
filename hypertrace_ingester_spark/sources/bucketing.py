"""Bucketed-table layout — the "re-key once, never shuffle again" path.

The reference keeps spans co-located by trace via pre-keyed Kafka topics
(raw spans are produced keyed on (tenant, trace_id) —
JaegerSpanToAvroRawSpanTransformer.java:58-65 — so the grouper's state
store never re-partitions). The warehouse analog is a BUCKETED table:
write the fact table bucketed (and sorted) by its group key once, and
every later groupBy/join on that key reads the bucket layout instead of
shuffling — at 100 TB that turns the biggest repeated Exchange in the
workload into a one-time write-side cost. (On Iceberg the same contract
is `bucket(N, key)` partition transforms + `write.distribution-mode=hash`;
Spark's Hive-style bucketing is the in-sandbox equivalent with identical
plan behavior.)

`tests/test_bucketing.py` pins the plan property: an aggregate over the
bucket key on the bucketed table has NO Exchange, and the same aggregate
over the plain parquet copy does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Materialize ``df`` as a bucketed (+ sorted-within-bucket) parquet
    table in the session catalog. Sorting by the read-side window order
    (e.g. (user_id, ts_ms)) additionally lets window functions skip their
    Sort at read time."""
    (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back; the scan reports the bucket layout as
    its output partitioning, so Catalyst drops Exchanges whose required
    distribution it already satisfies."""
    return spark.table(table)
