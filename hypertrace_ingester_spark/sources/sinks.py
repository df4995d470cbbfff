"""Sink bootstrap — view-creator analog (SURVEY.md §2.1 S5,
hypertrace-view-generator/hypertrace-view-creator configs).

The reference runs a one-shot job that pre-creates each Pinot view table
before ingestion. Here the analog registers each sink as a (partitioned)
table in the session catalog ahead of the first write — on a cluster this
is the `CREATE TABLE ... USING iceberg PARTITIONED BY (...)` DDL; locally
it creates parquet-backed external tables over the sink directories so the
fan-out output is immediately queryable by name.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def create_sink_tables(
    spark: SparkSession,
    routed_schema: DataFrame,
    out_dir: str,
    sinks: list[str],
    database: str = "sinks",
) -> list[str]:
    """Create one external table per sink over `{out_dir}/routed/sink=<s>`.

    Idempotent (CREATE IF NOT EXISTS); returns the qualified table names."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    ddl_cols = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in routed_schema.schema.fields
        if f.name != "sink"
    )
    names = []
    for sink in sinks:
        table = f"{database}.{sink.replace('-', '_')}"
        path = os.path.join(out_dir, "routed", f"sink={sink}")
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {table} ({ddl_cols}) "
            f"USING parquet LOCATION '{path}'"
        )
        names.append(table)
    return names
