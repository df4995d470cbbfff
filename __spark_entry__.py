"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship parse→enrich→route→aggregate DAG over the
sf0.001 events table; ``queries()`` / ``oracle_sql()`` expose the operator
catalog from ``hypertrace_ingester_spark.queries`` (one entry per implemented
operator from SURVEY.md §2 plus the training-data dedup/similarity/text ops).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hypertrace_ingester_spark import queries as qcat
from hypertrace_ingester_spark.operators import views as vw
from hypertrace_ingester_spark.sources import load_table

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the full pipeline collapsed to its aggregate face.

    parse (JSON attr extraction + ms normalization) → enrich (status/kind
    classification) → route (rule fan-out to sinks) → aggregate (per-sink,
    per-hour counts). One scan, one shuffle (the final groupBy).
    """
    qcat.ensure_session_confs(spark)  # driver-owned session: pin SQL confs
    events = load_table(spark, SF0001, "events")
    enriched = vw.span_event_view(events)  # parse + enrich projections
    sink = (
        F.when(F.col("status_state") == "FAIL", "sink-dlq")
        .when(F.col("kind") == "ENTRY", "sink-0")
        .otherwise("sink-1")
    )
    bucket = (F.col("ts_ms") - F.col("ts_ms") % 3_600_000).alias("bucket_start_ms")
    return (
        enriched.withColumn("sink", sink)
        .groupBy("sink", bucket)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("value_r"), 2).alias("total_value"),
            F.sum(F.when(F.col("status_state") == "FAIL", 1).otherwise(0))
            .cast("long")
            .alias("error_rows"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return qcat.queries()


def oracle_sql() -> dict[str, str]:
    return qcat.oracle_sql()
