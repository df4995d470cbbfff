"""End-to-end parse → enrich → route → aggregate pipeline with
checkpoint/resume and per-partition lineage manifests (north_rule).

Topology mirror of HypertraceIngester.buildTopology
(hypertrace-ingester/.../HypertraceIngester.java:79-127): sub-stages compose
into ONE lazy DataFrame DAG; the Kafka topic edges between the reference's
sub-topologies become either plain lineage (same job) or stage-boundary
parquet checkpoints (the resumable path). A run manifest records, per stage,
row counts, per-sink counts, and the input fingerprint — the per-partition
lineage + metrics manifest the north rule requires.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import datagen
from ..operators import aggregate as agg_ops
from ..operators import enrich as enrich_ops
from ..operators import group as group_ops
from ..operators import parse as parse_ops
from ..operators import route as route_ops
from ..sources import bucketing


@dataclass
class PipelineConfig:
    out_dir: str
    drop_criteria: parse_ops.DropCriteria = field(default_factory=lambda: parse_ops.DEFAULT_DROP)
    # None → no pre-write shuffle: each task streams straight into its
    # per-sink files (fastest; file count = tasks × sinks). Set an int to
    # hash-cluster output by (sink, salt) — fewer/larger files per sink at
    # the cost of shuffling the full payload (Iceberg write.distribution-mode
    # =hash equivalent); the salt spreads hot sinks (src-0 ≈ 40%).
    salt_buckets: int | None = None
    metric_window_ms: int = agg_ops.METRIC_WINDOW_MS
    checkpoint_parse: bool = False  # stage-boundary checkpoint for resume
    # write the parse checkpoint as a BUCKETED external table keyed by the
    # group key (P17 pre-keyed layout: the reference produces raw spans
    # keyed (tenant, trace_id) so the grouper never re-partitions,
    # JaegerSpanToAvroRawSpanTransformer.java:58-65). A resumed run's
    # group/join stages on that key then read the bucket layout with NO
    # Exchange — at 100 TB the biggest repeated shuffle becomes a one-time
    # write-side cost. Requires checkpoint_parse.
    bucket_parse_checkpoint: bool = False
    parse_buckets: int = 32
    # opt-in GROUP stage (raw-spans-grouper analog between normalizer and
    # enrichers in the reference topology, HypertraceIngester.java:79-127):
    # gap-sessionize surviving rows per (tenant_id, source) — the
    # (tenant, trace) analog on the sequences domain — and emit one summary
    # row per closed session to out_dir/sessions.
    session_stage: bool = False
    session_gap_ms: int = group_ops.SESSION_GAP_MS
    # persist the parse output when the upstream lineage is expensive to
    # recompute (e.g. a generator); False when input is a columnar table —
    # re-scanning with column pruning beats caching the full token payload.
    cache_parse: bool = False
    use_pandas_grok: bool = False
    # STREAMING ONLY, opt-in: commit each micro-batch's routed rows to a
    # snapshot-versioned table (out_dir/routed_snap) with the idempotent
    # batch_id gate — a foreachBatch retry replay no-ops, upgrading the
    # routed sink from parquet-append at-least-once to exactly-once (the
    # Iceberg recipe; sources/snapshots.py is the in-sandbox stand-in).
    # The sink lands as ONE table with `sink` as a column (snapshot
    # manifests replace partition dirs as the pruning metadata).
    snapshot_routed: bool = False


# the pre-keyed layout's key: the (tenant, trace_id) analog for sequences
PARSE_BUCKET_COLS = ["tenant_id", "source"]
PARSE_SORT_COLS = ["tenant_id", "source", "ts_ms", "doc_id"]


def _parse_ckpt_table(out_dir: str) -> str:
    import hashlib

    return "parsed_ckpt_" + hashlib.md5(out_dir.encode()).hexdigest()[:10]


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest.json")


def load_manifest(out_dir: str) -> dict:
    p = _manifest_path(out_dir)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"stages": {}}


def _write_manifest(out_dir: str, manifest: dict) -> None:
    os.makedirs(out_dir, exist_ok=True)
    with open(_manifest_path(out_dir), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True, default=str)


def _partition_lineage(df: DataFrame) -> list[dict]:
    """Per-partition row counts — lineage evidence without a full collect.

    Uses a spark_partition_id groupBy (one extra pass over the cached stage
    output), the distributed analog of the reference's per-task counters."""
    rows = (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .count()
        .orderBy("partition_id")
        .collect()
    )
    return [{"partition_id": r["partition_id"], "rows": r["count"]} for r in rows]


def run_pipeline(
    spark: SparkSession,
    sequences: DataFrame,
    cfg: PipelineConfig,
    ctx: enrich_ops.EnrichContext | None = None,
    route_rules: DataFrame | None = None,
    resume: bool = False,
    lineage: bool = False,
) -> dict:
    """Run the full DAG; returns the manifest dict (also written to out_dir).

    With ``resume=True``, stages already marked complete in the manifest are
    skipped and their checkpointed output is re-read — restart-safe the way
    the reference resumes from RocksDB state + changelog topics."""
    t0 = time.time()
    manifest = load_manifest(cfg.out_dir) if resume else {"stages": {}}
    manifest.setdefault("config", {})["salt_buckets"] = cfg.salt_buckets

    ctx = ctx or enrich_ops.EnrichContext(
        endpoints=datagen.endpoints_dim(spark),
        services=datagen.services_dim(spark),
        status_codes=datagen.status_codes_dim(spark),
    )
    route_rules = route_rules if route_rules is not None else datagen.route_rules_dim(spark)

    # ---- PARSE ----------------------------------------------------------
    parse_ckpt = os.path.join(cfg.out_dir, "_checkpoints", "parsed")
    cached_parse = None
    parse_state = manifest["stages"].get("parse", {})
    resumed_from_ckpt = bool(
        resume and parse_state.get("complete") and parse_state.get("checkpoint")
    )
    if resumed_from_ckpt:
        # resume re-reads the checkpoint only if one was actually written;
        # a complete-but-uncheckpointed parse stage is recomputed (cheap,
        # deterministic) — the route/aggregate skips below still apply
        if parse_state.get("bucketed"):
            # re-declare the bucket layout (the default catalog is
            # in-memory, so a new session has lost it); the planner then
            # drops Exchanges on the bucket key for every downstream
            # group/join — the P17 zero-shuffle resume path
            schema_ddl = ", ".join(
                f"`{f.name}` {f.dataType.simpleString()}"
                for f in spark.read.parquet(parse_ckpt).schema
            )
            # the layout is re-declared with the bucket count the checkpoint
            # was WRITTEN with (manifest-recorded), not the current cfg's —
            # a drifted declared count would make the planner drop Exchanges
            # over wrong bucket ids (round-4 review find)
            parsed = bucketing.ensure_bucketed_table(
                spark, _parse_ckpt_table(cfg.out_dir), parse_ckpt, schema_ddl,
                PARSE_BUCKET_COLS,
                int(parse_state.get("buckets", cfg.parse_buckets)),
                PARSE_SORT_COLS,
            )
        else:
            parsed = spark.read.parquet(parse_ckpt)
    else:
        parsed = parse_ops.parse_sequences(
            sequences, drop_criteria=cfg.drop_criteria, use_pandas_grok=cfg.use_pandas_grok
        )
        if cfg.checkpoint_parse and cfg.bucket_parse_checkpoint:
            tbl = _parse_ckpt_table(cfg.out_dir)
            bucketing.write_bucketed(
                parsed, tbl, PARSE_BUCKET_COLS, cfg.parse_buckets,
                sort_cols=PARSE_SORT_COLS, path=parse_ckpt,
            )
            parsed = spark.table(tbl)
        elif cfg.checkpoint_parse:
            parsed.write.mode("overwrite").parquet(parse_ckpt)
            parsed = spark.read.parquet(parse_ckpt)
        elif cfg.cache_parse:
            # persist only when the upstream lineage is expensive; for
            # columnar-table input the downstream consumers each re-scan
            # with column pruning, which is cheaper than caching tokens.
            parsed = parsed.persist()
            cached_parse = parsed

    counters = agg_ops.operational_counters(parsed)

    # ---- ENRICH (single pass; no branch-union double scan) --------------
    # The reference branches bypass spans around enrichment
    # (SpanNormalizer.java:66-70). Expressed as two filter+union branches
    # that costs a second scan of the input; instead enrich ALL surviving
    # rows in one pass and null out the dim-lookup columns for bypass rows
    # afterwards — identical result, half the scans.
    alive = parsed.filter(F.col("has_tenant") & ~F.col("is_dropped")).select(
        *parse_ops.PARSE_OUTPUT_COLS
    )
    # fused path: ONE composite broadcast join instead of three — each
    # chained join re-materializes the wide token payload
    enriched_all = enrich_ops.enrich_with_bypass(alive, ctx)

    # ---- GROUP (opt-in; raw-spans-grouper analog) ------------------------
    n_sessions = None
    if cfg.session_stage and not (
        resume and manifest["stages"].get("sessions", {}).get("complete")
    ):
        sessions = group_ops.session_summary(
            group_ops.sessionize(
                alive, group_col=PARSE_BUCKET_COLS, ts_ms_col="ts_ms",
                tiebreak_col="doc_id", gap_ms=cfg.session_gap_ms,
            ),
            group_col=PARSE_BUCKET_COLS,
            ts_ms_col="ts_ms",
        )
        sessions_dir = os.path.join(cfg.out_dir, "sessions")
        sessions.write.mode("overwrite").parquet(sessions_dir)
        n_sessions = spark.read.parquet(sessions_dir).count()

    # ---- ROUTE ----------------------------------------------------------
    routed = route_ops.route(enriched_all, route_rules)
    routed_dir = os.path.join(cfg.out_dir, "routed")
    if not (resume and manifest["stages"].get("route", {}).get("complete")):
        route_ops.fan_out(routed, routed_dir, cfg.salt_buckets)
    # explicit schema: robust to an empty fan-out (no files ⇒ no inference)
    routed_back = spark.read.schema(routed.schema).parquet(routed_dir)

    # ---- AGGREGATE ------------------------------------------------------
    # two pruned scans of the routed parquet (neither touches tokens)
    metrics = agg_ops.sink_metrics(routed_back, cfg.metric_window_ms)
    histogram = agg_ops.token_histogram(routed_back)
    metrics_dir = os.path.join(cfg.out_dir, "metrics")
    metrics.write.mode("overwrite").parquet(metrics_dir)
    histogram.write.mode("overwrite").parquet(os.path.join(cfg.out_dir, "histogram"))

    # ---- manifest: per-sink counts + per-tenant counters + lineage ------
    # sink counts roll up from the (tiny) metrics output instead of
    # re-scanning the routed data
    sink_counts = {
        r["sink"]: r["n"]
        for r in spark.read.parquet(metrics_dir)
        .groupBy("sink").agg(F.sum("num_rows").alias("n")).collect()
    }
    tenant_counters = [r.asDict() for r in counters.collect()]
    if resumed_from_ckpt:
        # the checkpoint on disk is what it always was — carry the prior
        # record forward instead of rewriting it from the CURRENT cfg, which
        # would erase the checkpoint/bucketed/buckets facts and make the
        # NEXT resume recompute parse from the caller's (possibly
        # placeholder) input (round-4 review find)
        manifest["stages"]["parse"] = dict(parse_state)
    else:
        manifest["stages"]["parse"] = {
            "complete": True,
            "checkpoint": cfg.checkpoint_parse,
            "bucketed": bool(cfg.checkpoint_parse and cfg.bucket_parse_checkpoint),
        }
        if cfg.checkpoint_parse and cfg.bucket_parse_checkpoint:
            manifest["stages"]["parse"]["buckets"] = cfg.parse_buckets
    if cfg.session_stage:
        prior = manifest["stages"].get("sessions", {})
        manifest["stages"]["sessions"] = {
            "complete": True,
            "n_sessions": n_sessions if n_sessions is not None else prior.get("n_sessions"),
        }
    manifest["stages"]["route"] = {"complete": True, "sink_counts": sink_counts}
    manifest["stages"]["aggregate"] = {"complete": True}
    manifest["tenant_counters"] = tenant_counters
    manifest["total_routed_rows"] = int(sum(sink_counts.values()))
    if lineage:
        manifest["stages"]["route"]["partition_lineage"] = _partition_lineage(routed_back)
    manifest["elapsed_sec"] = round(time.time() - t0, 3)
    _write_manifest(cfg.out_dir, manifest)
    # S6 exporter: the same counters in Prometheus text exposition format
    # (textfile-collector contract; see sources/prometheus.py)
    from ..sources import prometheus as prom

    prom.write_pipeline_metrics(cfg.out_dir, manifest)
    if cached_parse is not None:
        cached_parse.unpersist()
    return manifest
