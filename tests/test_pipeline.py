"""End-to-end DAG test — HypertraceIngesterTest.java:53-132 analog (F5):
pipe rows through the full parse→enrich→route→aggregate DAG, assert each
stage's output is sound, per-sink counts reconcile, and token arrays survive
end-to-end bit-identical."""

import json
import os

import pytest
from pyspark.sql import functions as F

from hypertrace_ingester_spark import datagen
from hypertrace_ingester_spark.plans.pipeline import PipelineConfig, load_manifest, run_pipeline


@pytest.fixture(scope="module")
def run(spark, sequences, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pipe"))
    manifest = run_pipeline(
        spark, sequences, PipelineConfig(out_dir=out, checkpoint_parse=True), lineage=True
    )
    return out, manifest


def test_counts_reconcile(spark, sequences, run):
    out, manifest = run
    received = sum(c["received"] for c in manifest["tenant_counters"])
    dropped = sum(c["dropped"] for c in manifest["tenant_counters"])
    missing = sum(c["missing_tenant"] for c in manifest["tenant_counters"])
    assert received == sequences.count()
    # routed = received - dropped - missing-tenant (bypass rows ARE routed)
    dropped_with_tenant = dropped  # drop rule applies only to tenant-having rows in fixture
    assert manifest["total_routed_rows"] == received - dropped_with_tenant - missing


def test_sink_counts_match_files(spark, run):
    out, manifest = run
    routed = spark.read.parquet(os.path.join(out, "routed"))
    on_disk = {r["sink"]: r["count"] for r in routed.groupBy("sink").count().collect()}
    assert on_disk == manifest["stages"]["route"]["sink_counts"]
    # 8 sources → 3 sinks (F3.3)
    assert set(on_disk) == {"sink-0", "sink-1", "sink-2"}


def test_token_array_equality_end_to_end(spark, sequences, run):
    """Per-row token-array equality input → routed sink files (north_rule)."""
    out, _ = run
    routed = spark.read.parquet(os.path.join(out, "routed"))
    joined = sequences.select("doc_id", "tokens").alias("in").join(
        routed.select("doc_id", "tokens").alias("out"), "doc_id"
    )
    assert joined.filter(F.col("in.tokens") != F.col("out.tokens")).count() == 0
    assert routed.select("doc_id").distinct().count() == routed.count()  # no dup/loss


def test_metrics_totals(spark, run):
    out, manifest = run
    metrics = spark.read.parquet(os.path.join(out, "metrics"))
    assert metrics.agg(F.sum("num_rows")).first()[0] == manifest["total_routed_rows"]
    hist = spark.read.parquet(os.path.join(out, "histogram"))
    assert hist.agg(F.sum("num_rows")).first()[0] == manifest["total_routed_rows"]


def test_partition_lineage_recorded(run):
    out, manifest = run
    lineage = manifest["stages"]["route"]["partition_lineage"]
    assert sum(p["rows"] for p in lineage) == manifest["total_routed_rows"]


def test_resume_skips_completed_stages(spark, sequences, run):
    out, first = run
    resumed = run_pipeline(
        spark, sequences, PipelineConfig(out_dir=out, checkpoint_parse=True), resume=True
    )
    assert resumed["total_routed_rows"] == first["total_routed_rows"]
    assert resumed["stages"]["route"]["sink_counts"] == first["stages"]["route"]["sink_counts"]


def test_manifest_is_valid_json(run):
    out, _ = run
    m = load_manifest(out)
    json.dumps(m)  # round-trips
    assert m["stages"]["aggregate"]["complete"]


def test_resume_without_checkpoint(spark, sequences, tmp_path):
    """Resume when parse was complete but NOT checkpointed: parse recomputes
    (deterministic) and the run still succeeds with identical results."""
    out = str(tmp_path / "nockpt")
    first = run_pipeline(spark, sequences, PipelineConfig(out_dir=out))
    resumed = run_pipeline(
        spark, sequences, PipelineConfig(out_dir=out), resume=True
    )
    assert resumed["total_routed_rows"] == first["total_routed_rows"]
    assert resumed["stages"]["route"]["sink_counts"] == first["stages"]["route"]["sink_counts"]


def test_empty_input(spark, sequences, tmp_path):
    out = str(tmp_path / "empty")
    manifest = run_pipeline(spark, sequences.limit(0), PipelineConfig(out_dir=out))
    assert manifest["total_routed_rows"] == 0
    assert manifest["stages"]["route"]["sink_counts"] == {}


def test_prometheus_exposition(spark, run):
    """S6 exporter: metrics.prom in Prometheus text exposition format,
    values matching the manifest's sink counts."""
    out, manifest = run
    path = os.path.join(out, "metrics.prom")
    assert os.path.exists(path)
    text = open(path).read()
    assert "# TYPE ingester_routed_rows_total counter" in text
    for sink, n in manifest["stages"]["route"]["sink_counts"].items():
        assert f'ingester_routed_rows_total{{sink="{sink}"}} {n}' in text
    assert "# TYPE ingester_run_seconds gauge" in text  # durations are gauges
