"""Small-file compaction (sources/compaction.py).

- flat + hive-partitioned dirs: appended fragments collapse to the size
  target, rows/values/partition columns byte-identical, second run is a
  no-op (idempotent nightly maintenance);
- bucketed tables: after N index appends each bucket holds N×tasks files;
  compaction lands EXACTLY one file per non-empty bucket with no Exchange
  in the rewrite read (bucket-aligned scan: one task == one bucket), the
  catalog layout survives, and downstream zero-Exchange plans + the
  incremental-dedup probe behave identically before/after.
"""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from hypertrace_ingester_spark.operators import incremental as inc
from hypertrace_ingester_spark.sources import bucketing, compaction

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata dir {SF_DIR} missing"
)


def test_compact_flat_dir(spark, tmp_path):
    path = str(tmp_path / "flat")
    df = spark.range(0, 3000).withColumn("v", F.col("id") * 2)
    for _ in range(3):
        df.repartition(16).write.mode("append").parquet(path)
    before = compaction.file_stats(path)
    assert before["n_files"] == 48

    manifest = compaction.compact_dir(spark, path, target_mb=256)
    assert manifest["leaves_compacted"] == 1
    assert manifest["files_after"] < manifest["files_before"]
    assert compaction.file_stats(path)["n_files"] == 1  # tiny table → 1 file

    back = spark.read.parquet(path)
    assert back.count() == 9000
    assert back.agg(F.sum("v")).first()[0] == 3 * 2 * sum(range(3000))

    # idempotent: already-compact leaves are skipped entirely
    again = compaction.compact_dir(spark, path, target_mb=256)
    assert again["leaves_compacted"] == 0
    assert again["files_after"] == again["files_before"]


def test_compact_partitioned_dir(spark, tmp_path):
    path = str(tmp_path / "parted")
    df = spark.range(0, 2000).withColumn(
        "sink", F.when(F.col("id") % 2 == 0, "alpha").otherwise("beta")
    )
    for _ in range(3):
        df.repartition(8).write.mode("append").partitionBy("sink").parquet(path)
    before = compaction.file_stats(path)
    assert before["n_files"] == 48  # 8 tasks × 2 sinks × 3 appends

    manifest = compaction.compact_dir(spark, path, target_mb=256)
    assert manifest["leaves_compacted"] == 2
    assert compaction.file_stats(path)["n_files"] == 2  # one per partition

    back = spark.read.parquet(path)
    got = {r["sink"]: r["n"] for r in back.groupBy("sink").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert got == {"alpha": 3000, "beta": 3000}  # partition col survives


@pytest.fixture(scope="module")
def appended_index(spark, tmp_path_factory):
    """An index built once then appended twice — the daily-crawl file
    fragmentation compaction exists for."""
    path = str(tmp_path_factory.mktemp("compact") / "index")
    src = pd.read_parquet(os.path.join(SF_DIR, "documents.parquet"),
                          columns=["doc_id", "text"])
    docs = spark.createDataFrame(src).repartition(8)
    prefix = "cidx_compact"
    inc.build_index(docs.where(F.col("doc_id") % 3 == 0), path, prefix=prefix,
                    n_buckets=8)
    inc.build_index(docs.where(F.col("doc_id") % 3 == 1), path, prefix=prefix,
                    n_buckets=8, mode="append")
    inc.build_index(docs.where(F.col("doc_id") % 3 == 2), path, prefix=prefix,
                    n_buckets=8, mode="append")
    yield path, prefix, src
    for t in ("exact", "bands", "sigs"):
        spark.sql(f"DROP TABLE IF EXISTS {prefix}_{t}")


def test_compact_bucketed_index(spark, appended_index):
    path, prefix, src = appended_index
    idx = inc.load_index(spark, path, prefix=prefix)
    rows_before = {t: idx[t].count() for t in ("exact", "bands", "sigs")}
    files_before = {
        t: compaction.file_stats(f"{path}/{t}")["n_files"]
        for t in ("exact", "bands", "sigs")
    }
    # three appends of an 8-partition frame fragment every bucket
    assert all(n > 8 for n in files_before.values())

    manifest = compaction.compact_index(spark, path, prefix=prefix)

    for t in ("exact", "bands", "sigs"):
        stats = compaction.file_stats(f"{path}/{t}")
        assert stats["n_files"] <= 8, t  # exactly one file per non-empty bucket
        assert stats["n_files"] < files_before[t], t
        assert manifest[t]["files_after"] == stats["n_files"]

    # geometry meta untouched, layout re-validated, rows identical
    idx2 = inc.load_index(spark, path, prefix=prefix)
    assert idx2["_meta"]["n_buckets"] == 8
    for t in ("exact", "bands", "sigs"):
        assert idx2[t].count() == rows_before[t], t

    # the zero-Exchange read property the layout exists for still holds
    plan = (
        idx2["exact"].groupBy("text_hash").agg(F.count(F.lit(1)).alias("n"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan

    # bucket-aligned rewrite: the compacted scan is one task per bucket
    auto_key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(auto_key, "true")
    spark.conf.set(auto_key, "false")
    try:
        assert idx2["exact"].rdd.getNumPartitions() == 8
    finally:
        spark.conf.set(auto_key, prev)


def test_probe_behaves_identically_after_compaction(spark, appended_index):
    path, prefix, src = appended_index
    idx = inc.load_index(spark, path, prefix=prefix)
    long_doc = src[src["text"].str.count(" ") >= 30].iloc[0]
    delta = spark.createDataFrame(
        pd.DataFrame(
            [
                {"doc_id": 990000, "text": long_doc["text"]},  # exact re-present
                {"doc_id": 990001,
                 "text": " ".join(f"qzc{j}" for j in range(40))},  # fresh
            ]
        )
    )
    kept, manifest = inc.incremental_dedup(delta, idx, threshold=0.5)
    assert manifest["exact_dups_vs_corpus"] == 1
    assert manifest["kept"] == 1
    assert [r["doc_id"] for r in kept.select("doc_id").collect()] == [990001]
