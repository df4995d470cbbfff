"""Deterministic per-source upsampling — full DuckDB oracle via the
engine-shared md5 unit hash (production keeps xxhash64; hash-agnostic)."""

import os

import duckdb
import pytest

from pyspark.sql import functions as F

from hypertrace_ingester_spark.oracle import compare, duckdb_connection
from hypertrace_ingester_spark.operators import sampling

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata dir {SF_DIR} missing"
)

# src0 ×2.3 epochs, src1 downsampled to 0.4, src2 exactly 3, src3 dropped;
# every other source keeps weight 1.0 implicitly
WEIGHTS = {"src0": 2.3, "src1": 0.4, "src2": 3.0, "src3": 0.0}
SEED = 3

_ORACLE = f"""
WITH w(source, fl, fb) AS (
  VALUES ('src0', 2, 300000), ('src1', 0, 400000),
         ('src2', 3, 0),      ('src3', 0, 0)
),
cop AS (
  SELECT d.doc_id, d.source,
         coalesce(w.fl, 1)
         + CASE WHEN ('0x' || substr(md5(d.doc_id::VARCHAR || ':{SEED}'), 1, 8))::BIGINT
                     % {sampling.BUCKETS} < coalesce(w.fb, 0)
                THEN 1 ELSE 0 END AS copies
  FROM documents d LEFT JOIN w USING (source)
)
SELECT doc_id, source, CAST(g.epoch AS BIGINT) AS epoch
FROM cop, generate_series(0, 3) g(epoch)
WHERE g.epoch < copies
"""


def test_upsample_matches_duckdb_oracle(spark):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    got = (
        sampling.upsample(
            docs, WEIGHTS, seed=SEED, unit_hash=sampling.md5_unit_hash
        )
        .select("doc_id", "source", F.col("epoch").cast("long").alias("epoch"))
        .toPandas()
    )
    want = duckdb_connection(SF_DIR).execute(_ORACLE).fetchdf()
    problems = compare(got, want)
    assert not problems, problems


def test_upsample_expectation_and_determinism(spark):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    out = sampling.upsample(docs, WEIGHTS)  # production xxhash64 path
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    base = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert "src3" not in counts  # weight 0 drops the source entirely
    assert counts["src2"] == 3 * base["src2"]  # integer weight is exact
    # fractional weights hit expectation within hash-quantization noise
    assert 2 * base["src0"] <= counts["src0"] <= 3 * base["src0"]
    assert 0 < counts["src1"] < base["src1"]
    # untouched sources keep exactly one copy, epoch 0
    assert counts["src5"] == base["src5"]
    assert out.where("source = 'src5' and epoch != 0").count() == 0
    # deterministic: same inputs, same multiset
    again = sampling.upsample(docs, WEIGHTS)
    assert (
        out.select("doc_id", "epoch").exceptAll(again.select("doc_id", "epoch")).count()
        == 0
    )
