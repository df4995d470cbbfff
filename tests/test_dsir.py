"""DSIR importance-resampling weights — full DuckDB oracle.

Target corpus = the src0 documents (the "trusted" set), raw corpus = all
documents. hash_mode='md5' makes the hashed-n-gram bucketing bit-identical
in both engines (dedup.md5_word_hash / its DuckDB hex restatement), so the
oracle restates feature hashing, both bag models, smoothing, and the
per-doc log-weight sum; production keeps xxhash64 — the machinery is
hash-agnostic."""

import os

import pytest

from pyspark.sql import functions as F

from hypertrace_ingester_spark.operators import sampling
from hypertrace_ingester_spark.oracle import compare, duckdb_connection

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata dir {SF_DIR} missing"
)

B = 512
ALPHA = 0.5

_HI = "('0x'||substr(md5(gram),1,8))::BIGINT"
_LO = "('0x'||substr(md5(gram),9,8))::BIGINT"
_H64 = (
    f"({_LO} + ({_HI} % 2147483648) * 4294967296"
    f" + CASE WHEN {_HI} >= 2147483648 THEN -9223372036854775808 ELSE 0 END)"
)

_ORACLE_SQL = f"""
WITH toks AS (
  SELECT doc_id, source, CAST(generate_subscripts(parts, 1) AS BIGINT) AS i,
         unnest(parts) AS w
  FROM (SELECT doc_id, source, string_split(text, ' ') AS parts FROM documents)
),
grams AS (
  SELECT doc_id, source, w AS gram FROM toks
  UNION ALL
  SELECT a.doc_id, a.source, a.w || ' ' || b.w AS gram
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
),
bkt AS (
  SELECT doc_id, source, (({_H64} % {B}) + {B}) % {B} AS b FROM grams
),
p AS (SELECT b, CAST(count(*) AS BIGINT) AS cp FROM bkt
      WHERE source = 'src0' GROUP BY b),
q AS (SELECT b, CAST(count(*) AS BIGINT) AS cq FROM bkt GROUP BY b),
ptot AS (SELECT count(*) AS t FROM bkt WHERE source = 'src0'),
qtot AS (SELECT count(*) AS t FROM bkt),
ratio AS (
  SELECT coalesce(p.b, q.b) AS b,
         ln((coalesce(cp, 0) + {ALPHA}) / ((SELECT t FROM ptot) + {ALPHA * B}))
         - ln((coalesce(cq, 0) + {ALPHA}) / ((SELECT t FROM qtot) + {ALPHA * B}))
           AS log_ratio
  FROM p FULL JOIN q ON p.b = q.b
)
SELECT k.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       sum(r.log_ratio) AS log_weight
FROM bkt k JOIN ratio r USING (b)
GROUP BY k.doc_id
"""


def test_dsir_log_weights_match_duckdb_oracle(spark):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    target = docs.where(F.col("source") == "src0")
    got = sampling.dsir_log_weights(
        docs, target, n_buckets=B, alpha=ALPHA, hash_mode="md5"
    ).toPandas()
    want = duckdb_connection(SF_DIR).execute(_ORACLE_SQL).fetchdf()
    assert len(got) == docs.count()
    problems = compare(got, want)
    assert not problems, problems


def test_dsir_target_docs_rank_high(spark):
    """Docs drawn from the target source should on average outrank the
    rest (the whole point of importance weighting)."""
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    target = docs.where(F.col("source") == "src0")
    w = sampling.dsir_log_weights(docs, target, n_buckets=B)
    avg = {
        r["is_tgt"]: r["m"]
        for r in w.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy((F.col("source") == "src0").alias("is_tgt"))
        .agg(F.avg("log_weight").alias("m"))
        .collect()
    }
    assert avg[True] > avg[False]

    sel = sampling.dsir_select(docs, w, keep_frac=0.2)
    n, n_sel = docs.count(), sel.count()
    assert 0.15 * n <= n_sel <= 0.25 * n
    kept_min = (
        w.join(sel.select("doc_id"), "doc_id").agg(F.min("log_weight")).first()[0]
    )
    dropped_max = (
        w.join(sel.select("doc_id"), "doc_id", "left_anti")
        .agg(F.max("log_weight")).first()[0]
    )
    assert kept_min >= dropped_max
