"""Corpus datacard (operators/datacard.py) — FULL DuckDB oracle on the
documents table (both engines restate token/char counts, md5 distinct,
exact rank-selection quantiles, corpus shares) + histogram conservation
laws.
"""

import os

import pytest
from pyspark.sql import functions as F

from hypertrace_ingester_spark.operators import datacard as dc
from hypertrace_ingester_spark.oracle import compare

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
DOCS = os.path.join(SF_DIR, "documents.parquet")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata dir {SF_DIR} missing"
)


def test_datacard_matches_duckdb(spark):
    import duckdb

    docs = spark.read.parquet(DOCS)
    got = dc.corpus_datacard(docs).toPandas()
    oracle = duckdb.connect().execute(f"""
        WITH stats AS (
          SELECT source, lang,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                 CAST(length(text) AS BIGINT) AS n_chars,
                 md5(text) AS th
          FROM read_parquet('{DOCS}')
        ), ranked AS (
          SELECT *,
                 row_number() OVER (PARTITION BY source, lang ORDER BY n_tokens) AS rk,
                 count(*) OVER (PARTITION BY source, lang) AS n
          FROM stats
        ), grouped AS (
          SELECT source, lang,
                 CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
                 CAST(sum(n_chars) AS BIGINT) AS n_chars,
                 CAST(count(DISTINCT th) AS BIGINT) AS distinct_docs,
                 max(CASE WHEN rk = CAST(ceil(0.5 * n) AS BIGINT) THEN n_tokens END) AS p50_tokens,
                 max(CASE WHEN rk = CAST(ceil(0.9 * n) AS BIGINT) THEN n_tokens END) AS p90_tokens,
                 max(CASE WHEN rk = CAST(ceil(0.99 * n) AS BIGINT) THEN n_tokens END) AS p99_tokens
          FROM ranked GROUP BY source, lang
        )
        SELECT source, lang, n_docs, n_tokens, n_chars, distinct_docs,
               p50_tokens, p90_tokens, p99_tokens,
               1.0 - distinct_docs / n_docs AS exact_dup_rate,
               n_docs / sum(n_docs) OVER () AS pct_docs,
               n_tokens / sum(n_tokens) OVER () AS pct_tokens
        FROM grouped
    """).df()
    assert compare(got, oracle) == []


def test_datacard_approx_path_same_grain(spark):
    docs = spark.read.parquet(DOCS)
    exact = dc.corpus_datacard(docs, exact_quantiles=True)
    approx = dc.corpus_datacard(docs, exact_quantiles=False)
    assert exact.columns == approx.columns
    # integer accounting identical on both paths; quantiles within sketch
    # accuracy (10k resolution on this data: exact)
    e = {tuple(r[0:2]): r for r in exact.orderBy("source", "lang").collect()}
    a = {tuple(r[0:2]): r for r in approx.orderBy("source", "lang").collect()}
    assert e.keys() == a.keys()
    for k in e:
        assert e[k]["n_docs"] == a[k]["n_docs"]
        assert e[k]["n_tokens"] == a[k]["n_tokens"]
        assert abs(e[k]["p90_tokens"] - a[k]["p90_tokens"]) <= 1


def test_length_histogram_conserves(spark):
    import duckdb

    docs = spark.read.parquet(DOCS)
    hist = dc.length_histogram(docs, group_cols=("source",))
    got = hist.toPandas()
    oracle = duckdb.connect().execute(f"""
        SELECT source,
               CAST(floor(log2(len(string_split(text, ' ')))) AS INT) AS bucket,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM read_parquet('{DOCS}')
        GROUP BY 1, 2
    """).df()
    assert compare(got, oracle) == []
    # conservation: histogram totals == corpus totals
    tot = hist.agg(F.sum("n_docs"), F.sum("n_tokens")).first()
    assert tot[0] == docs.count()
    # bucket law: every doc in bucket b has 2^b <= n_tokens < 2^(b+1)
    stats = docs.select(
        F.size(F.split("text", " ")).alias("n"),
        F.floor(F.log2(F.size(F.split("text", " ")).cast("double"))).alias("b"),
    )
    assert stats.where(
        (F.col("n") < F.pow(F.lit(2.0), F.col("b")))
        | (F.col("n") >= F.pow(F.lit(2.0), F.col("b") + 1))
    ).count() == 0


def test_sketch_path_one_shuffle(spark):
    """exact_quantiles=False + exact_distinct=False: the whole card is one
    partial-agg shuffle over the narrow stats frame (plus the tiny window
    over the grouped result), and the sketch distinct stays within its
    1% rsd of truth."""
    docs = spark.read.parquet(DOCS)
    card = dc.corpus_datacard(docs, exact_quantiles=False, exact_distinct=False)
    exact = dc.corpus_datacard(docs)
    e = {(r["source"], r["lang"]): r["distinct_docs"] for r in exact.collect()}
    for r in card.collect():
        truth = e[(r["source"], r["lang"])]
        assert abs(r["distinct_docs"] - truth) <= max(2, 0.05 * truth)
    plan = card._jdf.queryExecution().executedPlan().toString()
    # corpus-row exchanges: exactly one (the groupBy, with partial HLL +
    # partial percentile sketches BEFORE it); the window's exchange moves
    # group-grain rows only. Count the AQE final plan section alone.
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 1, plan
    assert "partial_approx_count_distinct" in final, plan
    assert "partial_percentile_approx" in final, plan
