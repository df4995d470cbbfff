"""Corpus line-level dedup (C4 recipe) — full DuckDB oracle.

The shared documents table is single-line text, so the fixture derives a
deterministic multi-line corpus from it (5-word lines, a shared boilerplate
line appended to every doc, and doc N's first line injected into doc N+1 to
force cross-doc duplicates), written once to parquet so BOTH engines read
identical bytes. Spark runs ``dedup.line_dedup``; DuckDB restates the
first-occurrence-by-(doc_id, line_idx) semantics with string equality
(the xxhash64 grouping is an optimization, not a semantic)."""

import os

import pandas as pd
import pytest

from hypertrace_ingester_spark.operators import dedup
from hypertrace_ingester_spark.oracle import compare

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata dir {SF_DIR} missing"
)

_ORACLE_SQL = """
WITH lines AS (
  SELECT doc_id,
         CAST(generate_subscripts(parts, 1) - 1 AS BIGINT) AS line_idx,
         unnest(parts) AS line
  FROM (SELECT doc_id, string_split(text, chr(10)) AS parts FROM docs_ml)
),
survivors AS (
  SELECT doc_id, line_idx, line FROM (
    SELECT doc_id, line_idx, line,
           row_number() OVER (PARTITION BY line ORDER BY doc_id, line_idx) AS rn
    FROM lines) WHERE rn = 1
)
SELECT s.doc_id, string_agg(s.line, chr(10) ORDER BY s.line_idx) AS text,
       CAST(count(*) AS BIGINT) AS n_lines_kept,
       CAST(any_value(t._n) - count(*) AS BIGINT) AS n_lines_dropped
FROM survivors s
JOIN (SELECT doc_id, count(*) AS _n FROM lines GROUP BY doc_id) t USING (doc_id)
GROUP BY s.doc_id
"""

BOILER = "subscribe to our newsletter for updates"


def _multiline_fixture(tmp_path) -> str:
    src = pd.read_parquet(os.path.join(SF_DIR, "documents.parquet"),
                          columns=["doc_id", "text"])
    rows = []
    prev_first = None
    for doc_id, text in zip(src["doc_id"], src["text"]):
        words = text.split(" ")
        doc_lines = [" ".join(words[i:i + 5]) for i in range(0, len(words), 5)]
        if prev_first is not None and doc_id % 3 == 0:
            doc_lines.insert(1, prev_first)  # forced cross-doc duplicate
        doc_lines.append(BOILER)  # survives only in the first doc
        prev_first = doc_lines[0]
        rows.append({"doc_id": int(doc_id), "text": "\n".join(doc_lines)})
    path = str(tmp_path / "docs_multiline.parquet")
    pd.DataFrame(rows).to_parquet(path, index=False)
    return path


def test_line_dedup_matches_duckdb_oracle(spark, tmp_path):
    import duckdb

    path = _multiline_fixture(tmp_path)
    docs = spark.read.parquet(path)
    got = dedup.line_dedup(docs).toPandas()

    con = duckdb.connect()
    con.execute(f"CREATE VIEW docs_ml AS SELECT * FROM read_parquet('{path}')")
    want = con.execute(_ORACLE_SQL).fetchdf()

    assert len(got) > 0
    # the boilerplate line must survive exactly once corpus-wide
    n_boiler = sum(t.split("\n").count(BOILER) for t in got["text"])
    assert n_boiler == 1
    problems = compare(got, want)
    assert not problems, problems


def test_line_dedup_drops_fully_duplicate_doc(spark):
    pdf = pd.DataFrame(
        {"doc_id": [0, 1, 2],
         "text": ["a b\nc d\nunique zero", "a b\nc d", "c d\nunique two"]}
    )
    out = dedup.line_dedup(spark.createDataFrame(pdf)).orderBy("doc_id").collect()
    assert [r["doc_id"] for r in out] == [0, 2]
    assert out[0]["text"] == "a b\nc d\nunique zero"
    assert out[0]["n_lines_dropped"] == 0
    assert out[1]["text"] == "unique two"
    assert out[1]["n_lines_kept"] == 1 and out[1]["n_lines_dropped"] == 1


def test_curation_line_dedup_stage(spark, tmp_path):
    from pyspark.sql import functions as F

    from hypertrace_ingester_spark.plans import curation as cur

    path = _multiline_fixture(tmp_path)
    docs = spark.read.parquet(path).withColumn("source", F.lit("web"))
    cfg = cur.CurationConfig(
        line_dedup=True,
        gopher_filter=False, quality_filter=False, redact_pii=False,
        near_dup=False,
    )
    curated, manifest = cur.run_curation(spark, docs, config=cfg)
    st = manifest["stages"]
    assert "line_dedup" in st
    assert st["line_dedup"]["tokens"] < st["exact_dedup"]["tokens"]
    rows = curated.select("doc_id", "text", "source").collect()
    assert rows and all(r["source"] == "web" for r in rows)
    # the boilerplate line survives exactly once corpus-wide
    n_boiler = sum(r["text"].split("\n").count(BOILER) for r in rows)
    assert n_boiler == 1
