"""Context-window chunking (sliding token windows) — full DuckDB oracle.

DuckDB restates the window law over the same parquet with generate_series
+ 1-based inclusive list slicing; chunk identity is verified by md5 of the
space-joined chunk, so the oracle checks the actual token content of every
window, not just the counts."""

import os

import pytest
from pyspark.sql import functions as F

from hypertrace_ingester_spark.operators import sampling as sp
from hypertrace_ingester_spark.oracle import compare, duckdb_connection

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata dir {SF_DIR} missing"
)

_ORACLE_SQL = """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS toks, len(string_split(text, ' ')) AS n
  FROM documents WHERE len(string_split(text, ' ')) > 0
),
c AS (
  SELECT *, CASE WHEN n <= {L} THEN 1
                 ELSE 1 + CAST(ceil((n - {L}) * 1.0 / {S}) AS INT) END AS n_chunks
  FROM d
)
SELECT doc_id,
       CAST(i AS INT) AS chunk_idx,
       md5(array_to_string(toks[i*{S} + 1 : least(i*{S} + {L}, n)], ' ')) AS chunk_fp,
       CAST(least({L}, n - i*{S}) AS INT) AS n_chunk_tokens
FROM (SELECT *, unnest(range(n_chunks)) AS i FROM c)
"""


def _spark_chunks(spark, max_len, stride):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    toks = docs.select("doc_id", F.split("text", " ").alias("toks"))
    return sp.chunk_documents(toks, tokens_col="toks",
                              max_len=max_len, stride=stride).select(
        "doc_id",
        "chunk_idx",
        F.md5(F.concat_ws(" ", "chunk")).alias("chunk_fp"),
        "n_chunk_tokens",
    )


@pytest.mark.parametrize("max_len,stride", [(16, None), (16, 8), (7, 3)])
def test_chunking_matches_duckdb_oracle(spark, max_len, stride):
    got = _spark_chunks(spark, max_len, stride).toPandas()
    con = duckdb_connection(SF_DIR)
    want = con.execute(
        _ORACLE_SQL.format(L=max_len, S=stride or max_len)
    ).fetchdf()
    assert len(got) == len(want) > 0
    problems = compare(got, want)
    assert not problems, problems


def test_chunking_laws(spark):
    pdf = [(1, list(range(10))), (2, list(range(4))), (3, list(range(3))),
           (4, [])]
    docs = spark.createDataFrame(pdf, "doc_id int, toks array<int>")

    # disjoint windows conserve tokens in order
    out = sp.chunk_documents(docs, tokens_col="toks", max_len=4).orderBy(
        "doc_id", "chunk_idx").collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).extend(r["chunk"])
    assert by_doc == {1: list(range(10)), 2: list(range(4)), 3: list(range(3))}
    assert 4 not in by_doc  # empty doc vanishes
    assert [r["n_chunk_tokens"] for r in out if r["doc_id"] == 1] == [4, 4, 2]

    # overlapping windows: stride 2, max 4 over 10 tokens -> starts 0,2,4,6
    over = sp.chunk_documents(docs.where("doc_id = 1"), tokens_col="toks",
                              max_len=4, stride=2).orderBy("chunk_idx").collect()
    assert [r["chunk"] for r in over] == [
        [0, 1, 2, 3], [2, 3, 4, 5], [4, 5, 6, 7], [6, 7, 8, 9]]
    # every window reaches the end; no degenerate tail past it
    assert over[-1]["chunk"][-1] == 9

    with pytest.raises(ValueError):
        sp.chunk_documents(docs, tokens_col="toks", max_len=0)
    with pytest.raises(ValueError):
        sp.chunk_documents(docs, tokens_col="toks", max_len=4, stride=8)
