"""CCNet-style bigram-LM perplexity scoring — full DuckDB oracle.

Both engines train the same add-alpha bigram model on documents.parquet and
score the same docs; floats compare under oracle.compare's 1e-9 rtol (the
per-doc log-prob sums differ only by accumulation order)."""

import math
import os

import pandas as pd
import pytest

from hypertrace_ingester_spark.operators import text
from hypertrace_ingester_spark.oracle import compare, duckdb_connection

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata dir {SF_DIR} missing"
)

_ORACLE_SQL = """
WITH toks AS (
  SELECT doc_id, CAST(generate_subscripts(parts, 1) AS BIGINT) AS i,
         unnest(parts) AS w
  FROM (SELECT doc_id, string_split(text, ' ') AS parts FROM documents)
),
uni AS (SELECT w, CAST(count(*) AS BIGINT) AS c1 FROM toks GROUP BY w),
stats AS (SELECT CAST(count(*) AS BIGINT) AS vocab,
                 CAST(sum(c1) AS BIGINT) AS total_tokens FROM uni),
bi AS (
  SELECT a.w AS w_prev, b.w AS w, CAST(count(*) AS BIGINT) AS c2
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  GROUP BY 1, 2
),
first_terms AS (
  SELECT t.doc_id,
         ln((coalesce(u.c1, 0) + 0.5) / (s.total_tokens + 0.5 * s.vocab)) AS logp
  FROM (SELECT doc_id, w FROM toks WHERE i = 1) t
  LEFT JOIN uni u USING (w), stats s
),
bi_terms AS (
  SELECT a.doc_id,
         ln((coalesce(bc.c2, 0) + 0.5) / (coalesce(u.c1, 0) + 0.5 * s.vocab)) AS logp
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  LEFT JOIN bi bc ON bc.w_prev = a.w AND bc.w = b.w
  LEFT JOIN uni u ON u.w = a.w, stats s
),
terms AS (SELECT * FROM first_terms UNION ALL SELECT * FROM bi_terms)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms, sum(logp) AS sum_logp,
       exp(-sum(logp) / count(*)) AS ppl
FROM terms GROUP BY doc_id
"""


def test_lm_perplexity_matches_duckdb_oracle(spark):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    got = text.ngram_lm_perplexity(docs).toPandas()
    con = duckdb_connection(SF_DIR)
    want = con.execute(_ORACLE_SQL).fetchdf()
    assert len(got) == docs.count()  # every doc scored (all have >=1 word)
    problems = compare(got, want)
    assert not problems, problems


def test_lm_perplexity_hand_case(spark):
    """Train on a tiny corpus: the doc made of the corpus's dominant bigram
    chain scores lower perplexity than a doc of unseen words."""
    model_pdf = pd.DataFrame(
        {"doc_id": [0, 1, 2], "text": ["a b a b a b", "a b a b", "a b c"]}
    )
    score_pdf = pd.DataFrame({"doc_id": [10, 11], "text": ["a b a b", "x y z q"]})
    model_docs = spark.createDataFrame(model_pdf)
    model = text.train_bigram_lm(model_docs)
    out = {
        r["doc_id"]: r
        for r in text.ngram_lm_perplexity(
            spark.createDataFrame(score_pdf), model=model
        ).collect()
    }
    assert out[10]["ppl"] < out[11]["ppl"]
    # exact check of the in-distribution doc: V=3, T=13, c1(a)=6, c1(b)=6,
    # c2(a,b)=6, c2(b,a)=3, alpha=0.5
    V, T, a = 3, 13, 0.5
    logp = (
        math.log((6 + a) / (T + a * V))       # p(a)
        + math.log((6 + a) / (6 + a * V))     # p(b|a)
        + math.log((3 + a) / (6 + a * V))     # p(a|b)
        + math.log((6 + a) / (6 + a * V))     # p(b|a)
    )
    assert out[10]["n_terms"] == 4
    assert abs(out[10]["sum_logp"] - logp) < 1e-12
    assert abs(out[10]["ppl"] - math.exp(-logp / 4)) < 1e-12


def _expected_buckets(ppls, cuts=(1.0 / 3.0, 2.0 / 3.0),
                      labels=("head", "middle", "tail")):
    """Pure-python restatement of the rank-selection cut rule."""
    s = sorted(ppls)
    n = len(s)
    cut_vals = [s[max(1, math.ceil(q * n)) - 1] for q in cuts]

    def bucket(p):
        for cv, lb in zip(cut_vals, labels[:-1]):
            if p <= cv:
                return lb
        return labels[-1]

    return bucket


def test_perplexity_buckets_exact_matches_rank_rule(spark):
    """CCNet head/middle/tail: per-language exact cuts agree row-by-row
    with a driver-side sort of the same perplexities."""
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    scored = docs.select("doc_id", "lang").join(
        text.ngram_lm_perplexity(docs), "doc_id"
    )
    out = text.perplexity_buckets(scored, by=("lang",)).toPandas()
    assert len(out) == scored.count()
    for lang, g in out.groupby("lang"):
        bucket = _expected_buckets(g["ppl"].tolist())
        for _, r in g.iterrows():
            assert r["ppl_bucket"] == bucket(r["ppl"]), (lang, r["doc_id"])
        # ordering invariant: head <= middle <= tail by construction
        by_b = {b: sub["ppl"] for b, sub in g.groupby("ppl_bucket")}
        if "head" in by_b and "middle" in by_b:
            assert by_b["head"].max() <= by_b["middle"].min()
        if "middle" in by_b and "tail" in by_b:
            assert by_b["middle"].max() <= by_b["tail"].min()


def test_perplexity_buckets_approx_and_global(spark):
    """The percentile_approx (100 TB) path preserves the ordering
    invariant and ~third-sized buckets; by=() buckets globally."""
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    scored = docs.select("doc_id").join(text.ngram_lm_perplexity(docs), "doc_id")
    out = text.perplexity_buckets(scored, by=(), exact=False).toPandas()
    n = len(out)
    counts = out["ppl_bucket"].value_counts()
    assert set(counts.index) == {"head", "middle", "tail"}
    for b in ("head", "middle", "tail"):
        assert abs(counts[b] - n / 3) <= 0.1 * n, counts
    by_b = {b: g["ppl"] for b, g in out.groupby("ppl_bucket")}
    assert by_b["head"].max() <= by_b["middle"].min()
    assert by_b["middle"].max() <= by_b["tail"].min()
    # label/cut arity guarded
    with pytest.raises(ValueError):
        text.perplexity_buckets(scored, cuts=(0.5,), labels=("a", "b", "c"))
