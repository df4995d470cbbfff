"""BM25 + RRF retrieval (operators/retrieval.py) vs a pure-python
reference implementation of the same public formulas (Robertson BM25 with
the Lucene ln(1 + (N-df+.5)/(df+.5)) IDF; Cormack et al. RRF)."""
from __future__ import annotations

import math

import pytest

from hypertrace_ingester_spark.operators import retrieval as rtv

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "a quick brown dog outpaces a quick fox"),
    (3, "lorem ipsum dolor sit amet consectetur"),
    (4, "the dog sleeps all day the dog dreams"),
    (5, "foxes are quick and dogs are loyal"),
    (6, "completely unrelated text about spark pipelines"),
]
QUERIES = [(10, "quick fox"), (20, "the dog")]


def _ref_bm25(corpus, queries, k, k1=rtv.BM25_K1, b=rtv.BM25_B):
    toks = {d: t.lower().split() for d, t in corpus}
    toks = {d: [w for w in ws if w] for d, ws in toks.items()}
    n = len(toks)
    avgdl = sum(len(ws) for ws in toks.values()) / n
    df = {}
    for ws in toks.values():
        for t in set(ws):
            df[t] = df.get(t, 0) + 1
    out = {}
    for qid, qtext in queries:
        scores = {}
        for term in set(qtext.lower().split()):
            if term not in df:
                continue
            idf = math.log(1 + (n - df[term] + 0.5) / (df[term] + 0.5))
            for d, ws in toks.items():
                tf = ws.count(term)
                if tf == 0:
                    continue
                dl = len(ws)
                scores[d] = scores.get(d, 0.0) + idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * dl / avgdl))
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out[qid] = [(d, r + 1, s) for r, (d, s) in enumerate(ranked)]
    return out


def test_bm25_topk_matches_reference(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    queries = spark.createDataFrame(QUERIES, "query_id long, text string")
    got = rtv.bm25_topk(docs, queries, k=3).collect()
    expect = _ref_bm25(CORPUS, QUERIES, k=3)
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(expect)
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [(r["doc_id"], r["rank"]) for r in rows] == [
            (d, rk) for d, rk, _ in expect[qid]]
        for r, (_, _, s) in zip(rows, expect[qid]):
            assert r["score"] == pytest.approx(s, rel=1e-9)


def test_bm25_no_hit_query_returns_nothing(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    queries = spark.createDataFrame([(99, "zzz qqq")], "query_id long, text string")
    assert rtv.bm25_topk(docs, queries, k=3).count() == 0


def test_rrf_fuse_hand_case(spark):
    a = spark.createDataFrame(
        [(1, 101, 1), (1, 102, 2), (1, 103, 3)],
        "query_id long, doc_id long, rank int")
    b = spark.createDataFrame(
        [(1, 102, 1), (1, 104, 2), (1, 101, 3)],
        "query_id long, doc_id long, rank int")
    rows = {r["doc_id"]: r for r in rtv.rrf_fuse(a, b, k=60).collect()}
    # doc 102: 1/62 + 1/61 ; doc 101: 1/61 + 1/63 ; 103: 1/63 ; 104: 1/62
    assert rows[102]["rrf_score"] == pytest.approx(1 / 62 + 1 / 61)
    assert rows[101]["rrf_score"] == pytest.approx(1 / 61 + 1 / 63)
    order = sorted(rows.values(), key=lambda r: r["rank"])
    assert [r["doc_id"] for r in order] == [102, 101, 104, 103]


def test_hybrid_bm25_plus_knn_shapes(spark):
    """RRF composes BM25 with the embedding ANN ranker output shape
    (query_id, doc_id/neighbor, rank) — the hybrid-retrieval path."""
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    queries = spark.createDataFrame(QUERIES, "query_id long, text string")
    lex = rtv.bm25_topk(docs, queries, k=3)
    # stand-in embedding ranks (same shape the similarity rankers emit)
    emb = spark.createDataFrame(
        [(10, 5, 1), (10, 1, 2), (20, 4, 1), (20, 6, 2)],
        "query_id long, doc_id long, rank int")
    fused = rtv.rrf_fuse(lex, emb, topk=3)
    got = {r["query_id"] for r in fused.collect()}
    assert got == {10, 20}
    assert fused.where("rank > 3").count() == 0
