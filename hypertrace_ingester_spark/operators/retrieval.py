"""Lexical retrieval over the ``documents`` table: BM25 top-k and
reciprocal-rank fusion with the embedding ANN rankers (similarity.py).

Training-data pipelines use exactly this pair: BM25 for benchmark
decontamination sweeps (find training docs lexically close to an eval
set) and hybrid lexical+embedding retrieval for curation queries. All
DataFrame ops:

- the token stream is exploded ONCE and aggregated to (doc_id, term, tf)
  — one shuffle keyed by (doc_id, term), partial-agg before the exchange;
- document frequencies / IDF are an aggregate over distinct (term, doc)
  pairs — the result is tiny (vocabulary-sized) and is broadcast back;
- the query side is always broadcast (queries ≪ corpus);
- top-k per query is the two-phase window rank, never a global sort.

At 100 TB the only payload-sized shuffle is the (doc_id, term, tf)
aggregation; scores travel as scalars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

BM25_K1 = 1.2
BM25_B = 0.75


def term_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, term, tf) + per-doc length ``dl`` (whitespace tokens).

    Lowercased so queries match case-insensitively; one explode + one
    partial-agg'd groupBy."""
    words = F.split(F.lower(F.col(text_col)), " ")
    exploded = docs.select(
        "doc_id", F.size(words).alias("dl"), F.explode(words).alias("term")
    ).where(F.col("term") != "")
    return exploded.groupBy("doc_id", "dl", "term").agg(
        F.count(F.lit(1)).alias("tf"))


def idf_table(tf: DataFrame) -> DataFrame:
    """Robertson/Sparck-Jones BM25 IDF per term:
    ln(1 + (N - df + 0.5) / (df + 0.5)) — always positive, the form
    Lucene uses. Input is :func:`term_frequencies` output; N is the
    distinct doc count. Output is vocabulary-sized (broadcastable)."""
    n_docs = tf.select("doc_id").distinct().count()
    df_tbl = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    return df_tbl.withColumn(
        "idf",
        F.log((F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
              / (F.col("df") + F.lit(0.5)) + F.lit(1.0)),
    )


def bm25_topk(docs: DataFrame, queries: DataFrame, k: int = 5,
              text_col: str = "text", k1: float = BM25_K1,
              b: float = BM25_B) -> DataFrame:
    """BM25 top-k docs per query → (query_id, doc_id, rank, score).

    ``queries`` is (query_id, text). The corpus tf table shuffles once;
    the query term list and the IDF table are broadcast; the final
    per-query rank is a window over candidate rows only (docs sharing at
    least one query term), never the corpus."""
    tf = term_frequencies(docs, text_col)
    idf = idf_table(tf)
    avgdl = tf.select("doc_id", "dl").distinct().agg(
        F.avg("dl").alias("avgdl")).collect()[0]["avgdl"]

    q_terms = queries.select(
        "query_id",
        F.explode(F.array_distinct(F.split(F.lower(F.col(text_col)), " "))).alias("term"),
    ).where(F.col("term") != "")

    # candidate rows: corpus tf ⋈ broadcast query terms ⋈ broadcast idf
    cand = (
        tf.join(F.broadcast(q_terms), "term")
        .join(F.broadcast(idf), "term")
        .withColumn(
            "contrib",
            F.col("idf") * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.lit(float(avgdl)))),
        )
    )
    scored = cand.groupBy("query_id", "doc_id").agg(F.sum("contrib").alias("score"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "rank", "score")
    )


def rrf_fuse(ranks_a: DataFrame, ranks_b: DataFrame, k: int = 60,
             topk: int | None = None) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of two rankers'
    (query_id, doc_id, rank) frames: score = Σ 1/(k + rank) over the
    rankers that returned the doc → (query_id, doc_id, rrf_score, rank).
    The standard hybrid of BM25 + embedding ANN; inputs are top-k-sized,
    so the fusion is a small union + groupBy."""
    both = (
        ranks_a.select("query_id", "doc_id", "rank")
        .unionByName(ranks_b.select("query_id", "doc_id", "rank"))
        .withColumn("rrf", F.lit(1.0) / (F.lit(float(k)) + F.col("rank")))
    )
    fused = both.groupBy("query_id", "doc_id").agg(F.sum("rrf").alias("rrf_score"))
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    out = fused.withColumn("rank", F.row_number().over(w))
    if topk is not None:
        out = out.where(F.col("rank") <= topk)
    return out.select("query_id", "doc_id", "rrf_score", "rank")
