"""Deterministic split + mixture sampling (operators/sampling.py)."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hypertrace_ingester_spark.operators import sampling as smp


def _docs(spark, n=4000):
    rows = [(i, ["web", "code", "books"][i % 3],
             " ".join(f"w{j}" for j in range((i % 7) + 3))) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_hash_split_proportions_and_determinism(spark):
    docs = _docs(spark)
    out = smp.hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = sum(counts.values())
    assert n == 4000
    assert counts["train"] / n == pytest.approx(0.8, abs=0.03)
    assert counts["val"] / n == pytest.approx(0.1, abs=0.02)
    # determinism: identical assignment on re-run and independent of corpus size
    again = {r["doc_id"]: r["split"] for r in
             smp.hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    subset = smp.hash_split(docs.where("doc_id < 100"),
                            {"train": 0.8, "val": 0.1, "test": 0.1}).collect()
    for r in subset:
        assert again[r["doc_id"]] == r["split"]  # growing corpus never reassigns


def test_mixture_keep_fractions_math():
    totals = {"web": 9000, "code": 3000, "books": 1000}
    # target 50/25/25: books binds (1000/0.25 = 4000 achievable total)
    fr = smp.mixture_keep_fractions(totals, {"web": 0.5, "code": 0.25, "books": 0.25})
    assert fr["books"] == pytest.approx(1.0)
    assert fr["web"] == pytest.approx(0.5 * 4000 / 9000)
    assert fr["code"] == pytest.approx(0.25 * 4000 / 3000)


def test_mixture_sample_hits_target_proportions(spark):
    docs = _docs(spark, 9000)
    out = smp.mixture_sample(docs, {"web": 0.6, "code": 0.4}, seed=7)
    toks = {r["source"]: r["t"] for r in out
            .withColumn("nt", F.size(F.split(F.col("text"), " ")))
            .groupBy("source").agg(F.sum("nt").alias("t")).collect()}
    assert set(toks) == {"web", "code"}          # 'books' not in target -> dropped
    share_web = toks["web"] / (toks["web"] + toks["code"])
    assert share_web == pytest.approx(0.6, abs=0.03)
    # deterministic: same seed, same survivors
    ids1 = {r["doc_id"] for r in out.select("doc_id").collect()}
    ids2 = {r["doc_id"] for r in smp.mixture_sample(
        docs, {"web": 0.6, "code": 0.4}, seed=7).select("doc_id").collect()}
    assert ids1 == ids2


def test_mixture_sample_binding_source_kept_whole(spark):
    docs = _docs(spark, 3000)
    # ask for mostly-books: books is smallest -> binds -> keep fraction 1.0
    out = smp.mixture_sample(docs, {"books": 0.9, "web": 0.1}, seed=7)
    n_books_in = docs.where("source = 'books'").count()
    n_books_out = out.where("source = 'books'").count()
    assert n_books_out == n_books_in


def test_cluster_balanced_sample(spark):
    import os
    sampling = smp
    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    if not os.path.isdir(sf):
        pytest.skip("testdata missing")
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    out = sampling.cluster_balanced_sample(docs, emb, n_clusters=4)
    tot = {
        r["cluster"]: r["t"]
        for r in out.withColumn("_t", F.size(F.split("text", " ")))
        .groupBy("cluster").agg(F.sum("_t").alias("t")).collect()
    }
    assert len(tot) == 4
    # uniform target scaled to the binding cluster: every cluster's sampled
    # token mass sits near the smallest cluster's total (hash quantization
    # noise at ~125 docs/cluster)
    lo, hi = min(tot.values()), max(tot.values())
    assert hi <= 2.0 * lo, tot
    # deterministic
    out2 = sampling.cluster_balanced_sample(docs, emb, n_clusters=4)
    assert sorted(r["doc_id"] for r in out.select("doc_id").collect()) == \
           sorted(r["doc_id"] for r in out2.select("doc_id").collect())
