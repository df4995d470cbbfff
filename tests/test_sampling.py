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


def test_temperature_weights_math():
    totals = {"web": 8100, "code": 900}  # natural shares 0.9 / 0.1
    w = smp.temperature_weights(totals, 0.5)
    p_web, p_code = 0.9 ** 0.5, 0.1 ** 0.5
    z = p_web + p_code
    assert w["web"] == pytest.approx(p_web / z)
    assert w["code"] == pytest.approx(p_code / z)
    # alpha=1 reproduces natural proportions exactly
    w1 = smp.temperature_weights(totals, 1.0)
    assert w1["web"] == pytest.approx(0.9)
    assert w1["code"] == pytest.approx(0.1)
    # alpha -> 0 approaches uniform
    w0 = smp.temperature_weights(totals, 1e-9)
    assert w0["web"] == pytest.approx(0.5, abs=1e-6)
    # zero-mass sources get 0, never NaN; alpha <= 0 rejected
    assert smp.temperature_weights({"a": 0, "b": 100}, 0.3)["a"] == 0.0
    with pytest.raises(ValueError):
        smp.temperature_weights(totals, 0.0)


def test_temperature_mixture_alpha1_keeps_everything(spark):
    """alpha=1 -> target == natural proportions -> every source binds at
    keep fraction 1.0: the sample IS the corpus (the invariant that makes
    temperature mixing a strict generalization of no mixing)."""
    docs = _docs(spark, 3000)
    out = smp.temperature_mixture_sample(docs, temperature=1.0)
    assert out.count() == docs.count()


def test_temperature_mixture_upweights_low_resource(spark):
    # 90% web / 10% code by token mass (uniform doc length)
    rows = [(i, "code" if i % 10 == 0 else "web",
             " ".join(f"w{j}" for j in range(10))) for i in range(8000)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    alpha = 0.3
    out = smp.temperature_mixture_sample(docs, temperature=alpha)
    toks = {r["source"]: r["t"] for r in out
            .withColumn("nt", F.size(F.split(F.col("text"), " ")))
            .groupBy("source").agg(F.sum("nt").alias("t")).collect()}
    share_code = toks["code"] / (toks["code"] + toks["web"])
    expect = 0.1 ** alpha / (0.1 ** alpha + 0.9 ** alpha)  # ~0.341
    assert share_code == pytest.approx(expect, abs=0.03)
    # code is the most-upweighted source -> binds -> kept whole
    assert out.where("source = 'code'").count() == 800
    # and the achieved share moved from the natural 0.1 toward uniform
    assert share_code > 0.25
