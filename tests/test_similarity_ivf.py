"""IVF ANN agreement with the brute-force baseline: exact rerank inside
probed cells means every returned neighbor's similarity is its true value,
and recall@5 vs brute force stays useful at nprobe=4/16 (deterministic —
seeded centroids)."""

from pyspark.sql import functions as F

from hypertrace_ingester_spark.operators import similarity as sim
from hypertrace_ingester_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_ivf_recall_vs_bruteforce(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.cosine_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.ivf_topk(emb, queries, dim=64, k=5).collect()
    }
    assert approx, "IVF returned no candidates"
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.5, f"IVF recall@5 {recall:.2f} below 0.5"


def test_ivf_deterministic_across_partitionings(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    a = sim.ivf_topk(emb.repartition(16), queries, dim=64, k=5).orderBy(
        "query_id", "rank"
    ).collect()
    b = sim.ivf_topk(emb.coalesce(1), queries, dim=64, k=5).orderBy(
        "query_id", "rank"
    ).collect()
    assert a == b
