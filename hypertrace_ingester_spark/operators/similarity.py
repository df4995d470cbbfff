"""Similarity search over the ``embeddings`` table (array<float> vectors).

Training-data-pipeline extension (driver mandate):
- brute-force cosine top-k — the exact baseline, pure JVM column math
  (``zip_with`` + ``aggregate`` dot products, no UDF);
- LSH-bucketed ANN — the 100 TB scale path: random-hyperplane signatures
  computed as one Arrow-batched numpy matmul per batch (``mapInPandas``),
  then candidate generation only within matching buckets.

Scale design: queries are broadcast (small side); the corpus is scanned
once. Top-k uses two-phase selection — per-partition top-k before the final
per-query top-k — so the shuffle carries k·partitions rows, not the whole
scored corpus.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SEED = 42
ANN_BITS = 16


def _norm(col):
    return F.sqrt(F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    two_phase: bool = True,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    broadcast(queries) ⨝ corpus (no shuffle of the corpus), then two-phase
    selection: per-partition row_number prunes to k rows per (query,
    partition) before the final per-query window — the distributed top-k
    pattern (same partial/final shape as Spark's own TakeOrderedAndProject).
    Self-matches are excluded."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _norm(F.col(vec_col)).alias("qnorm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        _norm(F.col(vec_col)).alias("cnorm"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", _dot(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm")))
        .select("query_id", "neighbor_id", "cos_sim")
    )
    if two_phase:
        part_w = Window.partitionBy("query_id", F.spark_partition_id()).orderBy(
            F.desc("cos_sim"), F.asc("neighbor_id")
        )
        scored = scored.withColumn("_prn", F.row_number().over(part_w)).filter(
            F.col("_prn") <= k
        ).drop("_prn")
    final_w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(final_w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def _hyperplanes(dim: int, bits: int = ANN_BITS) -> np.ndarray:
    """Deterministic random hyperplanes (seeded) — identical on every
    executor, so signatures are reproducible without broadcasting state."""
    rng = np.random.RandomState(SEED)
    return rng.standard_normal((dim, bits)).astype(np.float64)


def lsh_signatures(
    df: DataFrame, dim: int, bits: int = ANN_BITS,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector.

    One numpy matmul per Arrow batch (vectorized — never per-row Python):
    sign(X @ P) packed into an int bucket."""
    planes = _hyperplanes(dim, bits)

    def signer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = (1 << np.arange(bits)).astype(np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                                    "bucket": pd.Series([], dtype="int64")})
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            bucket = ((x @ planes) > 0).astype(np.int64) @ weights
            yield pd.DataFrame({"vec_id": pdf[id_col].to_numpy(), "bucket": bucket})

    sigs = df.select(id_col, vec_col).mapInPandas(signer, schema="vec_id bigint, bucket bigint")
    return df.join(sigs.withColumnRenamed("vec_id", id_col), on=id_col)


def ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    bits: int = ANN_BITS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket; exact
    cosine + per-query top-k within the bucket. Trades recall (documented:
    vectors in neighboring buckets are missed) for a corpus shuffle keyed by
    bucket instead of an all-pairs scan — the IVF/LSH scale path."""
    c = lsh_signatures(corpus, dim, bits, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"), "bucket",
        _norm(F.col(vec_col)).alias("cnorm"),
    )
    q = lsh_signatures(queries, dim, bits, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"), "bucket",
        _norm(F.col(vec_col)).alias("qnorm"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", _dot(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos_sim", 4).alias("cos_sim"))
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the second scale path of the driver mandate
# ---------------------------------------------------------------------------

IVF_CELLS = 16
IVF_NPROBE = 4


def _centroids(dim: int, n_cells: int = IVF_CELLS) -> np.ndarray:
    """Deterministic seeded unit-norm coarse centroids — identical on every
    executor without broadcasting state. Production would train them with
    k-means|| over a corpus sample; the IVF plumbing (cell assignment,
    inverted lists, nprobe probing, exact rerank) is unchanged by centroid
    quality, only recall is."""
    rng = np.random.RandomState(SEED + 1)
    c = rng.standard_normal((n_cells, dim)).astype(np.float64)
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def ivf_assign(
    df: DataFrame, dim: int, n_cells: int = IVF_CELLS, nprobe: int = 1,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its ``nprobe`` nearest coarse centroids by
    cosine — one numpy matmul per Arrow batch. nprobe=1 builds the
    inverted lists (corpus side); nprobe>1 yields the probe set per query."""
    cents = _centroids(dim, n_cells)

    def assigner(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                                    "cell": pd.Series([], dtype="int64")})
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
            sims = x @ cents.T
            # top-nprobe cells, deterministic tie-break by cell index
            order = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
            ids = np.repeat(pdf[id_col].to_numpy(), nprobe)
            yield pd.DataFrame({"vec_id": ids, "cell": order.reshape(-1)})

    cells = df.select(id_col, vec_col).mapInPandas(
        assigner, schema="vec_id bigint, cell bigint"
    )
    return df.join(cells.withColumnRenamed("vec_id", id_col), on=id_col)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_cells: int = IVF_CELLS,
    nprobe: int = IVF_NPROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: corpus partitioned into inverted lists by coarse centroid;
    each query probes its ``nprobe`` nearest cells and reranks exactly
    inside them. At 100 TB the corpus shuffles ONCE keyed by cell (or is
    written bucketed-by-cell and never shuffles again); per-query work is
    bounded by nprobe/n_cells of the corpus instead of an all-pairs scan.
    Recall loss = neighbors whose cell the query does not probe
    (documented; raise nprobe to trade compute for recall)."""
    c = ivf_assign(corpus, dim, n_cells, 1, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"), "cell",
        _norm(F.col(vec_col)).alias("cnorm"),
    )
    q = ivf_assign(queries, dim, n_cells, nprobe, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"), "cell",
        _norm(F.col(vec_col)).alias("qnorm"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        c.join(F.broadcast(q), on="cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", _dot(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm")))
        .select("query_id", "neighbor_id", "cos_sim")
        .distinct()  # a pair probed via 2 cells counts once
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos_sim", 4).alias("cos_sim"))
    )
