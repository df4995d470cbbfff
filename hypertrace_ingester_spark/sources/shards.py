"""Deterministic training-shard writer — the output stage of a curation
run.

A training corpus is consumed as FIXED, GLOBALLY-SHUFFLED shards (the
data-loader streams shard files round-robin; within-shard order is the
read order, so the shuffle must happen at write time and must be
reproducible). Two properties matter at 100 TB:

- **determinism**: the same curated input yields byte-identical shard
  membership and within-shard order on every run/cluster layout — both
  come from hashes of the row id, never from partition ids, task order,
  or ``rand()``;
- **one task per shard**: ``repartition(n_shards, shard)`` then
  ``partitionBy(shard)`` means each reducer writes whole shard
  directories — no tiny-file explosion, no post-pass merge. Shard
  sizing is the caller's lever (tokens_per_shard → n_shards), and
  ``maxRecordsPerFile`` bounds any single file inside a shard.

The span pipeline's fan-out (operators/route.py) is the same
single-pass ``partitionBy`` shape keyed by sink; this is the
training-data face of it (driver-mandate territory — the reference
ships to Kafka/Pinot sinks, RawSpansProcessor output topics, not
shard files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def assign_shards(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: int = 73,
) -> DataFrame:
    """Add ``shard`` (uniform hash bucket of the id) and ``shard_pos``
    (the within-shard sort key — a second independent hash, so readers
    see a deterministic global shuffle, not input order)."""
    taken = {"shard", "shard_pos"} & set(df.columns)
    if taken:
        raise ValueError(
            f"input already has {sorted(taken)} — rename or drop before "
            "sharding (silent overwrite would corrupt shard identity)"
        )
    return df.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(n_shards))
        .cast("int"),
    ).withColumn(
        "shard_pos", F.xxhash64(F.col(id_col), F.lit(seed + 1)),
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    seed: int = 73,
    max_records_per_file: int = 0,
) -> dict:
    """Write ``df`` as ``path/shard=K/`` parquet directories with
    deterministic membership and within-shard order; returns a per-shard
    manifest (rows, and token totals when ``n_tokens`` is present).

    The manifest count aggregates the NARROW assignment frame (shard +
    n_tokens only), so the token payload is materialized exactly once —
    in the write itself."""
    sharded = assign_shards(df, n_shards, id_col, seed)
    writer = (
        sharded.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "shard_pos")
        .drop("shard_pos")
        .write.mode("overwrite")
        .option("parquet.page.size", str(4 * 1024 * 1024))
    )
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.partitionBy("shard").parquet(path)

    aggs = [F.count("*").alias("rows")]
    if "n_tokens" in df.columns:
        aggs.append(F.sum("n_tokens").cast("long").alias("tokens"))
    narrow = ["shard"] + (["n_tokens"] if "n_tokens" in df.columns else [])
    per_shard = {
        int(r["shard"]): {k: int(r[k]) for k in r.asDict() if k != "shard"}
        for r in sharded.select(*narrow).groupBy("shard").agg(*aggs).collect()
    }
    return {
        "path": path,
        "n_shards": n_shards,
        "seed": seed,
        "shards": per_shard,
    }


def read_shard(spark: SparkSession, path: str, shard: int) -> DataFrame:
    """One shard, in its written (deterministic) order — what a data
    loader rank consumes. Partition pruning serves the single directory;
    parquet row-group order preserves the write-time sort."""
    return spark.read.parquet(path).where(F.col("shard") == shard)
