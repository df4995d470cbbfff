"""Small-file compaction — the maintenance pass every appended layout needs.

Every append-shaped writer in the repo multiplies files: the streaming
curation sink appends one file set per micro-batch
(streaming/curation.py), `build_index(mode='append')` adds a file per
(task, bucket) per delta (operators/incremental.py), and the daily-crawl
flow appends corpus survivors each day (plans/curation.py). At 100 TB
scale a year of daily appends turns every scan into a listing storm and
every bucketed read into thousands of tiny-file opens per bucket — table
formats ship a maintenance pass for exactly this (Iceberg
`rewrite_data_files`, Delta `OPTIMIZE`; the reference ingester compacts
its RocksDB span store the same way via background compaction,
RawSpansProcessor's store config). This module is the parquet-native
analog, with the two layouts the repo writes:

- **Bucketed tables** (`compact_bucketed_table`): read the bucketed scan
  (one input partition per bucket, all of that bucket's files), rewrite
  with the SAME bucketBy spec. The scan's reported partitioning already
  satisfies the write's required distribution, so the rewrite is
  ZERO-Exchange (plan-asserted in tests/test_compaction.py) — one
  read+write pass, no shuffle, and each bucket lands as one file.
- **Plain / hive-partitioned dirs** (`compact_dir`): size-targeted
  `coalesce` rewrite per leaf directory — coalesce, not repartition, so
  compaction itself never shuffles; input files are write-sized and
  near-uniform, so coalesce skew is bounded by the target size.

Both rewrite to a temp sibling and atomically swap directories, so a
crashed compaction leaves the original layout untouched and readers never
see a half-written table (the same idempotence contract as the streaming
sink's per-batch overwrite). On an object store the "rename" is the
table-format metadata swap; the seam is this module's `_swap_dirs`.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from . import bucketing

DEFAULT_TARGET_MB = 256


def file_stats(path: str) -> dict:
    """Recursive data-file census of ``path``: count, bytes, min/max size.

    Driver-side metadata listing only (the same cost every planner listing
    pays); `_`-prefixed bookkeeping (``_SUCCESS``, ``_index_meta.json``)
    and hidden files are excluded, matching Spark's own data-file filter.
    """
    n, total, smallest, largest = 0, 0, None, 0
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for f in files:
            if f.startswith("_") or f.startswith("."):
                continue
            sz = os.path.getsize(os.path.join(root, f))
            n += 1
            total += sz
            largest = max(largest, sz)
            smallest = sz if smallest is None else min(smallest, sz)
    return {
        "n_files": n,
        "total_bytes": total,
        "min_bytes": smallest or 0,
        "max_bytes": largest,
    }


def _leaf_partition_dirs(path: str) -> list[str]:
    """Leaf directories holding data files: ``path`` itself for a flat
    layout, else every ``key=value`` leaf of a hive-partitioned tree."""
    leaves = []
    for root, dirs, files in os.walk(path):
        if any(not f.startswith(("_", ".")) for f in files):
            leaves.append(root)
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
    return leaves or [path]


def _hidden_sibling(path: str, tag: str) -> str:
    """A normal-named leaf under a dot-prefixed sibling dir
    (``<parent>/.<tag>/<name>``): invisible to Spark's data-file listing of
    ``<parent>`` (hive-partition readers of the root never see it), to
    :func:`file_stats`, and to :func:`_leaf_partition_dirs`, so a
    crash-left temp or old directory never pollutes reads or
    re-compaction. The LEAF name stays undotted because Spark's file index
    filters a dot-prefixed root path itself ("All paths were ignored") —
    only ancestors may hide."""
    d, b = os.path.split(os.path.abspath(path))
    hidden_dir = os.path.join(d, f".{tag}")
    os.makedirs(hidden_dir, exist_ok=True)
    return os.path.join(hidden_dir, b)


def _swap_dirs(path: str, tmp_path: str) -> None:
    """Atomically replace ``path`` with ``tmp_path`` (rename-swap; the old
    data survives at a hidden sibling until the swap completes, then drops)."""
    old = _hidden_sibling(path, "compact-old")
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(path, old)
    os.rename(tmp_path, path)
    shutil.rmtree(old)


def compact_dir(
    spark: SparkSession,
    path: str,
    target_mb: int = DEFAULT_TARGET_MB,
    min_files: int = 2,
) -> dict:
    """Compact a plain or hive-partitioned parquet directory in place.

    Each leaf partition directory is rewritten to
    ``ceil(leaf_bytes / target_mb)`` files via ``coalesce`` (never a
    shuffle); leaves already at ``min_files`` or fewer are skipped, so a
    nightly run over an already-compact table is a metadata no-op. Hive
    partition values live in the directory name, so per-leaf rewrites
    preserve the partition column on re-read. Returns a before/after
    manifest (the curation-manifest idiom)."""
    before = file_stats(path)
    compacted_leaves = 0
    for leaf in _leaf_partition_dirs(path):
        stats = file_stats(leaf)
        if stats["n_files"] <= min_files:
            continue
        n_out = max(1, math.ceil(stats["total_bytes"] / (target_mb * 1024 * 1024)))
        if n_out >= stats["n_files"]:
            continue
        tmp = _hidden_sibling(leaf, "compact-tmp")
        (
            spark.read.parquet(leaf)
            .coalesce(n_out)
            .write.mode("overwrite")
            .option("parquet.page.size", str(4 * 1024 * 1024))
            .parquet(tmp)
        )
        _swap_dirs(leaf, tmp)
        compacted_leaves += 1
    return {
        "path": path,
        "leaves_compacted": compacted_leaves,
        "files_before": before["n_files"],
        "files_after": file_stats(path)["n_files"],
        "bytes": before["total_bytes"],
    }


def compact_bucketed_table(
    spark: SparkSession,
    table: str,
    path: str,
    schema_ddl: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> dict:
    """Zero-Exchange compaction of an EXTERNAL bucketed table.

    Reads the bucketed scan (its reported partitioning is the bucket
    hash), rewrites with the identical ``bucketBy`` spec to a temp
    location — the planner drops the Exchange the write would otherwise
    require, so the whole pass is scan → sort-within-bucket → write —
    then rename-swaps the data directory and re-registers the table.
    After N appends a bucket holds N×tasks files; after compaction it
    holds one. Layout metadata (catalog DDL, ``ensure_bucketed_table``
    validation) is unchanged, so downstream zero-Exchange joins keep
    their plans."""
    src = bucketing.ensure_bucketed_table(
        spark, table, path, schema_ddl, bucket_cols, n_buckets, sort_cols
    )
    before = file_stats(path)
    tmp_path = _hidden_sibling(path, "compact-tmp")
    tmp_table = f"{table}_compact_tmp"
    if os.path.exists(tmp_path):
        shutil.rmtree(tmp_path)
    # Force the bucket-aligned scan for the rewrite: autoBucketedScan may
    # otherwise plan a plain file-split read (no downstream operator needs
    # the distribution), and a task holding a file split rather than a
    # whole bucket writes one file per (task, bucket) again — exactly the
    # fragmentation being repaired. With the aligned scan each task IS one
    # bucket and emits exactly one file.
    auto_key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev_auto = spark.conf.get(auto_key, "true")
    spark.conf.set(auto_key, "false")
    try:
        bucketing.write_bucketed(
            src, tmp_table, bucket_cols, n_buckets,
            sort_cols=sort_cols, mode="overwrite", path=tmp_path,
        )
    finally:
        spark.conf.set(auto_key, prev_auto)
    spark.sql(f"DROP TABLE IF EXISTS {tmp_table}")
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    _swap_dirs(path, tmp_path)
    bucketing.ensure_bucketed_table(
        spark, table, path, schema_ddl, bucket_cols, n_buckets, sort_cols
    )
    return {
        "table": table,
        "files_before": before["n_files"],
        "files_after": file_stats(path)["n_files"],
        "bytes": before["total_bytes"],
    }


def compact_index(spark: SparkSession, path: str, prefix: str = "corpus_index") -> dict:
    """Compact the three incremental-dedup index tables
    (operators/incremental.py) after a run of daily appends — the
    maintenance half of the daily-crawl flow. Geometry comes from the
    index's own persisted meta, never the caller."""
    from ..operators import incremental as inc

    idx = inc.load_index(spark, path, prefix=prefix)
    meta = idx.get("_meta") or {}
    n_buckets = meta.get("n_buckets", inc.INDEX_BUCKETS)
    t = {
        "exact": ("text_hash string, doc_id string", ["text_hash"]),
        "bands": ("band_hash bigint, doc_id string", ["band_hash"]),
        "sigs": ("doc_id string, minhash array<bigint>", ["doc_id"]),
    }
    out = {}
    for name, (ddl, cols) in t.items():
        out[name] = compact_bucketed_table(
            spark, f"{prefix}_{name}", f"{path}/{name}", ddl, cols, n_buckets
        )
    return out
