"""Curation plan at 10× docs (round-5 VERDICT #7): ≥50k docs with every
applicable opt-in stage armed, reporting the per-stage wall table the 5k
runs could not give (they are job-launch dominated).

Input: the sf0.1 documents table replicated ×10. Replica 0 is verbatim
(preserving the planted dup structure); replicas 1-9 get a deterministic
per-replica word shuffle (sort words by xxhash64(word, rep)) so replicas
are NOT near-dups of each other — same token population, different
shingles — i.e. the corpus grows 10× in real work, not in trivially
collapsible copies.

Stages NOT armed, with reasons (same notes as BENCH/BASELINE.md):
- c4_clean: the synthetic word-soup has no sentence punctuation; c4_keep
  would drop the corpus wholesale (documented in CurationConfig).
- semantic decontamination: the documents table carries no embedding
  column (embeddings.parquet is vec-grain, 2k rows, not doc-aligned).
- url stages / domain_rank_floor: no url/links columns in the table.
- bpe_merges: the BPE train loop is its own benched operator (test_bpe);
  arming it here would fold a driver-side merge loop into stage walls.

Usage: python scripts/curation_scale_run.py [--reps 3] [--rows-factor 10]
Prints one JSON line; run only with no other Spark work live (CLAUDE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

from pyspark.sql import functions as F  # noqa: E402

from bench import host_probe  # noqa: E402
from hypertrace_ingester_spark.plans.curation import (  # noqa: E402
    CurationConfig, run_curation)
from hypertrace_ingester_spark.session import get_spark  # noqa: E402


def build_docs(spark, sf_dir: str, factor: int):
    base = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    words = F.split(F.col("text"), " ")
    shuffled = F.array_join(
        F.transform(
            F.array_sort(
                F.transform(
                    words,
                    lambda w: F.struct(
                        F.xxhash64(w, F.col("rep")).alias("h"),
                        w.alias("w"),
                    ),
                )
            ),
            lambda s: s["w"],
        ),
        " ",
    )
    return base.crossJoin(reps).select(
        (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
        F.when(F.col("rep") == 0, F.col("text")).otherwise(shuffled)
        .alias("text"),
        "lang", "source", "n_chars",
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--rows-factor", type=int, default=10)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    spark = get_spark(app_name="curation_scale",
                      master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus)
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()

    # materialize the input to parquet first (measure the plan, not the
    # synthetic replication) — same rule as bench.py's sequence input
    in_dir = os.path.join(scratch, f"cur_scale_in_{args.rows_factor}x")
    if not os.path.exists(os.path.join(in_dir, "_SUCCESS")):
        build_docs(spark, args.sf_dir, args.rows_factor).repartition(
            args.cpus).write.mode("overwrite").parquet(in_dir)
    docs = spark.read.parquet(in_dir)
    eval_docs = spark.read.parquet(
        os.path.join(args.sf_dir, "documents.parquet")
    ).where(F.col("doc_id") < 50).select("doc_id", "text")

    probe_pre = host_probe(own_jvms=1)
    runs = []
    for rep in range(args.reps):
        work = tempfile.mkdtemp(prefix="cur_scale_", dir=scratch)
        cfg = CurationConfig(
            unicode_normalize=True,
            boilerplate_min_doc_frac=0.05,
            quality_model_alpha=9.0,
            line_dedup=True,
            exact_substr_length=50,
            ccnet_buckets=("head", "middle"),
            mixture_temperature=0.7,
            checkpoint_dir=os.path.join(work, "ckpt"),
            corpus_index_path=os.path.join(work, "corpus_idx"),
            # unique per rep: the bucketed index registers session-catalog
            # tables named <prefix>_*, which would collide across reps
            corpus_index_prefix=f"cur10x_r{rep}_idx",
            corpus_index_append=True,
            shard_dir=os.path.join(work, "shards"),
            n_shards=16,
            metrics_dir=os.path.join(work, "metrics"),
            datacard=True,
        )
        t0 = time.time()
        _, manifest = run_curation(spark, docs, eval_docs=eval_docs,
                                   config=cfg)
        wall = round(time.time() - t0, 2)
        runs.append({
            "wall_sec": wall,
            "stages": manifest["stages"],
            "stage_walls": manifest.get("stage_walls", {}),
            "probe": {"fault_gbps": host_probe(own_jvms=1)["fault_gbps"]},
        })
        shutil.rmtree(work, ignore_errors=True)
        print(f"rep {rep}: {wall} s", file=sys.stderr)

    best = min(runs, key=lambda r: r["wall_sec"])
    counts = [
        {k: (v["rows"], v["tokens"]) for k, v in r["stages"].items()}
        for r in runs
    ]
    print(json.dumps({
        "rows_factor": args.rows_factor,
        "n_docs": docs.count(),
        "walls_sec": [r["wall_sec"] for r in runs],
        "best_stage_table": best["stages"],
        "best_stage_walls": best["stage_walls"],
        "counts_stable": all(c == counts[0] for c in counts[1:]),
        "host_probe_pre": probe_pre,
        "host_probe_post": host_probe(own_jvms=1),
    }))


if __name__ == "__main__":
    main()
