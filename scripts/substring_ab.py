"""A/B the ExactSubstr gram streams: JVM O(n·L) slice hashing
(dedup.token_grams) vs Arrow-side O(n) Rabin-Karp (token_grams_rolling).

Interleaved ABAB reps on one session (the measurement pattern bench.py's
per-query section uses), synthetic planted corpus identical to
BENCH/BASELINE.md's exact-substring scaling table. Reports per-variant
wall minima + host probes, and cross-checks that both variants drop the
SAME token count (the hash-agnostic invariant).

Usage: python scripts/substring_ab.py [--docs 100000] [--toks 200]
           [--length 50] [--reps 3]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def make_corpus(spark, n_docs: int, avg_toks: int):
    """Planted corpus: ~10% of docs share one 60-token run (the
    BENCH/BASELINE.md shape), token values deterministic."""
    d = F.col("doc_id")

    def tok(i):
        # hash-scrambled filler: linear-in-i fillers are degenerate (every
        # same-start window is an identical arithmetic progression) — only
        # the planted 60-token runs may duplicate
        return (
            F.when((d % 10 == 0) & (i >= 20) & (i < 80), i + 7_000_000)
            .otherwise(F.pmod(F.xxhash64(d, i), F.lit(1_000_003)))
            .cast("int")
        )

    n_tok = (F.lit(avg_toks) + (d % 21) - 10).cast("int")
    return (
        spark.range(n_docs)
        .select(F.col("id").alias("doc_id"))
        .select(
            "doc_id",
            F.transform(F.sequence(F.lit(0), n_tok - 1), tok).alias("tokens"),
            n_tok.cast("long").alias("n_tok"),
        )
        .repartition(32)
        .localCheckpoint()
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--toks", type=int, default=200)
    ap.add_argument("--length", type=int, default=50)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    from hypertrace_ingester_spark.session import get_spark
    from hypertrace_ingester_spark.operators import dedup

    pre = bench.host_probe()
    spark = get_spark(app_name="substring_ab", master="local[32]",
                      shuffle_partitions=32)
    corpus = make_corpus(spark, args.docs, args.toks)
    n_tokens = corpus.agg(F.sum("n_tok")).first()[0]

    def run(rolling: bool) -> tuple[float, int]:
        t0 = time.time()
        dropped = (
            dedup.substring_dedup(corpus, length=args.length, rolling=rolling)
            .agg(F.sum("n_tok_dropped"))
            .first()[0]
        )
        return time.time() - t0, int(dropped)

    run(False)  # one warmup each (JIT / python-worker spin-up)
    run(True)
    walls = {"slice": [], "rolling": []}
    drops = set()
    for _ in range(args.reps):
        for name, flag in (("slice", False), ("rolling", True)):
            w, d = run(flag)
            walls[name].append(round(w, 3))
            drops.add(d)
    post = bench.host_probe()
    result = {
        "docs": args.docs,
        "tokens": int(n_tokens),
        "length": args.length,
        "walls": walls,
        "min_slice": min(walls["slice"]),
        "min_rolling": min(walls["rolling"]),
        "dropped_agree": len(drops) == 1,
        "dropped": sorted(drops),
        "host_probe_pre": pre,
        "host_probe_post": post,
    }
    print("RESULT_JSON " + json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
