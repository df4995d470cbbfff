"""A/B the parquet write options on the pipeline's fan-out write.

The pipeline hot path is ~2/3 parquet encode+write of the token payload
(profiled round 4: warm noop-compute 4.6 s vs full fan_out 12.8 s at 1M
rows), so writer-side knobs are the highest-leverage remaining lever.
Candidates (parquet-mr options, passed per-write):

- ``parquet.page.write-checksum.enabled=false`` — skip the CRC32 per data
  page. Integrity is still covered end-to-end by the pipeline's own
  routed-row equality checks and by object-store checksums in production;
  page CRCs are a read-time corruption canary only.
- ``parquet.page.size=4194304`` (4 MB, default 1 MB) — the token column's
  plain-encoded values are ~1 KB/row, so 1 MB pages flush the encoder every
  ~1k rows; bigger pages amortize page-header/stat/flush overhead on the
  widest column.

One JVM, one build of the routed DataFrame, reps alternate round-robin
across variants (ABCD ABCD ...) so an episodic host degradation lands on
every variant instead of poisoning one — same rationale as bench.py's
interleaved query passes. Per-rep spin probe recorded.

Usage: python scripts/write_options_ab.py [n_rows] [reps_per_variant]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import spin_probe  # shared calibration with bench JSON spins
from hypertrace_ingester_spark import datagen
from hypertrace_ingester_spark.operators import enrich as enrich_ops
from hypertrace_ingester_spark.operators import parse as parse_ops
from hypertrace_ingester_spark.operators import route as route_ops
from hypertrace_ingester_spark.session import get_spark

from pyspark.sql import functions as F

VARIANTS = {
    "base": {},
    "nocrc": {"parquet.page.write-checksum.enabled": "false"},
    "bigpage": {"parquet.page.size": str(4 * 1024 * 1024)},
    "nocrc+bigpage": {
        "parquet.page.write-checksum.enabled": "false",
        "parquet.page.size": str(4 * 1024 * 1024),
    },
}


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    spark = get_spark(app_name="write_ab")
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()

    input_dir = os.path.join(scratch, f"bench_seq_{n_rows}.parquet")
    if not os.path.exists(os.path.join(input_dir, "_SUCCESS")):
        datagen.generate_sequences(spark, n_rows, partitions=128).write.mode(
            "overwrite"
        ).parquet(input_dir)
    seqs = spark.read.parquet(input_dir)

    parsed = parse_ops.parse_sequences(seqs)
    alive = parsed.filter(F.col("has_tenant") & ~F.col("is_dropped")).select(
        *parse_ops.PARSE_OUTPUT_COLS
    )
    ctx = enrich_ops.EnrichContext(
        endpoints=datagen.endpoints_dim(spark),
        services=datagen.services_dim(spark),
        status_codes=datagen.status_codes_dim(spark),
    )
    enriched = enrich_ops.enrich_with_bypass(alive, ctx)
    routed = route_ops.route(enriched, datagen.route_rules_dim(spark))

    def timed_write(opts: dict) -> float:
        out = tempfile.mkdtemp(prefix="wab_", dir=scratch)
        w = (
            routed.write.mode("overwrite")
            .option("parquet.writer.version", "v2")
            .option("parquet.enable.dictionary#tokens.list.element", "false")
        )
        for k, v in opts.items():
            w = w.option(k, v)
        t0 = time.time()
        w.partitionBy("sink").parquet(out)
        dt = time.time() - t0
        shutil.rmtree(out, ignore_errors=True)
        return round(dt, 2)

    # warmup (JIT) — untimed, base options
    timed_write({})

    runs: dict[str, list[float]] = {k: [] for k in VARIANTS}
    spins: dict[str, list[float]] = {k: [] for k in VARIANTS}
    for _ in range(reps):
        for name, opts in VARIANTS.items():
            runs[name].append(timed_write(opts))
            spins[name].append(spin_probe())

    out = {
        "n_rows": n_rows,
        "reps": reps,
        "min_sec": {k: min(v) for k, v in runs.items()},
        "median_sec": {k: sorted(v)[len(v) // 2] for k, v in runs.items()},
        "runs_sec": runs,
        "spin_mops": spins,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
