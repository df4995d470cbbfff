"""Scaling-efficiency benchmark: the same pipeline job at two parallelism
levels over the SAME materialized input, per BASELINE.json's north rule
(throughput scaling efficiency N→4N executors).

Two modes:
- threads:   local[N] vs local[4N] in one JVM;
- executors: local-cluster[N,8,12g] — N separate executor JVMs × 8 cores,
             the in-sandbox analog of an N-executor cluster.

Each level runs in a fresh subprocess (own JVM — fair JIT state), does one
untimed warmup run, then ``--reps`` measured runs; median + min reported,
plus a RESULT_JSON line. BENCH/BASELINE.md holds the curated results and
the scaling analysis (hardware ceilings measured via microbenchmarks).

CPU pinning (round-3 methodology fix): each level is pinned with
``taskset`` to exactly its core budget (N cores for threads mode, N×8 for
executors mode). Without pinning, the "8-core" level borrows all 32
physical cores' cache and turbo headroom (8 worker threads migrate
freely), understating the small level's true cost and adding 2.3×
run-to-run spread in executors mode from scheduler migration; pinned, the
levels measure what N-core hardware actually does, and the JVM sizes its
GC/compiler pools from the affinity mask. Disable with --no-pin.

Usage: python scripts/scaling_bench.py [--rows 4000000] [--reps 3]
       [--levels 8 32] [--mode threads|executors] [--no-pin]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
from shutil import which as shutil_which
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRATCH = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()

WORKER = r"""
import json, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from hypertrace_ingester_spark.session import get_spark
from hypertrace_ingester_spark.plans.pipeline import run_pipeline, PipelineConfig

mode, n, input_dir, reps, scratch = sys.argv[1], int(sys.argv[2]), sys.argv[3], int(sys.argv[4]), sys.argv[5]
if mode == "executors":
    # N separate executor JVMs x 8 cores — the in-sandbox analog of an
    # N-executor cluster (own heap + GC per executor, shared host DRAM)
    master, cores = f"local-cluster[{{n}},8,12288]", n * 8
    extra = {{"spark.executor.memory": "12g", "spark.driver.memory": "8g",
              "spark.executor.extraJavaOptions": "-XX:+UseParallelGC -Xmn4g"}}
else:
    master, cores = f"local[{{n}}]", n
    extra = {{}}
spark = get_spark(app_name=f"scaling_{{mode}}_{{n}}", master=master,
                  shuffle_partitions=max(cores, 8), extra_conf=extra)
seqs = spark.read.parquet(input_dir)
times = []
for i in range(reps + 1):  # rep 0 = untimed warmup
    out = tempfile.mkdtemp(prefix=f"scale_{{n}}_", dir=scratch)
    t0 = time.time()
    m = run_pipeline(spark, seqs, PipelineConfig(out_dir=out))
    dt = time.time() - t0
    shutil.rmtree(out, ignore_errors=True)
    if i > 0:
        times.append(dt)
print("RESULT " + json.dumps({{"n": n, "times": times,
                               "routed": m["total_routed_rows"]}}))
"""


def run_level(mode: str, n: int, input_dir: str, reps: int, pin: bool = True) -> dict:
    script = WORKER.format(repo=REPO)
    cores = n * 8 if mode == "executors" else n
    cmd = [sys.executable, "-c", script, mode, str(n), input_dir, str(reps), SCRATCH]
    # record whether THIS level actually got pinned — taskset may be
    # missing or the level may need more cores than the host has, and a
    # silently-unpinned level must not be reported as pinned
    pinned = bool(pin and shutil_which("taskset") and cores <= os.cpu_count())
    if pinned:
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    out = subprocess.run(
        cmd,
        capture_output=True, text=True, timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            result = json.loads(line[len("RESULT "):])
            result["pinned"] = pinned
            return result
    raise RuntimeError(f"no RESULT from {mode}={n}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--levels", type=int, nargs=2, default=[8, 32])
    ap.add_argument("--mode", choices=["threads", "executors"], default="threads",
                    help="threads: local[N]; executors: local-cluster[N,8,12g] "
                         "(levels are executor counts, e.g. 1 4)")
    ap.add_argument("--no-report", action="store_true",
                    help="print results only; don't write BENCH/BASELINE.md")
    ap.add_argument("--no-pin", action="store_true",
                    help="skip taskset CPU pinning (measure the unpinned legacy way)")
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
    for n in args.levels:
        r = run_level(args.mode, n, input_dir, args.reps, pin=not args.no_pin)
        r["median_sec"] = statistics.median(r["times"])
        r["min_sec"] = min(r["times"])
        r["throughput"] = args.rows / r["median_sec"]
        results[n] = r
        print(f"{args.mode}={n}: median {r['median_sec']:.1f}s min {r['min_sec']:.1f}s "
              f"({r['throughput']:.0f} seq/s), times={[round(t,1) for t in r['times']]}")

    n, n4 = args.levels
    speedup = results[n4]["throughput"] / results[n]["throughput"]
    efficiency = speedup / (n4 / n)
    print(f"speedup {speedup:.2f}x over {n4//n}x {args.mode} -> scaling efficiency {efficiency:.2f}")
    print("RESULT_JSON " + json.dumps({"mode": args.mode, "rows": args.rows,
                                       "pinned": all(r["pinned"] for r in results.values()),
                                       "levels": args.levels,
                                       "results": {str(k): v for k, v in results.items()},
                                       "speedup": speedup, "efficiency": efficiency}))


if __name__ == "__main__":
    main()
