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
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from hypertrace_ingester_spark.session import get_spark
from hypertrace_ingester_spark.plans.pipeline import run_pipeline, PipelineConfig

mode, n, input_dir, reps, scratch = sys.argv[1], int(sys.argv[2]), sys.argv[3], int(sys.argv[4]), sys.argv[5]
narrow = "narrow" in sys.argv[6:]
interleaved = "interleaved" in sys.argv[6:]
noop = "noop" in sys.argv[6:]
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
if narrow:
    # the narrow input is ~20x smaller on disk, so the default 128 MB
    # maxPartitionBytes would pack it into ~1 input split and serialize
    # the parse stage — size splits to the SAME task count the wide input
    # gets (~1 split per 128 MB of wide bytes ~ 64 splits at 4M rows),
    # keeping the two plans task-for-task comparable
    nbytes = sum(
        os.path.getsize(os.path.join(input_dir, f))
        for f in os.listdir(input_dir) if f.endswith(".parquet")
    )
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(max(nbytes // 64, 1 << 20)))
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
seqs = spark.read.parquet(input_dir)

def one_rep():
    out = tempfile.mkdtemp(prefix=f"scale_{{n}}_", dir=scratch)
    t0 = time.time()
    m = run_pipeline(spark, seqs, PipelineConfig(out_dir=out))
    dt = time.time() - t0
    shutil.rmtree(out, ignore_errors=True)
    return dt, m

if noop:
    # compute-only decomposition: the full parse -> enrich -> route DAG with
    # every routed row (token payload included) materialized into Spark's
    # built-in `noop` batch writer — all the engine work minus the parquet
    # encode + tmpfs page faults of the sink. Scaling of THIS variant is the
    # engine's own N->4N behavior with the one-DRAM-domain write substrate
    # removed; the aggregate stage is excluded because in the real pipeline
    # it re-reads the written sink with column pruning (tokens never read),
    # i.e. it belongs to the write side of the decomposition.
    from hypertrace_ingester_spark import datagen
    from hypertrace_ingester_spark.operators import enrich as enrich_ops
    from hypertrace_ingester_spark.operators import parse as parse_ops
    from hypertrace_ingester_spark.operators import route as route_ops
    from pyspark.sql import functions as F
    _ctx = enrich_ops.EnrichContext(
        endpoints=datagen.endpoints_dim(spark),
        services=datagen.services_dim(spark),
        status_codes=datagen.status_codes_dim(spark),
    )
    _rules = datagen.route_rules_dim(spark)

    def one_rep():
        t0 = time.time()
        parsed = parse_ops.parse_sequences(seqs)
        alive = parsed.filter(
            F.col("has_tenant") & ~F.col("is_dropped")
        ).select(*parse_ops.PARSE_OUTPUT_COLS)
        routed = route_ops.route(enrich_ops.enrich_with_bypass(alive, _ctx), _rules)
        routed.write.format("noop").mode("overwrite").save()
        return time.time() - t0, {{"total_routed_rows": None}}

def spin_probe():
    # single-thread spin speed: <4 Mops on this box = degraded host window
    # (hypervisor steal / fault-bandwidth collapse; BENCH/BASELINE.md
    # "Measurement hygiene" #3) — lets a slow rep be attributed in the JSON
    t0 = time.time()
    x = 0
    while time.time() - t0 < 0.2:
        x += 1
    return round(x / (time.time() - t0) / 1e6, 2)

if interleaved:
    # driven over stdin by the parent: one rep per RUN line, so reps
    # alternate between parallelism levels (ABAB) — an episodic host
    # slowdown (hypervisor steal / memory-reclaim stall) contaminates
    # both levels instead of silently poisoning one
    routed = None
    print("READY", flush=True)
    for line in sys.stdin:
        cmd = line.strip()
        if cmd == "QUIT":
            break
        dt, m = one_rep()
        routed = m["total_routed_rows"]
        print(f"REP {{dt:.3f}} {{spin_probe()}}", flush=True)
    print("RESULT " + json.dumps({{"n": n, "routed": routed}}), flush=True)
else:
    times, spins = [], []
    for i in range(reps + 1):  # rep 0 = untimed warmup
        dt, m = one_rep()
        if i > 0:
            times.append(dt)
            spins.append(spin_probe())
    print("RESULT " + json.dumps({{"n": n, "times": times, "spins": spins,
                                   "routed": m["total_routed_rows"]}}))
"""


def _level_cmd(mode: str, n: int, input_dir: str, reps: int, pin: bool,
               narrow: bool, interleaved: bool = False,
               noop: bool = False) -> tuple[list, bool]:
    script = WORKER.format(repo=REPO)
    cores = n * 8 if mode == "executors" else n
    cmd = [sys.executable, "-c", script, mode, str(n), input_dir, str(reps), SCRATCH]
    if narrow:
        cmd.append("narrow")
    if interleaved:
        cmd.append("interleaved")
    if noop:
        cmd.append("noop")
    # record whether THIS level actually got pinned — taskset may be
    # missing or the level may need more cores than the host has, and a
    # silently-unpinned level must not be reported as pinned
    pinned = bool(pin and shutil_which("taskset") and cores <= os.cpu_count())
    if pinned:
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    return cmd, pinned


def run_level(mode: str, n: int, input_dir: str, reps: int, pin: bool = True, narrow: bool = False, noop: bool = False) -> dict:
    cmd, pinned = _level_cmd(mode, n, input_dir, reps, pin, narrow, noop=noop)
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


def run_interleaved(mode: str, levels: list, input_dir: str, reps: int,
                    pin: bool, narrow: bool, noop: bool = False) -> dict:
    """ABAB rep ordering: both level workers stay alive (only one executes
    at a time, driven over stdin), so an episodic host slowdown lands on
    reps of BOTH levels rather than silently poisoning whichever level ran
    during the episode — the failure mode that produced round-3's
    32-slower-than-8 artifacts."""
    procs, pinned = {}, {}
    for n in levels:
        cmd, pn = _level_cmd(mode, n, input_dir, reps, pin, narrow, interleaved=True, noop=noop)
        # stderr to a file, not DEVNULL: a worker that dies mid-rep (one
        # did, silently, during a host-stall episode) must leave its
        # traceback somewhere findable
        errf = open(os.path.join(tempfile.gettempdir(), f"scale_worker_{mode}_{n}.err"), "w")
        procs[n] = subprocess.Popen(
            cmd, stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=errf, text=True, bufsize=1,
        )
        pinned[n] = pn
    try:
        for n in levels:  # wait for session init before any timing
            line = procs[n].stdout.readline()
            while line and not line.startswith("READY"):
                line = procs[n].stdout.readline()
            if not line:
                raise RuntimeError(f"worker {n} died before READY")
        times = {n: [] for n in levels}
        spins = {n: [] for n in levels}
        for rep in range(reps + 1):  # rep 0 = untimed warmup (both levels)
            for n in levels:
                p = procs[n]
                p.stdin.write("RUN\n")
                p.stdin.flush()
                line = p.stdout.readline()
                while line and not line.startswith("REP "):
                    line = p.stdout.readline()
                if not line:
                    raise RuntimeError(f"worker {n} died mid-rep")
                if rep > 0:
                    parts = line.split()
                    times[n].append(float(parts[1]))
                    spins[n].append(float(parts[2]) if len(parts) > 2 else -1.0)
                    print(f"  rep {rep} {mode}={n}: {times[n][-1]:.1f}s "
                          f"(spin {spins[n][-1]})", flush=True)
        results = {}
        for n in levels:
            p = procs[n]
            p.stdin.write("QUIT\n")
            p.stdin.flush()
            line = p.stdout.readline()
            while line and not line.startswith("RESULT "):
                line = p.stdout.readline()
            r = json.loads(line[len("RESULT "):]) if line else {"n": n, "routed": None}
            r["times"] = times[n]
            r["spins"] = spins[n]
            r["pinned"] = pinned[n]
            results[n] = r
        return results
    finally:
        for p in procs.values():
            try:
                p.stdin.close()
            except Exception:
                pass
            try:
                p.wait(timeout=60)
            except Exception:
                p.kill()


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
    ap.add_argument("--interleave", action="store_true",
                    help="keep both level workers alive and alternate reps "
                         "ABAB (only one executes at a time) so episodic host "
                         "slowdowns contaminate both levels symmetrically "
                         "instead of poisoning one level's whole series")
    ap.add_argument("--narrow", action="store_true",
                    help="payload-decomposition experiment: identical rows and "
                         "plan, but the tokens array truncated to 1 element "
                         "(~zero payload bytes). Parse/enrich/route never "
                         "compute over tokens content — it is pure carried "
                         "payload — so this isolates how the PLAN scales from "
                         "how moving payload bytes through one DRAM domain "
                         "scales. n_tok (used by the histogram) is untouched.")
    ap.add_argument("--noop", action="store_true",
                    help="compute-only decomposition: full parse/enrich/route "
                         "DAG with every routed row (payload included) "
                         "materialized into Spark's built-in noop writer — "
                         "engine scaling with the parquet-encode + tmpfs "
                         "page-fault write substrate removed.")
    args = ap.parse_args()

    suffix = "_narrow" if args.narrow else ""
    input_dir = os.path.join(SCRATCH, f"bench_seq_{args.rows}{suffix}.parquet")
    if not os.path.exists(os.path.join(input_dir, "_SUCCESS")):
        shrink = (
            ".withColumn('tokens', F.slice(F.col('tokens'), 1, 1))" if args.narrow else ""
        )
        gen = (
            "import sys; sys.path.insert(0, {repo!r})\n"
            "from hypertrace_ingester_spark.session import get_spark\n"
            "from hypertrace_ingester_spark import datagen\n"
            "from pyspark.sql import functions as F\n"
            "spark = get_spark(master='local[32]')\n"
            "datagen.generate_sequences(spark, {rows}, partitions=128){shrink}"
            ".write.mode('overwrite').parquet({inp!r})\n"
        ).format(repo=REPO, rows=args.rows, inp=input_dir, shrink=shrink)
        subprocess.run([sys.executable, "-c", gen], check=True, timeout=3600)

    if args.interleave:
        results = run_interleaved(args.mode, args.levels, input_dir, args.reps,
                                  pin=not args.no_pin, narrow=args.narrow,
                                  noop=args.noop)
    else:
        results = {}
        for n in args.levels:
            results[n] = run_level(args.mode, n, input_dir, args.reps,
                                   pin=not args.no_pin, narrow=args.narrow,
                                   noop=args.noop)
    for n in args.levels:
        r = results[n]
        r["median_sec"] = statistics.median(r["times"])
        r["min_sec"] = min(r["times"])
        r["throughput"] = args.rows / r["median_sec"]
        print(f"{args.mode}={n}: median {r['median_sec']:.1f}s min {r['min_sec']:.1f}s "
              f"({r['throughput']:.0f} seq/s), times={[round(t,1) for t in r['times']]}")

    n, n4 = args.levels
    speedup = results[n4]["throughput"] / results[n]["throughput"]
    efficiency = speedup / (n4 / n)
    print(f"speedup {speedup:.2f}x over {n4//n}x {args.mode} -> scaling efficiency {efficiency:.2f}")
    min_speedup = (args.rows / results[n4]["min_sec"]) / (args.rows / results[n]["min_sec"])
    print("RESULT_JSON " + json.dumps({"mode": args.mode, "rows": args.rows,
                                       "narrow": args.narrow, "noop": args.noop,
                                       "interleaved": args.interleave,
                                       "min_based_efficiency": min_speedup / (n4 / n),
                                       "pinned": all(r["pinned"] for r in results.values()),
                                       "levels": args.levels,
                                       "results": {str(k): v for k, v in results.items()},
                                       "speedup": speedup, "efficiency": efficiency}))


if __name__ == "__main__":
    main()
