"""Streaming corpus ingestion (streaming/curation.py).

The claim under test: continuous ingestion dedups against EVERYTHING ever
kept while holding zero unbounded streaming state — all-time dedup state
is the persisted incremental index (operators/incremental.py), probed per
micro-batch in foreachBatch; the only streaming state is the
within-watermark exact-dedup buffer, which the watermark evicts.

Two stream "days" drive it: day 1 seeds the corpus (junk filtered, twins
collapsed); day 2 re-presents a day-1 doc (exact), a perturbed day-1 doc
(near), and a fresh doc — the index built from day 1's survivors must
drop the first two and keep the third, across a QUERY RESTART (the index,
not the checkpoint state, carries the knowledge).
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from hypertrace_ingester_spark.streaming import curation as sc

pytestmark = pytest.mark.usefixtures("spark")


def _doc(i: int, n: int = 40) -> str:
    return " ".join(f"w{i}t{j}" for j in range(n))


def _write_batch(spark, path: str, rows: list[tuple], name: str) -> None:
    df = spark.createDataFrame(rows, "doc_id string, text string, ts_ms long")
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/{name}")


def _stream(spark, path: str):
    return (
        spark.readStream.schema("doc_id string, text string, ts_ms long")
        .option("recursiveFileLookup", "true")
        .parquet(path)
        .withColumn("ts", F.timestamp_millis(F.col("ts_ms")))
    )


def _run(spark, in_dir, idx, out):
    # watermark 0s: in-flight dedup state covers only the CURRENT batch, so
    # day 2's re-present must be caught by the persisted INDEX — the test
    # pins the two-horizon split, not the watermark buffer
    q = sc.streaming_curate(
        _stream(spark, in_dir), idx, out, prefix="t_scur", threshold=0.5,
        watermark="0 seconds")
    q.awaitTermination(180)


def _manifests(out: str) -> list[dict]:
    with open(f"{out}/_ingest_manifest.jsonl") as fh:
        return [json.loads(line) for line in fh]


def test_streaming_curate_two_days(spark, tmp_path):
    in_dir, idx, out = (str(tmp_path / d) for d in ("in", "idx", "out"))
    os.makedirs(in_dir)
    base = 1_700_000_000_000
    day1 = [(f"d{i}", _doc(i), base + i * 1000) for i in range(6)]
    day1 += [
        ("junk1", " ".join(["aa"] * 12), base + 7000),        # gopher drop
        ("twin1", "the streaming twin " + _doc(90), base + 8000),
        ("twin2", "the streaming twin " + _doc(90), base + 9000),
    ]
    _write_batch(spark, in_dir, day1, "day1")

    sc.bootstrap_index(spark, idx, prefix="t_scur")
    try:
        _run(spark, in_dir, idx, out)
        man1 = _manifests(out)
        # junk never reached the index probe; exactly one twin survived
        assert sum(m["kept"] for m in man1) == 7
        kept1 = spark.read.parquet(f"{out}/docs").select("doc_id").collect()
        ids1 = {r["doc_id"] for r in kept1}
        assert "junk1" not in ids1
        assert len({"twin1", "twin2"} & ids1) == 1

        # day 2: exact re-present, near-dup (perturbed), fresh — arrives
        # after a RESTART: only the persisted index can know day 1
        words = _doc(3).split(" ")
        words[-1] = "zzz"
        day2 = [
            ("e1", _doc(2), base + 86_400_000),          # exact dup of d2
            ("n1", " ".join(words), base + 86_401_000),  # near dup of d3
            ("f1", " ".join(f"fresh{j}q" for j in range(40)),
             base + 86_402_000),                          # brand new
        ]
        _write_batch(spark, in_dir, day2, "day2")
        _run(spark, in_dir, idx, out)

        man2 = _manifests(out)[len(man1):]
        assert sum(m["exact_dups_vs_corpus"] for m in man2) == 1
        assert sum(m["near_dups_vs_corpus"] for m in man2) == 1
        assert sum(m["kept"] for m in man2) == 1
        ids2 = {r["doc_id"] for r in
                spark.read.parquet(f"{out}/docs").select("doc_id").collect()}
        assert "f1" in ids2 and "e1" not in ids2 and "n1" not in ids2
        assert ids1 <= ids2  # day-1 survivors untouched by day 2's batches
    finally:
        for t in ("t_scur_exact", "t_scur_bands", "t_scur_sigs"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
