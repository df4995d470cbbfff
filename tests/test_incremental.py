"""Incremental corpus maintenance (operators/incremental.py).

- exact stages carry a FULL DuckDB oracle (within-delta min-id keep +
  anti-join vs the corpus hash set restated as plain SQL on the same
  parquet bytes);
- the near-dup-vs-corpus stage is pinned with planted copies (exact copy →
  stage-2 drop, word-perturbed copy → stage-3 drop, unique-vocabulary
  fresh doc → kept) — deterministic under xxhash64;
- the scale property is plan-asserted: every delta-vs-index join reads the
  corpus side's bucket layout with NO Exchange (exactly one Exchange in
  the join plan: the delta side);
- append + re-dedup is idempotent (everything re-presented is an exact
  dup of the index).
"""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from hypertrace_ingester_spark.operators import incremental as inc
from hypertrace_ingester_spark.oracle import compare

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata dir {SF_DIR} missing"
)


def _fixture(tmp_path) -> tuple[str, str]:
    """corpus = even docs; delta = odd docs + planted rows:
    - 9000xx: exact copies of corpus docs        → exact-vs-corpus drops
    - 9100xx: corpus docs with the last word replaced → near-vs-corpus drops
    - 9200xx: unique-vocabulary fresh docs       → kept
    - 9300xx: within-delta exact duplicate pair  → min-id survives stage 1
    """
    src = pd.read_parquet(os.path.join(SF_DIR, "documents.parquet"),
                          columns=["doc_id", "text"])
    corpus = src[src["doc_id"] % 2 == 0].copy()
    delta_rows = [
        {"doc_id": int(d), "text": t}
        for d, t in zip(src["doc_id"], src["text"]) if d % 2 == 1
    ]
    long_corpus = corpus[corpus["text"].str.count(" ") >= 30].head(8)
    for i, (_, row) in enumerate(long_corpus.iterrows()):
        delta_rows.append({"doc_id": 900000 + i, "text": row["text"]})
        words = row["text"].split(" ")
        words[-1] = "zzperturbed"
        delta_rows.append({"doc_id": 910000 + i, "text": " ".join(words)})
    for i in range(4):
        fresh = " ".join(f"zqx{i}w{j}" for j in range(40))
        delta_rows.append({"doc_id": 920000 + i, "text": fresh})
    delta_rows.append({"doc_id": 930000, "text": "the within delta twin"})
    delta_rows.append({"doc_id": 930001, "text": "the within delta twin"})

    corpus_path = str(tmp_path / "corpus.parquet")
    delta_path = str(tmp_path / "delta.parquet")
    corpus.to_parquet(corpus_path, index=False)
    pd.DataFrame(delta_rows).to_parquet(delta_path, index=False)
    return corpus_path, delta_path


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("incremental")
    corpus_path, delta_path = _fixture(base)
    idx_path = str(base / "index")
    corpus = spark.read.parquet(corpus_path)
    meta = inc.build_index(corpus, idx_path, prefix="t_inc")
    index = inc.load_index(spark, idx_path, prefix="t_inc")
    yield corpus_path, delta_path, idx_path, index, meta
    for t in ("t_inc_exact", "t_inc_bands", "t_inc_sigs"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_exact_stages_match_duckdb_oracle(spark, setup):
    import duckdb

    corpus_path, delta_path, _, index, _ = setup
    delta = spark.read.parquet(delta_path)
    # threshold 2.0 > any signature estimate → stage 3 is a no-op; what
    # remains is pure exact logic DuckDB can restate
    kept, man = inc.incremental_dedup(delta, index, threshold=2.0)
    got = kept.select("doc_id").toPandas()

    con = duckdb.connect()
    oracle = con.execute(f"""
        WITH delta AS (SELECT * FROM read_parquet('{delta_path}')),
        corpus AS (SELECT * FROM read_parquet('{corpus_path}')),
        d1 AS (
          SELECT * FROM delta
          WHERE doc_id = (SELECT min(d2.doc_id) FROM delta d2
                          WHERE md5(d2.text) = md5(delta.text))
        )
        SELECT doc_id FROM d1
        WHERE md5(text) NOT IN (SELECT md5(text) FROM corpus)
    """).df()
    assert compare(got, oracle) == []
    assert man["kept"] == len(oracle)
    assert man["near_dups_vs_corpus"] == 0


def test_planted_near_dups(spark, setup):
    _, delta_path, _, index, _ = setup
    delta = spark.read.parquet(delta_path)
    kept, man = inc.incremental_dedup(delta, index, threshold=0.5)
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}

    # exact copies of corpus docs never survive
    assert not any(900000 <= d < 900100 for d in kept_ids)
    # one-word-perturbed long docs are caught by the signature index
    assert not any(910000 <= d < 910100 for d in kept_ids)
    # unique-vocabulary fresh docs always survive
    assert {920000, 920001, 920002, 920003} <= kept_ids
    # within-delta twins: min id survives stages 1-2 (not in corpus)
    assert 930000 in kept_ids and 930001 not in kept_ids
    assert man["exact_dups_within_delta"] == 1
    assert man["exact_dups_vs_corpus"] >= 8
    assert man["near_dups_vs_corpus"] >= 8
    # manifest arithmetic is self-consistent
    assert man["kept"] == (man["delta_rows"] - man["exact_dups_within_delta"]
                           - man["exact_dups_vs_corpus"]
                           - man["near_dups_vs_corpus"])


def test_corpus_side_reads_bucket_layout_no_exchange(spark, setup):
    _, delta_path, _, index, _ = setup
    delta = spark.read.parquet(delta_path)
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # exact anti-join: only the delta side shuffles
        anti = delta.select(F.md5("text").alias("text_hash")).join(
            index["exact"], "text_hash", "left_anti")
        plan = anti._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, plan

        # band probe join: only the delta side shuffles
        from hypertrace_ingester_spark.operators import dedup as dd
        sigs = dd.minhash_signature(delta)
        bands = sigs.select(
            "doc_id", F.explode(dd.band_hash_array()).alias("band_hash"))
        probe = bands.join(index["bands"], "band_hash")
        plan2 = probe._jdf.queryExecution().executedPlan().toString()
        # the signature aggregate itself shuffles once (groupBy doc_id);
        # the probe join must add only the delta-side Exchange on band_hash
        assert plan2.count("Exchange") == 2, plan2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)


def test_append_then_rededup_is_idempotent(spark, setup):
    _, delta_path, idx_path, index, _ = setup
    delta = spark.read.parquet(delta_path)
    kept, man = inc.incremental_dedup(delta, index, threshold=0.5)
    kept = kept.localCheckpoint()  # pin before the index underneath changes
    n_kept = kept.count()
    inc.build_index(kept, idx_path, prefix="t_inc", mode="append")
    index2 = inc.load_index(spark, idx_path, prefix="t_inc")
    # re-presenting the same delta: every doc is now either a dup of the
    # original corpus or an exact dup of its own appended survivor
    kept2, man2 = inc.incremental_dedup(delta, index2, threshold=0.5)
    assert man2["kept"] == 0
    assert man2["exact_dups_vs_corpus"] == (man["exact_dups_vs_corpus"]
                                            + n_kept)


def test_index_meta_roundtrip_and_append_guard(spark, tmp_path):
    """The hash geometry is a property of the INDEX: a non-default build's
    parameters persist in _index_meta.json, load_index/incremental_dedup
    inherit them (no caller repetition), and an append under different
    parameters refuses instead of silently mixing signature spaces."""
    rows = [(i, " ".join(f"m{i}w{j}" for j in range(40))) for i in range(6)]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "meta_idx")
    meta = inc.build_index(corpus, path, prefix="t_meta",
                           num_perm=32, bands=8, n_buckets=4)
    assert (meta["num_perm"], meta["bands"], meta["n_buckets"]) == (32, 8, 4)
    try:
        # caller passes NOTHING — geometry comes from the persisted meta
        # (n_buckets=4 differs from the module default 32: the declared
        # layout must match the written files or joins would misplan)
        index = inc.load_index(spark, path, prefix="t_meta")
        assert index["_meta"]["num_perm"] == 32
        delta = spark.createDataFrame(
            [(100, rows[0][1]),                          # exact dup
             (101, rows[1][1].replace("m1w39", "zz")),   # near dup
             (102, " ".join(f"q{j}x" for j in range(40)))],  # fresh
            "doc_id long, text string")
        kept, man = inc.incremental_dedup(delta, index, threshold=0.5)
        assert man["exact_dups_vs_corpus"] == 1
        assert man["near_dups_vs_corpus"] == 1
        assert {r["doc_id"] for r in kept.select("doc_id").collect()} == {102}

        with pytest.raises(ValueError, match="num_perm=32"):
            inc.build_index(corpus, path, prefix="t_meta", mode="append")
    finally:
        for t in ("t_meta_exact", "t_meta_bands", "t_meta_sigs"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
