"""Embedding-level benchmark decontamination — full DuckDB oracle.

Corpus = the shared embeddings table. Eval set = for every vec_id % 13 == 0
corpus row, an EXACT copy (eval_id = vec_id*10+1) and a ×2-scaled copy
(eval_id = vec_id*10+2, same direction ⇒ same cosine) plus one unrelated
noise vector that should catch nobody. DuckDB restates the cross join,
the list_dot_product cosine (bit-identical to the Spark fold), the hit
aggregate, and the (cos desc, eval_id asc) nearest-eval tie-break."""

import os

import numpy as np
import pandas as pd
import pytest

from hypertrace_ingester_spark.operators import similarity as sim
from hypertrace_ingester_spark.oracle import compare

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata dir {SF_DIR} missing"
)

THRESH = 0.95

_ORACLE_SQL = f"""
WITH c AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM corpus
),
ev AS (
  SELECT eval_id, CAST(embedding AS DOUBLE[]) AS ee FROM evalset
),
pairs AS (
  SELECT c.vec_id, ev.eval_id,
         list_dot_product(c.e, ev.ee)
           / (sqrt(list_dot_product(c.e, c.e))
              * sqrt(list_dot_product(ev.ee, ev.ee))) AS cos
  FROM c CROSS JOIN ev
),
hits AS (SELECT * FROM pairs WHERE cos >= {THRESH}),
agg AS (
  SELECT vec_id, max(cos) AS max_eval_cos,
         CAST(count(*) AS BIGINT) AS n_eval_hits
  FROM hits GROUP BY vec_id
),
near AS (
  SELECT vec_id, eval_id AS nearest_eval_id FROM (
    SELECT vec_id, eval_id,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY cos DESC, eval_id ASC) AS rn
    FROM hits) WHERE rn = 1
)
SELECT c.vec_id, c.label, agg.max_eval_cos,
       CAST(coalesce(agg.n_eval_hits, 0) AS BIGINT) AS n_eval_hits,
       near.nearest_eval_id,
       coalesce(agg.n_eval_hits, 0) > 0 AS contaminated
FROM c LEFT JOIN agg USING (vec_id) LEFT JOIN near USING (vec_id)
"""


def _eval_fixture(tmp_path) -> tuple[str, set]:
    src = pd.read_parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    planted = src[src["vec_id"] % 13 == 0]
    rows = []
    for vid, emb in zip(planted["vec_id"], planted["embedding"]):
        emb = np.asarray(emb, dtype=np.float32)
        rows.append({"eval_id": int(vid) * 10 + 1, "embedding": emb})
        rows.append({"eval_id": int(vid) * 10 + 2, "embedding": emb * 2.0})
    rng = np.random.RandomState(7)
    dim = len(rows[0]["embedding"])
    rows.append({
        "eval_id": 999_999,
        "embedding": rng.randn(dim).astype(np.float32),
    })
    path = str(tmp_path / "evalset.parquet")
    pd.DataFrame(rows).to_parquet(path, index=False)
    return path, set(int(v) for v in planted["vec_id"])


def test_semantic_decontaminate_matches_duckdb_oracle(spark, tmp_path):
    import duckdb

    eval_path, planted_ids = _eval_fixture(tmp_path)
    corpus = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    evalset = spark.read.parquet(eval_path).withColumnRenamed(
        "eval_id", "vec_id")

    got = (
        sim.semantic_decontaminate(corpus, evalset, threshold=THRESH)
        .select("vec_id", "label", "max_eval_cos", "n_eval_hits",
                "nearest_eval_id", "contaminated")
        .toPandas()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW corpus AS SELECT * FROM "
        f"read_parquet('{os.path.join(SF_DIR, 'embeddings.parquet')}')")
    con.execute(
        f"CREATE VIEW evalset AS SELECT * FROM read_parquet('{eval_path}')")
    want = con.execute(_ORACLE_SQL).fetchdf()
    problems = compare(got, want)
    assert not problems, problems

    # every planted source row is caught by BOTH its copies, nearest is
    # the min-eval_id (the exact copy), and nothing else is flagged
    flagged = got[got["contaminated"]]
    assert set(flagged["vec_id"]) == planted_ids
    by_id = flagged.set_index("vec_id")
    for vid in planted_ids:
        assert by_id.loc[vid, "n_eval_hits"] == 2
        assert by_id.loc[vid, "nearest_eval_id"] == vid * 10 + 1
        assert by_id.loc[vid, "max_eval_cos"] >= 0.999999


def test_semantic_decontaminate_no_hits_path(spark, tmp_path):
    eval_path, _ = _eval_fixture(tmp_path)
    corpus = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    evalset = spark.read.parquet(eval_path).withColumnRenamed(
        "eval_id", "vec_id")
    # cosine cannot exceed 1: an impossible threshold exercises the
    # all-null left-join path without a special empty-eval branch
    out = sim.semantic_decontaminate(
        corpus, evalset, threshold=1.000001).toPandas()
    assert len(out) == corpus.count()
    assert not out["contaminated"].any()
    assert (out["n_eval_hits"] == 0).all()
    assert out["max_eval_cos"].isna().all()


def test_semantic_decontaminate_zero_norm_vectors_match_nothing(spark):
    import numpy as np

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>")
    evalset = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.0, 0.0])],
        "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in
           sim.semantic_decontaminate(corpus, evalset, 0.95).collect()}
    # the zero corpus vector is NOT flagged against everything (NaN guard)
    assert not out[2]["contaminated"]
    # the zero eval vector flags nobody; the exact copy still hits
    assert out[1]["contaminated"] and out[1]["nearest_eval_id"] == 10
    assert not out[3]["contaminated"]


def test_curation_semantic_decontamination_stage(spark):
    from hypertrace_ingester_spark.plans import curation as cur

    # 30 docs with orthogonal-ish embeddings; eval set contains doc 7's
    # exact vector — the 13-gram pass can't catch it (texts differ), the
    # semantic stage must
    rows = [
        (i, " ".join(f"w{i}x{j}" for j in range(15)),
         [1.0 if d == i % 8 else 0.1 * ((i * d) % 3) for d in range(8)])
        for i in range(30)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, embedding array<double>")
    evalv = spark.createDataFrame(
        [(500, rows[7][2])], "vec_id long, embedding array<double>")
    cfg = cur.CurationConfig(
        semantic_threshold=0.999,
        gopher_filter=False, quality_filter=False, redact_pii=False,
        near_dup=False,
    )
    curated, manifest = cur.run_curation(
        spark, docs, config=cfg, eval_vectors=evalv)
    assert "semantic_decontaminated" in manifest["stages"]
    ids = {r["doc_id"] for r in curated.select("doc_id").collect()}
    assert 7 not in ids
    # only vectors truly at cosine ~1 with the eval vector drop; doc 7's
    # exact twin under the construction is any i with identical embedding
    twins = {i for i, _, e in rows if e == rows[7][2]}
    assert ids == set(range(30)) - twins


def test_semantic_decontaminate_rejects_non_numeric_eval_ids(spark):
    """cast('long') on a string eval id silently yields NULL (review
    find) — the operator must raise instead of emitting garbage
    nearest_eval_id values."""
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>")
    evals = spark.createDataFrame(
        [("eval-a", [1.0, 0.0])], "vec_id string, embedding array<double>")
    with pytest.raises(TypeError, match="must be numeric"):
        sim.semantic_decontaminate(corpus, evals)
