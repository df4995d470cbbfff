"""Learned quality classifier (GPT-3 Appendix-A recipe): weak-label
training separates constructed good/junk corpora, scoring stays JVM-side,
the model round-trips through save/load bit-identically, and the Pareto
retention rule matches its closed-form per-doc law."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from hypertrace_ingester_spark.operators import quality_model as qm
from hypertrace_ingester_spark.operators import text as tx
from hypertrace_ingester_spark.operators.sampling import BUCKETS

GOOD_WORDS = (
    "the quick brown fox jumps over a lazy dog and then walks to the "
    "river where it drinks some clear water before resting in the shade"
).split()
JUNK_TOKENS = ["%%$#@!", "xx", "@@@", "###", "zz!!", "$$", "qq%"]


def _corpus(spark, n_good=60, n_junk=60):
    rows = []
    for i in range(n_good):
        # 24-word circular window of a 26-word vocab: distinct positions, so
        # dup_word/dup_2gram stay under the Gopher thresholds (weak label 1)
        words = [GOOD_WORDS[(i * 3 + j) % len(GOOD_WORDS)] for j in range(24)]
        rows.append(Row(doc_id=i, text=" ".join(words)))
    for i in range(n_junk):
        toks = [JUNK_TOKENS[(i + j) % len(JUNK_TOKENS)] for j in range(12)]
        rows.append(Row(doc_id=n_good + i, text=" ".join(toks * 3)))
    return spark.createDataFrame(rows)


@pytest.fixture(scope="module")
def fitted(spark):
    docs = _corpus(spark)
    labeled = qm.weak_labels(tx.text_profile(docs))
    # the weak labels must actually separate the construction, else the
    # classifier test would be vacuous
    agg = labeled.groupBy("label").count().collect()
    by_label = {r["label"]: r["count"] for r in agg}
    assert by_label.get(1.0, 0) >= 50 and by_label.get(0.0, 0) >= 50
    model = qm.train_quality_model(labeled, n_features=1 << 12)
    return docs, model


def test_classifier_separates_good_from_junk(spark, fitted):
    docs, model = fitted
    # score UNSEEN docs (shifted word windows / different junk mix)
    held = _corpus(spark, n_good=20, n_junk=20).withColumn(
        "doc_id", F.col("doc_id") + 10_000
    )
    scored = qm.score_quality(held, model).collect()
    good = [r["quality_prob"] for r in scored if r["doc_id"] < 10_020]
    junk = [r["quality_prob"] for r in scored if r["doc_id"] >= 10_020]
    assert min(good) > 0.8, f"good docs scored low: {sorted(good)[:3]}"
    assert max(junk) < 0.2, f"junk docs scored high: {sorted(junk)[-3:]}"
    # scoring drops every internal column
    out_cols = set(scored[0].asDict())
    assert out_cols == {"doc_id", "text", "quality_prob"}


def test_scoring_plan_is_jvm_only(spark, fitted):
    docs, model = fitted
    scored = qm.score_quality(docs, model)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_model_save_load_identical_scores(spark, fitted, tmp_path):
    from pyspark.ml import PipelineModel

    docs, model = fitted
    path = str(tmp_path / "qmodel")
    model.write().overwrite().save(path)
    reloaded = PipelineModel.load(path)
    a = {r["doc_id"]: r["quality_prob"]
         for r in qm.score_quality(docs, model).collect()}
    b = {r["doc_id"]: r["quality_prob"]
         for r in qm.score_quality(docs, reloaded).collect()}
    assert a == b


def test_pareto_keep_matches_closed_form(spark):
    # synthetic scores: the keep decision must equal the Lomax inverse-CDF
    # law computed row-by-row in python
    rows = [Row(doc_id=i, quality_prob=(i % 21) / 20.0) for i in range(400)]
    df = spark.createDataFrame(rows)
    out = qm.pareto_keep(df, alpha=9.0, seed=4).collect()
    import hashlib

    def expect(doc_id, score):
        h = int(hashlib.md5(f"{doc_id}:4".encode()).hexdigest()[:8], 16) % BUCKETS
        u = h / float(BUCKETS)
        lomax = (1.0 - u) ** (-1.0 / 9.0) - 1.0
        return lomax > (1.0 - score)

    mismatch = [r for r in out
                if r["pareto_keep"] != expect(r["doc_id"], r["quality_prob"])]
    assert not mismatch, mismatch[:3]
    # the rule is useful: high scorers survive far more often than low
    hi = [r for r in out if r["quality_prob"] >= 0.9]
    lo = [r for r in out if r["quality_prob"] <= 0.1]
    hi_rate = sum(r["pareto_keep"] for r in hi) / len(hi)
    lo_rate = sum(r["pareto_keep"] for r in lo) / len(lo)
    assert hi_rate > 0.4 and lo_rate < 0.1
    # sanity: the Lomax tail gives survival (2-s)^-9 — s=0.95 ~ 0.645
    assert math.isclose((2 - 0.95) ** -9.0, 0.645, abs_tol=0.01)


def test_unigram_only_variant_trains(spark):
    docs = _corpus(spark, n_good=30, n_junk=30)
    labeled = qm.weak_labels(tx.text_profile(docs))
    model = qm.train_quality_model(labeled, n_features=1 << 10,
                                   use_bigrams=False)
    scored = qm.score_quality(docs, model)
    assert scored.where(F.col("quality_prob").isNull()).count() == 0
