"""Learned document-quality classifier — the public GPT-3 / LLaMA
CommonCrawl-filtering recipe, Spark-native.

Public provenance (no reference-repo analog; hypertrace-ingester has no ML
stage — this is training-data-pipeline mandate territory):

- Brown et al. 2020 (GPT-3), Appendix A: "we trained a classifier ...
  using logistic regression classifier with features from Spark's standard
  tokenizer and HashingTF" — i.e. the original recipe IS the pyspark.ml
  pipeline built here, trained positive-on-curated / negative-on-crawl.
- Touvron et al. 2023 (LLaMA §2.1): a fastText-style linear classifier on
  word n-grams filtering CommonCrawl.
- GPT-3's retention rule (same appendix): a document is kept iff
  ``np.random.pareto(alpha) > 1 - document_score`` with alpha = 9 — mostly
  keeps high-scoring docs but occasionally admits low scorers to preserve
  diversity. Reproduced here as a deterministic column expression via the
  Lomax inverse-CDF on an md5-derived uniform (sampling.md5_unit_hash), so
  reruns keep the identical document set.

Scale shape (100 TB): featurization (regex tokenize -> 2-gram -> hashed
bag-of-grams) is ONE JVM map stage, no Python workers; LogisticRegression
trains with L-BFGS over treeAggregate'd gradient partials (the standard
distributed-GLM plan); scoring is one more JVM map stage; the Pareto keep
is pure column math. Nothing here shuffles the corpus — the only iterative
traffic is the (n_features+1)-sized coefficient vector per L-BFGS step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import BUCKETS, md5_unit_hash

_FEATURES_COL = "_qm_features"
_INTERNAL_COLS = ("_qm_uni", "_qm_bi", "_qm_grams", _FEATURES_COL,
                  "rawPrediction", "probability", "prediction")


def _featurizer_stages(text_col: str, n_features: int, use_bigrams: bool):
    """ml Pipeline stages: text -> hashed bag of {1,2}-gram term counts.

    Word unigrams and bigrams share ONE HashingTF space (fastText's single
    hashed bucket table for all n-grams), concatenated by a SQLTransformer
    so the whole featurizer serializes inside the PipelineModel.
    """
    from pyspark.ml.feature import HashingTF, NGram, RegexTokenizer, SQLTransformer

    stages = [RegexTokenizer(inputCol=text_col, outputCol="_qm_uni",
                             pattern=r"\s+", toLowercase=True)]
    if use_bigrams:
        stages.append(NGram(n=2, inputCol="_qm_uni", outputCol="_qm_bi"))
        stages.append(SQLTransformer(
            statement="SELECT *, concat(_qm_uni, _qm_bi) AS _qm_grams FROM __THIS__"
        ))
        gram_col = "_qm_grams"
    else:
        gram_col = "_qm_uni"
    stages.append(HashingTF(inputCol=gram_col, outputCol=_FEATURES_COL,
                            numFeatures=n_features))
    return stages


def weak_labels(profiled: DataFrame, label_col: str = "label") -> DataFrame:
    """Weak supervision from the heuristic filters: a doc passing BOTH the
    Gopher repetition rules and the quality thresholds (text_profile's
    ``gopher_keep`` / ``quality_keep``) is a positive exemplar, anything
    else a negative — the distillation trick that turns hard rules into a
    smooth, generalizing scorer (the in-corpus analog of GPT-3's
    curated-vs-crawl split when no curated corpus is at hand)."""
    return profiled.withColumn(
        label_col,
        (F.col("gopher_keep") & F.col("quality_keep")).cast("double"),
    )


def train_quality_model(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    n_features: int = 1 << 18,
    use_bigrams: bool = True,
    reg_param: float = 1e-4,
    max_iter: int = 50,
):
    """Fit the tokenize->hash->logistic-regression pipeline; returns the
    fitted ``PipelineModel`` (save/load-able with ``model.write().save()``
    — a real run trains once and ships the model to the scoring job)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression

    lr = LogisticRegression(
        featuresCol=_FEATURES_COL, labelCol=label_col,
        regParam=reg_param, maxIter=max_iter, standardization=False,
    )
    stages = _featurizer_stages(text_col, n_features, use_bigrams) + [lr]
    return Pipeline(stages=stages).fit(labeled)


def score_quality(docs: DataFrame, model,
                  score_col: str = "quality_prob") -> DataFrame:
    """Add ``score_col`` = P(high quality) in [0, 1]; all intermediate
    feature/prediction columns are dropped. JVM-only plan (asserted in
    tests): the model's transform chain never leaves codegen for Python."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(docs).withColumn(
        score_col, F.get(vector_to_array("probability"), 1)
    )
    return scored.drop(*[c for c in _INTERNAL_COLS if c in scored.columns])


def pareto_keep(
    scored: DataFrame,
    alpha: float = 9.0,
    seed: int = 0,
    score_col: str = "quality_prob",
    id_col: str = "doc_id",
    keep_col: str = "pareto_keep",
) -> DataFrame:
    """GPT-3's retention rule: keep iff ``pareto(alpha) > 1 - score``.

    numpy's ``random.pareto(a)`` is Lomax(a): ``x = (1-u)**(-1/a) - 1`` for
    uniform u — restated as a deterministic column on the md5-derived
    uniform of (seed, doc id), so the kept set is reproducible and the
    oracle (or a rerun) selects the identical documents. A score-s doc
    survives with probability ``(2 - s)**(-alpha)`` — the Lomax tail —
    (alpha=9: s=1 always, s=0.95 ~64%, s=0.9 ~42%, s=0.2 ~0.5%) — low
    scorers are rarely but not never kept, preserving tail diversity
    exactly as the GPT-3 appendix describes."""
    u = md5_unit_hash(id_col, seed) / F.lit(float(BUCKETS))
    lomax = F.pow(F.lit(1.0) - u, F.lit(-1.0 / alpha)) - F.lit(1.0)
    return scored.withColumn(keep_col, lomax > (F.lit(1.0) - F.col(score_col)))
