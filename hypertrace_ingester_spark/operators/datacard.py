"""Corpus datacard — the audit/statistics report a corpus release ships
with (per-source/lang doc+token accounting, length distribution, exact-dup
rate; "Datasheets for Datasets", Gebru et al. 2021, and every public
corpus paper's Table 1).

Shape: ONE projection builds the narrow per-doc stats frame (token/char
counts + content hash — the text payload is dropped immediately), then
everything aggregates at group grain. The only row-sized shuffle is the
group-by; with ``exact_quantiles=True`` a per-group window sort is added
(bit-exact oracle parity, the small-SF default), while ``False`` uses the
mergeable ``percentile_approx`` sketch — the 100 TB path, one partial-agg
shuffle and no sort.

Reference parity: the span pipeline's operational counters + distribution
summaries (operators/aggregate.py A5/A6, TraceEmitPunctuator stats) at
corpus grain — driver-mandate training-data territory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _doc_stats(docs: DataFrame, text_col: str, group_cols: list[str]) -> DataFrame:
    return docs.select(
        *group_cols,
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        F.md5(F.col(text_col)).alias("_th"),
    )


def corpus_datacard(
    docs: DataFrame,
    text_col: str = "text",
    group_cols: tuple[str, ...] = ("source", "lang"),
    exact_quantiles: bool = True,
    exact_distinct: bool = True,
) -> DataFrame:
    """Per-group corpus accounting: ``n_docs, n_tokens, n_chars,
    mean_doc_tokens, p50/p90/p99 doc tokens, distinct_docs,
    exact_dup_rate, pct_docs, pct_tokens``.

    The share columns come from an unpartitioned window over the GROUPED
    result — group-cardinality rows, never the corpus.

    ``exact_distinct=False`` swaps the exact distinct (an expand +
    second shuffle) for the mergeable HLL++ sketch
    (``approx_count_distinct``, rsd 1%) — with ``exact_quantiles=False``
    the whole card is then ONE partial-agg shuffle, the 100 TB shape."""
    gcols = [c for c in group_cols if c in docs.columns]
    stats = _doc_stats(docs, text_col, gcols)
    if exact_quantiles:
        w = Window.partitionBy(*gcols).orderBy("n_tokens")
        ranked = stats.withColumn("rk", F.row_number().over(w)).withColumn(
            "n", F.count(F.lit(1)).over(Window.partitionBy(*gcols))
        )

        def at(p):
            return F.max(
                F.when(
                    F.col("rk") == F.ceil(F.lit(p) * F.col("n")).cast("long"),
                    F.col("n_tokens"),
                )
            )

        quants = [at(0.5).alias("p50_tokens"), at(0.9).alias("p90_tokens"),
                  at(0.99).alias("p99_tokens")]
        base = ranked
    else:
        quants = [
            F.percentile_approx("n_tokens", p, 10_000).alias(name)
            for p, name in ((0.5, "p50_tokens"), (0.9, "p90_tokens"),
                            (0.99, "p99_tokens"))
        ]
        base = stats
    grouped = base.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum("n_chars").alias("n_chars"),
        (F.count_distinct(F.col("_th")) if exact_distinct
         else F.approx_count_distinct("_th", 0.01)).alias("distinct_docs"),
        *quants,
    )
    # corpus totals via an unpartitioned window over `grouped`: this DOES
    # funnel through one task (Spark warns), but `grouped` is the bounded
    # (source x lang)-grain frame — dozens of rows — so the single-task
    # window moves group-grain rows only. The seemingly-cleaner 1-row
    # totals crossJoin is WORSE here: `totals` would be a second branch
    # over the same aggregate lineage, re-running the corpus-wide shuffle
    # twice (verified round 5 — it broke the one-corpus-Exchange plan
    # assertion in test_datacard).
    wall = Window.partitionBy()
    return grouped.select(
        *gcols,
        "n_docs", "n_tokens", "n_chars", "distinct_docs",
        "p50_tokens", "p90_tokens", "p99_tokens",
        (1.0 - F.col("distinct_docs") / F.col("n_docs")).alias("exact_dup_rate"),
        (F.col("n_docs") / F.sum("n_docs").over(wall)).alias("pct_docs"),
        (F.col("n_tokens") / F.sum("n_tokens").over(wall)).alias("pct_tokens"),
    )


def length_histogram(
    docs: DataFrame,
    text_col: str = "text",
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Power-of-two doc-length histogram (the standard corpus-card length
    plot): bucket ``b`` holds docs with ``2^b <= n_tokens < 2^(b+1)``
    (empty docs in bucket -1). One map projection + one group-grain
    aggregate with map-side combine."""
    gcols = [c for c in group_cols if c in docs.columns]
    n = F.size(F.split(F.col(text_col), " ")).cast("long")
    bucket = F.when(n <= 0, F.lit(-1)).otherwise(
        F.floor(F.log2(n.cast("double"))).cast("int")
    )
    return (
        docs.select(*gcols, n.alias("n_tokens"), bucket.alias("bucket"))
        .groupBy(*gcols, "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )
