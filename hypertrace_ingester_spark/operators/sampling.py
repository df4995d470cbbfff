"""Deterministic sampling / data-mixing operators for training-set
assembly over the ``documents`` table.

Two ops every LLM data pipeline runs before tokenization:

- :func:`hash_split` — stable train/val/test assignment by key hash. No
  randomness, no state: re-running on a grown corpus never reassigns an
  existing doc (the property rand()-based splits lack), and the split is
  reproducible across clusters, sessions and engines.
- :func:`mixture_sample` — per-source downsampling to hit target mixture
  proportions by TOKEN mass (not doc count), scaled to the largest total
  the corpus can supply without upsampling any source. The per-source
  keep-fractions are computed from a sources-sized aggregate (bounded by
  the source dim, collected to the driver like any dim table) and applied
  as one deterministic hash filter — a single scan, no shuffle.

Both use the same hash→unit-interval mapping: pmod(xxhash64(key, seed),
BUCKETS) / BUCKETS, so membership is auditable row-by-row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 1_000_000  # hash resolution: keep-fractions quantize to 1e-6


def _unit_hash(key: str, seed: int) -> Column:
    return F.pmod(F.xxhash64(F.col(key), F.lit(seed)), F.lit(BUCKETS))


def hash_split(df: DataFrame, weights: dict[str, float] | None = None,
               key: str = "doc_id", seed: int = 0,
               split_col: str = "split") -> DataFrame:
    """Assign each row to a named split by cumulative hash-bucket ranges.

    ``weights`` are normalized; assignment order is the dict order (make
    it deterministic — python dicts preserve insertion order). A doc's
    split depends only on (key, seed, weights), never on the rest of the
    corpus."""
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = float(sum(weights.values()))
    h = _unit_hash(key, seed)
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        bound = int(round(cum * BUCKETS))
        cond = h < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn(split_col, expr)


def mixture_keep_fractions(token_totals: dict[str, int],
                           target: dict[str, float]) -> dict[str, float]:
    """Per-source keep fractions hitting ``target`` proportions by token
    mass with NO upsampling: the achievable total is S = min(T_s / p_s),
    keep_s = p_s * S / T_s (the binding source keeps 1.0). Pure function
    so tests/oracles can restate it."""
    total_p = float(sum(target.values()))
    p = {s: w / total_p for s, w in target.items()}
    feasible = min(token_totals[s] / p[s] for s in p if p[s] > 0)
    return {
        s: (p[s] * feasible / token_totals[s]) if token_totals.get(s) else 0.0
        for s in p
    }


def mixture_sample(docs: DataFrame, target: dict[str, float],
                   source_col: str = "source", text_col: str = "text",
                   key: str = "doc_id", seed: int = 7) -> DataFrame:
    """Downsample per source so sampled token mass matches ``target``
    proportions (sources absent from ``target`` drop). One aggregate over
    the source dim (driver-collected, bounded by #sources) → broadcast
    keep-fraction filter via the deterministic unit hash — single scan."""
    with_tokens = docs.withColumn(
        "_mix_tokens", F.size(F.split(F.col(text_col), " ")))
    totals = {
        r[source_col]: r["t"]
        for r in with_tokens.groupBy(source_col)
        .agg(F.sum("_mix_tokens").alias("t")).collect()
        if r[source_col] in target
    }
    fracs = mixture_keep_fractions(totals, {s: w for s, w in target.items()
                                            if s in totals})
    frac_col = None
    for s, f in fracs.items():
        bound = F.lit(int(round(f * BUCKETS)))
        frac_col = (F.when(F.col(source_col) == s, bound)
                    if frac_col is None
                    else frac_col.when(F.col(source_col) == s, bound))
    if frac_col is None:
        return docs.limit(0)
    frac_col = frac_col.otherwise(F.lit(-1))  # sources outside target drop
    return (
        with_tokens.where(_unit_hash(key, seed) < frac_col)
        .drop("_mix_tokens")
    )
