"""Token-level exact-substring dedup (Lee et al. 2021, gram granularity) —
full DuckDB oracle.

The input corpus is generated from closed-form laws of (doc_id, position)
that BOTH engines restate independently (the x_multimodal_features pattern):
DuckDB rebuilds the expected deduped token arrays from the laws via
generate_series + window first-occurrence logic, while Spark must really run
the gram-hash stream → duplicate-mark join → numpy span-cut plan to match.

Planted structure:
- every doc_id % 3 == 0 shares an identical 24-token run at positions 5..28
  (cross-doc duplicates, partial where n_tok cuts the run short);
- every doc_id % 5 == 4 has period-30 token laws (within-doc duplicates);
- all other token values follow a quadratic-in-position law mod a prime, so
  no two distinct (doc, pos) windows of length ≥ 2 collide by accident
  (equal tokens at 2 consecutive positions would force the shifted quadratic
  to match linearly, which pins shift = 0 and doc delta = 0 mod 50021).
"""

import duckdb
import pytest

from pyspark.sql import functions as F

from hypertrace_ingester_spark.oracle import compare
from hypertrace_ingester_spark.operators import dedup

N_DOCS = 150
L = 16


def _seqs(spark):
    d = F.col("doc_id")

    def tok(i):
        ie = F.when(d % 5 == 4, i % 30).otherwise(i)
        return (
            F.when((d % 3 == 0) & (ie >= 5) & (ie <= 28), ie + 995)
            .otherwise((d * 31 + ie * 17 + 5 * ie * ie) % 50021)
            .cast("int")
        )

    n_tok = (F.lit(8) + (d * 7) % 60).cast("int")
    return spark.range(N_DOCS).select(F.col("id").alias("doc_id")).select(
        "doc_id",
        F.transform(F.sequence(F.lit(0), n_tok - 1), tok).alias("tokens"),
        n_tok.alias("n_tok"),
    )


_ORACLE = f"""
WITH docs AS (
  SELECT i AS doc_id, 8 + (i*7) % 60 AS n_tok FROM generate_series(0, {N_DOCS - 1}) s(i)
),
toks AS (
  SELECT d.doc_id, p.i AS i,
         CASE WHEN d.doc_id % 3 = 0 AND e.ie BETWEEN 5 AND 28 THEN e.ie + 995
              ELSE (d.doc_id*31 + e.ie*17 + 5*e.ie*e.ie) % 50021 END AS tok
  FROM docs d,
       generate_series(0, 66) p(i),
       LATERAL (SELECT CASE WHEN d.doc_id % 5 = 4 THEN p.i % 30 ELSE p.i END AS ie) e
  WHERE p.i < d.n_tok
),
grams AS (
  SELECT t.doc_id, g.p AS pos,
         array_to_string(list(t.tok ORDER BY t.i), ' ') AS gram
  FROM docs d
  JOIN toks t USING (doc_id),
       generate_series(0, 66) g(p)
  WHERE g.p <= d.n_tok - {L}
    AND d.n_tok >= {L} AND t.i BETWEEN g.p AND g.p + {L} - 1
  GROUP BY t.doc_id, g.p
),
marked AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos,
           row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn,
           count(*) OVER (PARTITION BY gram) AS c
    FROM grams) WHERE c > 1 AND rn > 1
),
kept AS (
  SELECT t.doc_id, t.i, t.tok FROM toks t
  WHERE NOT EXISTS (SELECT 1 FROM marked m
                    WHERE m.doc_id = t.doc_id
                      AND t.i >= m.pos AND t.i < m.pos + {L})
),
rebuilt AS (
  SELECT doc_id, array_to_string(list(tok ORDER BY i), ' ') AS tokens_str,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(r.tokens_str, '') AS tokens_str,
       CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_tok,
       CAST(d.n_tok - coalesce(r.n_kept, 0) AS BIGINT) AS n_tok_dropped
FROM docs d LEFT JOIN rebuilt r USING (doc_id)
"""


@pytest.fixture(scope="module")
def deduped(spark):
    return (
        dedup.substring_dedup(_seqs(spark), length=L)
        .select(
            "doc_id",
            F.array_join(
                F.transform("tokens", lambda t: t.cast("string")), " "
            ).alias("tokens_str"),
            F.col("n_tok").cast("long").alias("n_tok"),
            F.col("n_tok_dropped").cast("long").alias("n_tok_dropped"),
        )
        .toPandas()
    )


def test_substring_dedup_matches_duckdb_oracle(deduped):
    want = duckdb.sql(_ORACLE).fetchdf()
    problems = compare(deduped, want)
    assert not problems, problems


def test_substring_dedup_invariants(deduped):
    # dedup actually fired (planted cross-doc + within-doc runs exist)
    assert deduped["n_tok_dropped"].sum() > 0
    # no doc gained tokens; drops are consistent with the rebuilt arrays
    n_orig = (8 + deduped["doc_id"] * 7 % 60).astype("int64")
    assert (deduped["n_tok"] + deduped["n_tok_dropped"] == n_orig).all()
    # the full 24-token planted run survives in EXACTLY one doc corpus-wide
    run = " ".join(str(995 + j) for j in range(5, 29))
    survivors = deduped[deduped["tokens_str"].str.contains(run, regex=False)]
    assert len(survivors) == 1, survivors[["doc_id"]].to_dict("records")


def test_short_docs_pass_through(spark):
    short = _seqs(spark).where(F.size("tokens") < L)
    out = dedup.substring_dedup(short, length=L).toPandas()
    assert (out["n_tok_dropped"] == 0).all()
    assert (out["n_tok"] == 8 + out["doc_id"] * 7 % 60).all()


def test_rolling_hash_window_law():
    """Pure-numpy law test of the O(n) Rabin-Karp stream: every window
    hash equals the direct basis evaluation Σ m[i+j]·B^j, and equal
    windows hash equal at ANY position (the property the gram grouping
    relies on). No JVM needed."""
    import numpy as np

    rng = np.random.default_rng(7)
    toks = rng.integers(0, 50021, size=300).astype(np.int64)
    # plant a repeated 60-token run at two positions
    toks[200:260] = toks[40:100]
    L = 50
    h = dedup._rk_hashes(toks, L)
    assert h.size == 300 - L + 1
    base = np.uint64(dedup._RK_BASE | 1)
    with np.errstate(over="ignore"):
        m = (toks.astype(np.uint64) + np.uint64(dedup._RK_BASE)) * np.uint64(
            dedup._RK_MIX
        )
        m ^= m >> np.uint64(31)
        pows = np.ones(L, dtype=np.uint64)
        np.cumprod(np.full(L - 1, base, dtype=np.uint64), out=pows[1:])
        for i in (0, 1, 40, 137, 200, 300 - L):
            direct = np.uint64(0)
            direct = (m[i : i + L] * pows).sum(dtype=np.uint64)
            assert h[i] == direct.view(np.int64).item(), i
    # the planted repeat: windows fully inside [40,100) == [200,260)
    for off in range(60 - L + 1):
        assert h[40 + off] == h[200 + off]
    # and a non-repeat window collides with nothing else in this stream
    assert (h == h[0]).sum() == 1
    # short-doc edge
    assert dedup._rk_hashes(toks[: L - 1], L).size == 0


def test_rolling_stream_agrees_with_slice_stream(spark):
    """The Rabin-Karp gram stream yields the IDENTICAL final dedup output
    as the xxhash64 slice stream on the oracle corpus (hash-agnostic
    downstream, zero collisions at this scale by the quadratic law)."""
    a = (
        dedup.substring_dedup(_seqs(spark), length=L)
        .select("doc_id", "tokens", "n_tok_dropped")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        dedup.substring_dedup(_seqs(spark), length=L, rolling=True)
        .select("doc_id", "tokens", "n_tok_dropped")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert a["n_tok_dropped"].tolist() == b["n_tok_dropped"].tolist()
    for x, y in zip(a["tokens"], b["tokens"]):
        assert list(x) == list(y)


def test_rolling_hash_property():
    """Property form of the window law: for random token arrays and gram
    lengths, (a) every window hash equals the direct basis evaluation,
    (b) planting window j's tokens at window i makes the hashes equal,
    (c) perturbing ONE token inside a window changes its hash."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=150, deadline=None)
    @given(
        st.integers(0, 2**63 - 1).flatmap(
            lambda seed: st.tuples(
                st.just(seed),
                st.integers(5, 30),          # L
                st.integers(61, 240),        # n  (>= 2L+1: disjoint plant)
            )
        )
    )
    def inner(args):
        seed, L, n = args
        rng = np.random.default_rng(seed)
        toks = rng.integers(0, 2**31 - 1, size=n).astype(np.int64)
        # disjoint windows: overlapping ones mutate the source mid-copy
        i = int(rng.integers(0, n - 2 * L + 1))
        j = int(rng.integers(i + L, n - L + 1))
        toks[i : i + L] = toks[j : j + L]  # plant equal windows
        h = dedup._rk_hashes(toks, L)
        assert h.size == n - L + 1
        # (a) direct evaluation at i
        base = np.uint64(dedup._RK_BASE | 1)
        with np.errstate(over="ignore"):
            m = (toks.astype(np.uint64) + np.uint64(dedup._RK_BASE)) * np.uint64(
                dedup._RK_MIX
            )
            m ^= m >> np.uint64(31)
            pows = np.ones(L, dtype=np.uint64)
            np.cumprod(np.full(L - 1, base, dtype=np.uint64), out=pows[1:])
            direct = (m[i : i + L] * pows).sum(dtype=np.uint64)
        assert h[i] == direct.view(np.int64).item()
        # (b) planted equality
        assert h[i] == h[j]
        # (c) sensitivity: flip one token inside window i
        toks2 = toks.copy()
        toks2[i + L // 2] ^= 1
        assert dedup._rk_hashes(toks2, L)[i] != h[i]

    inner()
