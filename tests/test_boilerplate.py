"""Boilerplate heavy-hitters (frequent_lines) + removal (boilerplate_filter)
— full DuckDB oracles.

Fixture: a deterministic multi-line corpus derived from the shared
documents table (5-word lines), with three planted template lines:

- NAV appended to EVERY doc, in one of three whitespace/case variants
  chosen by doc_id % 3 — all variants share one normalized line_key, so
  discovery must fold them;
- COOKIE appended to every doc with doc_id % 2 == 0;
- RARE appended only to doc_id % 97 == 0 (stays under realistic min_docs).

DuckDB restates the normalization (lower/trim/regexp_replace with the 'g'
flag), both aggregation levels, the (n_docs desc, n_occurrences desc,
line_key asc) top-k order, and the anti-filter + per-doc reassembly."""

import os

import pandas as pd
import pytest

from hypertrace_ingester_spark.operators import dedup
from hypertrace_ingester_spark.oracle import compare

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata dir {SF_DIR} missing"
)

NAV_VARIANTS = [
    "Home | About | Contact",
    "home   |  about | contact",
    "  HOME | ABOUT | CONTACT  ",
]
COOKIE = "This site uses cookies to improve your experience"
RARE = "Powered by ObscureCMS v0.1"

_KEY = "lower(trim(regexp_replace(line, '\\s+', ' ', 'g')))"

_FREQ_SQL = f"""
WITH lines AS (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM docs_ml
),
keyed AS (
  SELECT doc_id, {_KEY} AS line_key, line FROM lines
  WHERE length({_KEY}) > 0
),
per_doc AS (
  SELECT line_key, doc_id, count(*) AS n, min(line) AS ex
  FROM keyed GROUP BY line_key, doc_id
)
SELECT line_key, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n) AS BIGINT) AS n_occurrences, min(ex) AS example
FROM per_doc GROUP BY line_key HAVING count(*) >= {{min_docs}}
"""

_FILTER_SQL = f"""
WITH bp AS (
  SELECT line_key FROM ({_FREQ_SQL.format(min_docs="{min_docs}")})
  ORDER BY n_docs DESC, n_occurrences DESC, line_key ASC LIMIT {{top_k}}
),
lines AS (
  SELECT doc_id,
         CAST(generate_subscripts(parts, 1) - 1 AS BIGINT) AS line_idx,
         unnest(parts) AS line
  FROM (SELECT doc_id, string_split(text, chr(10)) AS parts FROM docs_ml)
),
kept AS (
  SELECT * FROM lines
  WHERE {_KEY} NOT IN (SELECT line_key FROM bp)
)
SELECT k.doc_id, string_agg(k.line, chr(10) ORDER BY k.line_idx) AS text,
       CAST(count(*) AS BIGINT) AS n_lines_kept,
       CAST(any_value(t._n) - count(*) AS BIGINT) AS n_lines_dropped
FROM kept k
JOIN (SELECT doc_id, count(*) AS _n FROM lines GROUP BY doc_id) t USING (doc_id)
GROUP BY k.doc_id
"""


def _fixture(tmp_path) -> str:
    src = pd.read_parquet(os.path.join(SF_DIR, "documents.parquet"),
                          columns=["doc_id", "text"])
    rows = []
    for doc_id, text in zip(src["doc_id"], src["text"]):
        words = text.split(" ")
        doc_lines = [" ".join(words[i:i + 5]) for i in range(0, len(words), 5)]
        doc_lines.append(NAV_VARIANTS[doc_id % 3])
        if doc_id % 2 == 0:
            doc_lines.append(COOKIE)
        if doc_id % 97 == 0:
            doc_lines.append(RARE)
        rows.append({"doc_id": int(doc_id), "text": "\n".join(doc_lines)})
    path = str(tmp_path / "docs_boiler.parquet")
    pd.DataFrame(rows).to_parquet(path, index=False)
    return path


def _duck(path):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW docs_ml AS SELECT * FROM read_parquet('{path}')")
    return con


def test_frequent_lines_matches_duckdb_oracle(spark, tmp_path):
    path = _fixture(tmp_path)
    ids = pd.read_parquet(path, columns=["doc_id"])["doc_id"]
    n_cookie = int((ids % 2 == 0).sum())
    docs = spark.read.parquet(path)
    n_docs_total = docs.count()

    got = dedup.frequent_lines(docs, min_docs=2).toPandas()
    want = _duck(path).execute(_FREQ_SQL.format(min_docs=2)).fetchdf()
    problems = compare(got, want)
    assert not problems, problems

    # the three nav variants fold into ONE key present in every doc
    by_key = got.set_index("line_key")
    nav = by_key.loc["home | about | contact"]
    assert nav["n_docs"] == n_docs_total
    # example is the lexicographically-min RAW variant (leading spaces win)
    assert nav["example"] == "  HOME | ABOUT | CONTACT  "
    assert by_key.loc[COOKIE.lower()]["n_docs"] == n_cookie
    assert RARE.lower() not in by_key.index or by_key.loc[RARE.lower()][
        "n_docs"] < 0.05 * n_docs_total


def test_frequent_lines_top_k_is_deterministic_total_order(spark, tmp_path):
    path = _fixture(tmp_path)
    docs = spark.read.parquet(path)
    a = dedup.frequent_lines(docs, min_docs=2, top_k=5).toPandas()
    b = dedup.frequent_lines(
        docs.repartition(13), min_docs=2, top_k=5).toPandas()
    assert list(a["line_key"]) == list(b["line_key"])
    assert len(a) == 5
    # the two planted corpus-wide templates must lead the ranking
    assert set(a["line_key"][:2]) == {
        "home | about | contact", COOKIE.lower()}


def test_boilerplate_filter_matches_duckdb_oracle(spark, tmp_path):
    path = _fixture(tmp_path)
    docs = spark.read.parquet(path)
    bp = dedup.frequent_lines(docs, min_docs=2, top_k=2)
    got = dedup.boilerplate_filter(docs, bp).toPandas()
    want = _duck(path).execute(
        _FILTER_SQL.format(min_docs=2, top_k=2)).fetchdf()
    problems = compare(got, want)
    assert not problems, problems
    # no surviving line normalizes to a removed template
    for t in got["text"]:
        for ln in t.split("\n"):
            key = " ".join(ln.split()).lower()
            assert key not in {"home | about | contact", COOKIE.lower()}
    # the rare line survives (below min_docs reach of top_k=2 list)
    assert any(RARE in t for t in got["text"])


def test_boilerplate_filter_edge_semantics(spark):
    pdf = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "lang": ["en", "en", "de"],
        "text": [
            "nav bar\n\nreal content here",   # blank line must survive
            "nav bar",                         # fully boilerplate -> vanishes
            "NAV   BAR\nother things",         # variant folds to same key
        ],
    })
    docs = spark.createDataFrame(pdf)
    bp = spark.createDataFrame(pd.DataFrame({"line_key": ["nav bar"]}))
    out = dedup.boilerplate_filter(docs, bp).orderBy("doc_id").collect()
    assert [r["doc_id"] for r in out] == [0, 2]
    assert out[0]["text"] == "\nreal content here"  # blank line kept
    assert out[0]["n_lines_kept"] == 2 and out[0]["n_lines_dropped"] == 1
    assert out[1]["text"] == "other things"
    # caller's extra columns ride through
    assert out[0]["lang"] == "en" and out[1]["lang"] == "de"


def test_frequent_lines_sampled_discovery_is_deterministic_slice(spark, tmp_path):
    path = _fixture(tmp_path)
    docs = spark.read.parquet(path)
    sampled = dedup.frequent_lines(
        docs, min_docs=2, sample_frac=0.5, seed=7).toPandas()
    # heavy hitters survive sampling: both corpus-wide templates found
    keys = set(sampled["line_key"])
    assert {"home | about | contact", COOKIE.lower()} <= keys
    # deterministic: same slice every run
    again = dedup.frequent_lines(
        docs, min_docs=2, sample_frac=0.5, seed=7).toPandas()
    assert sorted(keys) == sorted(set(again["line_key"]))
    # counts refer to the sample, so n_docs is ~half the full-corpus count
    full = dedup.frequent_lines(docs, min_docs=2).toPandas()
    full_nav = int(full.set_index("line_key").loc[
        "home | about | contact", "n_docs"])
    samp_nav = int(sampled.set_index("line_key").loc[
        "home | about | contact", "n_docs"])
    assert 0.3 * full_nav <= samp_nav <= 0.7 * full_nav


def test_curation_boilerplate_stage(spark, tmp_path):
    from hypertrace_ingester_spark.plans import curation as cur

    path = _fixture(tmp_path)
    docs = spark.read.parquet(path)
    cfg = cur.CurationConfig(
        boilerplate_min_doc_frac=0.3,   # catches NAV (100%) + COOKIE (50%)
        gopher_filter=False, quality_filter=False, redact_pii=False,
        near_dup=False,
    )
    curated, manifest = cur.run_curation(spark, docs, config=cfg)
    stages = manifest["stages"]
    assert "boilerplate" in stages
    assert stages["boilerplate"]["rows"] <= stages["input"]["rows"]
    assert stages["boilerplate"]["tokens"] < stages["input"]["tokens"]
    texts = [r["text"] for r in curated.select("text").collect()]
    assert texts
    for t in texts:
        for ln in t.split("\n"):
            assert " ".join(ln.split()).lower() not in {
                "home | about | contact", COOKIE.lower()}
    # the rare line (3 docs at sf0.001's ~250 docs < 30% threshold) survives
    assert any(RARE in t for t in texts)


def test_frequent_lines_approx_sketch_agrees_with_exact(spark, tmp_path):
    path = _fixture(tmp_path)
    docs = spark.read.parquet(path)
    approx = dedup.frequent_lines_approx(docs, k=10).toPandas()
    exact = dedup.frequent_lines(docs, min_docs=1).toPandas()
    # cardinality here is far under max_items_tracked, so the sketch's
    # counts are EXACT (frequent-items guarantee) — compare per key
    exact_by_key = exact.set_index("line_key")["n_occurrences"]
    assert len(approx) == 10
    for _, r in approx.iterrows():
        assert int(r["est_occurrences"]) == int(exact_by_key[r["line_key"]])
    # the two corpus-wide templates lead the occurrence ranking
    assert set(approx["line_key"][:2]) == {
        "home | about | contact", COOKIE.lower()}


def test_boilerplate_filter_empty_list_is_identity(spark, tmp_path):
    path = _fixture(tmp_path)
    docs = spark.read.parquet(path)
    empty = spark.createDataFrame([], "line_key string")
    out = dedup.boilerplate_filter(docs, empty).toPandas()
    src = pd.read_parquet(path)
    merged = out.merge(src, on="doc_id", suffixes=("_got", "_want"))
    assert len(merged) == len(src)
    assert (merged["text_got"] == merged["text_want"]).all()
    assert (out["n_lines_dropped"] == 0).all()
