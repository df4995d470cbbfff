"""Unicode script detection (text.script_profile) — full DuckDB oracle.

The script classes are literal character ranges, so both engines count
the identical class; the oracle restates every count, every rounded
fraction, and the name-order argmax. Fixture mixes scripts
deterministically: doc i gets i%7 Cyrillic, i%5 CJK, i%3 Greek tokens
appended to its Latin base text (plus pure-single-script and no-script
rows pinned by hand)."""

import os

import pandas as pd
import pytest

from hypertrace_ingester_spark.operators import text as tx
from hypertrace_ingester_spark.oracle import compare

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata dir {SF_DIR} missing"
)

CYR = "привет"
CJK = "你好世界"
GRK = "αβγδ"
ARB = "مرحبا"
DEV = "नमस्ते"


def _fixture(tmp_path) -> str:
    src = pd.read_parquet(os.path.join(SF_DIR, "documents.parquet"),
                          columns=["doc_id", "text"])
    rows = []
    for doc_id, text in zip(src["doc_id"], src["text"]):
        extra = ([CYR] * (doc_id % 7) + [CJK] * (doc_id % 5)
                 + [GRK] * (doc_id % 3))
        rows.append({"doc_id": int(doc_id),
                     "text": " ".join([text[:200]] + extra)})
    base = int(src["doc_id"].max()) + 1
    rows += [
        {"doc_id": base + 0, "text": f"{ARB} {ARB}"},
        {"doc_id": base + 1, "text": DEV},
        {"doc_id": base + 2, "text": "12345 !!! ..."},   # no script chars
        {"doc_id": base + 3, "text": f"{CYR} {CYR} {CYR} short latin"},
    ]
    path = str(tmp_path / "docs_scripts.parquet")
    pd.DataFrame(rows).to_parquet(path, index=False)
    return path


def _oracle_sql() -> str:
    cnt = {
        name: f"len(regexp_extract_all(text, '{cls}'))"
        for name, cls in tx.SCRIPT_CLASSES.items()
    }
    total = " + ".join(cnt.values())
    names = sorted(tx.SCRIPT_CLASSES)
    # name-order argmax: later names win only on strictly greater counts
    best = f"CASE WHEN {cnt[names[0]]} > 0 THEN {cnt[names[0]]} ELSE 0 END"
    pred = (f"CASE WHEN {cnt[names[0]]} > 0 THEN '{names[0]}' "
            f"ELSE 'unk' END")
    for n in names[1:]:
        pred = f"CASE WHEN {cnt[n]} > ({best}) THEN '{n}' ELSE ({pred}) END"
        best = f"CASE WHEN {cnt[n]} > ({best}) THEN {cnt[n]} ELSE ({best}) END"
    fracs = ",\n".join(
        f"CASE WHEN ({total}) > 0 THEN "
        f"floor({cnt[n]} * 1.0 / ({total}) * 10000 + 0.5) / 10000 "
        f"ELSE 0.0 END AS frac_{n}"
        for n in names
    )
    return f"""
    SELECT doc_id, text,
           CAST({total} AS BIGINT) AS n_script_chars,
           {fracs},
           {pred} AS pred_script,
           CASE WHEN ({total}) > 0 THEN
             floor(({best}) * 1.0 / ({total}) * 10000 + 0.5) / 10000
           ELSE 0.0 END AS script_confidence
    FROM docs_s
    """


def test_script_profile_matches_duckdb_oracle(spark, tmp_path):
    import duckdb

    path = _fixture(tmp_path)
    got = tx.script_profile(spark.read.parquet(path)).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW docs_s AS SELECT * FROM read_parquet('{path}')")
    want = con.execute(_oracle_sql()).fetchdf()
    problems = compare(got, want)
    assert not problems, problems


def test_script_profile_pinned_cases(spark, tmp_path):
    path = _fixture(tmp_path)
    got = tx.script_profile(spark.read.parquet(path)).toPandas()
    base = int(got["doc_id"].max()) - 3
    by_id = got.set_index("doc_id")
    assert by_id.loc[base + 0, "pred_script"] == "arabic"
    assert by_id.loc[base + 0, "script_confidence"] == 1.0
    assert by_id.loc[base + 1, "pred_script"] == "devanagari"
    assert by_id.loc[base + 2, "pred_script"] == "unk"
    assert by_id.loc[base + 2, "n_script_chars"] == 0
    assert by_id.loc[base + 2, "script_confidence"] == 0.0
    # Cyrillic-majority doc: 18 cyrillic chars vs 10 latin
    assert by_id.loc[base + 3, "pred_script"] == "cyrillic"
    # the word-soup base docs stay latin-dominant
    latin_docs = got[got["doc_id"] < base]
    assert (latin_docs["pred_script"] == "latin").mean() > 0.9


def test_curation_script_gate(spark):
    from hypertrace_ingester_spark.plans import curation as cur

    rows = (
        [(i, " ".join(f"latin{i}w{j}" for j in range(12))) for i in range(20)]
        + [(100 + i, " ".join([CYR] * 10)) for i in range(5)]
        + [(200, "1234 ... !!!")]   # 'unk': no classified script chars
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = cur.CurationConfig(
        allowed_scripts=("latin",),
        gopher_filter=False, quality_filter=False, redact_pii=False,
        near_dup=False,
    )
    curated, manifest = cur.run_curation(spark, docs, config=cfg)
    assert "script_gated" in manifest["stages"]
    assert manifest["stages"]["script_gated"]["rows"] == 20
    ids = {r["doc_id"] for r in curated.select("doc_id").collect()}
    assert ids == set(range(20))
