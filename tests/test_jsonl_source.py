"""JSONL corpus source (sources/jsonl.py): explicit-schema read,
dead-letter split, lineage, and a full documents-table round trip."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from hypertrace_ingester_spark.sources import jsonl

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_dead_letter_and_lineage(spark, tmp_path):
    good_rows = [
        {"doc_id": 1, "text": "hello world", "lang": "en", "source": "web",
         "n_chars": 11},
        {"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "books",
         "n_chars": 7},
        {"doc_id": 3, "text": "", "lang": "en", "source": "web", "n_chars": 0},
    ]
    lines = [json.dumps(r) for r in good_rows]
    lines.insert(2, '{"doc_id": 99, "text": "broken')  # malformed line
    (tmp_path / "part0.jsonl").write_text("\n".join(lines) + "\n")

    df = jsonl.load_documents_jsonl(spark, str(tmp_path))
    good, dead = jsonl.split_dead_letters(df)
    got = {r["doc_id"]: r for r in good.collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["text"] == "hello world" and got[2]["lang"] == "fr"
    assert all(r["_src_file"].endswith("part0.jsonl") for r in got.values())
    dead_rows = dead.collect()
    assert len(dead_rows) == 1
    assert dead_rows[0][jsonl.CORRUPT_COL].startswith('{"doc_id": 99')


def test_documents_roundtrip_text_equality(spark, tmp_path):
    """documents.parquet → JSONL on disk → loader: byte-identical rows
    (the per-row text/token equality invariant, applied to the source)."""
    if not os.path.isdir(SF_DIR):
        pytest.skip("testdata missing")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    out = str(tmp_path / "dump")
    docs.write.json(out)
    back = jsonl.load_documents_jsonl(spark, out)
    good, dead = jsonl.split_dead_letters(back)
    assert dead.count() == 0
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    a = sorted(map(tuple, docs.select(*cols).collect()))
    b = sorted(map(tuple, good.select(*cols).collect()))
    assert a == b


def test_custom_schema_string(spark, tmp_path):
    (tmp_path / "x.jsonl").write_text(json.dumps({"id": 5, "body": "t"}) + "\n")
    df = jsonl.load_documents_jsonl(
        spark, str(tmp_path), schema="id bigint, body string", lineage=False
    )
    rows = df.where(F.col(jsonl.CORRUPT_COL).isNull()).collect()
    assert rows[0]["id"] == 5 and rows[0]["body"] == "t"
    assert "_src_file" not in df.columns
