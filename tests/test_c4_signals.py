"""C4 line-level cleaning heuristics (Raffel et al. 2020 §2.2) — full
DuckDB oracle.

The shared documents table is single-line punctuation-free word soup, so
the fixture derives a deterministic multi-line corpus from it with every
C4 failure mode planted (unterminated lines, short lines, javascript
mentions, lorem-ipsum pages, curly-brace pages), written once to parquet
so BOTH engines read identical bytes. DuckDB restates every predicate
verbatim: line keep = terminal punctuation AND >=5 words AND no
"javascript"; page keep = no lorem ipsum, no brace, no blocklist word
(whole-word, case-insensitive), >=3 sentences in the CLEANED text."""

import os

import pandas as pd
import pytest

from hypertrace_ingester_spark.operators import text as txt
from hypertrace_ingester_spark.oracle import compare

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata dir {SF_DIR} missing"
)

BADWORDS = ["badplaceholderword", "otherbadword"]
# identical RE2 pattern text in both engines (word-boundary, case-insensitive)
_BADPAT = r"(?i)\b(?:badplaceholderword|otherbadword)\b"

_ORACLE_SQL = f"""
WITH base AS (
  SELECT doc_id, text, string_split(text, chr(10)) AS lines FROM docs_c4
),
cleaned AS (
  SELECT *,
         coalesce(array_to_string(list_filter(lines, ln ->
             regexp_matches(ln, '[.!?"]$')
             AND len(list_filter(string_split(ln, ' '), x -> x <> '')) >= 5
             AND NOT contains(lower(ln), 'javascript')
         ), chr(10)), '') AS text_c4,
         len(list_filter(lines, ln ->
             regexp_matches(ln, '[.!?"]$')
             AND len(list_filter(string_split(ln, ' '), x -> x <> '')) >= 5
             AND NOT contains(lower(ln), 'javascript')
         )) AS n_kept_lines
  FROM base
)
SELECT doc_id,
       CAST(len(lines) AS INT) AS n_lines,
       CAST(n_kept_lines AS INT) AS n_kept_lines,
       text_c4,
       CAST(len(regexp_extract_all(text_c4, '[.!?]')) AS INT) AS n_sentences,
       contains(lower(text), 'lorem ipsum') AS has_lorem_ipsum,
       contains(text, '{{') AS has_brace,
       regexp_matches(text, '{_BADPAT}') AS has_badword,
       (NOT contains(lower(text), 'lorem ipsum') AND NOT contains(text, '{{')
        AND NOT regexp_matches(text, '{_BADPAT}')
        AND len(regexp_extract_all(text_c4, '[.!?]')) >= 3) AS c4_keep
FROM cleaned
"""


def _c4_fixture(tmp_path) -> str:
    src = pd.read_parquet(os.path.join(SF_DIR, "documents.parquet"),
                          columns=["doc_id", "text"])
    rows = []
    for doc_id, text in zip(src["doc_id"], src["text"]):
        words = text.split(" ")
        doc_lines = []
        for k, i in enumerate(range(0, len(words), 6)):
            ln = " ".join(words[i:i + 6])
            if (doc_id + k) % 4 == 0:
                ln += "."          # terminated sentence
            elif (doc_id + k) % 4 == 1:
                ln += "!"          # terminated, different punct
            # %4 in (2,3): unterminated -> line dropped
            if (doc_id + k) % 7 == 0:
                ln = "enable JavaScript to view this " + ln  # dropped
            if (doc_id + k) % 11 == 0:
                ln = "Short line."  # terminated but <5 words -> dropped
            doc_lines.append(ln)
        if doc_id % 13 == 0:
            doc_lines.insert(0, "Lorem Ipsum dolor sit amet placeholder.")
        if doc_id % 17 == 0:
            doc_lines.append("function() { return 1; }")
        if doc_id % 19 == 0:
            # page-level blocklist hit; 'embadplaceholderworded' on %23 pages
            # must NOT trip it (word-boundary rule)
            doc_lines.append("This page contains BadPlaceholderWord sadly.")
        if doc_id % 23 == 0:
            doc_lines.append("The embadplaceholderworded token is innocent.")
        rows.append({"doc_id": int(doc_id), "text": "\n".join(doc_lines)})
    path = str(tmp_path / "docs_c4.parquet")
    pd.DataFrame(rows).to_parquet(path, index=False)
    return path


def test_c4_signals_match_duckdb_oracle(spark, tmp_path):
    import duckdb

    path = _c4_fixture(tmp_path)
    docs = spark.read.parquet(path)
    got = txt.c4_line_signals(docs, badwords=BADWORDS).drop("text").toPandas()

    con = duckdb.connect()
    con.execute(f"CREATE VIEW docs_c4 AS SELECT * FROM read_parquet('{path}')")
    want = con.execute(_ORACLE_SQL).fetchdf()

    assert len(got) == len(want) > 0
    # every failure mode is actually present in the fixture
    assert got["has_lorem_ipsum"].any() and got["has_brace"].any()
    assert got["has_badword"].any() and (~got["has_badword"]).any()
    assert (~got["c4_keep"]).any() and got["c4_keep"].any()
    assert (got["n_kept_lines"] < got["n_lines"]).any()
    assert (got["n_kept_lines"] <= got["n_lines"]).all()
    problems = compare(got, want)
    assert not problems, problems


def test_c4_signals_hand_cases(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                # 3 good sentences -> kept
                "The quick brown fox jumps high.\n"
                "A second proper sentence lives here!\n"
                "And a third one rounds it out?",
                # javascript line + short line + unterminated -> 0 kept
                "please enable javascript to continue here.\n"
                "Too short.\n"
                "no terminal punctuation on this line",
                # lorem ipsum page -> c4_keep false even with sentences
                "Lorem ipsum dolor sit amet consectetur.\n"
                "This real sentence is long enough today.\n"
                "So is this other one right here.",
                # brace page -> c4_keep false
                "This sentence is fine and long enough.\n"
                "if (x) { y(); } is code.\n"
                "Another good long sentence ends here.\n"
                "And one more to clear the bar.",
            ],
        }
    )
    out = {r["doc_id"]: r for r in
           txt.c4_line_signals(spark.createDataFrame(pdf)).collect()}
    assert out[0]["c4_keep"] and out[0]["n_kept_lines"] == 3
    assert out[1]["n_kept_lines"] == 0 and not out[1]["c4_keep"]
    assert out[2]["has_lorem_ipsum"] and not out[2]["c4_keep"]
    assert out[2]["n_kept_lines"] == 3  # lines survive; the PAGE is dropped
    assert out[3]["has_brace"] and not out[3]["c4_keep"]
    # the brace line ends in '.', has >=5 words, no 'javascript' — it
    # survives as a LINE; the brace drops the PAGE (C4 semantics)
    assert out[3]["n_kept_lines"] == 4
