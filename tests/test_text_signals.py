"""Gopher-style repetition/quality signals (text.repetition_signals).

Hand-computed expectations per the public Gopher filters (Rae et al. 2021):
duplicate-word fraction, duplicate-2-gram fraction, symbol-to-word ratio,
alpha-word fraction, composite gopher_keep. These are the standard
web-scale curation pass run BEFORE any dedup shuffle (pure map stage).
"""
from __future__ import annotations

from pyspark.sql import functions as F

from hypertrace_ingester_spark.operators import text as txt


def _signals(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    rows = txt.repetition_signals(docs).orderBy("doc_id").collect()
    return rows


def test_repetition_signals_hand_computed(spark):
    rows = _signals(spark, [
        "the cat sat on the mat",      # 0: clean English
        "spam spam spam spam",         # 1: one word repeated
        "a b a b a b",                 # 2: repeated bigram pattern
        "1 2 3 4 5 6 7 8 9 10",        # 3: no alpha words
        "see #tag and ... more #x",    # 4: symbol-heavy
        "",                            # 5: empty text
        "word",                        # 6: single word (no bigrams)
    ])

    r = rows[0]  # 6 words, 5 distinct -> dup_word 1/6; bigrams 5 distinct
    assert r["dup_word_frac"] == 0.167
    assert r["dup_2gram_frac"] == 0.0
    assert r["symbol_word_ratio"] == 0.0
    assert r["alpha_word_frac"] == 1.0
    assert r["gopher_keep"] is True

    r = rows[1]  # 4 words 1 distinct -> 3/4; 3 bigrams 1 distinct -> 2/3
    assert r["dup_word_frac"] == 0.75
    assert r["dup_2gram_frac"] == 0.667
    assert r["gopher_keep"] is False

    r = rows[2]  # 6 words 2 distinct -> 4/6; 5 bigrams 2 distinct -> 3/5
    assert r["dup_word_frac"] == 0.667
    assert r["dup_2gram_frac"] == 0.6
    assert r["gopher_keep"] is False

    r = rows[3]  # all-numeric words fail the alpha-word rule
    assert r["alpha_word_frac"] == 0.0
    assert r["gopher_keep"] is False

    r = rows[4]  # '#tag', '...', '#x' -> 3 symbol marks / 6 words = 0.5
    assert r["symbol_word_ratio"] == 0.5
    assert r["gopher_keep"] is False

    r = rows[5]  # split('') -> [''] : 1 word, no alpha, no bigrams
    assert r["dup_word_frac"] == 0.0
    assert r["dup_2gram_frac"] == 0.0
    assert r["alpha_word_frac"] == 0.0
    assert r["gopher_keep"] is False

    r = rows[6]  # single word: the bigram guard must yield an empty array
    assert r["dup_2gram_frac"] == 0.0
    assert r["dup_word_frac"] == 0.0
    assert r["gopher_keep"] is True


def test_text_profile_carries_repetition_columns(spark):
    docs = spark.createDataFrame(
        [(1, "en", "the cat sat on the mat by the door")],
        "doc_id long, lang string, text string")
    row = txt.text_profile(docs).collect()[0]
    for col in ("dup_word_frac", "dup_2gram_frac", "symbol_word_ratio",
                "alpha_word_frac", "gopher_keep"):
        assert col in row.asDict()
    assert row["gopher_keep"] is True
    # still one fused frame: prior profile columns intact
    assert row["n_words"] == 9 and row["pred_lang"] == "en"


def test_pii_scrub_counts_and_redaction(spark):
    docs = spark.createDataFrame([
        (1, "contact me at jane.doe+x@example.co.uk for details"),
        (2, "server 10.0.255.7 answered then 192.168.1.1 timed out"),
        (3, "call +1 555 123 4567 or +44 20-7946-0958 now"),
        (4, "mixed user@10.0.0.1.example.com case"),  # email host contains an ip
        (5, "no personal data here"),
    ], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in txt.pii_scrub(docs).collect()}

    assert rows[1]["n_email"] == 1 and rows[1]["pii_free"] is False
    assert "<EMAIL>" in rows[1]["text_redacted"]
    assert "jane" not in rows[1]["text_redacted"]

    assert rows[2]["n_ip"] == 2
    assert rows[2]["text_redacted"].count("<IP>") == 2

    assert rows[3]["n_phone"] == 2
    assert rows[3]["text_redacted"].count("<PHONE>") == 2

    # email redacts FIRST, so the ip inside it is already masked
    assert rows[4]["n_email"] == 1 and rows[4]["n_ip"] == 1  # counts overlap by design
    assert rows[4]["text_redacted"] == "mixed <EMAIL> case"

    assert rows[5]["pii_free"] is True
    assert rows[5]["text_redacted"] == "no personal data here"


def test_normalize_text_nfc_oracle(spark):
    """Unicode first-mile cleanup: NFC composition + control/zero-width/BOM
    strip, verified against DuckDB's nfc_normalize on the same rows, plus
    idempotence (already-clean text round-trips byte-identically)."""
    import duckdb

    rows = [
        (0, "café con leche"),            # NFD -> NFC composes
        (1, "plain ascii"),                      # untouched
        (2, "bad\x00byte\x1fhere​gone!"),   # controls + zero-width out
        (3, "﻿bom lead"),                   # BOM stripped
        (4, "ümlaut already NFC"),
        (5, "tab\tand\nnewline kept"),           # \t \n survive
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = txt.normalize_text(docs)
    got = {r["doc_id"]: r for r in out.collect()}

    con = duckdb.connect()
    for i, raw in rows:
        want = con.execute(
            r"""SELECT nfc_normalize(regexp_replace(?,
                '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f'
                || '​-‍⁠﻿]', '', 'g'))""",
            [raw],
        ).fetchone()[0]
        assert got[i]["text"] == want, (i, raw)
        assert got[i]["was_normalized"] == (want != raw), i
    # idempotent: a second pass changes nothing
    again = txt.normalize_text(out.drop("was_normalized"))
    assert not [r for r in again.collect() if r["was_normalized"]]


def test_reserved_internal_names_guarded(spark):
    docs = spark.createDataFrame(
        [(0, "x", 1.0)], "doc_id long, _nt_orig string, _pb_cut0 double")
    import pytest as pt
    with pt.raises(ValueError, match="_nt_orig"):
        txt.normalize_text(docs.withColumnRenamed("_pb_cut0", "text")
                           .withColumn("text", F.lit("t")))
    scored = docs.withColumn("ppl", F.lit(1.0))
    with pt.raises(ValueError, match="_pb_cut0"):
        txt.perplexity_buckets(scored, by=())
