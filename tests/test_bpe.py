"""BPE tokenizer: paper-exact merge order, reconstruction invariants,
driver/distributed agreement, and compression monotonicity."""

import os

import pytest
from pyspark.sql import functions as F

from hypertrace_ingester_spark.operators import bpe

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata dir {SF_DIR} missing"
)


@pytest.fixture(scope="module")
def paper_docs(spark):
    # the Sennrich et al. (2016) worked example, as a weighted corpus
    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    return spark.createDataFrame([(0, text)], "doc_id int, text string")


def test_paper_example_merge_order(paper_docs):
    merges = bpe.train_bpe(paper_docs, n_merges=5)
    assert merges == [
        ("e", "s"),        # freq 9, lexicographic winner of the 9-tie
        ("es", "t"),       # freq 9
        ("est", bpe.EOW),  # freq 9
        ("l", "o"),        # freq 7
        ("lo", "w"),       # freq 7
    ]


def test_encode_reconstructs_and_matches_training(paper_docs):
    merges = bpe.train_bpe(paper_docs, n_merges=10)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for w in ("low", "lower", "newest", "widest", "unseenword"):
        toks = bpe.encode_word(w, ranks)
        assert "".join(toks) == w + bpe.EOW  # lossless segmentation
    # fully-merged frequent word collapses to one symbol + analysis of low
    assert bpe.encode_word("newest", ranks)[-1].endswith(bpe.EOW)


def test_distributed_tokenize_matches_driver(spark):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    merges = bpe.train_bpe(docs, n_merges=50)
    assert len(merges) == 50
    out = bpe.bpe_tokenize(docs, merges).select(
        "doc_id", "text", "bpe_tokens", "n_bpe_tokens"
    )
    rows = out.collect()
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for r in rows[:50]:
        expect = []
        for wd in r["text"].split(" "):
            if wd:
                expect.extend(bpe.encode_word(wd, ranks))
        assert r["bpe_tokens"] == expect
        assert r["n_bpe_tokens"] == len(expect)
    # reconstruction over the whole corpus: strip EOW, rejoin, compare
    bad = (
        out.withColumn(
            "rebuilt",
            F.array_join(
                F.split(F.concat_ws("", "bpe_tokens"), bpe.EOW), " "
            ),
        )
        .where(F.rtrim(F.col("rebuilt")) != F.regexp_replace("text", " +", " "))
        .count()
    )
    assert bad == 0


def test_more_merges_never_increase_token_count(spark):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).limit(100)
    counts = []
    for k in (0, 20, 80):
        merges = bpe.train_bpe(docs, n_merges=k)
        n = (
            bpe.bpe_tokenize(docs, merges)
            .agg(F.sum("n_bpe_tokens"))
            .first()[0]
        )
        counts.append(n)
    assert counts[0] > counts[1] > counts[2]


def test_training_is_deterministic(spark, paper_docs):
    assert bpe.train_bpe(paper_docs, n_merges=8) == bpe.train_bpe(
        paper_docs, n_merges=8
    )


def test_word_frequency_truncation(spark):
    docs = spark.createDataFrame(
        [(0, "b b b a a c")], "doc_id int, text string"
    )
    top2 = bpe.word_frequencies(docs, max_vocab_words=2).collect()
    assert [(r["word"], r["freq"]) for r in top2] == [("b", 3), ("a", 2)]
