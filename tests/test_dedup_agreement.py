"""MinHash-LSH vs exact-Jaccard agreement (the semi-oracle for the
rows-only d_minhash_lsh catalog entry): zero false positives by
construction (the exact filter), and deterministic recall vs the
brute-force exact pairs on the same corpus (hash seeds are fixed)."""

from hypertrace_ingester_spark.operators import dedup as dd
from hypertrace_ingester_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"
THRESHOLD = 0.3


def _pairs(df):
    return {(r["doc_a"], r["doc_b"]) for r in df.collect()}


def test_lsh_agrees_with_exact_jaccard(spark):
    docs = load_table(spark, SF_DIR, "documents")
    lsh = _pairs(dd.minhash_near_dups(docs, threshold=THRESHOLD))
    exact = _pairs(
        dd.ngram_jaccard_pairs(docs, block_cols=[], threshold=THRESHOLD)
    )
    # exact filter inside the LSH path -> no false positives, ever
    assert lsh <= exact
    # banding (16x4) recalls high-similarity pairs; deterministic here
    assert exact, "fixture should contain near-dup pairs"
    recall = len(lsh) / len(exact)
    assert recall >= 0.8, f"LSH recall {recall:.2f} below 0.8 ({len(lsh)}/{len(exact)})"


def test_signature_matches_bruteforce_definition(spark):
    # sig[i] == min(xxhash64(shingle, i)) computed the slow array way
    from pyspark.sql import functions as F

    docs = load_table(spark, SF_DIR, "documents").limit(20)
    fast = {r["doc_id"]: r["minhash"] for r in dd.minhash_signature(docs).collect()}
    sh = dd.shingles()
    slow_cols = [
        F.array_min(F.transform(sh, lambda s: F.xxhash64(s, F.lit(i)))).alias(f"m{i}")
        for i in range(dd.MINHASH_PERMS)
    ]
    slow_df = docs.select("doc_id", *slow_cols).collect()
    for r in slow_df:
        expect = [r[f"m{i}"] for i in range(dd.MINHASH_PERMS)]
        if all(v is None for v in expect):
            assert r["doc_id"] not in fast  # shingle-less docs drop out
        else:
            assert fast[r["doc_id"]] == expect


def test_short_docs_have_no_shingles_and_do_not_crash(spark):
    """Spark 4 ANSI regression (review find r3): docs with < k words made
    sequence() descend and element_at() throw; they must instead yield an
    empty shingle set and flow through the text/dedup operators."""
    from pyspark.sql import functions as F

    from hypertrace_ingester_spark.operators import dedup as dd
    from hypertrace_ingester_spark.operators import text as txt

    docs = spark.createDataFrame(
        [(1, "a"), (2, "one two"), (3, ""), (4, "one two three four")],
        "doc_id long, text string",
    )
    sh = {r["doc_id"]: r["n"] for r in docs.select(
        "doc_id", F.size(dd.shingles()).alias("n")).collect()}
    assert sh == {1: 0, 2: 0, 3: 0, 4: 2}
    prof = txt.text_profile(docs.withColumn("lang", F.lit("en"))).collect()
    assert {r["doc_id"]: r["n_shingles"] for r in prof} == {1: 0, 2: 0, 3: 0, 4: 2}
    # near-dup pipeline: short docs drop out of signatures, job completes
    pairs = dd.minhash_near_dups(docs, threshold=0.1).collect()
    assert isinstance(pairs, list)
