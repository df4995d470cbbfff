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


def test_duplicate_clusters_match_union_find(spark):
    """Min-label propagation equals a reference union-find on a random
    pair set (chains force multi-round propagation)."""
    import random

    import pandas as pd

    from hypertrace_ingester_spark.operators import dedup as dd

    rng = random.Random(11)
    # 3 deliberate chains (worst case for propagation depth) + random noise
    pairs = [(i, i + 1) for i in range(0, 9)]          # chain 0..9
    pairs += [(100 + i, 100 + i + 1) for i in range(0, 5)]
    pairs += [(200, 201), (202, 203), (201, 202)]       # merged via middle
    pairs += [(rng.randint(300, 340), rng.randint(300, 340)) for _ in range(25)]
    pairs = [(a, b) for a, b in pairs if a != b]

    # reference union-find
    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for a, b in pairs:
        union(a, b)
    expect = {x: find(x) for x in parent}
    # path-compress fully
    expect = {x: find(x) for x in parent}

    df = spark.createDataFrame(pd.DataFrame(pairs, columns=["doc_a", "doc_b"]))
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dd.duplicate_clusters(df).collect()
    }
    assert got == expect


def test_duplicate_clusters_pathological_chain_log_rounds(spark):
    """Round-3 VERDICT #5 stress: a 10k-edge PATH graph (diameter 10k —
    the worst case for plain min-label propagation, which would need
    diameter rounds and silently time out at max_iters=20). Pointer
    doubling must converge in ~log2(diameter) rounds with every node
    labeled by the component minimum."""
    import math

    import pandas as pd

    from hypertrace_ingester_spark.operators import dedup as dd

    n = 10_001  # nodes 0..10000 in one chain: 10k pairs
    pairs = pd.DataFrame({"doc_a": range(n - 1), "doc_b": range(1, n)})
    labels, rounds, converged = dd.duplicate_clusters_stats(
        spark.createDataFrame(pairs)
    )
    assert converged, "10k path graph must converge within max_iters"
    # log2(10000) ~ 13.3; allow slack for the fixpoint-detection round
    assert rounds <= math.ceil(math.log2(n)) + 2, rounds
    got = labels.collect()
    assert len(got) == n
    assert all(r["cluster_id"] == 0 for r in got)


def test_duplicate_clusters_strict_raises_on_non_convergence(spark):
    import pandas as pd

    import pytest

    from hypertrace_ingester_spark.operators import dedup as dd

    chain = pd.DataFrame({"doc_a": range(0, 99), "doc_b": range(1, 100)})
    df = spark.createDataFrame(chain)
    with pytest.raises(RuntimeError, match="did not converge"):
        dd.duplicate_clusters(df, max_iters=2)
    # non-strict mode returns the partial labels instead
    partial = dd.duplicate_clusters(df, max_iters=2, strict=False)
    assert partial.count() == 100


def test_keep_canonical_docs_with_preexisting_cluster_id_column(spark):
    """Round-3 ADVICE: a docs frame that already carries a cluster_id
    column (a prior dedup pass) must not alias-collide with the join."""
    import pandas as pd

    from hypertrace_ingester_spark.operators import dedup as dd

    docs = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1, 2, 3], "text": list("abc"), "cluster_id": [9, 9, 9]}
        )
    )
    pairs = spark.createDataFrame(pd.DataFrame({"doc_a": [1], "doc_b": [3]}))
    kept = dd.keep_canonical(docs, dd.duplicate_clusters(pairs))
    rows = sorted((r["doc_id"], r["cluster_id"]) for r in kept.collect())
    # doc 3 deduped away; the caller's own cluster_id column survives intact
    assert rows == [(1, 9), (2, 9)]


def test_keep_canonical(spark):
    import pandas as pd

    from hypertrace_ingester_spark.operators import dedup as dd

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3, 4, 5], "text": list("abcde")})
    )
    pairs = spark.createDataFrame(
        pd.DataFrame({"doc_a": [2, 4], "doc_b": [3, 2]})
    )
    clusters = dd.duplicate_clusters(pairs)
    kept = sorted(r["doc_id"] for r in dd.keep_canonical(docs, clusters).collect())
    # cluster {2,3,4} -> keep 2; singletons 1 and 5 kept
    assert kept == [1, 2, 5]


def test_md5_word_hash_matches_duckdb_restatement(spark):
    """The d_simhash full-oracle premise: dedup.md5_word_hash and the
    DuckDB expression in queries._SIMHASH_SQL produce the identical signed
    64-bit value for arbitrary words (negatives + unicode included)."""
    import duckdb
    from pyspark.sql import functions as F

    wordlist = ["hello", "world", "", "a", "Zyx9!", "über", "0", " ", "doc-1"]
    df = spark.createDataFrame([(w,) for w in wordlist], "word string").select(
        "word", dd.md5_word_hash(F.col("word")).alias("h")
    )
    sp = {r["word"]: r["h"] for r in df.collect()}
    hi = "('0x'||substr(md5(word),1,8))::BIGINT"
    lo = "('0x'||substr(md5(word),9,8))::BIGINT"
    q = (
        f"SELECT word, ({lo} + ({hi} % 2147483648) * 4294967296 + "
        f"CASE WHEN {hi} >= 2147483648 THEN -9223372036854775808 ELSE 0 END) AS h "
        "FROM (SELECT unnest(?) AS word)"
    )
    dk = dict(duckdb.connect().execute(q, [wordlist]).fetchall())
    assert sp == dk


def test_simhash_md5_variant_same_machinery_as_default(spark):
    """The pluggable word hash changes fingerprints (different hash) but not
    the machinery: same output schema, same doc set, and hamming-identical
    results when the hash itself is held constant."""
    from pyspark.sql import functions as F

    docs = load_table(spark, SF_DIR, "documents").limit(50)
    default = dd.simhash(docs)
    md5v = dd.simhash(docs, word_hash=dd.md5_word_hash)
    assert default.columns == md5v.columns == ["doc_id", "simhash"]
    assert default.count() == md5v.count() == 50
    # explicitly passing the default hash reproduces the default output
    again = dd.simhash(docs, word_hash=F.xxhash64)
    assert default.exceptAll(again).count() == 0


def test_decontaminate_13gram_collision(spark):
    """GPT-3/PaLM recipe: a train doc is contaminated iff it shares a full
    13-gram with an eval doc; a 12-word overlap must NOT flag."""
    from pyspark.sql import functions as F

    from hypertrace_ingester_spark.operators import dedup as dd

    eval_words = [f"e{i}" for i in range(20)]
    eval_docs = spark.createDataFrame(
        [(900, " ".join(eval_words))], "doc_id long, text string")

    train = spark.createDataFrame([
        # shares eval words 3..15 (13 consecutive) -> contaminated
        (1, "intro " + " ".join(eval_words[3:16]) + " outro"),
        # shares only 12 consecutive eval words -> clean
        (2, "intro " + " ".join(eval_words[3:15]) + " outro"),
        (3, "totally unrelated content with many plain words here"),
        # verbatim copy of the whole eval doc -> contaminated, many grams
        (4, " ".join(eval_words)),
    ], "doc_id long, text string")

    out = {r["doc_id"]: r for r in dd.decontaminate(train, eval_docs).collect()}
    assert out[1]["contaminated"] is True and out[1]["n_hit_grams"] == 1
    assert out[2]["contaminated"] is False and out[2]["n_hit_grams"] == 0
    assert out[3]["contaminated"] is False
    assert out[4]["contaminated"] is True and out[4]["n_hit_grams"] == 8  # 20-13+1
    assert out[4]["n_eval_docs_hit"] == 1
    # flag column rides on the original frame: all docs present
    assert set(out) == {1, 2, 3, 4}
