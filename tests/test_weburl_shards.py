"""URL/domain curation (operators/weburl.py) + shard writer
(sources/shards.py).

URL parsing is pinned on a table of hand-checked tricky URLs; the
per-domain cap and the shard writer are pinned on invariants the web-scale
contract actually needs: determinism across runs, exact cap counts,
under-cap rows untouched, shard membership/order independent of input
partitioning.
"""

import pytest
from pyspark.sql import functions as F

from hypertrace_ingester_spark.operators import weburl as wu
from hypertrace_ingester_spark.sources import shards as sh

URLS = [
    # url, host, registered_domain, path, query
    ("https://www.BBC.co.uk/news/uk-123?b=2&a=1#frag",
     "www.bbc.co.uk", "bbc.co.uk", "/news/uk-123", "b=2&a=1"),
    ("http://example.com:8080/a/b/", "example.com", "example.com", "/a/b/", ""),
    ("https://sub.deep.blogspot.com/post",
     "sub.deep.blogspot.com", "blogspot.com", "/post", ""),
    ("http://192.168.0.1/admin", "192.168.0.1", "192.168.0.1", "/admin", ""),
    ("https://localhost/x", "localhost", "localhost", "/x", ""),
    ("http://user:pw@shop.com.au/cart?utm_source=x&id=9",
     "shop.com.au", "shop.com.au", "/cart", "utm_source=x&id=9"),
]


@pytest.fixture()
def url_df(spark):
    rows = [(i, u[0]) for i, u in enumerate(URLS)]
    return spark.createDataFrame(rows, "doc_id long, url string")


def test_url_parts_golden(spark, url_df):
    got = {r["doc_id"]: r for r in wu.url_parts(url_df).collect()}
    for i, (_, host, reg, path, query) in enumerate(URLS):
        assert got[i]["host"] == host, i
        assert got[i]["registered_domain"] == reg, i
        assert got[i]["path"] == path, i
        assert got[i]["query"] == query, i


def test_canonical_url(spark, url_df):
    got = {r["doc_id"]: r["canonical_url"]
           for r in wu.canonical_url(url_df).collect()}
    # params sorted, fragment dropped, case folded
    assert got[0] == "https://www.bbc.co.uk/news/uk-123?a=1&b=2"
    # non-default port kept, trailing slash trimmed
    assert got[1] == "http://example.com:8080/a/b"
    # tracking param dropped, real param kept
    assert got[5] == "http://shop.com.au/cart?id=9"
    # default-port and bare-path forms collapse to one identity
    extra = spark.createDataFrame(
        [(10, "HTTPS://Example.COM:443"), (11, "https://example.com/")],
        "doc_id long, url string")
    vals = {r["canonical_url"] for r in wu.canonical_url(extra).collect()}
    assert vals == {"https://example.com/"}


def test_blocklist_filter(spark, url_df):
    out = wu.blocklist_filter(url_df, ["blogspot.com", "BBC.co.uk"])
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert kept == {1, 3, 4, 5}  # 0 (bbc) and 2 (blogspot subdomain) drop
    assert set(out.columns) == {"doc_id", "url"}


def test_per_domain_cap(spark):
    rows = [(i, f"https://big.example.com/p{i}") for i in range(40)]
    rows += [(100 + i, f"https://small.org/p{i}") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    capped = wu.per_domain_cap(df, cap=5)
    got = capped.withColumn(
        "dom", F.regexp_extract("url", r"https://([^/]+)/", 1)).collect()
    by_dom = {}
    for r in got:
        by_dom.setdefault(r["dom"], set()).add(r["doc_id"])
    # over-cap domain: exactly cap survivors; under-cap: untouched
    assert len(by_dom["big.example.com"]) == 5
    assert by_dom["small.org"] == {100, 101, 102}
    # deterministic: a second run (different partitioning) agrees exactly
    again = wu.per_domain_cap(df.repartition(7), cap=5)
    assert {r["doc_id"] for r in again.select("doc_id").collect()} == {
        r["doc_id"] for r in capped.select("doc_id").collect()}


def test_shard_writer_deterministic_and_pruned(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"text {i}", (i % 7) + 1) for i in range(500)],
        "doc_id long, text string, n_tokens long")
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    man1 = sh.write_training_shards(df, p1, n_shards=8)
    # same input, different partitioning → identical membership AND order
    man2 = sh.write_training_shards(df.repartition(13), p2, n_shards=8)
    assert man1["shards"] == man2["shards"]
    for k in range(8):
        a = [r["doc_id"] for r in sh.read_shard(spark, p1, k).collect()]
        b = [r["doc_id"] for r in sh.read_shard(spark, p2, k).collect()]
        assert a == b and len(a) > 20  # 500/8 ≈ 62 ± hash noise
    # manifest accounts for every row and token
    assert sum(s["rows"] for s in man1["shards"].values()) == 500
    assert sum(s["tokens"] for s in man1["shards"].values()) == sum(
        (i % 7) + 1 for i in range(500))
    # partition pruning: the shard predicate lands in PartitionFilters
    # (directory-level pruning), not a row-level data filter
    plan = (sh.read_shard(spark, p1, 3)
            ._jdf.queryExecution().executedPlan().toString())
    pf = [ln for ln in plan.splitlines() if "PartitionFilters:" in ln]
    assert pf and "shard" in pf[0] and " = 3" in pf[0], plan


def test_no_caller_column_clobber(spark):
    """Filters/canonicalization never touch caller columns, even ones
    named like URL parts (host, registered_domain, ...)."""
    df = spark.createDataFrame(
        [(1, "https://a.blogspot.com/x", "MY_HOST", "MY_REG")],
        "doc_id long, url string, host string, registered_domain string")
    out = wu.canonical_url(df)
    assert out.columns == df.columns + ["canonical_url"]
    r = out.first()
    assert r["host"] == "MY_HOST" and r["registered_domain"] == "MY_REG"
    kept = wu.blocklist_filter(df, ["other.com"])
    assert set(kept.columns) == set(df.columns)
    assert kept.first()["host"] == "MY_HOST"
    assert wu.blocklist_filter(df, ["blogspot.com"]).count() == 0
    capped = wu.per_domain_cap(df, cap=5)
    assert set(capped.columns) == set(df.columns)


def test_shard_name_collision_raises(spark):
    import pytest as _pt
    df = spark.createDataFrame([(1, 2)], "doc_id long, shard long")
    with _pt.raises(ValueError, match="shard"):
        sh.assign_shards(df, 4)


def test_canonicalization_laws(spark, url_df):
    """Fixpoint law: canonicalizing an already-canonical URL is identity
    (no double-strip, no port/slash oscillation); cap law: per_domain_cap
    is idempotent."""
    canon1 = wu.canonical_url(url_df).select(
        F.col("doc_id"), F.col("canonical_url").alias("url"))
    canon2 = wu.canonical_url(canon1)
    bad = canon2.where(F.col("canonical_url") != F.col("url"))
    assert bad.count() == 0, bad.collect()

    rows = [(i, f"https://d{i % 6}.net/p{i}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    once = wu.per_domain_cap(df, cap=4)
    twice = wu.per_domain_cap(once, cap=4)
    assert {r["doc_id"] for r in once.collect()} == {
        r["doc_id"] for r in twice.collect()}
