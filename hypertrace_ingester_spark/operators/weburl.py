"""URL/domain-level corpus curation — the stage a web-scale pipeline runs
BEFORE any text is read (RefinedWeb §3.1 / C4: URL blocklists, URL-level
dedup, per-domain caps).

Everything here is pure column expressions (regexp + array ops, JVM
codegen) — at 100 TB this stage is a map-only scan except the per-domain
cap, whose one shuffle is domain-grain and skew-split (see
``per_domain_cap``).

Reference parity: the span pipeline reconstructs full URLs from parts
(operators/fieldgen.py effective-URL ladder; the reference's
HttpSemanticConventionUtils.getHttpUrlForOTelFormat builds
scheme://host:port/path). This module is the inverse direction — parts
from URLs — applied at corpus grain, where the reference has no analog
(driver-mandate training-data territory).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# multi-label public suffixes where the registered domain is 3 labels
# (small curated table in uap-core style; the full PSL is a data-file swap)
_MULTI_SUFFIXES = (
    "co.uk", "org.uk", "gov.uk", "ac.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx", "com.tr",
    "co.in", "co.kr", "co.za", "com.ar", "com.sg", "com.tw", "co.nz",
)

# tracking params stripped during canonicalization (public convention:
# Google Analytics utm_*, click ids)
_TRACKING_RE = r"^(utm_[a-z]+|gclid|fbclid|msclkid|mc_cid|mc_eid|ref)="

_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)"


def normalize_host(raw_host: Column) -> Column:
    """Canonical host form shared by every host-keyed join in the repo
    (URL-derived hosts here; rules-table hosts in sources/robots.py):
    lowercase, port stripped unless the host is a bracketed IPv6 literal.
    ONE definition on purpose — two independently-stated copies would let
    a future tweak silently stop robots rules matching any URL (the
    span_has_error drift rule applied to hosts)."""
    lowered = F.lower(raw_host)
    return F.when(
        lowered.startswith("["), lowered
    ).otherwise(F.split(lowered, ":").getItem(0))


def _host_expr(url_col: str) -> Column:
    return normalize_host(F.regexp_extract(F.col(url_col), _HOST_RE, 1))


def _reg_domain_expr(host: Column) -> Column:
    labels = F.split(host, r"\.")
    n = F.size(labels)
    is_ip = host.rlike(r"^\d+\.\d+\.\d+\.\d+$") | host.startswith("[")
    last2 = F.array_join(F.slice(labels, -2, 2), ".")
    last3 = F.array_join(F.slice(labels, -3, 3), ".")
    return (
        F.when(is_ip | (n <= 2), host)
        .when(last2.isin(*_MULTI_SUFFIXES) & (n >= 3), last3)
        .otherwise(last2)
    )


def url_parts(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Add ``scheme, host, registered_domain, path, query`` columns.

    ``registered_domain`` is the last two host labels, or three when the
    last two are a listed multi-label public suffix (``co.uk`` →
    ``bbc.co.uk``). IP hosts pass through whole."""
    url = F.col(url_col)
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = _host_expr(url_col)
    path = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    return (
        df.withColumn("scheme", scheme)
        .withColumn("host", host)
        .withColumn("registered_domain", _reg_domain_expr(host))
        .withColumn("path", path)
        .withColumn("query", query)
    )


def canonical_url(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Add ``canonical_url``: lowercase scheme+host, default port dropped,
    fragment dropped, tracking params dropped, remaining query params
    SORTED, trailing slash trimmed. Two crawls of the same page then agree
    on identity, so URL-level exact dedup (groupBy canonical_url) runs
    before a single byte of text is compared — the cheapest dedup tier a
    web pipeline has. Only ``canonical_url`` is added — no intermediate
    part columns touch the caller's frame."""
    url = F.col(url_col)
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = _host_expr(url_col)
    default_port = F.when(scheme == "http", F.lit("80")).when(
        scheme == "https", F.lit("443")).otherwise(F.lit(""))
    # authority INCLUDING the port (_HOST_RE's class excludes ':')
    authority = F.lower(F.regexp_extract(
        F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^/?#]+)", 1))
    port = F.when(authority.startswith("["), F.lit("")).otherwise(
        F.coalesce(F.get(F.split(authority, ":"), 1), F.lit("")))
    port_part = F.when(
        (port == "") | (port == default_port), F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    path = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    norm_path = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        F.substring(path, 1, F.length(path) - 1),
    ).otherwise(F.when(path == "", F.lit("/")).otherwise(path))
    params = F.array_sort(
        F.filter(
            F.split(F.regexp_extract(url, r"\?([^#]*)", 1), "&"),
            lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
        )
    )
    query_part = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    canon = F.concat(scheme, F.lit("://"), host, port_part, norm_path, query_part)
    return df.withColumn("canonical_url", canon)


def blocklist_filter(
    df: DataFrame, blocked_domains: list[str], url_col: str = "url"
) -> DataFrame:
    """Drop rows whose registered domain is on the blocklist (subdomains
    match via the registered-domain collapse). The blocklist is a
    broadcast anti-join — list-sized side never shuffles the corpus."""
    spark = df.sparkSession
    bl = spark.createDataFrame(
        [(d.lower(),) for d in blocked_domains], "_wu_dom string"
    )
    # internal join key only — the caller's columns (even ones named
    # host/registered_domain) are never touched
    tagged = df.withColumn("_wu_dom", _reg_domain_expr(_host_expr(url_col)))
    return tagged.join(F.broadcast(bl), "_wu_dom", "left_anti").drop("_wu_dom")


def per_domain_cap(
    df: DataFrame,
    cap: int,
    url_col: str = "url",
    id_col: str = "doc_id",
    seed: int = 41,
) -> DataFrame:
    """Keep at most ``cap`` deterministically-chosen rows per registered
    domain (RefinedWeb-style domain balance).

    Skew shape: one domain-grain count (map-side combine, result is
    domain-cardinality small), then under-cap domains pass with NO
    per-row shuffle beyond the count join, and only over-cap domains pay
    the rank. Over-cap rows are first thinned by a deterministic hash
    threshold (keep ~1.5×cap of a 500M-page domain, no sort), so the
    exact ``row_number`` cap sorts a bounded set per domain instead of
    the whole giant domain — at web scale the biggest hosts are exactly
    where a naive window would skew-stall."""
    from pyspark.sql import Window

    parts = df.withColumn("_wu_dom", _reg_domain_expr(_host_expr(url_col)))
    counts = parts.groupBy("_wu_dom").agg(F.count("*").alias("_dom_n"))
    with_n = parts.join(F.broadcast(counts), "_wu_dom")
    under = with_n.where(F.col("_dom_n") <= cap)
    rank_hash = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(1 << 30))
    # hash prefilter: expected survivors ≈ 1.5×cap + 64 (the additive slack
    # makes small caps a certain full pass; for large caps the Chernoff
    # tail of under-filling is negligible), so the exact rank below sorts
    # a bounded set per domain
    keep_p = F.least(F.lit(1.0), (F.lit(1.5) * cap + 64) / F.col("_dom_n"))
    over = with_n.where(
        (F.col("_dom_n") > cap)
        & (rank_hash < (keep_p * (1 << 30)).cast("long"))
    )
    w = Window.partitionBy("_wu_dom").orderBy(rank_hash, id_col)
    capped = (
        over.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= cap)
        .drop("_rk")
    )
    return under.unionByName(capped).drop("_dom_n", "_wu_dom")
