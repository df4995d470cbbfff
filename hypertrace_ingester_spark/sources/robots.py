"""robots.txt enforcement (RFC 9309, the Robots Exclusion Protocol) —
the crawl-policy half that the meta-robots pass cannot cover: ``<meta
name=robots>`` lives inside each page (webextract.robots_meta), while
robots.txt is a per-HOST policy file. Common Crawl WARCs carry the
robots.txt fetches alongside the pages, so a corpus build that claims to
honor opt-outs must parse them and drop pages whose URL matches a
Disallow rule for its agent — the RefinedWeb/C4-era convention.

Everything here is relational column work, deliberately: group selection,
longest-match precedence, and wildcard compilation are all window/
aggregate expressions, so a DuckDB oracle restates the full RFC semantics
(tests/test_robots.py) and at 100 TB the rules table is host-grain
bounded and broadcasts.

Reference analog: none (the reference ingests spans, not crawls); this
belongs to the driver-mandate training-data pipeline, composing with
``plans/curation.ingest_crawl``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..operators.weburl import _host_expr, normalize_host


def _pattern_regex(path: Column) -> Column:
    """Compile an RFC 9309 path pattern to an anchored Java/RE2 regex as a
    COLUMN expression (patterns are data): ``*`` → ``.*``, a trailing
    ``$`` anchors the end, every other metacharacter is escaped. Lives in
    the Java-regex ∩ RE2 subset so the oracle can apply the identical
    compiled pattern."""
    anchored = path.endswith("$")
    body = F.when(
        anchored, F.substring(path, 1, F.length(path) - 1)
    ).otherwise(path)
    esc = F.regexp_replace(body, r"([.^$+?(){}\[\]|\\])", r"\\$1")
    wild = F.regexp_replace(esc, r"\*", ".*")
    return F.concat(
        F.lit("^"), wild, F.when(anchored, F.lit("$")).otherwise(F.lit(""))
    )


def parse_robots(
    robots: DataFrame,
    agent: str,
    host_col: str = "host",
    body_col: str = "body",
) -> DataFrame:
    """Parse robots.txt bodies and resolve the rule group for ``agent``.

    RFC 9309 semantics, all relational:

    - lines split, comments stripped, fields case-insensitive;
    - consecutive ``User-agent`` lines open ONE group (a group's rules
      apply to every agent named above them);
    - the crawler obeys the most specific matching group per host:
      specificity = length of the matched product token (substring match,
      case-insensitive — the deployed convention), ``*`` = 0; groups
      tying on the winning token all contribute rules (RFC: groups for
      the same agent are combined);
    - empty Allow/Disallow values match nothing and are dropped.

    Returns the bounded per-agent rule table
    ``(host, path, allow, pattern)`` — ``pattern`` is the compiled
    anchored regex — ready to broadcast into :func:`robots_filter`.

    Scale shape: one explode over robots bodies (host-grain input, tiny
    next to the page corpus), two window passes partitioned by host, one
    aggregate per (host, group); output is rules-per-host bounded."""
    # Normalize the host key to the same canonical form robots_filter
    # derives from URLs — ONE shared definition (weburl.normalize_host),
    # so a rules table keyed by "Example.COM:8080" matches and the two
    # sides can never drift. Split bodies on \r?\n: CRLF-served
    # robots.txt is the common real-world case and F.trim strips only
    # ASCII spaces, so a bare "\n" split leaves a trailing \r in every
    # token.
    lines = robots.select(
        normalize_host(F.col(host_col)).alias("host"),
        F.posexplode(F.split(F.col(body_col), r"\r?\n")).alias("idx", "raw"),
    ).select(
        "host", "idx",
        F.trim(F.regexp_replace("raw", "#.*$", "")).alias("line"),
    )
    fields = lines.select(
        "host", "idx",
        F.lower(F.regexp_extract("line", r"^([A-Za-z-]+)\s*:", 1)).alias(
            "field"),
        F.trim(F.regexp_extract("line", r":\s*(.*)$", 1)).alias("value"),
    ).where(F.col("field") != "")
    w = Window.partitionBy("host").orderBy("idx")
    grouped = (
        fields.withColumn("_is_ua", F.col("field") == "user-agent")
        .withColumn(
            "_starts",
            F.col("_is_ua")
            & ~F.coalesce(F.lag("_is_ua").over(w), F.lit(False)),
        )
        .withColumn("group_id", F.sum(F.col("_starts").cast("int")).over(w))
        .where(F.col("group_id") > 0)
    )
    uas = grouped.where(F.col("_is_ua")).select(
        "host", "group_id", F.lower(F.col("value")).alias("ua")
    )
    # group specificity for THIS agent: longest matching token, * = 0
    agent_lc = agent.lower()
    spec = (
        uas.withColumn(
            "_spec",
            F.when(F.col("ua") == "*", F.lit(0)).when(
                F.lit(agent_lc).contains(F.col("ua")),
                F.length("ua"),
            ),
        )
        .groupBy("host", "group_id")
        .agg(F.max("_spec").alias("spec"))
        .where(F.col("spec").isNotNull())
    )
    best = spec.groupBy("host").agg(F.max("spec").alias("best_spec"))
    chosen = spec.join(best, "host").where(
        F.col("spec") == F.col("best_spec")
    ).select("host", "group_id")
    rules = (
        grouped.where(F.col("field").isin("allow", "disallow")
                      & (F.col("value") != ""))
        .join(chosen, ["host", "group_id"])
        .select(
            "host",
            F.col("value").alias("path"),
            (F.col("field") == "allow").alias("allow"),
        )
        .withColumn("pattern", _pattern_regex(F.col("path")))
    )
    return rules


def robots_filter(
    docs: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Drop docs whose URL is disallowed by the (agent-resolved) ``rules``
    table. RFC 9309 §2.2.2 precedence: among the rules whose pattern
    matches the URL's path, the LONGEST path wins; on a length tie,
    ``allow`` wins; a URL matching no rule is allowed.

    Scale shape: ENTIRELY map-side. The rules fold into one bounded
    (host → rules array) dim that broadcasts; the per-URL winner is an
    array filter + array_max over that row-local array — the doc frame
    (and its text payload) is NEVER shuffled or re-joined on a
    corpus-scale key (review find: the first form aggregated per-URL
    hits, a corpus-sized frame, and sort-merge-joined the payload back
    on url). Docs on hosts with no rules keep a NULL array and pass."""
    per_host = rules.groupBy("host").agg(
        F.collect_list(
            F.struct(
                F.length("path").alias("l"),
                F.col("allow").cast("int").alias("a"),
                F.col("pattern").alias("p"),
            )
        ).alias("_rules")
    ).withColumnRenamed("host", "_host")
    path = F.regexp_extract(
        F.col(url_col), r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]+(/.*)?$", 1
    )
    d = (
        docs.withColumn("_path", F.when(path == "", "/").otherwise(path))
        .withColumn("_host", _host_expr(url_col))
        .join(F.broadcast(per_host), "_host", "left")
    )
    win = F.array_max(
        F.expr(
            "transform(filter(_rules, r -> _path rlike r.p),"
            " r -> struct(r.l as l, r.a as a))"
        )
    )
    keep = (
        F.col("_rules").isNull()       # host without robots rules
        | win.isNull()                  # rules exist, none match this path
        | (win["a"] == 1)               # longest match is an Allow
    )
    return d.where(keep).drop("_rules", "_host", "_path")
