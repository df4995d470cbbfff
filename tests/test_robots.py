"""robots.txt parsing + filtering (RFC 9309) — verified against a
pure-python reference implementation of the public spec (the BM25-style
oracle: exact agreement with an independent restatement of the rules),
plus pinned cases for every precedence subtlety."""

import re

import pandas as pd
import pytest

from hypertrace_ingester_spark.sources import robots as rb

AGENT = "MyCrawler/2.1"

BODIES = {
    # specific group beats *; consecutive UA lines share one group;
    # comments and unknown fields ignored; empty Disallow dropped
    "a.example.com": (
        "# policy\n"
        "User-agent: *\n"
        "Disallow: /\n"
        "\n"
        "User-agent: mycrawler\n"
        "User-agent: otherbot\n"
        "Crawl-delay: 5\n"
        "Disallow: /private/\n"
        "Allow: /private/ok/\n"
        "Disallow:\n"
    ),
    # wildcard and end-anchor patterns; tie between allow and disallow
    "b.example.com": (
        "User-agent: *\n"
        "Disallow: /*.pdf$\n"
        "Disallow: /tmp\n"
        "Allow: /tmp\n"          # same length as the disallow -> allow wins
        "Disallow: /a/*/deep\n"
    ),
    # only a non-matching group: nothing applies to our agent
    "c.example.com": (
        "User-agent: googlebot\n"
        "Disallow: /\n"
    ),
}

URLS = [
    "https://a.example.com/",
    "https://a.example.com/private/doc1",
    "https://a.example.com/private/ok/doc2",
    "https://a.example.com/public/doc3",
    "https://b.example.com/paper.pdf",
    "https://b.example.com/paper.pdf.html",   # $ anchor: NOT blocked
    "https://b.example.com/tmp/x",            # tie -> allow wins
    "https://b.example.com/a/b/deep/file",    # * wildcard blocks
    "https://b.example.com/a/deep",           # needs a middle segment: ok
    "https://c.example.com/anything",         # group doesn't match us
    "https://d.example.com/no/robots/at/all", # host without robots.txt
]


# --- pure-python RFC 9309 reference -----------------------------------------

def _py_rules(body: str, agent: str):
    groups, cur_uas, cur_rules, in_ua_run = [], [], [], False
    for raw in body.split("\n"):
        line = raw.split("#", 1)[0].strip()
        m = re.match(r"^([A-Za-z-]+)\s*:\s*(.*)$", line)
        if not m:
            continue
        field, value = m.group(1).lower(), m.group(2).strip()
        if field == "user-agent":
            if not in_ua_run:
                if cur_uas:
                    groups.append((cur_uas, cur_rules))
                cur_uas, cur_rules = [], []
            cur_uas.append(value.lower())
            in_ua_run = True
        else:
            in_ua_run = False
            if field in ("allow", "disallow") and value and cur_uas:
                cur_rules.append((value, field == "allow"))
    if cur_uas:
        groups.append((cur_uas, cur_rules))
    best, out = None, []
    for uas, rules in groups:
        specs = [0 if u == "*" else (len(u) if u in agent.lower() else None)
                 for u in uas]
        specs = [s for s in specs if s is not None]
        if not specs:
            continue
        s = max(specs)
        if best is None or s > best:
            best, out = s, list(rules)
        elif s == best:
            out.extend(rules)
    return out


def _py_pattern(path: str):
    anchored = path.endswith("$")
    body = path[:-1] if anchored else path
    esc = re.escape(body).replace(r"\*", ".*")
    return re.compile("^" + esc + ("$" if anchored else ""))


def _py_allowed(rules, path: str) -> bool:
    hits = [(len(p), allow) for p, allow in rules
            if _py_pattern(p).match(path)]
    if not hits:
        return True
    return max(hits)[1]


def _expected_survivors():
    out = []
    for url in URLS:
        host = url.split("//", 1)[1].split("/", 1)[0]
        path = "/" + (url.split("//", 1)[1].split("/", 1) + [""])[1]
        rules = _py_rules(BODIES[host], AGENT) if host in BODIES else []
        if _py_allowed(rules, path):
            out.append(url)
    return out


# --- tests -------------------------------------------------------------------

def _robots_df(spark):
    return spark.createDataFrame(
        [(h, b) for h, b in BODIES.items()], "host string, body string")


def test_parse_robots_matches_python_reference(spark):
    got = rb.parse_robots(_robots_df(spark), AGENT).toPandas()
    for host, body in BODIES.items():
        want = sorted(_py_rules(body, AGENT))
        have = sorted(
            (r["path"], bool(r["allow"]))
            for _, r in got[got["host"] == host].iterrows()
        )
        assert have == want, (host, have, want)
    # the specific group's rules, not the * group's, for a.example.com
    a_rules = set(got[got["host"] == "a.example.com"]["path"])
    assert a_rules == {"/private/", "/private/ok/"}
    # c.example.com's googlebot-only group contributes nothing for us
    assert (got["host"] == "c.example.com").sum() == 0


def test_robots_filter_matches_python_reference(spark):
    docs = spark.createDataFrame(
        [(i, u) for i, u in enumerate(URLS)], "doc_id long, url string")
    rules = rb.parse_robots(_robots_df(spark), AGENT)
    kept = sorted(
        r["url"] for r in rb.robots_filter(docs, rules).collect())
    assert kept == sorted(_expected_survivors())
    # pinned decisions the reference must produce
    assert "https://a.example.com/private/ok/doc2" in kept   # deeper allow
    assert "https://a.example.com/private/doc1" not in kept
    assert "https://a.example.com/public/doc3" in kept       # * group beaten
    assert "https://b.example.com/paper.pdf" not in kept     # $ anchor
    assert "https://b.example.com/paper.pdf.html" in kept
    assert "https://b.example.com/tmp/x" in kept             # tie -> allow
    assert "https://b.example.com/a/b/deep/file" not in kept # * wildcard
    assert "https://c.example.com/anything" in kept
    assert "https://d.example.com/no/robots/at/all" in kept  # no robots


def test_robots_filter_keeps_caller_columns_and_rows_once(spark):
    docs = spark.createDataFrame(
        [(1, "https://a.example.com/public/x", "en")],
        "doc_id long, url string, lang string")
    rules = rb.parse_robots(_robots_df(spark), AGENT)
    out = rb.robots_filter(docs, rules).collect()
    assert len(out) == 1
    assert out[0]["lang"] == "en" and out[0]["doc_id"] == 1


def test_robots_filter_plan_is_map_side(spark):
    """The payload-bearing doc frame must never shuffle: the rules fold
    into a broadcast host-grain dim and the winner is computed row-locally
    — no Exchange, no sort-merge join in the filter's plan."""
    docs = spark.createDataFrame(
        [(i, u) for i, u in enumerate(URLS)], "doc_id long, url string")
    rules = rb.parse_robots(_robots_df(spark), AGENT)
    plan = rb.robots_filter(docs, rules)._jdf.queryExecution() \
        .executedPlan().toString()
    # everything before the BroadcastExchange is the docs branch (the
    # rules-side derivation below it may shuffle its host-grain rows —
    # that frame is bounded); the payload branch must stay map-only
    head = plan.split("BroadcastExchange")[0]
    assert "BroadcastHashJoin" in head
    assert "SortMergeJoin" not in head
    assert "Exchange hashpartitioning" not in head


def test_parse_robots_crlf_and_unnormalized_host(spark):
    """CRLF-served bodies (the common real-world case) and rules tables
    keyed by mixed-case host:port values (review finds): a bare '\\n'
    split leaves a trailing '\\r' in every token, and an unnormalized host
    key silently matches no URL in robots_filter."""
    body_lf = BODIES["a.example.com"]
    body_crlf = body_lf.replace("\n", "\r\n")
    crlf = spark.createDataFrame(
        [("A.Example.COM:8080", body_crlf)], "host string, body string")
    got = rb.parse_robots(crlf, AGENT).toPandas()
    # host canonicalized to the URL-side form (_host_expr semantics)
    assert set(got["host"]) == {"a.example.com"}
    # identical rule set to the LF body under the canonical host
    lf = rb.parse_robots(_robots_df(spark), AGENT).toPandas()
    want = sorted(
        (r["path"], bool(r["allow"]))
        for _, r in lf[lf["host"] == "a.example.com"].iterrows())
    have = sorted((r["path"], bool(r["allow"])) for _, r in got.iterrows())
    assert have == want
    # and no token carries a stray \r
    assert not any("\r" in p for p in got["path"])
    # end-to-end: the CRLF-parsed rules actually enforce Disallow
    docs = spark.createDataFrame(
        [(1, "https://a.example.com/private/doc1"),
         (2, "https://a.example.com/public/doc3")],
        "doc_id long, url string")
    kept = sorted(r["url"] for r in rb.robots_filter(
        docs, rb.parse_robots(crlf, AGENT)).collect())
    assert kept == ["https://a.example.com/public/doc3"]
