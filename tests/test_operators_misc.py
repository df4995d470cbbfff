"""Unit tests for the smaller operator analogs: tag normalization (P3),
tag allowlist filter (P4), rate limiting (P7), UA parsing (E10), sink
bootstrap DDL (S5)."""

import pytest
from pyspark.sql import functions as F

from hypertrace_ingester_spark.functions.ua import parse_user_agents
from hypertrace_ingester_spark.operators import parse as parse_ops
from hypertrace_ingester_spark.sources.sinks import create_sink_tables


@pytest.fixture()
def tagged(spark):
    return spark.createDataFrame(
        [
            (1, {"Http.Method": "GET", "x-secret": "1", "grpc.code": "0"}),
            (2, {"HTTP.METHOD": "POST", "keep.me": "y"}),
        ],
        "id int, attributes map<string,string>",
    )


def test_normalize_tags_lowercases_keys(spark, tagged):
    out = parse_ops.normalize_tags(tagged).collect()
    for row in out:
        assert all(k == k.lower() for k in row["attributes"])
    assert out[0]["attributes"]["http.method"] == "GET"


def test_filter_tags_allowlist(spark, tagged):
    out = parse_ops.filter_tags(
        parse_ops.normalize_tags(tagged),
        allowed_prefixes=["x-", "grpc."],
        allowlist=["grpc.code"],
    ).collect()
    m = {r["id"]: r["attributes"] for r in out}
    assert "x-secret" not in m[1]          # prefix-matched, not allowlisted
    assert m[1]["grpc.code"] == "0"        # prefix-matched but allowlisted
    assert m[1]["http.method"] == "GET"    # no prefix match → kept
    assert m[2] == {"http.method": "POST", "keep.me": "y"}


def test_rate_limit_per_key(spark):
    df = spark.createDataFrame(
        [(t, i) for t in ("a", "b") for i in range(10)], "tenant string, seq int"
    )
    out = parse_ops.rate_limit_per_key(df, ["tenant"], ["seq"], limit=3)
    got = {r["tenant"]: sorted(x["seq"] for x in out.collect() if x["tenant"] == r["tenant"])
           for r in out.collect()}
    assert got == {"a": [0, 1, 2], "b": [0, 1, 2]}


def test_parse_user_agents(spark):
    df = spark.createDataFrame(
        [
            (1, "Mozilla/5.0 (Windows NT 10.0) AppleWebKit/537.36 Chrome/120.0.0.0 Safari/537.36"),
            (2, "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15) Gecko/20100101 Firefox/115.0"),
            (3, "curl/8.4.0"),
            (4, "Googlebot/2.1 (+http://www.google.com/bot.html)"),
            (5, None),
        ],
        "id int, user_agent string",
    )
    out = {r["id"]: r for r in parse_user_agents(df).collect()}
    assert (out[1]["ua_family"], out[1]["ua_type"], out[1]["ua_os"]) == ("Chrome", "browser", "Windows")
    assert out[1]["ua_version"].startswith("120")
    assert (out[2]["ua_family"], out[2]["ua_os"]) == ("Firefox", "macOS")
    assert out[3]["ua_type"] == "tool"
    assert out[4]["ua_type"] == "bot"
    assert out[5]["ua_family"] is None


def test_parse_user_agents_mobile_and_bots(spark):
    """E10 device/bot fidelity (UserAgentSpanEnricherTest shape): mobile
    browser variants outrank desktop families, named bots and the generic
    spider bucket classify with UAP device families."""
    df = spark.createDataFrame(
        [
            (1, "Mozilla/5.0 (Linux; Android 13; SM-G991B) AppleWebKit/537.36 "
                "Chrome/116.0.0.0 Mobile Safari/537.36"),
            (2, "Mozilla/5.0 (iPhone; CPU iPhone OS 16_6 like Mac OS X) "
                "AppleWebKit/605.1.15 Version/16.6 Mobile/15E148 Safari/604.1"),
            (3, "Mozilla/5.0 (iPad; CPU OS 16_6 like Mac OS X) AppleWebKit/605.1.15 "
                "Version/16.6 Mobile/15E148 Safari/604.1"),
            (4, "Mozilla/5.0 (compatible; bingbot/2.0; +http://www.bing.com/bingbot.htm)"),
            (5, "SomethingNew-Crawler (contact@example.com)"),
            (6, "Mozilla/5.0 (Linux; Android 13) SamsungBrowser/21.0 Chrome/110.0 Safari"),
        ],
        "id int, user_agent string",
    )
    out = {r["id"]: r for r in parse_user_agents(df).collect()}
    assert (out[1]["ua_family"], out[1]["ua_os"], out[1]["ua_device"]) == (
        "Chrome Mobile", "Android", "Generic Smartphone")
    assert (out[2]["ua_family"], out[2]["ua_os"], out[2]["ua_device"]) == (
        "Mobile Safari", "iOS", "iPhone")
    assert out[3]["ua_device"] == "iPad"
    assert (out[4]["ua_family"], out[4]["ua_type"], out[4]["ua_device"]) == (
        "bingbot", "bot", "Spider")
    assert (out[5]["ua_family"], out[5]["ua_type"], out[5]["ua_device"]) == (
        "Spider", "bot", "Spider")
    assert out[5]["ua_version"] is None
    assert out[6]["ua_family"] == "Samsung Internet"  # outranks Chrome


def test_parse_user_agents_long_tail(spark):
    """E10 long-tail families (round-4 VERDICT #8): real-world agents from
    the uap-core top-family set — Chromium derivatives, iOS browser shells,
    webviews, legacy IE, SDK tools, and named crawlers — each must hit its
    specific family, never the generic Chrome/Safari/Spider buckets
    (UserAgentSpanEnricherTest shapes)."""
    cases = [
        # (ua, family, type, version-prefix, os, device)
        ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
         "Chrome/108.0.0.0 Safari/537.36 OPR/94.0.0.0",
         "Opera", "browser", "94", "Windows", "Other"),
        ("Mozilla/5.0 (iPhone; CPU iPhone OS 16_6 like Mac OS X) AppleWebKit/605.1.15 "
         "CriOS/116.0.5845.103 Mobile/15E148 Safari/604.1",
         "Chrome Mobile iOS", "browser", "116", "iOS", "iPhone"),
        ("Mozilla/5.0 (iPhone; CPU iPhone OS 16_6 like Mac OS X) AppleWebKit/605.1.15 "
         "FxiOS/116.2 Mobile/15E148 Safari/605.1.15",
         "Firefox iOS", "browser", "116", "iOS", "iPhone"),
        ("Mozilla/5.0 (Linux; Android 13; SM-A515F; wv) AppleWebKit/537.36 "
         "Chrome/116.0.0.0 Mobile Safari/537.36",
         "Chrome Mobile WebView", "browser", "116", "Android", "Generic Smartphone"),
        ("Mozilla/5.0 (Android 13; Mobile; rv:109.0) Gecko/116.0 Firefox/116.0",
         "Firefox Mobile", "browser", "116", "Android", "Generic Smartphone"),
        ("Mozilla/5.0 (Windows NT 6.1; WOW64; Trident/7.0; rv:11.0) like Gecko",
         "IE", "browser", "11", "Windows", "Other"),
        ("Mozilla/4.0 (compatible; MSIE 8.0; Windows NT 6.1)",
         "IE", "browser", "8", "Windows", "Other"),
        ("Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 HeadlessChrome/118.0.5993.88 "
         "Safari/537.36",
         "HeadlessChrome", "browser", "118", "Linux", "Other"),
        ("Mozilla/5.0 (Windows NT 10.0) AppleWebKit/537.36 Chrome/116.0.0.0 "
         "Safari/537.36 YaBrowser/23.9.1.962 Yowser/2.5",
         "Yandex Browser", "browser", "23", "Windows", "Other"),
        ("Mozilla/5.0 (Linux; U; Android 12; en-US; RMX3085) AppleWebKit/537.36 "
         "Chrome/100.0.4896.58 UCBrowser/15.5.5.1312 Mobile Safari/537.36",
         "UC Browser", "browser", "15", "Android", "Generic Smartphone"),
        ("Mozilla/5.0 (Linux; Android 11; KFTRWI) AppleWebKit/537.36 "
         "Chrome/116.0.0.0 Safari/537.36 Silk/116.3.7 like Chrome",
         "Amazon Silk", "browser", "116", "Android", "Other"),
        ("okhttp/4.11.0", "okhttp", "tool", "4.11", None, "Other"),
        ("Go-http-client/2.0", "Go-http-client", "tool", "2", None, "Other"),
        ("Java/1.8.0_292", "Java", "tool", "1.8", None, "Other"),
        ("Mozilla/5.0 (compatible; YandexBot/3.0; +http://yandex.com/bots)",
         "YandexBot", "bot", "3", None, "Spider"),
        ("Mozilla/5.0 (compatible; SemrushBot/7~bl; +http://www.semrush.com/bot.html)",
         "SemrushBot", "bot", "7", None, "Spider"),
        ("facebookexternalhit/1.1 (+http://www.facebook.com/externalhit_uatext.php)",
         "facebookexternalhit", "bot", "1.1", None, "Spider"),
        ("Mozilla/5.0 (compatible; GPTBot/1.0; +https://openai.com/gptbot)",
         "GPTBot", "bot", "1", None, "Spider"),
        ("Mozilla/5.0 (compatible; Applebot/1.0; "
         "+http://www.apple.com/go/applebot)",
         "Applebot", "bot", "1", None, "Spider"),
        ("Mozilla/5.0 (compatible; PetalBot;+https://webmaster.petalsearch.com/site/petalbot)",
         "PetalBot", "bot", None, None, "Spider"),
        ("Slackbot-LinkExpanding 1.0 (+https://api.slack.com/robots)",
         "Slackbot", "bot", None, None, "Spider"),
        ("Mozilla/5.0 (Linux; Android 13; 2211133G) AppleWebKit/537.36 "
         "Chrome/112.0.0.0 Mobile Safari/537.36 XiaoMi/MiuiBrowser/13.29.0-gn",
         "MiuiBrowser", "browser", "13.29", "Android", "Generic Smartphone"),
        ("Mozilla/5.0 (X11; CrOS x86_64 14541.0.0) AppleWebKit/537.36 "
         "Chrome/116.0.0.0 Safari/537.36",
         "Chrome", "browser", "116", "Chrome OS", "Other"),
        # --- round-5 long-tail additions (VERDICT #4): regional crawlers,
        # AI-era bots, SDK tools, in-app webviews, OEM shells, legacy stock
        ("Mozilla/5.0 (compatible; Yeti/1.1; +http://naver.me/spd)",
         "Yeti", "bot", "1.1", None, "Spider"),
        ("Sogou web spider/4.0(+http://www.sogou.com/docs/help/"
         "webmasters.htm#07)",
         "Sogou web spider", "bot", "4", None, "Spider"),
        ("Mozilla/5.0 (compatible; PerplexityBot/1.0; "
         "+https://perplexity.ai/perplexitybot)",
         "PerplexityBot", "bot", "1", None, "Spider"),
        ("Mozilla/5.0 AppleWebKit/537.36 (compatible; OAI-SearchBot/1.0; "
         "+https://openai.com/searchbot)",
         "OAI-SearchBot", "bot", "1", None, "Spider"),
        ("Mozilla/5.0 (compatible; heritrix/3.4.0 +http://archive.org)",
         "heritrix", "bot", "3.4", None, "Spider"),
        ("Screaming Frog SEO Spider/19.4",
         "Screaming Frog SEO Spider", "bot", "19.4", None, "Spider"),
        ("Pingdom.com_bot_version_1.4_(http://www.pingdom.com/)",
         "Pingdom", "bot", "1.4", None, "Spider"),
        ("GoogleOther", "GoogleOther", "bot", None, None, "Spider"),
        ("grpc-java-netty/1.45.0", "grpc-java", "tool", "1.45", None, "Other"),
        ("Dart/3.2 (dart:io)", "Dart", "tool", "3.2", None, "Other"),
        ("python-httpx/0.27.0", "python-httpx", "tool", "0.27", None, "Other"),
        ("aws-cli/2.13.5 Python/3.11.4 Linux/5.15",
         "aws-cli", "tool", "2.13", "Linux", "Other"),
        ("Mozilla/5.0 (iPhone; CPU iPhone OS 16_6 like Mac OS X) "
         "AppleWebKit/605.1.15 [FBAN/FBIOS;FBAV/430.0.0.30.107;FBBV/0]",
         "Facebook", "app", "430", "iOS", "iPhone"),
        ("Mozilla/5.0 (Linux; Android 13; Pixel 7) AppleWebKit/537.36 "
         "Chrome/116.0.0.0 Mobile Safari/537.36 Instagram 295.0.0.32.119 "
         "Android", "Instagram", "app", "295", "Android",
         "Generic Smartphone"),
        ("Mozilla/5.0 (Linux; Android 12; V2171A) AppleWebKit/537.36 "
         "Chrome/116.0.0.0 Mobile Safari/537.36 MicroMessenger/8.0.42",
         "WeChat", "app", "8.0", "Android", "Generic Smartphone"),
        ("Mozilla/5.0 (Linux; U; Android 12; zh-cn; M2012K11AC) "
         "AppleWebKit/537.36 MQQBrowser/13.4 Mobile Safari/537.36",
         "QQ Browser Mobile", "browser", "13.4", "Android",
         "Generic Smartphone"),
        ("Mozilla/5.0 (Linux; U; Android 4.0.3; en-us; GT-I9100) "
         "AppleWebKit/534.30 (KHTML, like Gecko) Version/4.0 Mobile "
         "Safari/534.30",
         "Android", "browser", "4", "Android", "Generic Smartphone"),
        ("Lynx/2.8.9rel.1 libwww-FM/2.14 SSL-MM/1.4.1",
         "Lynx", "browser", "2.8", None, "Other"),
        ("Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 "
         "QtWebEngine/5.15.3 Chrome/87.0.4280.144 Safari/537.36",
         "QtWebEngine", "browser", "5.15", "Linux", "Other"),
        ("Mozilla/5.0 (X11; Ubuntu; Linux x86_64; rv:109.0) Gecko/20100101 "
         "Firefox/115.0",
         "Firefox", "browser", "115", "Ubuntu", "Other"),
    ]
    df = spark.createDataFrame(
        [(i, ua) for i, (ua, *_rest) in enumerate(cases)], "id int, user_agent string"
    )
    out = {r["id"]: r for r in parse_user_agents(df).collect()}
    for i, (ua, fam, typ, ver, os_name, device) in enumerate(cases):
        r = out[i]
        assert r["ua_family"] == fam, f"{ua!r}: family {r['ua_family']} != {fam}"
        assert r["ua_type"] == typ, f"{ua!r}: type {r['ua_type']} != {typ}"
        if ver is None:
            assert r["ua_version"] is None, f"{ua!r}: version {r['ua_version']}"
        else:
            assert r["ua_version"].startswith(ver), f"{ua!r}: version {r['ua_version']}"
        assert r["ua_os"] == os_name, f"{ua!r}: os {r['ua_os']} != {os_name}"
        assert r["ua_device"] == device, f"{ua!r}: device {r['ua_device']} != {device}"


def test_create_sink_tables(spark, sequences, tmp_path):
    from hypertrace_ingester_spark.plans.pipeline import PipelineConfig, run_pipeline

    out = str(tmp_path / "ddl")
    run_pipeline(spark, sequences.limit(500), PipelineConfig(out_dir=out))
    routed = spark.read.parquet(out + "/routed")
    tables = create_sink_tables(spark, routed, out, ["sink-0", "sink-1", "sink-2"])
    total = 0
    for t in tables:
        total += spark.table(t).count()
    assert total == routed.count()


def test_value_coercion_mirrors_reference_cases(spark):
    """P14 — functions/coerce.py vs the reference's ValueCoercerTest
    (trace-reader/.../ValueCoercerTest.java:15-52): bool parses only
    true/false (any case), int64 is strict-integral, double accepts
    decimals, timestamp takes epoch-millis first then ISO-8601, junk
    coerces to null."""
    from pyspark.sql import functions as F

    from hypertrace_ingester_spark.functions import coerce as co

    df = spark.createDataFrame(
        [("some string", "true", "FALSE", "dummy", "42", "42.3",
          "1604339469114", "2020-11-02T17:51:09.114Z", "???")],
        "s string, b1 string, b2 string, junk string, i string, d string, "
        "ep string, iso string, badts string",
    )
    row = df.select(
        co.coerce(F.col("s"), "TYPE_STRING").alias("s"),
        co.coerce(F.col("b1"), "TYPE_BOOL").alias("b_true"),
        co.coerce(F.col("b2"), "TYPE_BOOL").alias("b_false"),
        co.coerce(F.col("junk"), "TYPE_BOOL").alias("b_junk"),
        co.coerce(F.col("i"), "TYPE_INT64").alias("i_ok"),
        co.coerce(F.col("junk"), "TYPE_INT64").alias("i_junk"),
        co.coerce(F.col("d"), "TYPE_INT64").alias("i_decimal"),
        co.coerce(F.col("i"), "TYPE_DOUBLE").alias("d_int"),
        co.coerce(F.col("d"), "TYPE_DOUBLE").alias("d_ok"),
        co.coerce(F.col("junk"), "TYPE_DOUBLE").alias("d_junk"),
        co.coerce(F.col("ep"), "TYPE_TIMESTAMP").alias("ts_epoch"),
        co.coerce(F.col("iso"), "TYPE_TIMESTAMP").alias("ts_iso"),
        co.coerce(F.col("badts"), "TYPE_TIMESTAMP").alias("ts_junk"),
    ).first()
    assert row["s"] == "some string"
    assert row["b_true"] is True and row["b_false"] is False
    assert row["b_junk"] is None
    assert row["i_ok"] == 42 and row["i_junk"] is None
    assert row["i_decimal"] is None  # Long.valueOf rejects decimals
    assert row["d_int"] == 42.0 and row["d_ok"] == 42.3
    assert row["d_junk"] is None
    assert row["ts_epoch"] == 1604339469114
    assert row["ts_iso"] == 1604339469114  # same instant via ISO-8601
    assert row["ts_junk"] is None


def test_parse_mem_mb_units():
    """Round-3 ADVICE: non-plain-gigabyte driver-mem strings must resolve to
    the same byte count for -Xms and spark.driver.memory (not fall back to a
    guessed 8g), and junk must raise instead of silently unpinning Xms."""
    import pytest

    from hypertrace_ingester_spark.session import _parse_mem_mb

    assert _parse_mem_mb("16g") == 16 * 1024
    assert _parse_mem_mb("16384m") == 16 * 1024
    assert _parse_mem_mb("512m") == 512
    assert _parse_mem_mb("512MB") == 512
    assert _parse_mem_mb("2097152k") == 2048
    # suffix-less = MiB, matching Spark's JavaUtils for *.memory confs
    assert _parse_mem_mb("4096") == 4096
    with pytest.raises(ValueError):
        _parse_mem_mb("lots")
    with pytest.raises(ValueError):
        _parse_mem_mb("512kb")  # below 1 MB


def test_driver_java_opts_follow_caller_memory_override():
    """Round-4 fix: a caller's extra_conf spark.driver.memory override must
    drive the -Xms/-Xmn pin — the env-default 16g pin with a caller's 8g
    Xmx refused to start the local-cluster scaling-bench JVM ('Initial heap
    size set to a larger value than the maximum heap size')."""
    from hypertrace_ingester_spark.session import _driver_java_opts

    opts = _driver_java_opts("8g")
    assert "-Xms8192m" in opts and "-Xmn2730m" in opts
    assert "-Xms16384m" in _driver_java_opts("16g")


def test_parse_user_agents_fuzz_invariants(spark):
    """The 85-rule UA table must never throw and must keep its structural
    invariants on adversarial input: family and type are always set
    together; a version implies a family; bots always classify device
    Spider; unmatched agents stay fully null (except the generic device
    rule requires a match)."""
    import random

    rng = random.Random(42)
    alphabet = "Chrome/Safari Mozilla();_5.0 \té中=bot Bot/12.3.4 ...%s$^[](){}|\\*+?"
    cases = ["", " ", "/", "Chrome/", "Bot", "bot", "a" * 5000]
    cases += ["".join(rng.choice(alphabet) for _ in range(rng.randint(1, 120)))
              for _ in range(250)]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "id int, user_agent string"
    )
    rows = parse_user_agents(df).collect()
    assert len(rows) == len(cases)
    for r in rows:
        assert (r["ua_family"] is None) == (r["ua_type"] is None)
        if r["ua_version"] is not None:
            assert r["ua_family"] is not None
        if r["ua_type"] == "bot":
            assert r["ua_device"] == "Spider"
        if r["ua_family"] is None:
            assert r["ua_device"] is None
