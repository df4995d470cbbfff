"""User-agent parsing — UserAgentSpanEnricher analog (SURVEY.md §2.4 E10,
enrichers/UserAgentSpanEnricher.java:27-68 + util/UserAgentParser.java).

The reference wraps the UAP library behind a Guava cache; here a
uap-core-shaped regex table covering the top ~55 families from the public
uap-core regexes.yaml (it's a data file, not a library — the patterns and
family precedence are re-stated, not imported) is applied VECTORIZED with
pandas ``.str.extract`` / ``.str.contains`` inside an Arrow-batched UDF
(never per-row Python). Rule order is precedence (first match wins),
mirroring uap-core semantics:

- named bots/crawlers outrank every browser family (bot UAs embed
  Chrome/Safari tokens), and the generic bot/crawler/spider fallback
  comes last;
- HTTP tools/SDKs (curl, okhttp, Go-http-client, ...) before browsers;
- Chromium-derivative and mobile variants outrank their base families
  (HeadlessChrome/Chromium/YaBrowser/Vivaldi/... before Chrome;
  Chrome Mobile WebView before Chrome Mobile iOS before Chrome Mobile
  before Chrome; FxiOS/Focus/Firefox Mobile before Firefox; Opera Mini
  before Opera; Mobile Safari before Safari);
- the device classifier follows UAP's family rules (Spider for bots,
  iPhone/iPad, Generic Smartphone for Android mobiles, Mac, Other for
  matched desktop agents).

Rules whose pattern has a capture group extract the version from it;
group-less patterns are versionless families (Yahoo! Slurp, PetalBot, ...).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# (family, type, regex) — order = precedence; 0 or 1 capture groups
UA_RULES: list[tuple[str, str, str]] = [
    # --- named bots / crawlers -------------------------------------------
    ("Googlebot-Image", "bot", r"Googlebot-Image/(\d+[\.\d]*)"),
    ("Googlebot", "bot", r"Googlebot/(\d+[\.\d]*)"),
    ("bingbot", "bot", r"bingbot/(\d+[\.\d]*)"),
    ("Yahoo! Slurp", "bot", r"Yahoo! Slurp"),
    ("DuckDuckBot", "bot", r"DuckDuckBot/(\d+[\.\d]*)"),
    ("Baiduspider", "bot", r"Baiduspider[/-]?(\d+[\.\d]*)"),
    ("YandexBot", "bot", r"YandexBot/(\d+[\.\d]*)"),
    ("Applebot", "bot", r"Applebot/(\d+[\.\d]*)"),
    ("facebookexternalhit", "bot", r"facebookexternalhit/(\d+[\.\d]*)"),
    ("Twitterbot", "bot", r"Twitterbot/(\d+[\.\d]*)"),
    ("LinkedInBot", "bot", r"LinkedInBot/(\d+[\.\d]*)"),
    ("Pinterestbot", "bot", r"Pinterest(?:bot)?/(\d+[\.\d]*)"),
    ("SemrushBot", "bot", r"SemrushBot/(\d+[\.\d]*)"),
    ("AhrefsBot", "bot", r"AhrefsBot/(\d+[\.\d]*)"),
    ("MJ12bot", "bot", r"MJ12bot/v?(\d+[\.\d]*)"),
    ("DotBot", "bot", r"DotBot/(\d+[\.\d]*)"),
    ("PetalBot", "bot", r"PetalBot"),
    ("Bytespider", "bot", r"Bytespider"),
    ("GPTBot", "bot", r"GPTBot/(\d+[\.\d]*)"),
    ("ClaudeBot", "bot", r"ClaudeBot/(\d+[\.\d]*)"),
    ("CCBot", "bot", r"CCBot/(\d+[\.\d]*)"),
    ("Amazonbot", "bot", r"Amazonbot/(\d+[\.\d]*)"),
    ("SeznamBot", "bot", r"SeznamBot/(\d+[\.\d]*)"),
    ("UptimeRobot", "bot", r"UptimeRobot/(\d+[\.\d]*)"),
    ("Discordbot", "bot", r"Discordbot/(\d+[\.\d]*)"),
    ("TelegramBot", "bot", r"TelegramBot"),
    ("WhatsApp", "bot", r"WhatsApp/(\d+[\.\d]*)"),
    ("Slackbot", "bot", r"Slackbot"),
    # --- HTTP tools / SDKs ------------------------------------------------
    ("curl", "tool", r"curl/(\d+[\.\d]*)"),
    ("Wget", "tool", r"[Ww]get/(\d+[\.\d]*)"),
    ("python-requests", "tool", r"python-requests/(\d+[\.\d]*)"),
    ("Python-urllib", "tool", r"Python-urllib/(\d+[\.\d]*)"),
    ("aiohttp", "tool", r"aiohttp/(\d+[\.\d]*)"),
    ("Scrapy", "tool", r"Scrapy/(\d+[\.\d]*)"),
    ("Go-http-client", "tool", r"Go-http-client/(\d+[\.\d]*)"),
    ("okhttp", "tool", r"okhttp/(\d+[\.\d]*)"),
    ("Apache-HttpClient", "tool", r"Apache-HttpClient/(\d+[\.\d]*)"),
    ("Java", "tool", r"^Java/(\d+[\.\d_]*)"),
    ("axios", "tool", r"axios/(\d+[\.\d]*)"),
    ("node-fetch", "tool", r"node-fetch/(\d+[\.\d]*)"),
    ("PostmanRuntime", "tool", r"PostmanRuntime/(\d+[\.\d]*)"),
    ("GuzzleHttp", "tool", r"GuzzleHttp/(\d+[\.\d]*)"),
    ("libwww-perl", "tool", r"libwww-perl/(\d+[\.\d]*)"),
    ("HTTPie", "tool", r"HTTPie/(\d+[\.\d]*)"),
    # --- app shells / mail clients ---------------------------------------
    ("Electron", "app", r"Electron/(\d+[\.\d]*)"),
    ("Thunderbird", "app", r"Thunderbird/(\d+[\.\d]*)"),
    # --- browsers: Chromium derivatives before Chrome ---------------------
    ("HeadlessChrome", "browser", r"HeadlessChrome/(\d+[\.\d]*)"),
    ("Yandex Browser", "browser", r"YaBrowser/(\d+[\.\d]*)"),
    ("Whale", "browser", r"Whale/(\d+[\.\d]*)"),
    ("Vivaldi", "browser", r"Vivaldi/(\d+[\.\d]*)"),
    ("Brave", "browser", r"Brave/(\d+[\.\d]*)"),
    ("UC Browser", "browser", r"UCBrowser/(\d+[\.\d]*)"),
    ("QQ Browser", "browser", r"QQBrowser/(\d+[\.\d]*)"),
    ("Maxthon", "browser", r"Maxthon[/ ](\d+[\.\d]*)"),
    ("Coc Coc", "browser", r"coc_coc_browser/(\d+[\.\d]*)"),
    ("Opera Mini", "browser", r"Opera Mini/(\d+[\.\d]*)"),
    ("Edge", "browser", r"Edg(?:e|A|iOS)?/(\d+[\.\d]*)"),
    ("Opera", "browser", r"OPR/(\d+[\.\d]*)"),
    ("Opera", "browser", r"Opera[/ ].*Version/(\d+[\.\d]*)"),
    ("Samsung Internet", "browser", r"SamsungBrowser/(\d+[\.\d]*)"),
    ("MiuiBrowser", "browser", r"MiuiBrowser/(\d+[\.\d]*)"),
    ("HuaweiBrowser", "browser", r"HuaweiBrowser/(\d+[\.\d]*)"),
    ("Amazon Silk", "browser", r"Silk/(\d+[\.\d]*)"),
    ("DuckDuckGo", "browser", r"Ddg/(\d+[\.\d]*)"),
    # Firefox variants before Firefox
    ("Firefox iOS", "browser", r"FxiOS/(\d+[\.\d]*)"),
    ("Firefox Focus", "browser", r"Focus/(\d+[\.\d]*)"),
    ("Waterfox", "browser", r"Waterfox/(\d+[\.\d]*)"),
    ("Pale Moon", "browser", r"PaleMoon/(\d+[\.\d]*)"),
    ("SeaMonkey", "browser", r"SeaMonkey/(\d+[\.\d]*)"),
    ("Firefox Mobile", "browser", r"Android.*Firefox/(\d+[\.\d]*)"),
    ("Firefox", "browser", r"Firefox/(\d+[\.\d]*)"),
    # Chrome variants (WebView's "; wv)" token precedes the Chrome token)
    ("Chrome Mobile WebView", "browser", r"; wv\).*Chrome/(\d+[\.\d]*)"),
    ("Chrome Mobile iOS", "browser", r"CriOS/(\d+[\.\d]*)"),
    ("Chromium", "browser", r"Chromium/(\d+[\.\d]*)"),
    ("Chrome Mobile", "browser", r"Chrome/(\d+[\.\d]*)[\.\d]* Mobile"),
    ("Chrome", "browser", r"Chrome/(\d+[\.\d]*)"),
    ("Mobile Safari", "browser", r"Version/(\d+[\.\d]*).*Mobile.*Safari"),
    ("Safari", "browser", r"Version/(\d+[\.\d]*).*Safari"),
    # legacy IE: IEMobile before MSIE; Trident token for IE 11
    ("IE Mobile", "browser", r"IEMobile/(\d+[\.\d]*)"),
    ("IE", "browser", r"MSIE (\d+[\.\d]*)"),
    ("IE", "browser", r"Trident/.*rv[: ](\d+[\.\d]*)"),
    ("Konqueror", "browser", r"Konqueror/(\d+[\.\d]*)"),
    ("Epiphany", "browser", r"Epiphany/(\d+[\.\d]*)"),
]

_COMPILED: list[tuple[str, str, "re.Pattern[str]"]] = [
    (fam, typ, re.compile(rx)) for fam, typ, rx in UA_RULES
]

# versionless fallback: anything self-describing as a bot/crawler/spider
# (uap-core's generic spider bucket)
GENERIC_BOT_RX = r"[Bb]ot\b|[Cc]rawler|[Ss]pider"

UA_OUT_SCHEMA = (
    "ua_family string, ua_type string, ua_version string, ua_os string, "
    "ua_device string"
)

_OS_RULES: list[tuple[str, str]] = [
    ("Windows Phone", r"Windows Phone"),
    ("Windows", r"Windows NT"),
    ("iOS", r"iPhone|iPad"),
    ("macOS", r"Mac OS X|Macintosh"),
    ("Chrome OS", r"CrOS"),
    ("Android", r"Android"),
    ("BlackBerry", r"BlackBerry|BB10"),
    ("Linux", r"Linux"),
]


def parse_user_agents(df: DataFrame, ua_col: str = "user_agent") -> DataFrame:
    """Append ua_family/ua_type/ua_version/ua_os/ua_device, Arrow-batched."""
    in_cols = df.columns
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema
    ) + ", " + UA_OUT_SCHEMA

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ua = pdf[ua_col].fillna("")
            n = len(pdf)
            family = pd.Series([None] * n, dtype="object")
            utype = pd.Series([None] * n, dtype="object")
            version = pd.Series([None] * n, dtype="object")
            remaining = pd.Series([True] * n)
            for fam, typ, rx in _COMPILED:
                if rx.groups:
                    got = ua.str.extract(rx, expand=False)
                    hit = remaining & got.notna()
                    version[hit] = got[hit]
                else:  # versionless family
                    hit = remaining & ua.str.contains(rx, regex=True, na=False)
                family[hit] = fam
                utype[hit] = typ
                remaining &= ~hit
            # generic versionless bots (uap-core spider bucket)
            bot_hit = remaining & ua.str.contains(GENERIC_BOT_RX, regex=True, na=False)
            family[bot_hit] = "Spider"
            utype[bot_hit] = "bot"
            remaining &= ~bot_hit

            os_name = pd.Series([None] * n, dtype="object")
            os_remaining = pd.Series([True] * n)
            for name, rx in _OS_RULES:
                hit = os_remaining & ua.str.contains(rx, regex=True, na=False)
                os_name[hit] = name
                os_remaining &= ~hit

            # device family, UAP precedence: bots are Spiders; Apple mobile
            # hardware by name; Android mobiles collapse to the generic
            # smartphone bucket; Macintosh desktops are Macs; any other
            # MATCHED agent is "Other"; unmatched agents stay null.
            device = pd.Series([None] * n, dtype="object")
            matched = family.notna()
            is_bot = utype == "bot"
            device[matched] = "Other"
            device[matched & ua.str.contains("Macintosh", na=False)] = "Mac"
            device[
                matched & ua.str.contains("Android", na=False)
                & ua.str.contains("Mobile", na=False)
            ] = "Generic Smartphone"
            device[matched & ua.str.contains("iPad", na=False)] = "iPad"
            device[matched & ua.str.contains("iPhone", na=False)] = "iPhone"
            device[is_bot] = "Spider"

            pdf = pdf.copy()
            pdf["ua_family"] = family
            pdf["ua_type"] = utype
            pdf["ua_version"] = version
            pdf["ua_os"] = os_name
            pdf["ua_device"] = device
            yield pdf[in_cols + ["ua_family", "ua_type", "ua_version", "ua_os", "ua_device"]]

    return df.mapInPandas(parse, schema=out_schema)
