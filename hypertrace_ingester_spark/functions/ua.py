"""User-agent parsing — UserAgentSpanEnricher analog (SURVEY.md §2.4 E10,
enrichers/UserAgentSpanEnricher.java:27-68 + util/UserAgentParser.java).

The reference wraps the UAP library behind a Guava cache; here a
uap-core-shaped regex table covering ~150 families from the public
uap-core regexes.yaml (it's a data file, not a library — the patterns and
family precedence are re-stated from public knowledge, not imported; the
sandbox has no network, so the remaining uap-core ultra-long tail falls
to the generic buckets) is applied VECTORIZED with
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
    # Google's non-web-search crawler fleet (each has its own product
    # token; the plain Googlebot rule above requires "Googlebot/" so these
    # never shadow it)
    ("AdsBot-Google-Mobile", "bot", r"AdsBot-Google-Mobile"),
    ("AdsBot-Google", "bot", r"AdsBot-Google"),
    ("Googlebot-News", "bot", r"Googlebot-News"),
    ("Googlebot-Video", "bot", r"Googlebot-Video/(\d+[\.\d]*)"),
    ("Storebot-Google", "bot", r"Storebot-Google/(\d+[\.\d]*)"),
    ("GoogleOther", "bot", r"GoogleOther"),
    ("APIs-Google", "bot", r"APIs-Google"),
    ("Mediapartners-Google", "bot", r"Mediapartners-Google"),
    ("FeedFetcher-Google", "bot", r"FeedFetcher-Google"),
    ("Google-Read-Aloud", "bot", r"Google-Read-Aloud"),
    ("Google Favicon", "bot", r"Google Favicon"),
    ("GoogleStackdriverMonitoring", "bot",
     r"GoogleStackdriverMonitoring-UptimeChecks"),
    # regional engines, SEO/archive fleet, link preview + monitoring
    ("Yeti", "bot", r"Yeti/(\d+[\.\d]*)"),
    ("Sogou web spider", "bot", r"Sogou web spider/(\d+[\.\d]*)"),
    ("Exabot", "bot", r"Exabot[/-](\d+[\.\d]*)"),
    ("Mail.RU_Bot", "bot", r"Mail\.RU_Bot/(\d+[\.\d]*)"),
    ("360Spider", "bot", r"360Spider"),
    ("BLEXBot", "bot", r"BLEXBot/(\d+[\.\d]*)"),
    ("DataForSeoBot", "bot", r"DataForSeoBot/(\d+[\.\d]*)"),
    ("MegaIndex", "bot", r"MegaIndex\.ru/(\d+[\.\d]*)"),
    ("Barkrowler", "bot", r"Barkrowler/(\d+[\.\d]*)"),
    ("serpstatbot", "bot", r"serpstatbot/(\d+[\.\d]*)"),
    ("ZoominfoBot", "bot", r"ZoominfoBot"),
    ("archive.org_bot", "bot", r"archive\.org_bot"),
    ("heritrix", "bot", r"heritrix/(\d+[\.\d]*)"),
    ("ia_archiver", "bot", r"ia_archiver"),
    ("Screaming Frog SEO Spider", "bot",
     r"Screaming Frog SEO Spider/(\d+[\.\d]*)"),
    ("rogerbot", "bot", r"rogerbot/(\d+[\.\d]*)"),
    ("SiteAuditBot", "bot", r"SiteAuditBot/(\d+[\.\d]*)"),
    ("W3C_Validator", "bot", r"W3C_Validator/(\d+[\.\d]*)"),
    ("Qwantify", "bot", r"Qwantify/(\d+[\.\d]*)"),
    ("redditbot", "bot", r"redditbot/(\d+[\.\d]*)"),
    ("SkypeUriPreview", "bot", r"SkypeUriPreview"),
    ("Embedly", "bot", r"Embedly"),
    ("vkShare", "bot", r"vkShare"),
    ("Pingdom", "bot", r"Pingdom\.com_bot_version_(\d+[\.\d]*)"),
    ("StatusCake", "bot", r"StatusCake"),
    ("Site24x7", "bot", r"Site24x7"),
    ("NewRelicPinger", "bot", r"NewRelicPinger/(\d+[\.\d]*)"),
    ("CensysInspect", "bot", r"CensysInspect/(\d+[\.\d]*)"),
    ("zgrab", "bot", r"zgrab/(\d+[\.\d]*)"),
    ("masscan", "bot", r"masscan/(\d+[\.\d]*)"),
    # AI-era crawlers (public UA strings)
    ("PerplexityBot", "bot", r"PerplexityBot/(\d+[\.\d]*)"),
    ("OAI-SearchBot", "bot", r"OAI-SearchBot/(\d+[\.\d]*)"),
    ("ChatGPT-User", "bot", r"ChatGPT-User/(\d+[\.\d]*)"),
    ("cohere-ai", "bot", r"cohere-ai"),
    ("Diffbot", "bot", r"Diffbot/(\d+[\.\d]*)"),
    ("ImagesiftBot", "bot", r"ImagesiftBot"),
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
    ("python-httpx", "tool", r"python-httpx/(\d+[\.\d]*)"),
    ("Java-http-client", "tool", r"Java-http-client/(\d+[\.\d]*)"),
    ("Jakarta Commons-HttpClient", "tool",
     r"Jakarta Commons-HttpClient/(\d+[\.\d]*)"),
    ("grpc-java", "tool", r"grpc-java[\w-]*/(\d+[\.\d]*)"),
    ("grpc-go", "tool", r"grpc-go/(\d+[\.\d]*)"),
    ("Dart", "tool", r"Dart/(\d+[\.\d]*)"),
    ("Deno", "tool", r"Deno/(\d+[\.\d]*)"),
    ("rest-client", "tool", r"rest-client/(\d+[\.\d]*)"),
    ("Faraday", "tool", r"Faraday v(\d+[\.\d]*)"),
    ("http.rb", "tool", r"http\.rb/(\d+[\.\d]*)"),
    ("Ruby", "tool", r"^Ruby\b"),
    ("PHP", "tool", r"^PHP/(\d+[\.\d]*)"),
    ("WordPress", "tool", r"WordPress/(\d+[\.\d]*)"),
    ("PowerShell", "tool", r"WindowsPowerShell/(\d+[\.\d]*)"),
    ("Insomnia", "tool", r"insomnia/(\d+[\.\d]*)"),
    ("aws-sdk-go", "tool", r"aws-sdk-go/(\d+[\.\d]*)"),
    ("aws-cli", "tool", r"aws-cli/(\d+[\.\d]*)"),
    ("Boto3", "tool", r"Boto3/(\d+[\.\d]*)"),
    ("git", "tool", r"^git/(\d+[\.\d]*)"),
    # --- app shells / in-app webviews / mail clients ---------------------
    # in-app browsers embed Chrome/Safari tokens, so the app section must
    # precede every browser rule (same reason bots precede browsers)
    ("Electron", "app", r"Electron/(\d+[\.\d]*)"),
    ("Thunderbird", "app", r"Thunderbird/(\d+[\.\d]*)"),
    ("Facebook", "app", r"FBAV/(\d+[\.\d]*)"),
    ("Instagram", "app", r"Instagram[ /](\d+[\.\d]*)"),
    ("WeChat", "app", r"MicroMessenger/(\d+[\.\d]*)"),
    ("Line", "app", r"\bLine/(\d+[\.\d]*)"),
    ("Snapchat", "app", r"Snapchat/(\d+[\.\d]*)"),
    ("Google Search App", "app", r"GSA/(\d+[\.\d]*)"),
    ("YandexSearch", "app", r"YandexSearch/(\d+[\.\d]*)"),
    ("baiduboxapp", "app", r"baiduboxapp/(\d+[\.\d]*)"),
    ("Outlook Mobile", "app", r"Outlook-(?:iOS|Android)/(\d+[\.\d]*)"),
    # --- browsers: Chromium derivatives before Chrome ---------------------
    ("HeadlessChrome", "browser", r"HeadlessChrome/(\d+[\.\d]*)"),
    ("Yandex Browser", "browser", r"YaBrowser/(\d+[\.\d]*)"),
    ("Whale", "browser", r"Whale/(\d+[\.\d]*)"),
    ("Vivaldi", "browser", r"Vivaldi/(\d+[\.\d]*)"),
    ("Brave", "browser", r"Brave/(\d+[\.\d]*)"),
    ("UC Browser", "browser", r"UCBrowser/(\d+[\.\d]*)"),
    # \b so the desktop rule never fires inside the mobile MQQBrowser token
    ("QQ Browser", "browser", r"\bQQBrowser/(\d+[\.\d]*)"),
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
    # Chinese/OEM Chromium shells (each carries its own product token
    # after the Chrome token, so they must precede the Chrome rules)
    ("QQ Browser Mobile", "browser", r"MQQBrowser/(\d+[\.\d]*)"),
    ("360 Secure Browser", "browser", r"\b360SE\b"),
    ("360 Enterprise Browser", "browser", r"\b360EE\b"),
    ("Sogou Explorer", "browser", r"MetaSr ?(\d+[\.\d]*)"),
    ("2345 Explorer", "browser", r"2345Explorer/(\d+[\.\d]*)"),
    ("Puffin", "browser", r"Puffin/(\d+[\.\d]*)"),
    ("Aloha Browser", "browser", r"AlohaBrowser/(\d+[\.\d]*)"),
    ("Mint Browser", "browser", r"Mint Browser/(\d+[\.\d]*)"),
    ("VivoBrowser", "browser", r"VivoBrowser/(\d+[\.\d]*)"),
    ("HeyTapBrowser", "browser", r"HeyTapBrowser/(\d+[\.\d]*)"),
    ("OppoBrowser", "browser", r"OppoBrowser/(\d+[\.\d]*)"),
    ("RealmeBrowser", "browser", r"RealmeBrowser/(\d+[\.\d]*)"),
    ("Quark", "browser", r"Quark/(\d+[\.\d]*)"),
    ("Oculus Browser", "browser", r"OculusBrowser/(\d+[\.\d]*)"),
    ("Ecosia", "browser", r"Ecosia (?:android|ios)@(\d+[\.\d]*)"),
    ("Iron", "browser", r"Iron/(\d+[\.\d]*)"),
    ("NokiaBrowser", "browser", r"NokiaBrowser/(\d+[\.\d]*)"),
    ("Nintendo Browser", "browser", r"NintendoBrowser/(\d+[\.\d]*)"),
    ("Sailfish Browser", "browser", r"SailfishBrowser/(\d+[\.\d]*)"),
    # Firefox variants before Firefox
    ("Firefox iOS", "browser", r"FxiOS/(\d+[\.\d]*)"),
    ("Firefox Focus", "browser", r"Focus/(\d+[\.\d]*)"),
    ("Waterfox", "browser", r"Waterfox/(\d+[\.\d]*)"),
    ("Pale Moon", "browser", r"PaleMoon/(\d+[\.\d]*)"),
    ("SeaMonkey", "browser", r"SeaMonkey/(\d+[\.\d]*)"),
    ("Iceweasel", "browser", r"Iceweasel/(\d+[\.\d]*)"),
    ("LibreWolf", "browser", r"LibreWolf/(\d+[\.\d]*)"),
    ("Basilisk", "browser", r"Basilisk/(\d+[\.\d]*)"),
    ("K-Meleon", "browser", r"K-Meleon/(\d+[\.\d]*)"),
    ("Firefox Mobile", "browser", r"Android.*Firefox/(\d+[\.\d]*)"),
    ("Firefox", "browser", r"Firefox/(\d+[\.\d]*)"),
    # Chrome variants (WebView's "; wv)" token precedes the Chrome token)
    ("Chrome Mobile WebView", "browser", r"; wv\).*Chrome/(\d+[\.\d]*)"),
    ("Chrome Mobile iOS", "browser", r"CriOS/(\d+[\.\d]*)"),
    ("Chromium", "browser", r"Chromium/(\d+[\.\d]*)"),
    ("QtWebEngine", "browser", r"QtWebEngine/(\d+[\.\d]*)"),
    ("Chrome Mobile", "browser", r"Chrome/(\d+[\.\d]*)[\.\d]* Mobile"),
    ("Chrome", "browser", r"Chrome/(\d+[\.\d]*)"),
    # legacy Android stock browser: Version + Mobile Safari and NO Chrome
    # token (every Chrome-bearing UA matched above)
    ("Android", "browser", r"Android.*Version/(\d+[\.\d]*).*Mobile Safari"),
    ("Mobile Safari", "browser", r"Version/(\d+[\.\d]*).*Mobile.*Safari"),
    ("Safari", "browser", r"Version/(\d+[\.\d]*).*Safari"),
    # legacy IE: IEMobile before MSIE; Trident token for IE 11
    ("IE Mobile", "browser", r"IEMobile/(\d+[\.\d]*)"),
    ("IE", "browser", r"MSIE (\d+[\.\d]*)"),
    ("IE", "browser", r"Trident/.*rv[: ](\d+[\.\d]*)"),
    ("Konqueror", "browser", r"Konqueror/(\d+[\.\d]*)"),
    ("Epiphany", "browser", r"Epiphany/(\d+[\.\d]*)"),
    # text-mode and niche engines
    ("Lynx", "browser", r"^Lynx/(\d+[\.\d]*)"),
    ("w3m", "browser", r"^w3m/(\d+[\.\d]*)"),
    ("ELinks", "browser", r"^ELinks[/ ](\d+[\.\d]*)"),
    ("Links", "browser", r"^Links \((\d+[\.\d]*)"),
    ("NetSurf", "browser", r"NetSurf/(\d+[\.\d]*)"),
    ("Midori", "browser", r"Midori/(\d+[\.\d]*)"),
    ("Falkon", "browser", r"Falkon/(\d+[\.\d]*)"),
    ("Otter", "browser", r"Otter/(\d+[\.\d]*)"),
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
    ("KaiOS", r"KaiOS"),
    ("Tizen", r"Tizen"),
    ("Android", r"Android"),
    ("BlackBerry", r"BlackBerry|BB10"),
    ("Symbian", r"SymbianOS|Symbian"),
    ("Sailfish", r"Sailfish"),
    ("FreeBSD", r"FreeBSD"),
    ("OpenBSD", r"OpenBSD"),
    ("NetBSD", r"NetBSD"),
    ("Ubuntu", r"Ubuntu"),
    ("Fedora", r"Fedora"),
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
            # each rule scans only the still-unmatched subset (first-match
            # precedence makes matched rows dead to later rules anyway);
            # with the round-5 long-tail table at ~150 rules this is the
            # difference between O(rules × batch) and O(rules × unmatched)
            # regex work per batch — most rows match in the first dozen
            # browser/bot rules
            for fam, typ, rx in _COMPILED:
                live = ua[remaining]
                if len(live) == 0:
                    break
                if rx.groups:
                    got = live.str.extract(rx, expand=False)
                    hit_idx = got.index[got.notna()]
                    version[hit_idx] = got[hit_idx]
                else:  # versionless family
                    mask = live.str.contains(rx, regex=True, na=False)
                    hit_idx = mask.index[mask]
                family[hit_idx] = fam
                utype[hit_idx] = typ
                remaining[hit_idx] = False
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
