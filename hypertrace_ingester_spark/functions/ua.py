"""User-agent parsing — UserAgentSpanEnricher analog (SURVEY.md §2.4 E10,
enrichers/UserAgentSpanEnricher.java:27-68 + util/UserAgentParser.java).

The reference wraps the UAP library behind a Guava cache; here a compact
uap-core-shaped regex table is applied VECTORIZED with pandas
``.str.extract`` inside an Arrow-batched UDF (never per-row Python). Rule
order is precedence (first match wins), mirroring uap-core semantics:
mobile browser variants (Chrome Mobile, Mobile Safari, Samsung Internet)
outrank their desktop families, named bots outrank the generic
bot/crawler/spider fallback, and the device classifier follows UAP's
family rules (Spider for bots, iPhone/iPad, Generic Smartphone for Android
mobiles, Mac, Other for matched desktop agents).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# (family, type, regex-with-version-group) — order = precedence
UA_RULES: list[tuple[str, str, str]] = [
    ("Googlebot", "bot", r"Googlebot/(\d+[\.\d]*)"),
    ("bingbot", "bot", r"bingbot/(\d+[\.\d]*)"),
    ("AhrefsBot", "bot", r"AhrefsBot/(\d+[\.\d]*)"),
    ("Edge", "browser", r"Edg(?:e|A|iOS)?/(\d+[\.\d]*)"),
    ("Opera", "browser", r"OPR/(\d+[\.\d]*)"),
    ("Samsung Internet", "browser", r"SamsungBrowser/(\d+[\.\d]*)"),
    ("Chrome Mobile", "browser", r"Chrome/(\d+[\.\d]*)[\.\d]* Mobile"),
    ("Chrome", "browser", r"Chrome/(\d+[\.\d]*)"),
    ("Firefox", "browser", r"Firefox/(\d+[\.\d]*)"),
    ("Mobile Safari", "browser", r"Version/(\d+[\.\d]*).*Mobile.*Safari"),
    ("Safari", "browser", r"Version/(\d+[\.\d]*).*Safari"),
    ("curl", "tool", r"curl/(\d+[\.\d]*)"),
    ("python-requests", "tool", r"python-requests/(\d+[\.\d]*)"),
]

# versionless fallback: anything self-describing as a bot/crawler/spider
# (uap-core's generic spider bucket)
GENERIC_BOT_RX = r"[Bb]ot\b|[Cc]rawler|[Ss]pider"

UA_OUT_SCHEMA = (
    "ua_family string, ua_type string, ua_version string, ua_os string, "
    "ua_device string"
)

_OS_RULES: list[tuple[str, str]] = [
    ("Windows", r"Windows NT"),
    ("iOS", r"iPhone|iPad"),
    ("macOS", r"Mac OS X|Macintosh"),
    ("Android", r"Android"),
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
            for fam, typ, rx in UA_RULES:
                got = ua.str.extract(rx, expand=False)
                hit = remaining & got.notna()
                family[hit] = fam
                utype[hit] = typ
                version[hit] = got[hit]
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
