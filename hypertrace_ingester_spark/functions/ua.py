"""User-agent parsing — UserAgentSpanEnricher analog (SURVEY.md §2.4 E10,
enrichers/UserAgentSpanEnricher.java:27-68 + util/UserAgentParser.java).

The reference wraps the UAP library behind a Guava cache; here a compact
regex table is applied VECTORIZED with pandas ``.str.extract`` inside an
Arrow-batched UDF (never per-row Python). The table covers the major
browser/bot families — extend ``UA_RULES`` for more; rule order is
precedence (first match wins), mirroring uap-core semantics.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# (family, type, regex-with-version-group) — order = precedence
UA_RULES: list[tuple[str, str, str]] = [
    ("Googlebot", "bot", r"Googlebot/(\d+[\.\d]*)"),
    ("Edge", "browser", r"Edg(?:e|A|iOS)?/(\d+[\.\d]*)"),
    ("Opera", "browser", r"OPR/(\d+[\.\d]*)"),
    ("Chrome", "browser", r"Chrome/(\d+[\.\d]*)"),
    ("Firefox", "browser", r"Firefox/(\d+[\.\d]*)"),
    ("Safari", "browser", r"Version/(\d+[\.\d]*).*Safari"),
    ("curl", "tool", r"curl/(\d+[\.\d]*)"),
    ("python-requests", "tool", r"python-requests/(\d+[\.\d]*)"),
]

UA_OUT_SCHEMA = "ua_family string, ua_type string, ua_version string, ua_os string"

_OS_RULES: list[tuple[str, str]] = [
    ("Windows", r"Windows NT"),
    ("iOS", r"iPhone|iPad"),
    ("macOS", r"Mac OS X"),
    ("Android", r"Android"),
    ("Linux", r"Linux"),
]


def parse_user_agents(df: DataFrame, ua_col: str = "user_agent") -> DataFrame:
    """Append ua_family/ua_type/ua_version/ua_os, Arrow-batched."""
    in_cols = df.columns
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema
    ) + ", " + UA_OUT_SCHEMA

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ua = pdf[ua_col].fillna("")
            family = pd.Series([None] * len(pdf), dtype="object")
            utype = pd.Series([None] * len(pdf), dtype="object")
            version = pd.Series([None] * len(pdf), dtype="object")
            remaining = pd.Series([True] * len(pdf))
            for fam, typ, rx in UA_RULES:
                got = ua.str.extract(rx, expand=False)
                hit = remaining & got.notna()
                family[hit] = fam
                utype[hit] = typ
                version[hit] = got[hit]
                remaining &= ~hit
            os_name = pd.Series([None] * len(pdf), dtype="object")
            os_remaining = pd.Series([True] * len(pdf))
            for name, rx in _OS_RULES:
                hit = os_remaining & ua.str.contains(rx, regex=True, na=False)
                os_name[hit] = name
                os_remaining &= ~hit
            pdf = pdf.copy()
            pdf["ua_family"] = family
            pdf["ua_type"] = utype
            pdf["ua_version"] = version
            pdf["ua_os"] = os_name
            yield pdf[in_cols + ["ua_family", "ua_type", "ua_version", "ua_os"]]

    return df.mapInPandas(parse, schema=out_schema)
