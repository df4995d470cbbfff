"""PARSE stage — span-normalizer analog (SURVEY.md §2.2, P1-P17).

The reference's record-at-a-time Transformers (JaegerSpanPreProcessor.java:66-128,
EventBuilder.java:30-118, SpanFilter.java:123-155) become declarative column
expressions compiled once on the driver; Catalyst constant-folds and
whole-stage-codegens them, and predicate pushdown moves the drop filters into
the scan. Field extraction uses JVM-side ``regexp_extract`` (the fast path); a
pandas-UDF grok variant is provided for patterns that need Python regex
features — both vectorized, never per-row Python (input_hint).
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Grok-style field extraction (P9/P10 analogs)
# ---------------------------------------------------------------------------

# Each field: (name, regex-with-one-group, cast). The synthetic source_line
# format is FIXTURES.md F1. Mirrors the first-matching-key / priority-list
# extraction of fieldgenerators/FirstMatchingKeyFinder.java:11-44 and the
# HTTP field extraction of fieldgenerators/HttpFieldsGenerator.java:120-636.
DEFAULT_GROK_FIELDS: list[tuple[str, str, str | None]] = [
    ("ts_ms", r"ts=(\d+)", "long"),
    ("tenant_raw", r"tenant=(\S*)", None),
    ("operation", r"op=(\S+)", None),
    ("status_code", r"status=(\d+)", None),
    ("url", r"url=(\S+)", None),
    ("bypass_raw", r"bypass=(\w+)", None),
]


def grok_extract(df: DataFrame, line_col: str = "source_line",
                 fields: list[tuple[str, str, str | None]] | None = None) -> DataFrame:
    """Vectorized regex extraction via native ``regexp_extract`` (codegen'd)."""
    for name, pattern, cast in fields or DEFAULT_GROK_FIELDS:
        col = F.regexp_extract(F.col(line_col), pattern, 1)
        col = F.when(col == "", None).otherwise(col)
        if cast:
            col = col.cast(cast)
        df = df.withColumn(name, col)
    return df


def grok_extract_pandas(df: DataFrame, line_col: str = "source_line",
                        fields: list[tuple[str, str, str | None]] | None = None) -> DataFrame:
    """Arrow-batched pandas-UDF grok path (for Python-only regex features).

    Semantically identical to :func:`grok_extract`; used where patterns need
    lookbehind/named-group features Java regex lacks. Batched `.str.extract`
    — never per-row Python (north_rule / input_hint requirement).
    """
    fields = fields or DEFAULT_GROK_FIELDS
    out_schema = ", ".join(
        [*(f"`{c}` {t}" for c, t in zip(df.columns, (f.dataType.simpleString() for f in df.schema)))]
        + [f"`{name}` {'bigint' if cast == 'long' else 'string'}" for name, _, cast in fields]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for name, pattern, cast in fields:
                extracted = pdf[line_col].str.extract(pattern, expand=False)
                extracted = extracted.replace("", None)  # empty match → NULL (native-path parity)
                if cast == "long":
                    extracted = pd.to_numeric(extracted, errors="coerce").astype("Int64")
                pdf[name] = extracted
            yield pdf

    return df.mapInPandas(extract, schema=out_schema)


def url_fields(df: DataFrame, url_col: str = "url") -> DataFrame:
    """HTTP URL decomposition — HttpFieldsGenerator.java:587-612 analog.

    path (leading slash kept, trailing slash stripped), query-string params
    exploded to a map (HttpAttributeEnricher.java:38-101 analog) — all via
    built-in ``parse_url``/``str_to_map`` (JVM-side), no UDF.
    """
    full = F.concat(F.lit("http://internal"), F.col(url_col))
    path_raw = F.parse_url(full, F.lit("PATH"))
    # keep leading '/', strip trailing slashes (HttpFieldsGenerator path rules)
    path = F.when(F.length(path_raw) > 1, F.regexp_replace(path_raw, "/+$", "")).otherwise(path_raw)
    query = F.parse_url(full, F.lit("QUERY"))
    return (
        df.withColumn("url_path", path)
        .withColumn(
            "query_params",
            F.when(query.isNotNull(), F.str_to_map(query, F.lit("&"), F.lit("="))).otherwise(
                F.create_map().cast("map<string,string>")
            ),
        )
    )


# ---------------------------------------------------------------------------
# Tenant resolution (P2 — jaeger/TenantIdHandler.java:29-81)
# ---------------------------------------------------------------------------

def resolve_tenant(df: DataFrame, tenant_col: str = "tenant_raw",
                   default_tenant: str | None = None) -> DataFrame:
    """Tenant from extracted field else configured static default; rows with
    no resolvable tenant get NULL (dropped downstream)."""
    raw = F.col(tenant_col)
    resolved = F.when((raw.isNotNull()) & (raw != ""), raw)
    if default_tenant is not None:
        resolved = resolved.otherwise(F.lit(default_tenant))
    return df.withColumn("tenant_id", resolved)


# ---------------------------------------------------------------------------
# DNF drop-filter compiler (P5 — jaeger/SpanFilter.java:123-155,193-267)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Cond:
    """One relational condition over a plain column or an attribute-map key.

    Operators mirror SpanDropFilter.java:1-62: EQ / NEQ / CONTAINS / EXISTS /
    NOT_EXISTS (plus STARTS_WITH used by exclude rules).
    """

    field: str
    op: str
    value: str | None = None
    in_map: str | None = None  # if set, field is a key of this map column

    def to_column(self) -> Column:
        target = (
            F.element_at(F.col(self.in_map), F.lit(self.field))
            if self.in_map
            else F.col(self.field)
        )
        op = self.op.upper()
        if op == "EQ":
            return target == F.lit(self.value)
        if op == "NEQ":
            # NULL-safe: a missing field is "not equal" (reference treats
            # missing tags as non-matching for EQ, matching for NEQ).
            return ~target.eqNullSafe(F.lit(self.value))
        if op == "CONTAINS":
            return target.contains(F.lit(self.value))
        if op == "STARTS_WITH":
            return target.startswith(F.lit(self.value))
        if op == "EXISTS":
            return target.isNotNull()
        if op == "NOT_EXISTS":
            return target.isNull()
        raise ValueError(f"unknown op {self.op!r}")


@dataclass(frozen=True)
class DropCriteria:
    """OR-of-AND drop criteria (DNF), SpanFilter.java:123-155 semantics:
    a row is dropped iff ANY criterion has ALL its conditions true."""

    criteria: tuple[tuple[Cond, ...], ...] = field(default_factory=tuple)

    def to_column(self) -> Column:
        if not self.criteria:
            return F.lit(False)
        ors: Column | None = None
        for conjunction in self.criteria:
            ands: Column | None = None
            for cond in conjunction:
                c = cond.to_column()
                ands = c if ands is None else (ands & c)
            assert ands is not None
            ors = ands if ors is None else (ors | ands)
        assert ors is not None
        return ors


# Exclude-rule AST (P6 — jaeger/ExcludeSpanRuleEvaluator.java:42-115):
# {"type": "and"|"or", "children": [...]} | {"type": "rel", "field", "op", "value", "in_map"?}
def compile_rule_tree(node: dict) -> Column:
    kind = node["type"].lower()
    if kind == "rel":
        return Cond(
            field=node["field"], op=node["op"], value=node.get("value"), in_map=node.get("in_map")
        ).to_column()
    children = [compile_rule_tree(c) for c in node["children"]]
    if not children:
        return F.lit(False)
    out = children[0]
    for c in children[1:]:
        out = (out & c) if kind == "and" else (out | c)
    return out


DEFAULT_DROP = DropCriteria(criteria=((Cond("operation", "EQ", "healthcheck"),),))


# ---------------------------------------------------------------------------
# Bypass predicate (P15 — rawspan/ByPassPredicate.java:28-44)
# ---------------------------------------------------------------------------

def bypass_predicate(bypass_col: str = "bypass_raw") -> Column:
    return F.coalesce(F.col(bypass_col) == "true", F.lit(False))


# ---------------------------------------------------------------------------
# Full parse stage
# ---------------------------------------------------------------------------

PARSE_OUTPUT_COLS = [
    "doc_id", "tokens", "n_tok", "source", "tenant_id", "ts_ms",
    "operation", "status_code", "url_path", "query_params", "attributes", "is_bypass",
]


def parse_sequences(
    df: DataFrame,
    drop_criteria: DropCriteria = DEFAULT_DROP,
    exclude_rule: dict | None = None,
    default_tenant: str | None = None,
    use_pandas_grok: bool = False,
) -> DataFrame:
    """sequences → parsed records, with per-row drop/bypass flags still attached.

    Chain: grok extract → URL fields → tenant resolve → drop-filter flags.
    Mirrors JaegerSpanPreProcessor.preProcessSpan ordering (:100-127): cheap
    predicates first so Catalyst pushes them ahead of expensive extraction.
    Callers split on ``is_dropped`` / ``tenant_id IS NULL`` and record counters
    (see aggregate.operational_counters).
    """
    extract = grok_extract_pandas if use_pandas_grok else grok_extract
    out = extract(df)
    out = url_fields(out)
    out = resolve_tenant(out, default_tenant=default_tenant)

    drop_col = drop_criteria.to_column()
    if exclude_rule is not None:
        drop_col = drop_col | compile_rule_tree(exclude_rule)

    out = (
        out.withColumn("is_bypass", bypass_predicate())
        .withColumn("is_dropped", F.coalesce(drop_col, F.lit(False)))
        .withColumn("has_tenant", F.col("tenant_id").isNotNull())
        .withColumn(
            "attributes",
            F.map_from_arrays(
                F.array(F.lit("op"), F.lit("status"), F.lit("lang")),
                F.array(
                    F.col("operation"),
                    F.col("status_code"),
                    F.element_at(F.col("query_params"), F.lit("lang")),
                ),
            ),
        )
    )
    return out


def split_parsed(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(kept, bypass) — two lineage branches over one DF (SpanNormalizer.java:66-70).

    kept = survives tenant + drop filters and is NOT bypass; bypass rows skip
    grouping/enrichment (RawSpanToStructuredTraceTransformer.java:28-44 analog).
    """
    alive = parsed.filter(F.col("has_tenant") & ~F.col("is_dropped"))
    kept = alive.filter(~F.col("is_bypass")).select(*PARSE_OUTPUT_COLS)
    bypass = alive.filter(F.col("is_bypass")).select(*PARSE_OUTPUT_COLS)
    return kept, bypass
