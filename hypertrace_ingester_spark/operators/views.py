"""ROUTE stage views — view-generator analogs over the events stream
(SURVEY.md §2.5, V1-V6).

The reference derives 6 flat views from each enriched trace
(hypertrace-view-generator/.../generators/*.java), all sharing one cached
per-trace state (ViewGeneratorState.java:17-70). Here all views derive from
ONE enriched events DataFrame (cache it before fanning out) — same
compute-once / project-many structure, but Catalyst prunes each view's scan
down to exactly the columns it needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.numeric import round_half_up

# event_type → status-state dim (ApiStatusEnricher / HttpCodeMapper analog,
# enrichers/util/HttpCodeMapper.java): compiled to a when-ladder so it stays
# inside whole-stage codegen (tiny closed domain — no join needed).
STATUS_STATE = {
    "error": "FAIL",
    "purchase": "SUCCESS",
    "signup": "SUCCESS",
    "click": "NEUTRAL",
    "view": "NEUTRAL",
}

# SpanTypeAttributeEnricher analog (enrichers/SpanTypeAttributeEnricher.java:88-179):
# classify each record ENTRY/EXIT/UNSPECIFIED from its type alias.
SPAN_KIND = {
    "signup": "ENTRY",
    "purchase": "ENTRY",
    "click": "EXIT",
    "view": "EXIT",
}


def _case(col_name: str, mapping: dict[str, str], default: str):
    expr = None
    for k, v in mapping.items():
        expr = F.when(F.col(col_name) == k, v) if expr is None else expr.when(F.col(col_name) == k, v)
    return expr.otherwise(default)


def with_ts_ms(events: DataFrame) -> DataFrame:
    """Normalize timestamp to epoch millis (EventBuilder.java:41-45 analog —
    proto Timestamp → long millis). Parquet TIMESTAMP(micros) arrives as
    TIMESTAMP_NTZ; the cast pins it to the session UTC zone so epoch math
    matches the DuckDB oracle's naive epoch_ms."""
    return events.withColumn("ts_ms", F.unix_millis(F.col("ts").cast("timestamp")))


def span_event_view(events: DataFrame) -> DataFrame:
    """V1 SpanEventView analog (generators/SpanEventViewGenerator.java:51-327):
    1 row per event with classification + status columns, all pure
    projections (codegen, zero shuffle)."""
    return with_ts_ms(events).select(
        "event_id",
        "user_id",
        "ts_ms",
        "event_type",
        _case("event_type", SPAN_KIND, "UNSPECIFIED").alias("kind"),
        _case("event_type", STATUS_STATE, "UNKNOWN").alias("status_state"),
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
        F.round("value", 2).alias("value_r"),
    )


def raw_trace_view(events: DataFrame) -> DataFrame:
    """V3 RawTraceView analog (generators/RawTraceViewGenerator.java:26-82):
    1 row per user(≙trace): member count, distinct types(≙services),
    duration. One shuffle on user_id."""
    return (
        with_ts_ms(events)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
            (F.max("ts_ms") - F.min("ts_ms")).alias("duration_ms"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


def service_call_view(events: DataFrame) -> DataFrame:
    """V4 ServiceCallView analog (generators/ServiceCallViewGenerator.java:95-150):
    caller/callee edge rows. The reference pairs exit spans with their
    entry-span children; here each event pairs with the user's next event
    in time — same adjacency-edge semantics, expressed as lead() instead of
    a self-join (one shuffle + sort-within-partition, vs the join's two)."""
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    df = with_ts_ms(events).select("event_id", "user_id", "ts_ms", "event_type")
    return (
        df.withColumn("dst_event_id", F.lead("event_id").over(w))
        .withColumn("callee", F.lead("event_type").over(w))
        .withColumn("latency_ms", F.lead("ts_ms").over(w) - F.col("ts_ms"))
        .filter(F.col("dst_event_id").isNotNull())
        .select(
            "user_id",
            F.col("event_id").alias("src_event_id"),
            "dst_event_id",
            F.col("event_type").alias("caller"),
            "callee",
            "latency_ms",
        )
    )


def log_event_view(events: DataFrame) -> DataFrame:
    """V6 LogEventView analog (generators/LogEventViewGenerator.java:43-111):
    1 row per record, summary = first non-null of a priority key list from
    the attribute bag (coalesce over JSON paths), attributes passed through
    serialized."""
    summary = F.coalesce(
        F.get_json_object("props", "$.message"),
        F.get_json_object("props", "$.k"),
        F.lit("<empty>"),
    )
    return with_ts_ms(events).select(
        "event_id",
        "user_id",
        F.col("ts_ms").alias("timestamp_ms"),
        summary.alias("summary"),
        F.length("props").alias("attr_bytes"),
    )


def service_call_rollup(events: DataFrame) -> DataFrame:
    """ServiceCallView aggregate face: caller→callee edge counts + mean
    latency (the 'almost a self-join on span event data' rollup)."""
    return (
        service_call_view(events)
        .groupBy("caller", "callee")
        .agg(
            F.count(F.lit(1)).alias("n_calls"),
            round_half_up(F.avg("latency_ms"), 2).alias("avg_latency_ms"),
        )
    )


# Variable-field masks for log template mining, applied in order: composite
# shapes (IPs, UUIDs, hex ids) BEFORE bare numbers, or octets/uuid segments
# degrade into <NUM> runs. Patterns are deliberately within the common
# subset of Java regex (Spark) and RE2 (DuckDB/Go) — word boundaries,
# char classes, bounded repeats — so the oracle restates them verbatim.
LOG_MASKS: list[tuple[str, str]] = [
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (
        r"\b[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}"
        r"-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}\b",
        "<UUID>",
    ),
    (r"\b0x[0-9a-fA-F]+\b", "<HEX>"),
    # bare digit runs last, and WITHOUT \b: "7ms"/"port8080" have no
    # digit→letter word boundary, yet their digits are variable fields
    (r"\d+", "<NUM>"),
]


def mask_log_line(col) -> "Column":
    """The masking half of template mining as a reusable column expression
    (pure regexp chain — fuses into the scan, whole-stage codegen)."""
    out = col
    for pat, tok in LOG_MASKS:
        out = F.regexp_replace(out, pat, tok)
    return out


def log_templates(
    logs: DataFrame, summary_col: str = "summary", ts_col: str | None = None
) -> DataFrame:
    """Log template mining over a log-event stream: collapse free-text
    lines to their constant skeleton by masking variable fields, then
    aggregate per skeleton. The degenerate-but-scalable variant of
    Drain-style template extraction (He et al. 2017): masking + exact
    grouping covers the fixed-format lines that dominate service logs,
    with ZERO driver state — one map pass + one partial-agg'd shuffle on
    the template string (cardinality = distinct templates, not lines).
    Complements V6 ``log_event_view`` (which gives the per-record rows
    this summarizes; reference logs land per-record with no rollup —
    LogEventViewGenerator.java:43-111 — so this is the analytics layer a
    100 TB/day log volume needs on top).

    Output: one row per template — ``template``, ``n_events``,
    ``example`` (the lexicographically-min raw line, deterministic), and
    ``first_ts_ms``/``last_ts_ms`` when ``ts_col`` is given.
    """
    t = logs.withColumn("template", mask_log_line(F.col(summary_col)))
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(summary_col).alias("example"),
    ]
    if ts_col is not None:
        aggs += [
            F.min(ts_col).alias("first_ts_ms"),
            F.max(ts_col).alias("last_ts_ms"),
        ]
    return t.groupBy("template").agg(*aggs)
