"""Structured Streaming face of the pipeline (SURVEY.md §2.3 streaming path).

The reference is a Kafka Streams app: record-at-a-time processors with
RocksDB state, session windows via hand-rolled punctuators
(raw-spans-grouper/.../RawSpansProcessor.java:186-247,
TraceEmitPunctuator.java:94-196), and quiesce-wait metric emission
(MetricsGenerator). The Spark-native equivalents:

- session-window trace assembly  → ``F.session_window(ts, gap)`` aggregation
  with a watermark (state store + window close handled by Spark);
- metric windows + emit wait      → tumbling ``F.window`` + watermark in
  append mode (emission happens when the watermark passes — the exact
  analog of the reference's 15s emit wait);
- per-trace custom state          → ``applyInPandasWithState`` (exposed via
  :func:`sessionize_with_state` for semantics Spark's built-in session
  window can't express, e.g. per-group span caps *while* the window is
  open).

Sources/sinks are pluggable: in production ``readStream.format("kafka")`` /
``writeStream.toTable(iceberg)``; tests use the ``rate`` source and memory
sink. All transformations are identical between the batch and streaming
faces — the DataFrame lineage IS the portability layer.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP = "30 minutes"
METRIC_WINDOW = "5 seconds"
WATERMARK_DELAY = "15 seconds"  # metric.emit.waitTimeMs analog (conf:15)


def streaming_sessionize(
    events: DataFrame,
    group_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = SESSION_GAP,
    watermark: str = "1 hour",
) -> DataFrame:
    """G1 streaming session assembly: one output row per closed session.

    ``session_window`` keeps per-key state and extends the window on every
    event within ``gap`` — precisely the reference's inactivity-gap
    semantics; the watermark is the punctuator: windows emit (append mode)
    once event time passes session end + gap + watermark."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(group_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
        .select(
            group_col,
            F.col("session_window.start").alias("window_start"),
            "n_events",
            "session_start",
            "session_end",
        )
    )


def streaming_metrics(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = METRIC_WINDOW,
    watermark: str = WATERMARK_DELAY,
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """A1/A2 streaming windowed group-count: tumbling window + watermark
    (MetricsProcessor.java:75-136 + MetricEmitPunctuator emit wait)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), *[F.col(c) for c in group_cols])
        .agg(F.count(F.lit(1)).alias("num_rows"))
        .select(
            F.col("window.start").alias("bucket_start"),
            *group_cols,
            "num_rows",
        )
    )


def streaming_dedup(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: the first occurrence of each normalized
    content fingerprint passes; later copies arriving within the watermark
    horizon are dropped. ``dropDuplicatesWithinWatermark`` evicts per-key
    state once the watermark passes — bounded state, the requirement for
    deduping an unbounded 100 TB document stream (plain ``dropDuplicates``
    state grows forever). Batch analog: ``operators.dedup.exact_dedup``;
    the fingerprint is the same normalized-md5 as the batch face, so batch
    backfills and the stream agree on identity."""
    from ..operators.text import fingerprint

    fp = fingerprint(docs, text_col)
    return fp.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(["doc_fp"])


# ---------------------------------------------------------------------------
# Custom stateful operator: session assembly WITH per-group caps (G1+G3)
# ---------------------------------------------------------------------------

_STATE_SCHEMA = "n_events bigint, start_ms bigint, end_ms bigint"
_OUT_SCHEMA = (
    "user_id bigint, n_events bigint, session_start_ms bigint, "
    "session_end_ms bigint, truncated boolean"
)


def _capped_session_fn(max_events: int, gap_ms: int):
    """applyInPandasWithState function: buffer count/min/max per key; emit on
    inactivity timeout; cap event count per session (truncation flag) — the
    G3 per-tenant cap the built-in session_window cannot express."""

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, start_ms, end_ms = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [min(n, max_events)],
                    "session_start_ms": [start_ms],
                    "session_end_ms": [end_ms],
                    "truncated": [n > max_events],
                }
            )
            return
        n, start_ms, end_ms = state.get if state.exists else (0, None, None)
        # Gap-splitting on EVENT time: incoming timestamps are sorted and
        # folded into sessions; any inter-event gap > gap_ms closes the
        # running session immediately (emitted below) — matching batch
        # group.sessionize, where replayed history splits by its own
        # timestamps instead of waiting for wall-clock timeouts.
        # The fold tracks the RUNNING session end (max of state end and
        # prior events), so late-but-within-watermark events merge into
        # the open session without shrinking its end or splitting it
        # (equivalent to the sorted-lag formulation of group.sessionize):
        # boundary at i  iff  ts[i] - max(end0, ts[i-1]) > gap.
        import numpy as np

        ts_parts = [pdf["ts_ms"].to_numpy() for pdf in pdfs if len(pdf)]
        closed: list[tuple[int, int, int]] = []
        if ts_parts:
            ts = np.sort(np.concatenate(ts_parts))
            end0 = -np.inf if end_ms is None else end_ms
            prev = np.maximum(end0, np.concatenate(([-np.inf], ts[:-1])))
            boundaries = np.flatnonzero(ts - prev > gap_ms)
            segments = np.split(ts, boundaries)  # segments[0] merges state
            if len(segments[0]):
                seg = segments[0]
                n += len(seg)
                start_ms = int(seg[0]) if start_ms is None else min(start_ms, int(seg[0]))
                end_ms = int(seg[-1]) if end_ms is None else max(end_ms, int(seg[-1]))
            for seg in segments[1:]:
                if n:
                    closed.append((n, start_ms, end_ms))
                n, start_ms, end_ms = len(seg), int(seg[0]), int(seg[-1])
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(closed),
                    "n_events": [min(c[0], max_events) for c in closed],
                    "session_start_ms": [c[1] for c in closed],
                    "session_end_ms": [c[2] for c in closed],
                    "truncated": [c[0] > max_events for c in closed],
                }
            )
        if end_ms is not None:
            # Guard (round-2 ADVICE): an invocation carrying only empty Arrow
            # batches with no existing state would leave end_ms None —
            # setting a timeout from it would TypeError and (0, None, None)
            # state would shadow a real session. Skip the update entirely.
            state.update((n, start_ms, end_ms))
            # EVENT-time inactivity gap: the session closes when the stream's
            # watermark passes (max observed event time + gap) — replayed
            # historical data sessions split by their own timestamps, and a
            # continuously-arriving key still closes once its EVENT times go
            # quiet. (A ProcessingTimeTimeout here would make the gap
            # wall-clock inactivity — divergent from batch group.sessionize.)
            state.setTimeoutTimestamp(end_ms + gap_ms)
        yield pd.DataFrame(
            {
                "user_id": pd.Series([], dtype="int64"),
                "n_events": pd.Series([], dtype="int64"),
                "session_start_ms": pd.Series([], dtype="int64"),
                "session_end_ms": pd.Series([], dtype="int64"),
                "truncated": pd.Series([], dtype="bool"),
            }
        )

    return fn


def sessionize_with_state(
    events: DataFrame,
    max_events: int = 1000,
    gap_ms: int = 30 * 60 * 1000,
    group_col: str = "user_id",
    watermark: str = "10 seconds",
) -> DataFrame:
    """Streaming session assembly with per-group caps via
    ``applyInPandasWithState`` — RawSpansProcessor's span store + cap +
    TraceEmitPunctuator collapsed into one Arrow-vectorized stateful op.

    EVENT-time timeouts (watermark-driven), so the 30-minute "session gap"
    means inactivity in event time — equivalent to the batch
    group.sessionize it mirrors, including on replayed historical data.

    Requires a streaming DataFrame with columns (user_id, ts_ms); update
    output mode."""
    with_ts = events.withColumn(
        "_event_ts", F.timestamp_millis(F.col("ts_ms"))
    ).withWatermark("_event_ts", watermark)
    return with_ts.groupBy(group_col).applyInPandasWithState(
        _capped_session_fn(max_events, gap_ms),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def streaming_tail_decisions(
    spans: DataFrame,
    latency_threshold_ms: int = 800,
    sample_hex_chars: str = "0123",
    trace_col: str = "trace_id",
    gap: str = "30 seconds",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming tail-based trace sampling: emit each trace's keep
    decision when the trace CLOSES — the OTel collector's
    tailsamplingprocessor ``decision_wait`` expressed as a
    ``session_window`` over (tenant, trace) span inactivity plus the
    watermark. One output row per kept closed trace:
    ``(tenant_id, trace_id, sample_reason, n_spans, trace_start_ms,
    trace_end_ms)``.

    The policy ladder is literally the batch expression
    (``group.tail_decision`` — error > latency > md5 probabilistic), so a
    replayed stream and the batch ``group.tail_sample`` keep identical
    traces (asserted in tests/test_tail_logs.py) PROVIDED each trace's
    span STARTS fall within ``gap`` of each other — the inherent
    tail-sampling trade (OTel's ``decision_wait`` has the same contract:
    spans arriving after the decision window are judged without the
    full trace). A trace quieter than ``gap`` mid-flight closes as
    separate sessions, each decided on its own spans (latency measured
    per fragment, possibly multiple decision rows per (tenant, trace));
    size ``gap`` to the expected in-trace span spread, exactly as you
    would size decision_wait. This is the DECISION
    stream; span retention is the downstream join against the span store
    — exactly the join ``tail_sample`` performs in one shot on bounded
    input, or an Iceberg MERGE/delete on the landed span table in
    production.

    Scale shape: per-trace state is three scalars inside Spark's session
    -window store, evicted at watermark; the emitted frame is
    trace-grain (orders smaller than spans) and never carries payload."""
    from ..operators.group import span_has_error, tail_decision

    with_ts = spans.withColumn(
        "_event_ts", F.timestamp_millis(F.col("start_ms"))
    ).withWatermark("_event_ts", watermark)
    agg = (
        with_ts.groupBy(
            F.session_window(F.col("_event_ts"), gap),
            F.col("tenant_id"),
            F.col(trace_col),
        )
        .agg(
            (F.max(span_has_error().cast("int")) == 1).alias("_has_error"),
            F.min("start_ms").alias("trace_start_ms"),
            F.max("end_ms").alias("trace_end_ms"),
            F.count(F.lit(1)).alias("n_spans"),
        )
    )
    reason = tail_decision(
        F.col("_has_error"),
        F.col("trace_end_ms") - F.col("trace_start_ms"),
        F.col("tenant_id"), F.col(trace_col),
        latency_threshold_ms, sample_hex_chars,
    )
    return (
        agg.select(
            "tenant_id", trace_col, reason.alias("sample_reason"),
            "n_spans", "trace_start_ms", "trace_end_ms",
        )
        .where(F.col("sample_reason").isNotNull())
    )
