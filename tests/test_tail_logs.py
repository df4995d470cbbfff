"""Tail-based trace sampling (group.tail_sample) and log template mining
(views.log_templates) — both with FULL DuckDB oracles.

- tail_sample's decision ladder (error > latency > probabilistic) is
  restated over the shared spans-domain CTE (spandom.SPANS_SQL), and the
  engine-portable md5 sampler makes the probabilistic tier bit-exact;
- log_templates' masks live in the Java-regex ∩ RE2 subset, so DuckDB
  applies the identical regexp_replace chain to the identical
  deterministically-built log lines.
"""

import os

import pytest
from pyspark.sql import functions as F

from hypertrace_ingester_spark.operators import group as gp
from hypertrace_ingester_spark.operators import spandom
from hypertrace_ingester_spark.operators import views as vw
from hypertrace_ingester_spark.oracle import compare, duckdb_connection

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata dir {SF_DIR} missing"
)

_W = "WITH RECURSIVE\n" + spandom.SPANS_SQL


@pytest.fixture(scope="module")
def duck():
    return duckdb_connection(SF_DIR)


TAIL_ORACLE = _W + """
    , decisions AS (
      SELECT tenant_id, trace_id,
             CASE
               WHEN max(CASE WHEN error_count > 0 OR status_code >= 500
                             THEN 1 ELSE 0 END) = 1 THEN 'error'
               WHEN max(end_ms) - min(start_ms) >= {thr} THEN 'latency'
               WHEN substr(md5(CAST(tenant_id AS VARCHAR) || ':' ||
                               CAST(trace_id AS VARCHAR)), 1, 1)
                    IN ({chars}) THEN 'probabilistic'
             END AS sample_reason
      FROM flags GROUP BY tenant_id, trace_id
    )
    SELECT f.tenant_id, f.trace_id, f.span_id, f.service,
           CAST(f.duration_ms AS BIGINT) AS duration_ms, d.sample_reason
    FROM flags f JOIN decisions d
      ON d.tenant_id = f.tenant_id AND d.trace_id = f.trace_id
    WHERE d.sample_reason IS NOT NULL
"""


def test_tail_sample_matches_oracle(spark, duck):
    sp = spandom.spans(spark, SF_DIR)
    got = (
        gp.tail_sample(sp, latency_threshold_ms=800, sample_hex_chars="0123")
        .select(
            "tenant_id", "trace_id", "span_id", "service",
            F.col("duration_ms").cast("bigint").alias("duration_ms"),
            "sample_reason",
        )
        .toPandas()
    )
    chars = ", ".join(f"'{c}'" for c in "0123")
    want = duck.execute(TAIL_ORACLE.format(thr=800, chars=chars)).df()
    problems = compare(got, want)
    assert not problems, "; ".join(problems)
    assert len(got) > 0


def test_tail_sample_keeps_whole_traces_with_policy_priority(spark):
    sp = spandom.spans(spark, SF_DIR)
    kept = gp.tail_sample(sp, latency_threshold_ms=800).localCheckpoint()

    # one reason per trace, and every span of a kept trace survives
    per_trace = kept.groupBy("tenant_id", "trace_id").agg(
        F.countDistinct("sample_reason").alias("n_reasons"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    assert per_trace.where(F.col("n_reasons") != 1).count() == 0
    orig = sp.groupBy("tenant_id", "trace_id").agg(
        F.count(F.lit(1)).alias("n_orig"))
    joined = per_trace.join(orig, ["tenant_id", "trace_id"])
    assert joined.where(F.col("n_kept") != F.col("n_orig")).count() == 0

    # priority: any trace containing an error span is labeled 'error'
    bad = (
        kept.groupBy("tenant_id", "trace_id", "sample_reason")
        .agg(F.max((F.col("error_count") > 0) | (F.col("status_code") >= 500))
             .alias("has_err"))
        .where(F.col("has_err") & (F.col("sample_reason") != "error"))
    )
    assert bad.count() == 0

    # latency traces really are slow; probabilistic ones really are fast
    e2e = kept.groupBy("tenant_id", "trace_id", "sample_reason").agg(
        (F.max("end_ms") - F.min("start_ms")).alias("e2e"))
    assert e2e.where((F.col("sample_reason") == "latency")
                     & (F.col("e2e") < 800)).count() == 0
    assert e2e.where((F.col("sample_reason") == "probabilistic")
                     & (F.col("e2e") >= 800)).count() == 0


# deterministic log lines built from the events table — same SQL text on
# both engines, exercising every mask class (ip, uuid-free hex, numbers)
_SPARK_LINE = (
    "concat('user ', cast(trace_id as string), ' fetched /api/v',"
    " cast(kv % 3 as string), '/item/', cast(kv as string),"
    " ' from 10.0.', cast(kv % 256 as string), '.',"
    " cast(trace_id % 256 as string), ' status 0x',"
    " hex(kv % 16), ' in ', cast(duration_ms as string), 'ms')"
)
_DUCK_LINE = (
    "'user ' || CAST(trace_id AS VARCHAR) || ' fetched /api/v' ||"
    " CAST(kv % 3 AS VARCHAR) || '/item/' || CAST(kv AS VARCHAR) ||"
    " ' from 10.0.' || CAST(kv % 256 AS VARCHAR) || '.' ||"
    " CAST(trace_id % 256 AS VARCHAR) || ' status 0x' ||"
    " hex(kv % 16) || ' in ' || CAST(duration_ms AS VARCHAR) || 'ms'"
)

LOG_ORACLE = _W + """
    , lines AS (SELECT {line} AS summary, ts_ms FROM flags),
    masked AS (
      SELECT regexp_replace(regexp_replace(regexp_replace(regexp_replace(
               summary,
               '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b', '<IP>', 'g'),
               '\\b[0-9a-fA-F]{{8}}-[0-9a-fA-F]{{4}}-[0-9a-fA-F]{{4}}-[0-9a-fA-F]{{4}}-[0-9a-fA-F]{{12}}\\b', '<UUID>', 'g'),
               '\\b0x[0-9a-fA-F]+\\b', '<HEX>', 'g'),
               '\\d+', '<NUM>', 'g') AS template,
             summary, ts_ms
      FROM lines
    )
    SELECT template, CAST(count(*) AS BIGINT) AS n_events,
           min(summary) AS example,
           min(ts_ms) AS first_ts_ms, max(ts_ms) AS last_ts_ms
    FROM masked GROUP BY template
"""


def test_log_templates_match_oracle(spark, duck):
    sp = spandom.spans(spark, SF_DIR)
    logs = sp.select(F.expr(_SPARK_LINE).alias("summary"), "ts_ms")
    got = (
        vw.log_templates(logs, ts_col="ts_ms")
        .withColumn("n_events", F.col("n_events").cast("bigint"))
        .toPandas()
    )
    want = duck.execute(LOG_ORACLE.format(line=_DUCK_LINE)).df()
    problems = compare(got, want)
    assert not problems, "; ".join(problems)
    # the variable fields really collapsed: far fewer templates than lines
    assert 0 < len(got) < logs.count() / 10
    tpl = set(got["template"])
    assert all("<IP>" in t and "<NUM>" in t and "<HEX>" in t for t in tpl)


def test_log_mask_pinned_cases(spark):
    rows = [
        ("conn from 192.168.1.17 dropped", "conn from <IP> dropped"),
        ("req 550e8400-e29b-41d4-a716-446655440000 done",
         "req <UUID> done"),
        ("ptr 0xDEADbeef freed", "ptr <HEX> freed"),
        ("retried 42 times in 7ms", "retried <NUM> times in <NUM>ms"),
        ("no variables here", "no variables here"),
        ("v1.2.3 is not an ip", "v<NUM>.<NUM>.<NUM> is not an ip"),
    ]
    df = spark.createDataFrame(rows, "summary string, expect string")
    bad = df.where(
        vw.mask_log_line(F.col("summary")) != F.col("expect")
    ).collect()
    assert not bad, bad


def test_tail_sample_all_tiers_synthetic(spark):
    """Hand-built traces firing every tier exactly once (tenant 0;
    md5('0:0')[0]='3' → probabilistic keep, md5('0:1')[0]='8' → drop):
      trace 0: fast, clean          → probabilistic (digit '3')
      trace 1: fast, clean          → dropped       (digit '8')
      trace 2: slow (e2e 1000)      → latency (digit 'd' would drop it)
      trace 3: fast but error span  → error
      trace 5: fast, 500 status     → error (5xx counts as error policy)
    """
    rows = [
        # tenant, trace, span, svc, start, end, dur, err, status
        (0, 0, 1, "a", 0, 100, 100, 0, 200),
        (0, 0, 2, "a", 50, 150, 100, 0, 200),
        (0, 1, 1, "a", 0, 100, 100, 0, 200),
        (0, 2, 1, "a", 0, 1000, 1000, 0, 200),
        (0, 2, 2, "a", 10, 20, 10, 0, 200),
        (0, 3, 1, "a", 0, 10, 10, 1, 200),
        (0, 3, 2, "a", 0, 10, 10, 0, 200),
        (0, 5, 1, "a", 0, 10, 10, 0, 500),
    ]
    df = spark.createDataFrame(
        rows,
        "tenant_id bigint, trace_id bigint, span_id bigint, service string,"
        " start_ms bigint, end_ms bigint, duration_ms bigint,"
        " error_count int, status_code int",
    )
    kept = gp.tail_sample(df, latency_threshold_ms=1000)
    got = {
        (r["trace_id"], r["sample_reason"])
        for r in kept.select("trace_id", "sample_reason").distinct().collect()
    }
    assert got == {
        (0, "probabilistic"), (2, "latency"), (3, "error"), (5, "error")
    }
    # whole-trace survival for the multi-span keeps
    counts = {r["trace_id"]: r["n"] for r in kept.groupBy("trace_id")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {0: 2, 2: 2, 3: 2, 5: 1}


def test_streaming_tail_decisions_match_batch(spark, tmp_path):
    """Stream/batch agreement: the streaming decision stream (session_window
    close + shared policy ladder) keeps exactly the traces batch
    tail_sample keeps, with identical reasons and per-trace stats."""
    from hypertrace_ingester_spark.streaming.jobs import (
        streaming_tail_decisions,
    )

    base = 1_700_000_000_000
    rows = []
    for t in range(40):
        tenant = f"tn-{t % 2}"
        trace = 1000 + t
        err = 1 if t % 7 == 0 else 0           # error traces
        slow = 2000 if t % 5 == 1 else 50      # latency traces (e2e >= 800)
        for s in range(3):
            start = base + t * 60_000 + s * 10  # spans tight within trace
            rows.append((tenant, trace, err if s == 0 else 0,
                         200, start, start + slow))
    # sentinel far in the future: pushes the final watermark past every
    # real trace so ALL of them close and emit; never closes itself
    rows.append(("zz-sentinel", 999999, 0, 200,
                 base + 10 * 3_600_000, base + 10 * 3_600_000 + 1))
    spans = spark.createDataFrame(
        rows,
        "tenant_id string, trace_id long, error_count int, "
        "status_code int, start_ms long, end_ms long",
    )
    in_dir = str(tmp_path / "spans_stream")
    spans.coalesce(1).write.parquet(in_dir)

    stream = spark.readStream.schema(spans.schema).parquet(in_dir)
    out = streaming_tail_decisions(stream, gap="30 seconds",
                                   watermark="0 seconds")
    q = (
        out.writeStream.format("memory").queryName("tail_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r["tenant_id"], r["trace_id"]):
            (r["sample_reason"], r["n_spans"],
             r["trace_start_ms"], r["trace_end_ms"])
        for r in spark.sql("select * from tail_out").collect()
        if r["tenant_id"] != "zz-sentinel"
    }

    batch = gp.tail_sample(spans.where(F.col("tenant_id") != "zz-sentinel"))
    want = {
        (r["tenant_id"], r["trace_id"]):
            (r["sample_reason"], r["n"], r["s"], r["e"])
        for r in batch.groupBy("tenant_id", "trace_id", "sample_reason")
        .agg(F.count(F.lit(1)).alias("n"), F.min("start_ms").alias("s"),
             F.max("end_ms").alias("e"))
        .collect()
    }
    assert got == want
    assert len(got) > 0
    reasons = {v[0] for v in got.values()}
    assert reasons == {"error", "latency", "probabilistic"}


def test_streaming_tail_decisions_fragmenting_is_the_documented_trade(spark, tmp_path):
    """A trace quieter than `gap` mid-flight closes as separate sessions,
    each judged on its own spans — the documented decision_wait trade."""
    from hypertrace_ingester_spark.streaming.jobs import (
        streaming_tail_decisions,
    )

    base = 1_700_000_000_000
    rows = [
        # one trace, two spans 45s apart (gap=30s): two sessions; each
        # fragment errors, so both fragments emit an 'error' decision
        ("tn-0", 1, 1, 500, base, base + 10),
        ("tn-0", 1, 1, 500, base + 45_000, base + 45_010),
        # sentinel to advance the watermark
        ("zz", 9, 0, 200, base + 3_600_000, base + 3_600_001),
    ]
    spans = spark.createDataFrame(
        rows,
        "tenant_id string, trace_id long, error_count int, "
        "status_code int, start_ms long, end_ms long")
    in_dir = str(tmp_path / "frag_stream")
    spans.coalesce(1).write.parquet(in_dir)
    out = streaming_tail_decisions(
        spark.readStream.schema(spans.schema).parquet(in_dir),
        gap="30 seconds", watermark="0 seconds")
    q = (
        out.writeStream.format("memory").queryName("frag_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    res = [r for r in spark.sql("select * from frag_out").collect()
           if r["tenant_id"] == "tn-0"]
    assert len(res) == 2                      # one row PER FRAGMENT
    assert {r["sample_reason"] for r in res} == {"error"}
    assert {r["n_spans"] for r in res} == {1}
