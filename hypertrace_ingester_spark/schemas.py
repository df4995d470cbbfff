"""Stage schemas (SURVEY.md §1).

The reference declares fixed Avro schemas per stage (span-normalizer-api,
hypertrace-view-generator-api *.avdl); we declare fixed StructTypes. The open
``map<string, AttributeValue>`` attribute bags become MapType(string,string)
(string-coercion at the edges mirrors span-normalizer/.../ValueConverter.java).
"""

from __future__ import annotations

from pyspark.sql import types as T

# F1 — primary input: pre-tokenized training sequences (BASELINE.json input_hint).
SEQUENCES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType(), False), False),
        T.StructField("n_tok", T.IntegerType(), False),
        T.StructField("source", T.StringType(), False),
        # synthetic raw line so parse has real grok work
        # (HttpFieldsGenerator analog, span-normalizer/.../HttpFieldsGenerator.java:120-636)
        T.StructField("source_line", T.StringType(), True),
    ]
)

# Post-parse record — RawSpan/Event analog
# (Avro Event in hypertrace-trace-enricher test fixture structured-trace-schema.json).
PARSED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType(), False), False),
        T.StructField("n_tok", T.IntegerType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("tenant_id", T.StringType(), True),
        T.StructField("ts_ms", T.LongType(), True),
        T.StructField("operation", T.StringType(), True),
        T.StructField("status_code", T.StringType(), True),
        T.StructField("url_path", T.StringType(), True),
        T.StructField("query_params", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("attributes", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("is_bypass", T.BooleanType(), False),
    ]
)

# F3 dim tables (broadcast-join enrichment fixtures).
ENDPOINTS_SCHEMA = T.StructType(
    [
        T.StructField("tenant_id", T.StringType(), False),
        T.StructField("operation", T.StringType(), False),
        T.StructField("api_id", T.StringType(), False),
        T.StructField("api_name", T.StringType(), False),
    ]
)

SERVICES_SCHEMA = T.StructType(
    [
        T.StructField("tenant_id", T.StringType(), False),
        T.StructField("service_name", T.StringType(), False),
        T.StructField("service_id", T.StringType(), False),
    ]
)

ROUTE_RULES_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType(), False),
        T.StructField("sink", T.StringType(), False),
    ]
)

STATUS_CODES_SCHEMA = T.StructType(
    [
        T.StructField("code", T.StringType(), False),
        T.StructField("state", T.StringType(), False),
        T.StructField("message", T.StringType(), False),
    ]
)

# Aggregate output — MetricIdentity analog
# (hypertrace-metrics-generator/.../MetricsProcessor.java:129-136).
METRICS_SCHEMA = T.StructType(
    [
        T.StructField("sink", T.StringType(), False),
        T.StructField("tenant_id", T.StringType(), True),
        T.StructField("bucket_start_ms", T.LongType(), False),
        T.StructField("num_rows", T.LongType(), False),
        T.StructField("sum_tokens", T.LongType(), False),
    ]
)
