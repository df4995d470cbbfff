"""hypertrace_ingester_spark — a PySpark-native parse→enrich→route→aggregate engine.

A from-scratch re-expression of the semantics of hypertrace/hypertrace-ingester
(a Kafka Streams telemetry pipeline: span-normalizer → raw-spans-grouper →
trace-enricher → view-generator → metrics-generator) as an idiomatic Spark
DataFrame DAG over tables of pre-tokenized training sequences.

Reference (read-only, /root/reference):
  - span-normalizer      → operators/parse.py      (PARSE)
  - raw-spans-grouper    → operators/group.py      (GROUP)
  - trace-enricher       → operators/enrich.py     (ENRICH)
  - view-generator       → operators/route.py      (ROUTE)
  - metrics-generator    → operators/aggregate.py  (AGGREGATE)

This is NOT a port: the reference's record-at-a-time Kafka Streams topology is
re-expressed as declarative DataFrame lineage so Catalyst/Tungsten/AQE pick the
physical strategy (broadcast joins, whole-stage codegen, skew mitigation).
"""

__version__ = "0.1.0"
