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

__version__ = "0.2.0"

# Spark Python workers deserialize applyInPandas closures that reference
# this package by module path. When the driver process imports the package
# from a cwd other than the repo root (driver harness, /tmp scripts), the
# workers — separate processes spawned by the JVM — need the repo root on
# PYTHONPATH. Export it before any SparkSession/JVM is created: the JVM
# inherits the driver's environment, and local-mode Python workers inherit
# the JVM's. On a real cluster the package ships via --py-files instead.
import os as _os

_repo_root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _repo_root not in _os.environ.get("PYTHONPATH", "").split(_os.pathsep):
    _os.environ["PYTHONPATH"] = (
        _repo_root + _os.pathsep + _os.environ.get("PYTHONPATH", "")
    ).rstrip(_os.pathsep)
del _os
