"""Driver-mirror correctness check: run every queries() entry on Spark and
its oracle_sql() on DuckDB over the same parquet tables; compare row count,
column names, and order-insensitive values (sorted rows, normalized dtypes).

Usage: python scripts/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hypertrace_ingester_spark.oracle import compare, duckdb_connection  # noqa: E402
import hypertrace_ingester_spark.queries as _q  # noqa: E402

_q._load_extensions()
REGISTRY = _q.REGISTRY
from hypertrace_ingester_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.001"
    only = set(a for a in sys.argv[1:] if not os.path.isdir(a))

    con = duckdb_connection(sf_dir)
    spark = get_spark(app_name="check_queries", master="local[8]", shuffle_partitions=8)
    failures = 0
    for name, qd in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = qd.fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if qd.oracle is None:
            print(f"ok   {name}: rows-only ({len(spark_pdf)} rows) [{time.time()-t0:.1f}s]")
            continue
        try:
            duck_pdf = con.execute(qd.oracle).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = compare(spark_pdf, duck_pdf)
        if problems:
            failures += 1
            print(f"FAIL {name} [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"     {p}")
        else:
            print(f"ok   {name}: {len(spark_pdf)} rows match [{time.time()-t0:.1f}s]")
    print(f"\n{failures} failures / {len(only) if only else len(REGISTRY)} queries checked @ {sf_dir}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
