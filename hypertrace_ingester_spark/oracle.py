"""Oracle-comparison helpers shared by tests and scripts/check_queries.py.

Mirrors the driver's correctness gate: row count + column set +
order-insensitive value equality between a Spark result and a DuckDB oracle
run on the same parquet tables.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .sources import TABLES


def duckdb_connection(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical form: columns sorted by name, integral/bool → Int64,
    floats rounded to 6 places, everything else stringified; rows sorted."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]) or pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(6)
        else:
            df[c] = df[c].astype("string")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return [
            f"columns differ: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
        ]
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count differ: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    if len(a) == len(b):
        for c in a.columns:
            if pd.api.types.is_float_dtype(a[c]):
                ok = np.allclose(
                    a[c].to_numpy(dtype="float64"),
                    b[c].to_numpy(dtype="float64"),
                    rtol=1e-9, atol=1e-9, equal_nan=True,
                )
            else:
                ok = a[c].equals(b[c])
            if not ok:
                diff = a[c].fillna("~null~").astype("string") != b[c].fillna("~null~").astype("string")
                problems.append(
                    f"values differ in column {c!r} ({int(diff.sum())} rows); "
                    f"sample spark={a[c][diff].head(3).tolist()} duck={b[c][diff].head(3).tolist()}"
                )
    return problems
