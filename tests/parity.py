"""Local replica of the driver's Spark-vs-DuckDB correctness gate.

Runs each __spark_entry__ query on Spark AND its oracle SQL on DuckDB
over the same parquet tables, then compares row counts, column names,
and order-insensitive values — catching any dialect drift before the
driver does.
"""

from __future__ import annotations

import math
from datetime import datetime

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # round to 6 significant decimals — mirrors defensive rounding
        return f"{v:.6g}"
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    return str(v)


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return sorted(c for c in cols), out


def compare(spark_df, con, sql: str, name: str = "") -> None:
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    d = con.sql(sql)
    d_rows = [tuple(r) for r in d.fetchall()]
    d_cols = list(d.columns)

    sc, sr = _normalize(s_rows, s_cols)
    dc, dr = _normalize(d_rows, d_cols)
    assert sc == dc, f"{name}: column mismatch spark={sc} duck={dc}"
    assert len(sr) == len(dr), f"{name}: row count spark={len(sr)} duck={len(dr)}"
    for i, (a, b) in enumerate(zip(sr, dr)):
        assert a == b, f"{name}: first row mismatch at sorted idx {i}:\n spark={a}\n duck ={b}"
