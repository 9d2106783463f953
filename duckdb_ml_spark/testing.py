"""Shared correctness-gate helpers: order-insensitive value-hash comparison of a
Spark DataFrame against a DuckDB oracle SQL over the same parquet tables.

Mirrors the driver's t2 gate (row count + sorted-column schema + value hash) so
tests and tools/oracle_check.py exercise the exact contract.
"""

from __future__ import annotations

import hashlib
import math
from datetime import date, datetime

import duckdb

from duckdb_ml_spark.tables import TABLE_NAMES


def _norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> tuple[int, str, str]:
    """(row_count, sorted-schema, order-insensitive sha256 prefix)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(rows), ",".join(sorted(cols)), h


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """In-memory DuckDB with the test tables registered as views."""
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def compare_to_oracle(spark_df, oracle: str, con: duckdb.DuckDBPyConnection) -> dict:
    """Run both sides, return a comparison report dict (key 'match': bool)."""
    scols = spark_df.columns
    srows = [tuple(r) for r in spark_df.collect()]
    res = con.execute(oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    sn, sc, sh = value_hash(scols, srows)
    on, oc, oh = value_hash(ocols, orows)
    return {
        "match": (sn, sc, sh) == (on, oc, oh),
        "spark": {"rows": sn, "schema": sc, "hash": sh},
        "duckdb": {"rows": on, "schema": oc, "hash": oh},
    }
