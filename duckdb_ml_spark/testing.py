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
    """In-memory DuckDB with the test tables registered as views.

    A table may be a single parquet FILE (driver testdata) or a DIRECTORY of
    parts (Spark-written derived tables, e.g. the 2048× lineitem) — DuckDB
    needs an explicit glob for the latter."""
    import os

    con = duckdb.connect()
    for t in TABLE_NAMES:
        p = f"{sf_dir}/{t}.parquet"
        src = f"read_parquet('{p}/*.parquet')" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    return con


def compare_to_oracle(
    spark_df,
    oracle: str,
    con: duckdb.DuckDBPyConnection,
    dump_to: str | None = None,
    name: str = "query",
) -> dict:
    """Run both sides, return a comparison report dict (key 'match': bool).

    `dump_to` (VERDICT r7 item 1b — the thrice-red driver row left NOTHING to
    diagnose because every gate discarded the mismatching values): on any
    mismatch, write both engines' sorted normalized rows, the differing lines,
    and per-column max deltas to `<dump_to>/<name>.json` and record the path
    in the report under 'dump'. Match runs write nothing."""
    scols = spark_df.columns
    srows = [tuple(r) for r in spark_df.collect()]
    res = con.execute(oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    sn, sc, sh = value_hash(scols, srows)
    on, oc, oh = value_hash(ocols, orows)
    report = {
        "match": (sn, sc, sh) == (on, oc, oh),
        "spark": {"rows": sn, "schema": sc, "hash": sh},
        "duckdb": {"rows": on, "schema": oc, "hash": oh},
    }
    if not report["match"] and dump_to is not None:
        report["dump"] = dump_mismatch(
            dump_to, name, scols, srows, ocols, orows
        )
    return report


def _sorted_lines(cols: list[str], rows: list[tuple]) -> list[str]:
    """The exact normalized lines value_hash hashes, in hash order."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)


def dump_mismatch(
    dump_to: str,
    name: str,
    scols: list[str],
    srows: list[tuple],
    ocols: list[str],
    orows: list[tuple],
    max_lines: int = 500,
) -> str:
    """Write a mismatch forensics artifact and return its path.

    Contents: both engines' sorted normalized row-lines (the exact strings
    the hash covers, truncated at max_lines), the symmetric difference of
    those line sets, and — when schemas + row counts align — per-column max
    absolute delta over the position-aligned sorted rows, which localizes a
    float divergence to the offending column and magnitude."""
    import json
    import os

    os.makedirs(dump_to, exist_ok=True)
    slines = _sorted_lines(scols, srows)
    olines = _sorted_lines(ocols, orows)
    only_spark = sorted(set(slines) - set(olines))
    only_duck = sorted(set(olines) - set(slines))
    col_deltas = None
    if sorted(scols) == sorted(ocols) and len(srows) == len(orows):
        sorder = sorted(range(len(scols)), key=lambda i: scols[i])
        oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
        # align rows by the same sort the hash uses, then diff per column
        skey = sorted(srows, key=lambda r: [_norm_cell(r[i]) for i in sorder])
        okey = sorted(orows, key=lambda r: [_norm_cell(r[i]) for i in oorder])
        col_deltas = {}
        for si, oi in zip(sorder, oorder):
            cname = scols[si]
            worst = None
            for sr, orow in zip(skey, okey):
                a, b = sr[si], orow[oi]
                if isinstance(a, (int, float)) and isinstance(b, (int, float)) \
                        and not isinstance(a, bool) and not isinstance(b, bool) \
                        and not (isinstance(a, float) and math.isnan(a)) \
                        and not (isinstance(b, float) and math.isnan(b)):
                    d = abs(float(a) - float(b))
                    if worst is None or d > worst[0]:
                        worst = (d, _norm_cell(a), _norm_cell(b))
                elif _norm_cell(a) != _norm_cell(b):
                    worst = (float("inf"), _norm_cell(a), _norm_cell(b))
            if worst is not None and worst[0] > 0:
                col_deltas[cname] = {
                    "max_abs_delta": worst[0],
                    "spark": worst[1],
                    "duckdb": worst[2],
                }
    path = os.path.join(dump_to, f"{name}.json")
    with open(path, "w") as f:
        json.dump(
            {
                "query": name,
                "spark_rows": len(srows),
                "duckdb_rows": len(orows),
                "spark_schema": ",".join(sorted(scols)),
                "duckdb_schema": ",".join(sorted(ocols)),
                "lines_only_in_spark": only_spark[:max_lines],
                "lines_only_in_duckdb": only_duck[:max_lines],
                "n_lines_only_in_spark": len(only_spark),
                "n_lines_only_in_duckdb": len(only_duck),
                "per_column_max_delta": col_deltas,
                "spark_lines": slines[:max_lines],
                "duckdb_lines": olines[:max_lines],
            },
            f,
            indent=1,
            default=str,
        )
    return path
