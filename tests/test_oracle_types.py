"""Oracle result-type gate (VERDICT r10 item 2).

Root cause of six rounds of local-green/driver-red rows: DuckDB's `sum()` over
INTEGER/BIGINT returns HUGEINT (int128).  The local gate replica normalizes via
`fetchall()` -> Python int, so both engines hash identically here, while any
typed serialization of the oracle result (Arrow exports HUGEINT as decimal128)
hashes differently from Spark's LONG.  The r10 17-probe bisection battery
confirmed the pattern: every red column was an uncast integer `sum()`, every
green one was `::BIGINT`-cast, `count(*)`, or a pinned DOUBLE.

This test makes the class structurally impossible: `DESCRIBE <oracle>` (planner
only — no execution) on every `oracle_sql()` entry, asserting no RESULT column
is HUGEINT / UHUGEINT / DECIMAL.  Intermediate CTE columns may still be HUGEINT
(harmless — only the serialized result crosses the engine boundary).

No SparkSession needed; runs in milliseconds per oracle.
"""

from __future__ import annotations

import pytest

BANNED = ("HUGEINT", "UHUGEINT", "DECIMAL")


def _oracles():
    import __spark_entry__ as entrymod

    return [
        pytest.param(name, sql, id=name)
        for name, sql in sorted(entrymod.oracle_sql().items())
    ]


@pytest.fixture(scope="module")
def con():
    from duckdb_ml_spark.testing import duckdb_connection

    return duckdb_connection("/root/testdata/sf0.01")


@pytest.mark.parametrize("name,sql", _oracles())
def test_oracle_result_types_are_hash_stable(con, name, sql):
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    offenders = [
        (col, typ)
        for col, typ, *_ in rows
        if any(k in typ.upper() for k in BANNED)
    ]
    assert not offenders, (
        f"oracle '{name}' emits engine-boundary-unstable result types "
        f"{offenders}: cast integer sum()s to ::BIGINT and money/ratio "
        f"columns to ::DOUBLE (see VERDICT r10 'What's wrong')"
    )
