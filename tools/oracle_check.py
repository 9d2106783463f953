#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

For every entry in __spark_entry__.queries(), runs the Spark DataFrame and the
matching oracle_sql() in DuckDB against the same parquet tables, then compares
row count + schema + order-insensitive value hash (duckdb_ml_spark.testing).

Usage:  python tools/oracle_check.py [--sf-dir /root/testdata/sf0.01] [--only name,...]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from duckdb_ml_spark.session import get_spark
    from duckdb_ml_spark.testing import compare_to_oracle, duckdb_connection

    spark = get_spark("oracle_check")
    con = duckdb_connection(args.sf_dir)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(args.only.split(",")) if args.only else None

    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf_dir)
            if name not in oracles:
                n = sdf.count()
                print(f"ROWS  {name}: rows={n} (no oracle) [{time.time() - t0:.1f}s]")
                n_rows_only += 1
                continue
            # Type gate (VERDICT r10 item 2): DuckDB sum() over ints returns
            # HUGEINT, which hashes differently from Spark LONG in any typed
            # serialization while fetchall() hides it locally. Fail fast at
            # authoring time instead of going driver-red.
            bad_types = [
                (c, t)
                for c, t, *_ in con.execute(f"DESCRIBE {oracles[name]}").fetchall()
                if any(k in t.upper() for k in ("HUGEINT", "DECIMAL"))
            ]
            if bad_types:
                print(f"FAIL  {name}: oracle emits unstable types {bad_types} "
                      "(cast to ::BIGINT / ::DOUBLE)")
                n_fail += 1
                continue
            sf_tag = Path(args.sf_dir).name
            report = compare_to_oracle(
                sdf, oracles[name], con,
                dump_to="diagnostics", name=f"{name}_{sf_tag}",
            )
        except Exception as e:
            print(f"FAIL  {name}: error: {str(e).splitlines()[0][:300]}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if report["match"]:
            print(f"PASS  {name}: rows={report['spark']['rows']} hash={report['spark']['hash']} [{dt:.1f}s]")
            n_pass += 1
        else:
            print(f"FAIL  {name}: spark={report['spark']} duckdb={report['duckdb']}"
                  f" dump={report.get('dump')}")
            n_fail += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
