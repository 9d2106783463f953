#!/usr/bin/env python
"""Time every oracle_sql() entry in DuckDB — the denominator of the 2x contract.

Methodology mirrors bench.py: each query timed N times (default 2), min
reported (steady-state cost, isolated from host contention). DuckDB side is
the EXACT oracle SQL the correctness gate runs, fetchall'd (DuckDB's analogue
of full plan execution; it has no noop sink).

Usage: python tools/duck_bench.py [--sf-dir /root/testdata/sf0.1] [--runs 2]
Prints one JSON line: {"total": sec, "queries": {name: sec, ...}}
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)  # keep in lockstep with bench.py RUNS
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from duckdb_ml_spark.testing import duckdb_connection

    # some oracles read .tmp/ exports created by the Spark query builders
    # (source_*_roundtrip): run those builders first so the files exist
    from duckdb_ml_spark.session import get_spark

    spark = get_spark("duck_bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # mirror bench.py: diagnostic/structural re-execution wrappers excluded
    specs = entrymod._all_query_specs()
    _NOBENCH = {"bisect", "nobench"}
    oracles = {
        k: v for k, v in oracles.items()
        if not _NOBENCH & set(getattr(specs.get(k), "tags", ()) or ())
    }
    for name in ("source_csv_roundtrip", "source_jsonl_roundtrip"):
        if name in qs:
            try:
                qs[name](spark, args.sf_dir).count()
            except Exception:
                pass

    from bench import HIGH_VARIANCE_ROWS  # min-of-5 rows, same set both engines

    con = duckdb_connection(args.sf_dir)
    times: dict[str, float] = {}
    for name, sql in oracles.items():
        best = -1.0
        for _ in range(
            max(args.runs, 5) if name in HIGH_VARIANCE_ROWS else args.runs
        ):
            t0 = time.perf_counter()
            try:
                con.execute(sql).fetchall()
                t = time.perf_counter() - t0
                best = t if best < 0 else min(best, t)
            except Exception as e:
                print(f"duck_bench: {name} FAILED: {str(e).splitlines()[0][:200]}", file=sys.stderr)
                best = -1.0
                break
        times[name] = round(best, 3)
    ok = {k: v for k, v in times.items() if v >= 0}
    print(json.dumps({"total": round(sum(ok.values()), 3), "queries": times, "runs": args.runs}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
