#!/usr/bin/env python
"""Same-window A/B of spark.sql.files.maxPartitionBytes at a derived scale.

r11: the non-compact (>=2 GB input) session previously pinned the 128 MB
cluster default, which leaves the dominant fact table UNDER one task wave at
the mid-scale probes (256x: lineitem 2.8 GB / 128 MB = 22 tasks on 32 cores).
session.get_spark now scales the split to ~total/128 (clamped [16 MB, 128 MB],
converging back to 128 MB at >=16 GB). This probe runs a scan-bound subset
twice in ONE JVM - once at the session formula, once forced back to 128 MB -
so the comparison is same-window and page-cache-equal.

Usage: python tools/scansplit_probe.py [--factor 256] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

QUERIES = [
    "pricing_summary",
    "revenue_by_nation",
    "events_hourly",
    "asof_last_order",
    "text_quality_score",
    "dedup_exact_keys",
    "sample_token_budget",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=256)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()
    sf_dir = str(Path(__file__).resolve().parent.parent / ".tmp" / f"sfx{args.factor}")
    if not Path(sf_dir, "lineitem.parquet").exists():
        print(f"missing {sf_dir}; run tools/scaleup_bench.py first", file=sys.stderr)
        return 1

    import __spark_entry__ as entrymod
    from duckdb_ml_spark.session import get_spark

    qs = entrymod.queries()
    spark = get_spark("scansplit_probe", sf_dir=sf_dir)
    spark.sparkContext.setLogLevel("ERROR")
    formula_split = spark.conf.get("spark.sql.files.maxPartitionBytes")

    def run_all() -> dict[str, float]:
        out = {}
        for name in QUERIES:
            best = min(_time_one(qs[name], spark, sf_dir) for _ in range(args.runs))
            out[name] = round(best, 3)
            print(f"  {name}: {best:.3f}s", file=sys.stderr)
        return out

    # warm page cache + JIT once with the formula setting
    for name in QUERIES:
        _time_one(qs[name], spark, sf_dir)

    print(f"formula split = {formula_split}", file=sys.stderr)
    a = run_all()
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(128 << 20))
    print("forced split = 128 MB", file=sys.stderr)
    b = run_all()
    out = {
        "factor": args.factor,
        "runs": args.runs,
        "formula_split_bytes": int(formula_split),
        "scaled": a,
        "fixed_128m": b,
        "total_scaled": round(sum(a.values()), 2),
        "total_128m": round(sum(b.values()), 2),
    }
    print(json.dumps(out))
    return 0


def _time_one(fn, spark, sf_dir) -> float:
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.time() - t0


if __name__ == "__main__":
    raise SystemExit(main())
