#!/usr/bin/env python
"""Same-window A/B of spark.sql.files.maxPartitionBytes at a derived scale.

OUTCOME (r11, bench/SCANSPLIT_x256_r11.json): FALSIFIED — the data-scaled
split (~total/128, clamped [16 MB, 128 MB]) wins only on the widest pure-scan
aggregate (pricing_summary 2.26 → 1.84 s, whose fact otherwise gets 22 tasks
on 32 cores) and pays it back in task overhead on Arrow-kernel queries
(sample_token_budget 7.13 → 7.73 s); the 7-query total was a wash (22.58 vs
22.90 s). session.get_spark therefore KEEPS the 128 MB default for
non-compact sessions (justification inline in session.py) — the hypothesis
is recorded here, not shipped.

The probe remains runnable for re-measurement on other hosts/scales: the A
side sets the scaled split EXPLICITLY (same formula, applied by this script —
ADVICE r11: it must not rely on the session doing it, since the session no
longer does), the B side forces 128 MB, both in ONE JVM so the comparison is
same-window and page-cache-equal.

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
    # A side: apply the (falsified, unshipped) data-scaled formula explicitly
    # — total input / 128 target tasks, clamped to [16 MB, 128 MB]
    total_bytes = sum(
        f.stat().st_size for f in Path(sf_dir).glob("**/*") if f.is_file()
    )
    scaled = max(16 << 20, min(128 << 20, total_bytes // 128))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(scaled))
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
