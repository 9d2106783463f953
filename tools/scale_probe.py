#!/usr/bin/env python
"""Scaling-curve probe: run representative queries at sf0.001 / 0.01 / 0.1 and
print wall-clock per sf, plus the 0.01→0.1 growth factor (data grows 10×).

A growth factor well under 10 means the per-query fixed cost (scheduling,
codegen) dominates and the data term is amortizing — the regime where adding
data is cheap. A factor near 10 means the operator is data-bound and linear;
super-10 would flag a super-linear plan (the thing to fix before 100 TB).

Usage: python tools/scale_probe.py [--only q1,q2] [--sfs sf0.001,sf0.01,sf0.1]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DEFAULT_QUERIES = [
    "pricing_summary",        # scan-heavy global agg
    "minmax_scaled",          # agg + broadcast cross join + projection
    "dedup_minhash_signatures",  # explode + 16-agg groupBy (md5-bound)
    "dedup_simhash",          # explode + 60-agg groupBy
    "sim_topk_bruteforce",    # broadcast-matrix kernel
    "asof_last_order",        # union + carry-forward window
    "stream_sessions",        # session windows
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    ap.add_argument("--sfs", default="sf0.001,sf0.01,sf0.1")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from duckdb_ml_spark.session import get_spark

    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = args.only.split(",") if args.only else DEFAULT_QUERIES
    sfs = args.sfs.split(",")

    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        timings = {}
        for sf in sfs:
            sf_dir = f"/root/testdata/{sf}"
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm plan/code
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[sf] = round(time.perf_counter() - t0, 3)
        growth = (
            round(timings[sfs[-1]] / timings[sfs[-2]], 2)
            if len(sfs) >= 2 and timings[sfs[-2]] > 0
            else None
        )
        out[name] = {**timings, "growth_last_decade": growth}
        print(json.dumps({"query": name, **out[name]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
