#!/usr/bin/env python
"""Floor decomposition of the five r12 256×-weak rows (VERDICT r12 item 2).

The r12 full-suite window read events_scd2_intervals 2.50×, events_sessionize
2.16×, orders_active_streaks 3.52×, sample_per_source_k 5.75× and
sample_curriculum 3.75× — all >2× with ≥1 s Spark time and no committed floor
probe. This tool runs, in one session per engine on the same derived corpus:

  1. the five queries paired (best-of-N, same window), and
  2. the Spark-side STAGE decomposition that bounds each residual:
     - streaks: scan → +month-expr → +collect_set agg → full
       (the r13 rewrite replaced the interpreted HOF lambdas — measured at
       1.7 s on 15k rows — with posexplode + two exchange-free rollups, and
       dropped the redundant date_trunc, −0.44 s/384M rows)
     - sessionize/scd2: scan → +decode → +exchange+sort+lag window → full
     - per_source_k: sizes-agg → md5 scan → +threshold filter → full
       (the r13 rewrite replaced the full two-pass rank — which sorted ALL
       rows to keep groups·k — with a threshold-prefiltered exact bottom-k)
     - curriculum: scan+explode-agg → full (the r13 rewrite computes per-
       epoch counts as parallel column aggregates over the UNEXPLODED corpus
       — one 60-bit hash + 2 ALU ops per epoch — and stack()s the tiny
       per-source result; was 5 md5+conv per doc over 5× exploded rows)

A row is CLOSED if its paired ratio ≤2×; otherwise the decomposition must
name the bound (e.g. "Spark's md5 scan floor alone exceeds DuckDB's whole
query" — an engine-throughput fact, not a plan defect).

Usage: python tools/weak5_floor_probe.py [--factor 256] [--runs 3]
Writes bench/WEAK5_x256_r13.json.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

QUERIES = [
    "orders_active_streaks",
    "events_sessionize",
    "events_scd2_intervals",
    "sample_per_source_k",
    "sample_curriculum",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=256)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    sf = REPO / ".tmp" / f"sfx{args.factor}"
    if not (sf / "_DERIVED").exists():
        print(f"derived corpus missing: run tools/scaleup_bench.py --factor {args.factor} first", file=sys.stderr)
        return 1

    import __spark_entry__ as entrymod
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from duckdb_ml_spark.operators.sampling import hash_uint
    from duckdb_ml_spark.session import get_spark
    from duckdb_ml_spark.tables import load
    from duckdb_ml_spark.testing import duckdb_connection

    spark = get_spark("weak5", sf_dir=str(sf))
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    def best(fn) -> float:
        b = 1e9
        for _ in range(args.runs):
            t0 = time.time()
            fn()
            b = min(b, time.time() - t0)
        return round(b, 3)

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    out: dict = {"factor": args.factor, "runs": args.runs, "paired": {}, "stages": {}}

    # --- paired runs ------------------------------------------------------
    con = duckdb_connection(str(sf))
    for name in QUERIES:
        s = best(lambda: noop(qs[name](spark, str(sf))))
        d = best(lambda: con.execute(oracles[name]).fetchall())
        out["paired"][name] = {
            "spark": s,
            "duckdb": d,
            "ratio": round(s / d, 2) if d > 0 else None,
        }
        print(f"paired {name}: spark={s} duck={d}", file=sys.stderr)
    con.close()

    # --- stage decompositions --------------------------------------------
    orders = load(spark, str(sf), "orders")
    mi = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("int")
    g = (
        orders.select("o_custkey", mi.alias("mi"))
        .groupBy("o_custkey")
        .agg(F.sort_array(F.collect_set("mi")).alias("ms"))
    )
    out["stages"]["orders_active_streaks"] = {
        "scan_count": best(lambda: orders.count()),
        "scan_plus_month_expr": best(
            lambda: orders.agg(F.sum(mi.cast("bigint"))).collect()
        ),
        "plus_collect_set_agg": best(lambda: noop(g)),
    }

    ev = load(spark, str(sf), "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    prev = F.lag(us).over(w)
    brk = F.when(prev.isNull() | (us - prev > 6 * 3600 * 1000000), 1).otherwise(0)
    out["stages"]["events_sessionize"] = {
        "scan_count": best(lambda: ev.count()),
        "scan_plus_decode": best(
            lambda: ev.agg(
                F.avg(F.unix_micros("ts")), F.count("user_id"), F.avg("event_id")
            ).collect()
        ),
        "plus_exchange_sort_lag_window": best(
            lambda: ev.select("user_id", "ts", "event_id", brk.alias("brk"))
            .agg(F.sum("brk"))
            .collect()
        ),
    }

    docs = load(spark, str(sf), "documents")
    t = docs.select("source", "doc_id").withColumn(
        "__h", hash_uint(F.col("doc_id"), "ksample", 15)
    )
    out["stages"]["sample_per_source_k"] = {
        "scan_count": best(lambda: docs.count()),
        "sizes_agg": best(
            lambda: docs.groupBy("source").agg(F.count(F.lit(1))).collect()
        ),
        "md5_scan": best(lambda: t.agg(F.avg("__h")).collect()),
    }

    out["notes"] = {
        "closed": "a paired ratio <= 2 closes the row for this round",
        "bounds": [
            "per_source_k: Spark's one md5+conv scan over the corpus (md5_scan) "
            "is the floor of ANY hash-defined sample; when it alone approaches "
            "or exceeds DuckDB's whole query, the residual is vectorized-md5 "
            "throughput, not plan shape (the r13 plan ranks only ~margin*k "
            "survivors, never sorts the corpus)",
            "streaks: plus_collect_set_agg is scan + month-expr + minimal "
            "distinct machinery; when it exceeds DuckDB's whole query the "
            "residual is per-row expression/agg throughput — the plan is "
            "already single-exchange with O(months) state per customer",
            "sessionize/scd2: plus_exchange_sort_lag_window is the one "
            "partition+sort every sessionization must pay; the full query "
            "adds only the running-sum window (same sort) and the rollup",
        ],
    }

    (REPO / "bench").mkdir(exist_ok=True)
    path = REPO / "bench" / f"WEAK5_x{args.factor}_r13.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
