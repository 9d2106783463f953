#!/usr/bin/env python
"""Floor decomposition probe: measures the fixed per-query overhead of small
queries under different engine configs (AQE on/off, shuffle partition counts).

The bench suite's ratio-vs-DuckDB is dominated at sf<=0.1 by a fixed per-query
cost (job scheduling + stage materialization), not data work. This probe
quantifies each config's floor so the session defaults for toy scale are chosen
from measurement, not folklore. At real scale AQE on + more partitions is the
right default; the probe tells us what the bench pays for that at sf0.1.

Usage: python tools/floor_probe.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def probe(aqe: str, parts: str, sf_dir: str) -> dict[str, float]:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.appName(f"floor_aqe{aqe}_p{parts}")
        .master("local[32]")
        .config("spark.sql.adaptive.enabled", aqe)
        .config("spark.sql.shuffle.partitions", parts)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    cases = {
        "noop_1row": lambda: noop(spark.range(1)),
        "scan_count": lambda: noop(lineitem.groupBy().count()),
        "agg_1key": lambda: noop(
            lineitem.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
        ),
        "join_agg_sort": lambda: noop(
            customer.join(orders, customer.c_custkey == orders.o_custkey)
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("c_mktsegment")
        ),
        "distinct": lambda: noop(customer.select("c_mktsegment").distinct()),
    }
    # warm codegen for every shape
    for fn in cases.values():
        fn()
    out = {}
    for name, fn in cases.items():
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
    spark.stop()
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    for aqe in ("true", "false"):
        for parts in ("32", "8"):
            res = probe(aqe, parts, sf_dir)
            total = round(sum(res.values()), 3)
            print(f"aqe={aqe} parts={parts} total={total} {res}", flush=True)


if __name__ == "__main__":
    main()
