#!/usr/bin/env python
"""revenue_by_nation residual decomposition at a derived scale (VERDICT r11
item 4: 2.92 s vs DuckDB 0.89 s at 256× — last lever: bucketed layout on the
orderkey join, or prove the residual is scan floor).

Variants, one JVM, interleaved runs (page-cache-equal):
  scan      4-column lineitem scan only (noop)      — the engine's scan floor
  li_asia   scan + broadcast-ASIA-supplier join + project + 5-group agg
            (no orders join at all)                 — the fact-side floor
  full      the registered query                    — adds the oc shuffle join
  bucketed  li_asia and oc both written bucketed+sorted on orderkey once
            (write time reported separately), then the zero-exchange
            SortMergeJoin + agg                     — the layout lever
DuckDB runs the registered oracle in the same window for the ratio.

Interpretation: if (full − li_asia) is small, the shuffle join is NOT the
residual and bucketing can't win it back — the gap to DuckDB is scan/engine
floor. If (full − li_asia) is material AND bucketed ≈ li_asia + ε, the
layout closes it at the price of the one-time write.

Usage: python tools/revenue_floor_probe.py [--factor 256] [--runs 3]
Writes bench/REVENUE_FLOOR_x<factor>_r12.json.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _t(thunk) -> float:
    t0 = time.time()
    thunk()
    return time.time() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=256)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()
    sf_dir = str(REPO / ".tmp" / f"sfx{args.factor}")
    if not Path(sf_dir, "lineitem.parquet").exists():
        print(f"missing {sf_dir}; run tools/scaleup_bench.py first", file=sys.stderr)
        return 1

    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    from duckdb_ml_spark.plans.relational import revenue_by_nation
    from duckdb_ml_spark.session import get_spark
    from duckdb_ml_spark.tables import load

    spark = get_spark("revenue_floor_probe", sf_dir=sf_dir)
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region")
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )

    asia_nat = nat.join(
        F.broadcast(reg.where(F.col("r_name") == "ASIA")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    supp_asia = supp.join(
        F.broadcast(asia_nat.select("n_nationkey")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_nationkey")
    cust_asia = cust.join(
        F.broadcast(asia_nat.select("n_nationkey")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey", "c_nationkey")
    oc = orders.join(
        F.broadcast(cust_asia), F.col("c_custkey") == F.col("o_custkey")
    ).select("o_orderkey", "c_nationkey")

    def v_scan():
        noop(li.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"))

    def li_asia_df():
        return li.join(
            F.broadcast(supp_asia), F.col("l_suppkey") == F.col("s_suppkey")
        ).select(
            "l_orderkey",
            "s_nationkey",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("__rev"),
        )

    def v_li_asia():
        noop(
            li_asia_df()
            .groupBy("s_nationkey")
            .agg(F.sum("__rev").alias("r"), F.count(F.lit(1)).alias("n"))
        )

    def v_full():
        noop(revenue_by_nation(spark, sf_dir))

    # bucketed: both narrow sides on the join key, written once. Catalyst
    # folds the post-join nation filter back into the join condition, so the
    # SMJ keys become (nationkey, orderkey); the orderkey bucket is a SUBSET
    # of them, which Spark only accepts as co-partitioning with
    # requireAllClusterKeysForCoPartition=false (subset clustering is always
    # a valid — coarser — clustering; with the default 'true' both bucketed
    # sides re-shuffled, measured as 2 exchanges).
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    tag = f"x{args.factor}"
    tl, to = f"rev_li_{tag}", f"rev_oc_{tag}"
    root = str(REPO / ".tmp" / f"sfx{args.factor}" / "bucketed_rev")
    from duckdb_ml_spark.sources.readers import write_bucketed

    schemas = {
        tl: ("l_orderkey BIGINT, s_nationkey INT, __rev DOUBLE", "l_orderkey"),
        to: ("o_orderkey BIGINT, c_nationkey INT", "o_orderkey"),
    }
    write_t = None
    if Path(root, tl, "_SUCCESS").exists():
        # layout already on disk from a prior session: re-register the
        # external bucketed tables instead of rewriting (the in-memory
        # catalog does not survive sessions)
        for name, (cols, key) in schemas.items():
            if not spark.catalog.tableExists(name):
                spark.sql(
                    f"CREATE TABLE {name} ({cols}) USING PARQUET "
                    f"CLUSTERED BY ({key}) SORTED BY ({key}) INTO 32 BUCKETS "
                    f"LOCATION '{root}/{name}'"
                )
    else:
        write_t = _t(
            lambda: (
                write_bucketed(li_asia_df(), tl, "l_orderkey", f"{root}/{tl}", n_buckets=32),
                write_bucketed(oc, to, "o_orderkey", f"{root}/{to}", n_buckets=32),
            )
        )

    def bucketed_join():
        # join key = the BUCKET key only; the nation equality is an inner-join
        # filter, not a cluster key (with it in the ON clause Spark requires
        # co-partitioning on ALL keys and re-shuffles both bucketed sides —
        # measured: 2 exchanges)
        lb, ob = spark.table(tl), spark.table(to)
        return lb.join(ob, F.col("l_orderkey") == F.col("o_orderkey")).where(
            F.col("s_nationkey") == F.col("c_nationkey")
        )

    def v_bucketed():
        agg = bucketed_join().groupBy("s_nationkey").agg(
            F.sum("__rev").alias("r"), F.count(F.lit(1)).alias("n")
        )
        noop(agg.join(F.broadcast(asia_nat), F.col("s_nationkey") == F.col("n_nationkey")))

    variants = {
        "scan": v_scan,
        "li_asia": v_li_asia,
        "full": v_full,
        "bucketed": v_bucketed,
    }
    # warm
    for fn in variants.values():
        fn()
    times = {k: [] for k in variants}
    for _ in range(args.runs):
        for k, fn in variants.items():
            times[k].append(_t(fn))
    med = {k: round(sorted(v)[len(v) // 2], 3) for k, v in times.items()}

    # exchange count in the bucketed plan (sanity: join itself shuffle-free)
    bplan = bucketed_join()._jdf.queryExecution().executedPlan().toString()
    n_exch = bplan.count("Exchange")

    # DuckDB pair, same window
    from duckdb_ml_spark.testing import duckdb_connection

    con = duckdb_connection(sf_dir)
    sql = entrymod.oracle_sql()["revenue_by_nation"]
    con.execute(sql).fetchall()  # warm
    dtimes = [_t(lambda: con.execute(sql).fetchall()) for _ in range(args.runs)]
    duck = round(sorted(dtimes)[len(dtimes) // 2], 3)
    con.close()

    out = {
        "factor": args.factor,
        "runs": args.runs,
        "spark_sec": med,
        "bucketed_write_sec": round(write_t, 2) if write_t is not None else "cached",
        "bucketed_join_exchanges": n_exch,
        "duckdb_sec": duck,
        "ratio_full": round(med["full"] / duck, 2),
        "ratio_bucketed": round(med["bucketed"] / duck, 2),
        "shuffle_residual_sec": round(med["full"] - med["li_asia"], 3),
        "scan_floor_sec": med["scan"],
    }
    path = REPO / "bench" / f"REVENUE_FLOOR_x{args.factor}_r12.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
