#!/usr/bin/env python
"""Bench the claimed production HLL path (VERDICT r14 item 3).

events_distinct_users_approx reads 73× at sf0.1 / 6.9× at 256× BY DESIGN —
it carries an exact-count verification branch. Its docstring claims
production uses the sketch ALONE (map-side approx_count_distinct partials,
one exchange of ~11 KB sketch states, no pair-dedup shuffle); that plan was
never itself a benched row. This probe times, on the same derived corpus in
one session per engine:

  1. sketch_only   — Spark: ev.groupBy(event_type).agg(approx_count_distinct
                     (user_id, 0.01)); DuckDB: approx_count_distinct. The
                     TRUE production plan both engines run at 100 TB.
                     (rows-only: raw estimates differ across sketches —
                     that is WHY the registry rows hash the ≥5σ band, not
                     the estimate.)
  2. hll_sketch_only row — the NEW registry row: production sketch branch +
                     dedup-first exact branch for band verification.
  3. distinct_users_approx row — the existing dedup-first verification row.

Usage: python tools/hll_sketch_probe.py [--factor 64] [--runs 3]
Writes bench/HLL_SKETCH_x{factor}_r15.json.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=64)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    sf = REPO / ".tmp" / f"sfx{args.factor}"
    if not (sf / "_DERIVED").exists():
        print(
            f"derived corpus missing: run tools/scaleup_bench.py --factor {args.factor} first",
            file=sys.stderr,
        )
        return 1

    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    from duckdb_ml_spark.session import get_spark
    from duckdb_ml_spark.tables import load
    from duckdb_ml_spark.testing import duckdb_connection

    spark = get_spark("hllprobe", sf_dir=str(sf))
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

    out: dict = {"factor": args.factor, "runs": args.runs, "paired": {}}

    ev = load(spark, str(sf), "events")
    sketch_only = lambda: noop(  # noqa: E731 — rebuilt per run (AQE replay trap)
        load(spark, str(sf), "events")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.01).alias("est_users"))
    )
    con = duckdb_connection(str(sf))
    s = best(sketch_only)
    d = best(
        lambda: con.execute(
            "SELECT event_type, approx_count_distinct(user_id) AS est_users "
            "FROM events GROUP BY event_type"
        ).fetchall()
    )
    out["paired"]["sketch_only"] = {
        "spark": s,
        "duckdb": d,
        "ratio": round(s / d, 2) if d > 0 else None,
        "note": "rows-only comparison: raw HLL estimates differ across "
        "engines by design; the registry rows hash the ≥5σ band instead",
    }
    print(f"paired sketch_only: spark={s} duck={d}", file=sys.stderr)

    for name in ("events_hll_sketch_only", "events_distinct_users_approx"):
        s = best(lambda: noop(qs[name](spark, str(sf))))
        d = best(lambda: con.execute(oracles[name]).fetchall())
        out["paired"][name] = {
            "spark": s,
            "duckdb": d,
            "ratio": round(s / d, 2) if d > 0 else None,
        }
        print(f"paired {name}: spark={s} duck={d}", file=sys.stderr)
    con.close()

    # stage decomposition + rsd sweep: names the bound. Measured at 256×
    # (25.6M events): scan 0.27, string-keyed group+count 0.39, +HLL at the
    # engine-default rsd 0.05 just 0.44 (the sketch update is ~free on top
    # of the agg), +HLL at rsd 0.01 (the gate's ≥5σ band precision) 1.36 —
    # the production bound is the string-keyed HashAggregate constant
    # (NOTES r12: UTF8String hashing vs dictionary-code grouping), and the
    # rsd-0.01 premium is a VERIFICATION artifact, not the production cost.
    def hll(rsd: float):
        return lambda: noop(
            load(spark, str(sf), "events")
            .groupBy("event_type")
            .agg(F.approx_count_distinct("user_id", rsd).alias("est"))
        )

    out["stages"] = {
        "scan_count": best(lambda: load(spark, str(sf), "events").count()),
        "group_count": best(
            lambda: noop(
                load(spark, str(sf), "events")
                .groupBy("event_type")
                .agg(F.count("user_id").alias("n"))
            )
        ),
        "group_hll_rsd05_default": best(hll(0.05)),
        "group_hll_rsd016_duck_parity": best(hll(0.016)),
        "group_hll_rsd01_band": best(hll(0.01)),
    }

    # plan facts for the record: the sketch-only plan must contain NO
    # Expand and NO pair-dedup aggregate — one partial/final HashAggregate
    # pair around a single exchange
    plan = (
        load(spark, str(sf), "events")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.01))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    out["plan_facts"] = {
        "expand_nodes": plan.count("Expand"),
        "exchanges": plan.count("Exchange"),
        "partial_sketch": "partial_approx_count_distinct" in plan,
    }

    (REPO / "bench").mkdir(exist_ok=True)
    path = REPO / "bench" / f"HLL_SKETCH_x{args.factor}_r15.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
