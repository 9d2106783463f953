#!/usr/bin/env python
"""Measure span_dup_fraction plan variants at a derived scale factor.

The registered plan aggregates the exploded window stream per (doc, shingle)
with a plain groupBy - Catalyst plans an Exchange on (doc_id, shingle), which
carries every distinct (doc, gram) pair (~150M rows at 256x). But documents
are row-atomic: hash-partitioning docs by doc_id BEFORE the explode satisfies
the ClusteredDistribution([doc_id, shingle]) requirement (partitioning keys
are a subset of the grouping keys), so the per-doc aggregate runs
exchange-free and the only corpus-scale exchanges left are the shingle-keyed
ones the gram index genuinely needs.

Variants:
- s0 current registered plan.
- s1 doc-partitioned: docs.repartition(doc_id) (1.28M compact rows) before
  exploding; g aggregates exchange-free.

MEASURED (256x, min-of-2, bench/SPAN_VARIANTS_x256_r11.json): s0 18.31 s,
s1 18.07 s - a 1.3% wash. The (doc, shingle) exchange s1 removes is NOT the
bottleneck; the shingle-keyed MERGE join (string sorts over ~150M gram rows,
the above-gate spill-safe strategy) dominates. Registered plan kept as s0:
same speed, one fewer moving part. Kept as the negative-result record.

Usage: python tools/span_variants_probe.py [--factor 256] [--runs 2]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from duckdb_ml_spark.operators.dedup import (
    SPAN_JOIN_HASH_GATE,
    SPAN_N,
    _cached_count,
    span_dup_fraction,
)
from duckdb_ml_spark.operators.textnorm import exploded_shingles
from duckdb_ml_spark.session import get_spark
from duckdb_ml_spark.tables import load


def s1_doc_partitioned(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    n_docs = _cached_count(docs, (sf_dir, "documents", "rowcount"))
    pre = docs.repartition("doc_id")
    sh = exploded_shingles(pre, n=SPAN_N)
    g = sh.groupBy("doc_id", "shingle").agg(F.count(F.lit(1)).alias("mult"))
    counts = g.groupBy("shingle").agg(F.count(F.lit(1)).alias("n_docs_with"))
    strat = "SHUFFLE_HASH" if n_docs <= SPAN_JOIN_HASH_GATE else "MERGE"
    per_win = g.join(counts.hint(strat), "shingle").groupBy("doc_id").agg(
        F.sum("mult").alias("n_windows"),
        F.sum(F.col("mult") * (F.col("n_docs_with") >= 2).cast("bigint")).alias(
            "n_dup_windows"
        ),
    )
    return docs.select("doc_id").join(per_win.hint(strat), "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_windows", F.lit(0)).alias("n_windows"),
        F.coalesce("n_dup_windows", F.lit(0)).alias("n_dup_windows"),
        F.coalesce(
            F.col("n_dup_windows").cast("double") / F.col("n_windows"), F.lit(0.0)
        ).alias("dup_fraction"),
    )


def s0_current(spark, sf_dir):
    return span_dup_fraction(
        load(spark, sf_dir, "documents"), cache_key=(sf_dir, "documents", "rowcount")
    )


VARIANTS = {"s0_current": s0_current, "s1_doc_partitioned": s1_doc_partitioned}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=256)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()
    sf_dir = str(Path(__file__).resolve().parent.parent / ".tmp" / f"sfx{args.factor}")
    if not Path(sf_dir, "documents.parquet").exists():
        print(f"missing {sf_dir}", file=sys.stderr)
        return 1
    spark = get_spark("span_probe", sf_dir=sf_dir)
    spark.sparkContext.setLogLevel("ERROR")
    # equality: compare aggregate fingerprints (exact ints + row count)
    sums = {}
    for name, fn in VARIANTS.items():
        r = fn(spark, sf_dir).agg(
            F.count(F.lit(1)), F.sum("n_windows"), F.sum("n_dup_windows")
        ).collect()[0]
        sums[name] = tuple(r)
    assert len(set(sums.values())) == 1, f"variants differ: {sums}"
    out = {"factor": args.factor, "runs": args.runs, "fingerprints_equal": True, "secs": {}}
    for name, fn in VARIANTS.items():
        best = min(_time_one(fn, spark, sf_dir) for _ in range(args.runs))
        out["secs"][name] = round(best, 3)
        print(f"{name}: {best:.3f}s", file=sys.stderr)
    print(json.dumps(out))
    return 0


def _time_one(fn, spark, sf_dir) -> float:
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.time() - t0


if __name__ == "__main__":
    raise SystemExit(main())
