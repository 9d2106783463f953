#!/usr/bin/env python
"""Measure vocab_topk plan variants at a derived scale factor.

The pre-r11 plan (v0) aggregated per (tok, doc_id) first: exact, but the
first exchange carries every distinct (tok, doc_id) pair — ~150M rows at
256x, by far the widest shuffle left in the text family. Measured at 256x
(bench/VOCAB_VARIANTS_x256_r11.json): v0 5.97 s, v1 3.50 s, v2 6.74 s —
v1 ADOPTED as the registered vocab_topk; v0 is kept inline here for the
record. Candidates:

- v0 legacy: explode -> groupBy(tok, doc_id) -> groupBy(tok).
- v1 two-branch: n_total from explode(ws), n_docs from
  explode(array_distinct(ws)); each branch partial-aggregates map-side so
  both exchanges are vocab-sized (thousands of rows, not 150M). Costs a
  second scan+tokenize of documents.text.
- v2 marked single-scan: one explode over concat(ws,
  transform(array_distinct(ws), t -> '#' || t)) — tokens are [a-z0-9]+ so
  '#' cannot collide; one scan, vocab-sized shuffle, but the transform
  lambda is interpreted per distinct token (CodegenFallback).

All three return identical rows (asserted). Usage:
    python tools/vocab_variants_probe.py --factor 256 [--runs 2]
Requires .tmp/sfx<factor>/ built by tools/scaleup_bench.py.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from duckdb_ml_spark.operators.text import VOCAB_TOP_K, vocab_topk
from duckdb_ml_spark.operators.textnorm import tokens
from duckdb_ml_spark.session import get_spark
from duckdb_ml_spark.tables import load


def v0_legacy(spark, sf_dir, k=VOCAB_TOP_K):
    docs = load(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    per_doc = tok.groupBy("tok", "doc_id").agg(F.count(F.lit(1)).alias("c"))
    return (
        per_doc.groupBy("tok")
        .agg(F.sum("c").alias("n_total"), F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.desc("n_total"), F.asc("tok"))
        .limit(k)
    )


def v2_marked(spark, sf_dir, k=VOCAB_TOP_K):
    docs = load(spark, sf_dir, "documents")
    ws = tokens(F.col("text"))
    marked = F.concat(ws, F.transform(F.array_distinct(ws), lambda t: F.concat(F.lit("#"), t)))
    ex = docs.select(F.explode(marked).alias("m"))
    per = ex.groupBy("m").agg(F.count(F.lit(1)).alias("c"))
    tot = per.where(~F.col("m").startswith("#")).select(F.col("m").alias("tok"), F.col("c").alias("n_total"))
    nd = per.where(F.col("m").startswith("#")).select(
        F.expr("substring(m, 2)").alias("tok"), F.col("c").alias("n_docs")
    )
    return (
        tot.join(nd, "tok")
        .orderBy(F.desc("n_total"), F.asc("tok"))
        .limit(k)
        .select("tok", "n_total", "n_docs")
    )


VARIANTS = {"v0_legacy": v0_legacy, "v1_two_branch": vocab_topk, "v2_marked": v2_marked}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=256)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()
    sf_dir = str(Path(__file__).resolve().parent.parent / ".tmp" / f"sfx{args.factor}")
    if not Path(sf_dir, "documents.parquet").exists():
        print(f"missing {sf_dir}; run tools/scaleup_bench.py --factor {args.factor} first", file=sys.stderr)
        return 1
    spark = get_spark("vocab_probe", sf_dir=sf_dir)
    # equality check once at the probe factor
    rows = {name: fn(spark, sf_dir).collect() for name, fn in VARIANTS.items()}
    base = [tuple(r) for r in rows["v0_legacy"]]
    for name, rs in rows.items():
        assert [tuple(r) for r in rs] == base, f"{name} differs from v0"
    out = {"factor": args.factor, "runs": args.runs, "rows_equal": True, "secs": {}}
    for name, fn in VARIANTS.items():
        best = min(_time_one(fn, spark, sf_dir) for _ in range(args.runs))
        out["secs"][name] = round(best, 3)
        print(f"{name}: {best:.3f}s", file=sys.stderr)
    print(json.dumps(out))
    return 0


def _time_one(fn, spark, sf_dir) -> float:
    t0 = time.time()
    fn(spark, sf_dir).collect()
    return time.time() - t0


if __name__ == "__main__":
    raise SystemExit(main())
