#!/usr/bin/env python
"""Decomposition probe for decontaminate_bloom at scale (VERDICT r14 item 2).

The row reads 46.2 s vs 9.0 s = 5.1× at 256× (1.42 s / 6.8× at sf0.1). The
standing explanation ("the derived corpus contaminates ~everything, so the
prefilter removes nothing") dates from r9, before the bitmask-aggregate and
layout-advisor machinery existed. This probe re-derives the bound from
scratch on the CURRENT plan, stage by stage (min-of-N, noop writes, plan
rebuilt per run — the EDITDIST_PROBE_r14 discipline):

  A. shingle_stream   — corpus_shingles train side, count only (scan+explode
                        +dedup floor every variant pays)
  B. plus_md5         — + the portable 60-bit md5 hash per (doc, shingle)
                        (the oracle-parity recipe; xxhash64 is production)
  C. plus_probe       — + broadcast-array element_at/bitwiseAND filter
  D. survivor_fraction— survivors / train shingles (how much the prefilter
                        prunes HERE: on the derived corpus ~nothing)
  E. plus_verify_join — + the exact verify join against eval shingles
  F. full_query       — + the one groupBy(countDistinct) shuffle
  G. exact_train      — decontaminate_train (no bloom) for reference
  H. xxhash64_variant — the production-hash form of the full bloom query
  I. duck_oracle      — the shared _DECONTAM_ORACLE, same window

Usage: python tools/bloom_floor_probe.py [--factor 256] [--runs 3]
Writes bench/BLOOMFLOOR_x{factor}_r15.json.
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
    ap.add_argument("--factor", type=int, default=256)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    sf = REPO / ".tmp" / f"sfx{args.factor}"
    if not (sf / "_DERIVED").exists():
        print(
            f"derived corpus missing: run tools/scaleup_bench.py --factor {args.factor} first",
            file=sys.stderr,
        )
        return 1

    from pyspark.sql import functions as F

    from duckdb_ml_spark.operators.pipeline import (
        EVAL_MOD,
        _bloom_hash,
        _decontam_bloom_q,
        _decontam_q,
        corpus_shingles,
        decontaminate_bloom,
    )
    from duckdb_ml_spark.session import get_spark
    from duckdb_ml_spark.testing import duckdb_connection

    spark = get_spark("bloomfloor", sf_dir=str(sf))
    spark.sparkContext.setLogLevel("ERROR")

    def best(fn) -> float:
        b = 1e9
        for _ in range(args.runs):
            t0 = time.time()
            fn()
            b = min(b, time.time() - t0)
        return round(b, 3)

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def train():
        return corpus_shingles(spark, str(sf)).where(F.col("doc_id") % EVAL_MOD != 0)

    def evals():
        return corpus_shingles(spark, str(sf)).where(F.col("doc_id") % EVAL_MOD == 0)

    out: dict = {"factor": args.factor, "runs": args.runs, "stages": {}}

    n_train = train().count()
    out["stages"]["shingle_stream_rows"] = n_train
    out["stages"]["A_shingle_stream"] = best(lambda: train().count())
    out["stages"]["B_plus_md5"] = best(
        lambda: train()
        .select(_bloom_hash(F.col("shingle")).alias("__h"))
        .agg(F.avg("__h"))
        .collect()
    )
    out["stages"]["B2_plus_xxhash64"] = best(
        lambda: train()
        .select(_bloom_hash(F.col("shingle"), "xxhash64").alias("__h"))
        .agg(F.avg("__h"))
        .collect()
    )

    # C/D: probe filter only (no verify/groupBy) — count survivors
    from duckdb_ml_spark.operators.pipeline import (
        BLOOM_WORDS,
        _bloom_probes_from,
        bloom_filter_words,
    )

    def probe_only(hash_fn: str):
        ev_sh = evals().select("shingle").distinct()
        filt = bloom_filter_words(ev_sh, BLOOM_WORDS, hash_fn)
        words = {r["wi"]: r["word"] for r in filt.collect()}
        arr = [words.get(i, 0) for i in range(BLOOM_WORDS)]
        words_row = spark.createDataFrame([(arr,)], "words array<bigint>")
        probed = train().withColumn(
            "__h", _bloom_hash(F.col("shingle"), hash_fn)
        ).crossJoin(F.broadcast(words_row))
        hits = [
            F.element_at(F.col("words"), (wi + 1).cast("int")).bitwiseAND(mask) != 0
            for wi, mask in _bloom_probes_from(F.col("__h"), BLOOM_WORDS)
        ]
        return probed.where(hits[0] & hits[1])

    out["stages"]["C_plus_probe"] = best(lambda: noop(probe_only("portable")))
    n_surv = probe_only("portable").count()
    out["stages"]["D_survivors"] = n_surv
    out["stages"]["D_survivor_fraction"] = round(n_surv / max(n_train, 1), 4)

    def full(hash_fn: str):
        return decontaminate_bloom(train(), evals(), hash_fn=hash_fn)

    out["stages"]["E_plus_verify_join"] = best(
        lambda: noop(
            probe_only("portable")
            .select("doc_id", "shingle")
            .join(evals().select("shingle").distinct(), "shingle")
        )
    )
    out["stages"]["F_full_query"] = best(lambda: noop(full("portable")))
    out["stages"]["H_xxhash64_full"] = best(lambda: noop(full("xxhash64")))
    out["stages"]["G_exact_train"] = best(
        lambda: noop(_decontam_q(spark, str(sf)))
    )
    out["stages"]["F_bloom_row_registered"] = best(
        lambda: noop(_decontam_bloom_q(spark, str(sf)))
    )

    con = duckdb_connection(str(sf))
    from duckdb_ml_spark.operators.pipeline import _DECONTAM_ORACLE

    out["stages"]["I_duck_oracle"] = best(
        lambda: con.execute(_DECONTAM_ORACLE).fetchall()
    )
    con.close()

    (REPO / "bench").mkdir(exist_ok=True)
    path = REPO / "bench" / f"BLOOMFLOOR_x{args.factor}_r15.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
