"""Permanent environment canaries (r10 bisection battery, retired r11).

Round 10 registered a 17-probe column-bisection battery here to localize the
five persistent local-green/driver-red rows. The readout (CORRECTNESS_r10) +
the judge's cross-reading of the oracles identified the root cause: every red
column was an uncast DuckDB integer `sum()` — HUGEINT (int128) under typed
serialization vs Spark's LONG — while every green column was `::BIGINT`-cast,
`count(*)`, or a pinned DOUBLE. The five oracles were cast-fixed in r11 and
the class is now structurally blocked by tests/test_oracle_types.py (DESCRIBE
type gate over every oracle). The probes re-executed their parents' full
plans, so with their diagnostic job done they are retired from the registry
(this file at tag/commit 'round 10' has the full battery + readout table;
NOTES.md keeps the narrative).

Round 12 (VERDICT r11 item 7): the last two canaries — canary_events_ts_sum
(content fingerprint of the events table) and canary_null_bool (NULL-BIGINT /
BOOLEAN normalization axes) — are retired from the registry too, both
driver-green in r10/r11 with their diagnostic job done. Their assertions now
run as a pytest gate (tests/test_canary_gate.py executes both Spark plans
against the DuckDB oracles at sf0.001 via the same compare_to_oracle path the
local gate replica uses), so the axes stay pinned without spending registry
entries or bench denominator. The builders and oracles below are kept solely
for that gate."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_ml_spark.plans.relational import QuerySpec
from duckdb_ml_spark.tables import load

# 2^30 (ADVICE r10 low): the per-row residue is < 2^30, so the BIGINT sum
# holds to 2^63/2^30 = 2^33 ≈ 8.5e9 event rows — far above any driver SF —
# whereas the r10 value (2^40) would wrap Spark's non-ANSI sum silently at
# ~1.7e7 rows while DuckDB's HUGEINT-then-cast path errors, turning a scale
# artifact into a fake RED on the one canary that anchors content readouts.
_TS_MOD = 1_073_741_824


def _events_ts_sum_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.agg(
        F.count(F.lit(1)).alias("n_events_total"),
        F.sum(F.unix_micros(F.col("ts")) % F.lit(_TS_MOD)).alias("ts_mod_sum"),
        F.sum("user_id").alias("uid_sum"),
        F.sum("event_id").alias("eid_sum"),
    )


_EVENTS_TS_SUM_ORACLE = f"""
SELECT count(*)::BIGINT AS n_events_total,
       sum(epoch_us(CAST(ts AS TIMESTAMP)) % {_TS_MOD})::BIGINT AS ts_mod_sum,
       sum(user_id)::BIGINT AS uid_sum,
       sum(event_id)::BIGINT AS eid_sum
FROM events
"""


def _null_bool_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = load(spark, sf_dir, "orders").groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )
    return g.select(
        "o_orderstatus",
        "n",
        F.when(F.col("o_orderstatus") == "F", F.lit(None).cast("bigint"))
        .otherwise(F.col("n"))
        .alias("maybe_null"),
        (F.col("n") > 100).alias("is_big"),
    )


_NULL_BOOL_ORACLE = """
SELECT o_orderstatus, count(*)::BIGINT AS n,
       (CASE WHEN o_orderstatus = 'F' THEN NULL ELSE count(*) END)::BIGINT
           AS maybe_null,
       count(*) > 100 AS is_big
FROM orders GROUP BY o_orderstatus
"""


# Retired from the driver registry r12 (kept for tests/test_canary_gate.py).
GATE_SPECS: dict[str, QuerySpec] = {
    "canary_events_ts_sum": QuerySpec(
        name="canary_events_ts_sum",
        builder=_events_ts_sum_q,
        oracle=_EVENTS_TS_SUM_ORACLE,
        doc="CANARY: one-row content fingerprint of the whole events table "
        "(count + sum of epoch-µs mod 2^30 + id sums) — red iff the events "
        "content itself reaches the engines differently.",
        tags=("bisect",),
    ),
    "canary_null_bool": QuerySpec(
        name="canary_null_bool",
        builder=_null_bool_q,
        oracle=_NULL_BOOL_ORACLE,
        doc="CANARY: multi-row output hashing a NULL BIGINT and a BOOLEAN — "
        "the normalization axes no single-row canary probes.",
        tags=("bisect",),
    ),
}

# Empty: nothing from this module is driver-registered anymore.
QUERIES: dict[str, QuerySpec] = {}
