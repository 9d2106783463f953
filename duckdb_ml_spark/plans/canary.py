"""Environment-canary battery (VERDICT r8 item 1).

R9 READOUT — ALL FIVE GREEN (CORRECTNESS_r09) while 4 of the 5 fixed rows
stayed red: every axis below is FALSIFIED as the red mechanism. The battery
stays in the window as a guard (a future red here would still be
meaningful), but round 10's diagnosis moved to COLUMN BISECTION
(plans/bisect.py) plus two new canaries for the axes this battery never
probed (multi-row outputs, NULL BIGINT, BOOLEAN, large-magnitude ints).

Original rationale: five driver rows went hash-red in r5-r8 while EVERY
local configuration (gate replica at two SFs, vanilla driver-like session)
passes — the divergence lives in the driver's environment (its DuckDB
version / testdata timestamp encoding / result-normalization path), which
this repo cannot observe directly. These five single-row query/oracle pairs
each isolate ONE suspected divergence axis, so the green/red PATTERN of the
canary block is itself the diagnostic readout (interpretation table:
NOTES.md "Canary battery readout").

Axes, one per canary:

  canary_ts_raw          a raw TIMESTAMP value (min(ts)) hashed directly.
                         RED iff the ns-vs-µs parquet-encoding theory holds
                         (driver testdata has shipped ts as TIMESTAMP(NANOS)
                         in some rounds — tables.py:71; Spark truncates
                         ns→µs at read, a ns-capable oracle engine need not).
  canary_ts_epoch_us     the SAME instant as an epoch-microseconds BIGINT on
                         both engines. Must stay GREEN under any encoding —
                         this is the contract the sessionize/SCD2 fixes
                         adopt; if THIS reds, integers themselves diverge
                         and the whole theory is wrong.
  canary_quantile_interp a quantile_cont-interpolated bound emitted RAW
                         (unrounded). The Spark side replicates THIS host's
                         DuckDB 1.0.0 symmetric interpolation bitwise
                         (orderstats.quantile_cont_sorted); RED iff the
                         driver's oracle DuckDB interpolates differently by
                         ulps — the suspected orders_winsorized_stats
                         mechanism (r5-r8).
  canary_decimal_literal the same arithmetic written with bare DECIMAL
                         literals in the oracle (`0.5 + n/7.0`) vs pure
                         doubles in Spark. DuckDB's DECIMAL
                         division/promotion rules are version-dependent and
                         a Decimal RESULT normalizes via str() (trailing
                         zeros) instead of float repr — the suspected
                         text_bm25_scores / capped-shards mechanism.
  canary_float_repr      one IEEE double with >9 significant digits built
                         from exact integers with pinned DOUBLE casts on
                         both sides (bit-identical by construction). RED iff
                         the driver harness normalizes floats differently
                         than repr(round(v, 9)) — the last axis left.

All five scan `orders`/`events` (driver-registered views) and return ONE
row, so they cost ~nothing in the 50-slot window. Since r12 they are tagged
`nobench` (VERDICT r11 item 7): they stay registered as permanent env-drift
sentinels for the driver gate, but the bench denominator now counts engine
queries only (the two r10 bisect-era canaries are retired outright —
plans/bisect.py → tests/test_canary_gate.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_ml_spark.plans.relational import QuerySpec
from duckdb_ml_spark.tables import load


def _ts_raw_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events").agg(F.min("ts").alias("ts_min"))


_TS_RAW_ORACLE = "SELECT min(ts) AS ts_min FROM events"


def _ts_epoch_us_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events").agg(
        F.unix_micros(F.min("ts")).alias("ts_min_us")
    )


# CAST(... AS TIMESTAMP) pins the oracle to µs precision before epoch_us,
# matching Spark's read-time ns→µs truncation whatever the file encoding is
_TS_EPOCH_US_ORACLE = (
    "SELECT epoch_us(CAST(min(ts) AS TIMESTAMP)) AS ts_min_us FROM events"
)


def _quantile_interp_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_ml_spark.plans.orderstats import group_quantiles_kernel

    orders = load(spark, sf_dir, "orders").select(
        F.lit(1).alias("__g"), "o_totalprice"
    )
    return group_quantiles_kernel(
        orders, "__g", "o_totalprice", [0.05], ["q05"]
    ).select("q05")


_QUANTILE_INTERP_ORACLE = (
    "SELECT quantile_cont(o_totalprice, 0.05) AS q05 FROM orders"
)


def _decimal_literal_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.agg(
        (F.lit(0.5) + F.count(F.lit(1)) / F.lit(7.0)).alias("v")
    )


# deliberately BARE decimal literals — the axis under test; the quotient is
# non-terminating so any scale-limited DECIMAL evaluation differs from the
# IEEE double inside the 9-dp normalization window
_DECIMAL_LITERAL_ORACLE = "SELECT 0.5 + count(*) / 7.0 AS v FROM orders"


def _float_repr_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.agg(
        (F.count(F.lit(1)).cast("double") / F.lit(7.0)).alias("v")
    )


_FLOAT_REPR_ORACLE = (
    "SELECT CAST(count(*) AS DOUBLE) / CAST(7 AS DOUBLE) AS v FROM orders"
)


QUERIES: dict[str, QuerySpec] = {
    "canary_ts_raw": QuerySpec(
        "canary_ts_raw", _ts_raw_q, _TS_RAW_ORACLE,
        doc="ENV CANARY: raw TIMESTAMP passthrough — red iff the testdata "
        "ts encoding (ns vs µs) reaches the two engines differently.",
        tags=("canary", "nobench"),
    ),
    "canary_ts_epoch_us": QuerySpec(
        "canary_ts_epoch_us", _ts_epoch_us_q, _TS_EPOCH_US_ORACLE,
        doc="ENV CANARY: the same instant as epoch-µs BIGINT — must be "
        "green under any encoding (the sessionize/SCD2 output contract).",
        tags=("canary", "nobench"),
    ),
    "canary_quantile_interp": QuerySpec(
        "canary_quantile_interp", _quantile_interp_q, _QUANTILE_INTERP_ORACLE,
        doc="ENV CANARY: quantile_cont interpolated bound emitted raw — red "
        "iff the oracle-side DuckDB interpolation differs by ulps.",
        tags=("canary", "nobench"),
    ),
    "canary_decimal_literal": QuerySpec(
        "canary_decimal_literal", _decimal_literal_q, _DECIMAL_LITERAL_ORACLE,
        doc="ENV CANARY: bare DECIMAL-literal arithmetic in the oracle vs "
        "pure doubles in Spark — red iff DECIMAL division/promotion or its "
        "result type differs in the driver's DuckDB.",
        tags=("canary", "nobench"),
    ),
    "canary_float_repr": QuerySpec(
        "canary_float_repr", _float_repr_q, _FLOAT_REPR_ORACLE,
        doc="ENV CANARY: one bit-identical IEEE double with >9 significant "
        "digits — red iff the harness float normalization differs.",
        tags=("canary", "nobench"),
    ),
}
