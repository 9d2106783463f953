"""Column-bisection probes for the five driver-red queries (VERDICT r9 item 1).

Round-9 outcome: ALL FIVE environment canaries came back GREEN while 4 of the
5 re-engineered red rows stayed RED (CORRECTNESS_r09) — every r9 environment
theory (ns-vs-µs ts encoding, epoch-µs integer divergence, quantile
interpolation, DECIMAL-literal arithmetic, harness float repr) is falsified
by the repo's own instrument. The five reds all pass the local gate replica
at sf0.01 AND sf0.1 with driver-identical row counts (judge-verified), so the
divergence is on an axis the single-row canaries never exercised. Per the
NOTES.md decision table ("if any fixed row is red with its canary green, the
mechanism is something else"), this round stops theorizing and BISECTS: each
red query gets column-subset variants registered as oracle-paired driver
entries, so CORRECTNESS_r10's green/red pattern names the diverging
column(s) directly.

Axes the r9 battery never probed, now covered:

  multi-row outputs      every r9 canary was 1-row; all five reds are
                         multi-row. canary_events_ts_sum reduces the events
                         table to ONE row of content fingerprints (count +
                         column sums) — if it REDS, the events content
                         itself reaches the two engines differently in the
                         driver env; if GREEN while per-row bisects red, the
                         divergence is per-row (values or normalization).
  NULL in a hashed col   valid_to_us in both SCD2 reds. bisect_scd2_validto
                         (raw, with NULLs) vs bisect_scd2_validto_coalesce
                         (NULL→-1 sentinel) separate NULL normalization from
                         the underlying values.
  BOOLEAN column         is_current in both SCD2 reds — bisect_scd2_bool.
  large-magnitude BIGINT epoch-µs values (~1.7e15) sit ABOVE the harness's
                         1e15 int-valued-float threshold; bisect_sess_ids
                         (small ints only) / bisect_sess_start_mod (µs mod
                         10^6, small) / bisect_sess_bounds (full-magnitude)
                         separate the magnitude axis from island structure.
  raw pinned DOUBLE      bm25 score / winsorized means — each red's exact
                         integer inputs and its derived double are hashed in
                         SEPARATE probes, so a red names the stage where the
                         engines diverge (ints → bounds → IEEE assembly →
                         normalization).

Readout (CORRECTNESS_r10):
  - original RED + ALL its bisects GREEN → the divergence needs the exact
    original column COMBINATION → harness-level row assembly, not values.
  - bisect RED → that column (set) carries the divergence; the r11 fix is a
    contract change for exactly that column.
  - canary_events_ts_sum RED → driver testdata/content divergence — nothing
    to fix in query contracts; escalate in NOTES.
  - canary_null_bool RED → NULL/BOOLEAN normalization divergence explains
    the SCD2 pair (and only it).

Every probe derives its Spark plan AND its oracle from the ORIGINAL query's
registered builder/oracle (subset-select wrappers), so the pair stays in
lockstep with any future change to the originals by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_ml_spark.plans.relational import RELATIONAL_QUERIES, QuerySpec
from duckdb_ml_spark.tables import load

_TS_MOD = 1_099_511_627_776  # 2^40: sum over 10^5 rows stays far below 2^63


# --- content-fingerprint canary: the whole events table in one row ----------


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


# --- NULL + BOOLEAN normalization canary (multi-row) -------------------------


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


# --- subset-wrapper machinery -------------------------------------------------


def _orig(name: str) -> QuerySpec:
    """The original QuerySpec a bisect probe derives from (lockstep source)."""
    if name in RELATIONAL_QUERIES:
        return RELATIONAL_QUERIES[name]
    from duckdb_ml_spark.operators.analytics import QUERIES as AQ
    from duckdb_ml_spark.operators.text import QUERIES as TQ

    for reg in (AQ, TQ):
        if name in reg:
            return reg[name]
    raise KeyError(name)


def _subset(src: str, exprs: list[str]):
    """Builder + oracle selecting `exprs` (SQL snippets, aliased) from the
    original query. Spark side applies the same snippets via selectExpr so
    any derived expression (%, coalesce, casts) is written ONCE."""

    def build(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _orig(src).builder(spark, sf_dir).selectExpr(*exprs)

    oracle = (
        "SELECT " + ", ".join(exprs) + f" FROM (\n{_orig(src).oracle}\n) __t"
    )
    return build, oracle


# --- winsorized bisects: re-derive each stage independently ------------------


def _wins_bounds_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority order-statistic bounds (the ⌈n/20⌉-th / ⌈19n/20⌉-th
    smallest o_totalprice) via the all-lazy disc path — the exact stage the
    original's n_lo/n_hi/mean_winsorized depend on, exposed directly."""
    from duckdb_ml_spark.plans.orderstats import exact_group_order_stats_lazy

    orders = load(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice")
    q = exact_group_order_stats_lazy(
        orders,
        "o_orderpriority",
        "o_totalprice",
        [(1, 20), (19, 20)],
        cache_key=(sf_dir, "orders", "o_totalprice"),
    )
    return q.groupBy("o_orderpriority").agg(
        F.max(F.when(F.col("__i") == 0, F.col("__q"))).alias("p05"),
        F.max(F.when(F.col("__i") == 1, F.col("__q"))).alias("p95"),
    )


_WINS_RANKED = """
WITH r AS (
    SELECT o_orderpriority, o_totalprice,
           row_number() OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice) AS rn,
           count(*) OVER (PARTITION BY o_orderpriority) AS n
    FROM orders
)
SELECT o_orderpriority,
       max(CASE WHEN rn = (n + 19) // 20 THEN o_totalprice END) AS p05,
       max(CASE WHEN rn = (19 * n + 19) // 20 THEN o_totalprice END) AS p95
FROM r GROUP BY o_orderpriority
"""

_WINS_BOUNDS_ORACLE = _WINS_RANKED

_WINS_BOUNDS_CENTS_ORACLE = f"""
SELECT o_orderpriority,
       CAST(round(p05 * 100) AS BIGINT) AS p05_cents,
       CAST(round(p95 * 100) AS BIGINT) AS p95_cents
FROM ({_WINS_RANKED}) __b
"""


def _wins_bounds_cents_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _wins_bounds_df(spark, sf_dir)
    return b.select(
        "o_orderpriority",
        F.round(F.col("p05") * 100, 0).cast("bigint").alias("p05_cents"),
        F.round(F.col("p95") * 100, 0).cast("bigint").alias("p95_cents"),
    )


def _wins_cents_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact integer cents sum per priority — the summation input of both
    means, with NO bounds and NO floats anywhere."""
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias(
            "cents_sum"
        ),
    )


_WINS_CENTS_ORACLE = """
SELECT o_orderpriority, count(*)::BIGINT AS n_orders,
       sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS cents_sum
FROM orders GROUP BY o_orderpriority
"""


def _wins_mean_e4_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mean_raw in exact fixed-point ten-thousandths via integer floor
    division — the all-integer twin of the original's round(sc/100.0/n, 4):
    if THIS is green while bisect_wins_means is red, the divergence is in
    the float division / rounding stage, not in the integer inputs."""
    c = _wins_cents_q(spark, sf_dir)
    return c.select(
        "o_orderpriority",
        F.expr("(cents_sum * 100) div n_orders").alias("mean_raw_e4"),
    )


_WINS_MEAN_E4_ORACLE = f"""
SELECT o_orderpriority,
       ((cents_sum * 100) // n_orders)::BIGINT AS mean_raw_e4
FROM ({_WINS_CENTS_ORACLE.strip()}) __c
"""


def _bm25_cols():
    from duckdb_ml_spark.operators.text import BM25_TERMS

    tf = [f"tf_{t}" for t in BM25_TERMS]
    numden = [c for t in BM25_TERMS for c in (f"num_{t}", f"den_{t}")]
    return tf, numden


def _make_queries() -> dict[str, QuerySpec]:
    tf_cols, numden_cols = _bm25_cols()
    specs: list[tuple[str, object, str, str]] = []

    # canaries
    specs.append((
        "canary_events_ts_sum", _events_ts_sum_q, _EVENTS_TS_SUM_ORACLE,
        "BISECT CANARY: one-row content fingerprint of the whole events "
        "table (count + sum of epoch-µs mod 2^40 + id sums) — red iff the "
        "events content itself reaches the engines differently.",
    ))
    specs.append((
        "canary_null_bool", _null_bool_q, _NULL_BOOL_ORACLE,
        "BISECT CANARY: multi-row output hashing a NULL BIGINT and a "
        "BOOLEAN — the two axes no r9 canary probed (SCD2 reds carry both).",
    ))

    # sessionize bisects
    for name, exprs, doc in (
        (
            "bisect_sess_ids",
            ["user_id", "session_id", "n_events"],
            "sessionize island STRUCTURE only (small ints, no timestamps).",
        ),
        (
            "bisect_sess_start_mod",
            ["user_id", "session_id", "session_start_us % 1000000 AS start_mod_us"],
            "sessionize start times mod 10^6 — the µs tail without the "
            "large-magnitude axis.",
        ),
        (
            "bisect_sess_bounds",
            ["user_id", "session_id", "session_start_us", "session_end_us"],
            "sessionize full-magnitude epoch-µs bounds (~1.7e15, above the "
            "1e15 float-int normalization threshold).",
        ),
    ):
        b, o = _subset("events_sessionize", exprs)
        specs.append((name, b, o, "BISECT(events_sessionize): " + doc))

    # scd2 bisects
    for name, exprs, doc in (
        (
            "bisect_scd2_nonnull",
            ["user_id", "event_type", "version_n", "valid_from_us", "n_events"],
            "all columns EXCEPT the NULL-bearing valid_to_us and BOOLEAN "
            "is_current.",
        ),
        (
            "bisect_scd2_validto_coalesce",
            ["user_id", "version_n", "coalesce(valid_to_us, -1) AS valid_to_c"],
            "valid_to_us with NULL replaced by a -1 sentinel — green here + "
            "red on the raw twin isolates NULL normalization.",
        ),
        (
            "bisect_scd2_validto",
            ["user_id", "version_n", "valid_to_us"],
            "raw valid_to_us INCLUDING NULLs.",
        ),
        (
            "bisect_scd2_bool",
            ["user_id", "version_n", "is_current"],
            "the BOOLEAN column alone.",
        ),
    ):
        b, o = _subset("events_scd2_intervals", exprs)
        specs.append((name, b, o, "BISECT(events_scd2_intervals): " + doc))

    # bm25 bisects
    for name, exprs, doc in (
        ("bisect_bm25_dl", ["doc_id", "dl"], "doc lengths only (tokenizer parity)."),
        ("bisect_bm25_tf", ["doc_id"] + tf_cols, "per-term tf counts only."),
        (
            "bisect_bm25_numden",
            ["doc_id"] + numden_cols,
            "the exact INT64 rational pairs only (no double anywhere).",
        ),
        (
            "bisect_bm25_score",
            ["doc_id", "score"],
            "the pinned-fold DOUBLE score alone.",
        ),
    ):
        b, o = _subset("text_bm25_scores", exprs)
        specs.append((name, b, o, "BISECT(text_bm25_scores): " + doc))

    # winsorized bisects
    for name, exprs, doc in (
        (
            "bisect_wins_counts",
            ["o_orderpriority", "n_orders", "n_clipped_low", "n_clipped_high"],
            "integer clip counts only (they encode the bound comparisons).",
        ),
        (
            "bisect_wins_means",
            ["o_orderpriority", "mean_raw", "mean_winsorized"],
            "the two 4-dp rounded DOUBLE means alone.",
        ),
    ):
        b, o = _subset("orders_winsorized_stats", exprs)
        specs.append((name, b, o, "BISECT(orders_winsorized_stats): " + doc))
    specs.append((
        "bisect_wins_bounds", _wins_bounds_df, _WINS_BOUNDS_ORACLE,
        "BISECT(orders_winsorized_stats): the p05/p95 order-statistic bound "
        "VALUES (exact 2-dp data doubles) via the all-lazy disc path.",
    ))
    specs.append((
        "bisect_wins_bounds_cents", _wins_bounds_cents_df,
        _WINS_BOUNDS_CENTS_ORACLE,
        "BISECT(orders_winsorized_stats): the same bounds as exact integer "
        "cents — bounds minus the double-normalization axis.",
    ))
    specs.append((
        "bisect_wins_cents", _wins_cents_q, _WINS_CENTS_ORACLE,
        "BISECT(orders_winsorized_stats): exact integer cents sums per "
        "priority (the means' summation input; no bounds, no floats).",
    ))
    specs.append((
        "bisect_wins_mean_e4", _wins_mean_e4_q, _WINS_MEAN_E4_ORACLE,
        "BISECT(orders_winsorized_stats): mean_raw as exact integer "
        "ten-thousandths (floor division) — the no-float mean twin.",
    ))

    return {
        name: QuerySpec(
            name=name, builder=b, oracle=o, doc=doc, tags=("bisect",)
        )
        for name, b, o, doc in specs
    }


QUERIES: dict[str, QuerySpec] = _make_queries()
