"""Scale utilities: skew salting and co-located (bucketed) join helpers.

These encode the two standard answers to "this shuffle dies at 100 TB":

- **Skewed aggregation** → two-phase salted aggregate: partial-aggregate on
  (key, salt) so one hot key spreads over N reducers, then finish on key.
  Results are exactly the aggregate of the unsalted plan for decomposable
  aggregates (sum/count/min/max) — equivalence pytest-checked.

- **Skewed/broadcast-impossible join** → salted replicate join: the big side
  gets a deterministic salt from row identity, the small side is replicated
  N_SALT times; join key becomes (key, salt) so a hot key's rows land on N
  reducers instead of one. Row-for-row identical to the plain join.

AQE's skew-join splitting (on in session.py) handles moderate skew
automatically; these helpers are for the pathological keys AQE can't split
(single-key hash aggregation, non-sort-merge paths) and for pinning the plan
shape explicitly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple],
    n_salts: int = 16,
    salt_from: str | Column | None = None,
) -> DataFrame:
    """Two-phase aggregation with a salt on the partial phase.

    aggs: output_name -> (phase1_agg_fn, phase2_agg_fn, input_col), where the
    pair must compose to the true aggregate (sum/sum, count/sum, min/min,
    max/max). Example:

        salted_agg(li, ["l_returnflag"], {
            "n":       (F.count, F.sum, "l_quantity"),
            "sum_qty": (F.sum,   F.sum, "l_quantity"),
            "max_qty": (F.max,   F.max, "l_quantity"),
        })
    """
    salt = (
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
        if salt_from is None
        else F.pmod(F.xxhash64(salt_from if isinstance(salt_from, Column) else F.col(salt_from)), F.lit(n_salts))
    )
    phase1 = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(
        *[f1(c).alias(f"__p_{name}") for name, (f1, _f2, c) in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[f2(f"__p_{name}").alias(name) for name, (_f1, f2, _c) in aggs.items()]
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the large side deterministically, explode
    the small side across all salts, join on (key, salt).

    Use when the small side is too big to broadcast and the key distribution
    has hot keys a sort-merge join would serialize onto single tasks."""
    lg = large.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    sm = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(n_salts)]))
    )
    out = lg.join(sm, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def key_skew_profile(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Per-key row counts + share of total — the diagnostic you run BEFORE
    choosing a join strategy at scale."""
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("t"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(key, "n", (F.col("n") / F.col("t")).alias("share"))
        .orderBy(F.desc("n"))
        .limit(top)
    )


# --- driver-checked query: the salted plan must equal the plain aggregate ----


def _salted_agg_q(spark, sf_dir: str):
    """Two-phase salted aggregate over events by event_type — value-hash
    checked against the PLAIN GROUP BY oracle, proving the skew-safe plan is
    a pure physical rewrite (sums rounded: float association differs)."""
    from duckdb_ml_spark.tables import load

    ev = load(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        ["event_type"],
        {
            "n_events": (F.count, F.sum, "value"),
            "sum_value": (F.sum, F.sum, "value"),
            "max_value": (F.max, F.max, "value"),
        },
        salt_from="event_id",
    )
    return out.select(
        "event_type",
        "n_events",
        F.round("sum_value", 6).alias("sum_value"),
        F.round("max_value", 6).alias("max_value"),
    )


_SALTED_AGG_ORACLE = """
SELECT event_type, count(value) AS n_events,
       round(sum(value), 6) AS sum_value, round(max(value), 6) AS max_value
FROM events GROUP BY event_type
"""

from duckdb_ml_spark.plans.relational import QuerySpec  # noqa: E402

QUERIES = {
    "skew_salted_agg": QuerySpec(
        "skew_salted_agg", _salted_agg_q, _SALTED_AGG_ORACLE,
        doc="Two-phase salted aggregation (hot-key spread) == plain GROUP BY.",
        tags=("scale", "skew"),
    ),
}
