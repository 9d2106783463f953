"""Temporal join operators Spark lacks natively: AS-OF join and range join.

- **as_of_join**: point-in-time lookup (each left row gets the latest right
  row at-or-before its timestamp, per key). Implemented with the union +
  carry-forward-window pattern: tag both inputs, sort each key's timeline
  once, `last(payload, ignorenulls=True)` over an unbounded-preceding window,
  keep left rows. ONE shuffle on the key — no range explosion, no per-row
  probing — the shape that survives 100 TB (contrast: an inequality join
  multiplies left×right per key before filtering).

- **range_pair_counts**: self range-join on time (pairs of events within a
  window) via bucket candidates: each right row claims its own and the
  previous bucket, equi-join on bucket, exact filter after. Candidates are
  O(rows × bucket-density), not O(rows²); each qualifying pair matches in
  exactly one bucket, so no distinct pass is needed.

DuckDB oracles: native `ASOF LEFT JOIN` and a plain inequality join — fully
independent implementations, value-hash compared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from duckdb_ml_spark.plans.relational import QuerySpec
from duckdb_ml_spark.tables import load


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    direction: str = "backward",
    tolerance_s: int | None = None,
) -> DataFrame:
    """left LEFT AS-OF join right (pandas merge_asof semantics, distributed):

    - direction="backward": latest right row with right_ts <= left_ts per key;
    - direction="forward":  earliest right row with right_ts >= left_ts;
    - tolerance_s: matches farther than this many seconds away are nulled —
      the carry-forward window is unchanged, staleness is a post-filter.

    Right rows must be unique per (key, right_ts) for deterministic payloads
    (pre-aggregate otherwise). Same one-shuffle union + carry window for both
    directions (forward just sorts the timeline descending)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got '{direction}'")
    r_dtypes = dict(right.dtypes)
    carry = list(dict.fromkeys([*payload_cols, right_ts]))  # right_ts rides along
    l_tag = left.select(
        F.col(key),
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__is_right"),
        *[F.lit(None).cast(r_dtypes[c]).alias(f"__p_{c}") for c in carry],
        "*",
    )
    r_tag = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__is_right"),
        *[F.col(c).alias(f"__p_{c}") for c in carry],
        *[F.lit(None).cast(t).alias(c) for c, t in left.dtypes],
    )
    merged = l_tag.select(r_tag.columns).union(r_tag)
    order = F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    # right rows sort FIRST at equal timestamps → ties are inclusive (>= / <=)
    w = (
        Window.partitionBy(key)
        .orderBy(order, F.col("__is_right").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        "*",
        *[F.last(f"__p_{c}", ignorenulls=True).over(w).alias(f"__asof_{c}") for c in carry],
    )
    out_left = [c for c, _ in left.dtypes]
    rows = carried.where(F.col("__is_right") == 0)
    if tolerance_s is None:
        ok = F.lit(True)
    else:
        # cast both to TIMESTAMP under the pinned-UTC session: the union
        # coerces __ts, while the carried right_ts keeps its source type
        # (events=TIMESTAMP vs orders=TIMESTAMP_NTZ would otherwise mismatch)
        lts = F.col("__ts").cast("timestamp")
        rts = F.col(f"__asof_{right_ts}").cast("timestamp")
        age = (
            F.unix_micros(lts) - F.unix_micros(rts)
            if direction == "backward"
            else F.unix_micros(rts) - F.unix_micros(lts)
        )
        ok = age <= tolerance_s * 1_000_000
    return rows.select(
        *out_left,
        *[
            F.when(ok, F.col(f"__asof_{c}")).alias(f"asof_{c}")
            for c in payload_cols
        ],
    )


def _asof_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"), F.col("o_orderdate").alias("ots"))
        .agg(F.max("o_orderkey").alias("last_orderkey"))
    )
    j = as_of_join(ev, orders, "user_id", "ts", "ots", ["last_orderkey", "ots"])
    return j.select(
        "event_id",
        "user_id",
        "asof_last_orderkey",
        F.col("asof_ots").alias("asof_order_ts"),
    )


_ASOF_ORACLE = """
WITH o AS (
    SELECT o_custkey AS user_id, o_orderdate AS ots, max(o_orderkey) AS last_orderkey
    FROM orders GROUP BY 1, 2
)
SELECT e.event_id, e.user_id, o.last_orderkey AS asof_last_orderkey, o.ots AS asof_order_ts
FROM events e ASOF LEFT JOIN o ON e.user_id = o.user_id AND e.ts >= o.ots
"""

ASOF_TOL_S = 30 * 86400  # 30-day staleness bound for the forward query


def _asof_fwd_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of with tolerance: each event's NEXT order within 30 days —
    the 'time-to-next-conversion' lookup shape."""
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"), F.col("o_orderdate").alias("ots"))
        .agg(F.min("o_orderkey").alias("next_orderkey"))
    )
    j = as_of_join(
        ev, orders, "user_id", "ts", "ots", ["next_orderkey", "ots"],
        direction="forward", tolerance_s=ASOF_TOL_S,
    )
    return j.select(
        "event_id",
        "user_id",
        "asof_next_orderkey",
        F.col("asof_ots").alias("asof_next_ts"),
    )


_ASOF_FWD_ORACLE = f"""
WITH o AS (
    SELECT o_custkey AS user_id, o_orderdate AS ots, min(o_orderkey) AS next_orderkey
    FROM orders GROUP BY 1, 2
)
SELECT e.event_id, e.user_id,
       CASE WHEN o.ots <= e.ts + INTERVAL {ASOF_TOL_S} SECONDS THEN o.next_orderkey END
           AS asof_next_orderkey,
       CASE WHEN o.ots <= e.ts + INTERVAL {ASOF_TOL_S} SECONDS THEN o.ots END
           AS asof_next_ts
FROM events e ASOF LEFT JOIN o ON e.user_id = o.user_id AND e.ts <= o.ots
"""


RANGE_SECONDS = 600  # 10-minute pairing window


def range_pair_counts(spark: SparkSession, sf_dir: str, window_s: int = RANGE_SECONDS) -> DataFrame:
    """Per-hour counts of ordered event pairs (a, b) with
    ts_a <= ts_b < ts_a + window and different event ids.

    ORDER-STATISTICS form (r4): the count of partners for event a is
    |{ts in [ts_a, ts_a+w)}| − 1 (self), so per window-width bucket we sort
    the candidate timestamps ONCE and answer every owner with two binary
    searches — no pair row is ever materialized. Each event is a candidate
    for its own bucket and the previous one (an owner's window spans at most
    two buckets), so the whole query is one explode + ONE shuffle by bucket
    + an Arrow kernel + a tiny hour rollup: O(n log n) versus the former
    bucket-join's O(pairs), and no broadcast of the event table (which the
    old plan's build side became — fine at sf0.1, a scale-killer at 100 TB).
    Bucket width = the window, so group sizes track event density; skewed
    hot buckets would salt by sub-range like plans/scale.py."""
    import numpy as np
    import pandas as pd

    from duckdb_ml_spark.session import ensure_shipped

    ensure_shipped(spark)
    ev = load(spark, sf_dir, "events").select("event_id", "ts")
    w_us = window_s * 1_000_000
    hour_us = 3_600_000_000
    us = F.unix_micros("ts")
    base = ev.select(
        us.alias("us"),
        (us - (us % hour_us)).alias("hr_us"),
        F.floor(us / F.lit(w_us)).cast("bigint").alias("b0"),
    )
    owners = base.select(F.col("b0").alias("b"), "us", "hr_us", F.lit(True).alias("own"))
    copies = base.select(
        (F.col("b0") - 1).alias("b"), "us", F.lit(0).cast("long").alias("hr_us"),
        F.lit(False).alias("own"),
    )
    allr = owners.unionByName(copies)

    # One kernel per PARTITION, not per bucket (tens of thousands of tiny
    # window-width groups would pay a Python call each under applyInPandas —
    # measured 4× slower). Buckets are hash-partitioned; inside the kernel a
    # composite int64 key (bucket · 2w + offset-in-bucket) makes the whole
    # partition one sorted array, so every owner's [ts, ts+w) partner count is
    # two vectorized searchsorted probes — no per-bucket loop at all. The
    # stride 2w bounds the window probe inside its bucket's key range; both
    # sides fit int64 comfortably (bucket ≈ us/w ≤ 2^45 for µs epochs).
    stride = 2 * w_us

    def count_gen(batches):
        frames = [pdf for pdf in batches if len(pdf)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]
        b = pdf["b"].to_numpy()
        us = pdf["us"].to_numpy()
        comp = np.sort(b * stride + (us - b * w_us))
        own = pdf["own"].to_numpy()
        ob, ous = b[own], us[own]
        okey = ob * stride + (ous - ob * w_us)
        cnt = np.searchsorted(comp, okey + w_us, side="left") - np.searchsorted(
            comp, okey, side="left"
        ) - 1  # [ts_a, ts_a+w) partners minus self
        g = pd.DataFrame({"hr_us": pdf["hr_us"].to_numpy()[own], "n": cnt})
        out = g.groupby("hr_us", as_index=False)["n"].sum()
        yield pd.DataFrame({"hr_us": out["hr_us"], "n_pairs": out["n"]})

    partial = allr.repartition("b").mapInPandas(count_gen, "hr_us long, n_pairs long")
    return (
        partial.groupBy("hr_us")
        .agg(F.sum("n_pairs").alias("n_pairs"))
        .where(F.col("n_pairs") > 0)  # hours with events but no pairs are
        # absent in the pair-join form (and the oracle) — keep that contract
        .select(F.timestamp_micros("hr_us").alias("hour"), "n_pairs")
    )


_RANGE_ORACLE = f"""
SELECT date_trunc('hour', a.ts) AS hour, count(*) AS n_pairs
FROM events a JOIN events b
  ON b.ts >= a.ts
 AND b.ts < a.ts + INTERVAL {RANGE_SECONDS} SECONDS
 AND a.event_id != b.event_id
GROUP BY 1
"""


QUERIES: dict[str, QuerySpec] = {
    "asof_last_order": QuerySpec(
        "asof_last_order", _asof_q, _ASOF_ORACLE,
        doc="AS-OF join: latest order at-or-before each event (union + carry-forward window).",
        tags=("asof", "join", "temporal"),
    ),
    "asof_next_order_tol": QuerySpec(
        "asof_next_order_tol", _asof_fwd_q, _ASOF_FWD_ORACLE,
        doc="Forward as-of join with 30-day tolerance (next order per event).",
        tags=("asof", "join", "temporal"),
    ),
    "range_event_pairs": QuerySpec(
        "range_event_pairs", range_pair_counts, _RANGE_ORACLE,
        doc="Range self-join via bucket candidates: event pairs within 10 minutes, per hour.",
        tags=("range", "join", "temporal"),
    ),
}
