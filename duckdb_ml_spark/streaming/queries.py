"""Oracle-checkable queries for the streaming surface (batch forms).

Spark's unified semantics mean each streaming operator is DEFINED by a batch
plan; the driver's value-hash gate runs that batch form against a DuckDB
oracle, and tests/test_streaming.py proves the identical plan produces the
identical rows under readStream (availableNow) — so the streaming surface gets
full value-level correctness coverage, not just rows-only.

Session-window oracle: Spark merges events whose gap is ≤ gapDuration
(boundary-inclusive, verified empirically), so the islands break condition is
strictly `ts - prev > gap`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from duckdb_ml_spark.plans.relational import QuerySpec
from duckdb_ml_spark.streaming.stream import (
    dedup_events,
    hourly_topk_types,
    interval_join_pairs,
    session_windows,
    sliding_counts,
    tumbling_counts,
    user_state,
)
from duckdb_ml_spark.tables import load


def _tumbling_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_counts(load(spark, sf_dir, "events"))


# avg derived from the ROUNDED sum, matching tumbling_counts: the 6-dp
# round collapses both engines' sums to the identical double before the
# division, so the final round cannot land on opposite sides of a half
# boundary (r13 gate finding at sf0.1)
_TUMBLING_ORACLE = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value,
       round(round(sum(value), 6) / count(*), 6) AS avg_value
FROM events GROUP BY 1, 2
"""


def _sliding_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_counts(load(spark, sf_dir, "events"))


_SLIDING_ORACLE = """
WITH e AS (SELECT time_bucket(INTERVAL '1 hour', ts) AS tb, event_type FROM events),
w AS (
    SELECT unnest([tb, tb - INTERVAL '1 hour']) AS window_start, event_type FROM e
)
SELECT window_start, event_type, count(*) AS n_events FROM w GROUP BY 1, 2
"""


def _sessions_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_windows(load(spark, sf_dir, "events"))


# every ts use pinned to µs (tsu) — the r9 environment-proof contract
# (VERDICT r8 item 2 / plans/canary.py); 30 min = 1 800 000 000 µs.
# Boundary is >= (ADVICE r9 low): F.session_window merges [start, last+gap)
# — an event exactly gap after the previous one starts a NEW session, so the
# oracle must break at >= gap too (no exact-gap pair exists in the generated
# µs testdata, so this is hash-neutral today and correct if one ever does).
_SESSIONS_ORACLE = """
WITH e AS (
    SELECT user_id, value, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu FROM events
),
o AS (
    SELECT user_id, tsu, value,
           CASE WHEN lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu, value) IS NULL
                  OR tsu - lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu, value)
                     >= 1800000000
                THEN 1 ELSE 0 END AS brk
    FROM e
),
s AS (
    SELECT user_id, tsu, value,
           sum(brk) OVER (PARTITION BY user_id ORDER BY tsu, value
                          ROWS UNBOUNDED PRECEDING) AS sid
    FROM o
)
SELECT user_id, min(tsu) AS session_start_us, count(*) AS n_events,
       max(tsu) AS last_ts_us, round(sum(value), 6) AS sum_value
FROM s GROUP BY user_id, sid
"""


def _user_state_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return user_state(load(spark, sf_dir, "events"))


_USER_STATE_ORACLE = """
SELECT user_id, count(*) AS n_events, max(value) AS max_value,
       epoch_us(CAST(max(ts) AS TIMESTAMP)) AS last_ts_us
FROM events GROUP BY user_id
"""


def _dedup_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    return dedup_events(load(spark, sf_dir, "events")).select(
        "event_id", "user_id", "event_type", F.round("value", 6).alias("value")
    )


# event_id is unique in the source, so exact-once output == the full table
# (duplicate-bearing inputs are exercised in tests/test_streaming.py by
# unioning the stream with itself under dropDuplicatesWithinWatermark).
_DEDUP_EVENTS_ORACLE = """
SELECT event_id, user_id, event_type, round(value, 6) AS value FROM events
"""


def _interval_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return interval_join_pairs(ev, ev)


_INTERVAL_JOIN_ORACLE = """
SELECT a.event_id AS id_a, b.event_id AS id_b
FROM events a JOIN events b
  ON a.user_id = b.user_id AND a.event_id != b.event_id
 AND b.ts >= a.ts AND b.ts < a.ts + INTERVAL 10 MINUTES
"""


def _topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hourly_topk_types(load(spark, sf_dir, "events"))


_TOPK_ORACLE = """
WITH c AS (
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
           count(*) AS n_events
    FROM events GROUP BY 1, 2
)
SELECT window_start, event_type, n_events,
       row_number() OVER (PARTITION BY window_start
                          ORDER BY n_events DESC, event_type ASC) AS rk
FROM c QUALIFY rk <= 3
"""


def _scd2_us_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_ml_spark.streaming.stream import scd2_compact

    return scd2_compact(load(spark, sf_dir, "events"))


# the analytics SCD2 oracle with µs-integer validity bounds — the exact
# schema the applyInPandasWithState twin emits (state rows carry µs ints).
# r9: every ts use pinned to µs up front (epoch_us of the µs-cast value) so
# window order and outputs match Spark's read-time ns→µs truncation
# whatever the parquet encoding is (VERDICT r8 item 2 / plans/canary.py).
_SCD2_US_ORACLE = """
WITH e AS (
    SELECT user_id, event_type, event_id,
           epoch_us(CAST(ts AS TIMESTAMP)) AS tsu
    FROM events
),
o AS (
    SELECT user_id, event_type, tsu, event_id,
           CASE WHEN lag(event_type) OVER w IS NULL
                  OR event_type <> lag(event_type) OVER w
                THEN 1 ELSE 0 END AS brk
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)
),
r AS (
    SELECT user_id, event_type, tsu,
           (sum(brk) OVER (PARTITION BY user_id ORDER BY tsu, event_id
                           ROWS UNBOUNDED PRECEDING))::BIGINT AS version_n
    FROM o
),
g AS (
    SELECT user_id, version_n, any_value(event_type) AS event_type,
           min(tsu) AS valid_from_us, count(*) AS n_events
    FROM r GROUP BY user_id, version_n
)
SELECT user_id, event_type, version_n,
       valid_from_us,
       lead(valid_from_us) OVER w2 AS valid_to_us,
       n_events,
       (lead(valid_from_us) OVER w2 IS NULL) AS is_current
FROM g
WINDOW w2 AS (PARTITION BY user_id ORDER BY version_n)
"""


def _countmin_users_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_ml_spark.streaming.stream import countmin_user_counters

    return countmin_user_counters(load(spark, sf_dir, "events"))


def _countmin_users_oracle() -> str:
    from duckdb_ml_spark.operators.text import _cm_buckets_sql

    b0, b1, h = _cm_buckets_sql("w")
    return f"""
WITH u AS (SELECT user_id::VARCHAR AS w FROM events),
hh AS (SELECT {h} AS h FROM u),
b AS (SELECT {b0} AS b0, {b1} AS b1 FROM hh)
SELECT 0 AS r, b0 AS b, count(*)::BIGINT AS c FROM b GROUP BY b0
UNION ALL
SELECT 1 AS r, b1 AS b, count(*)::BIGINT AS c FROM b GROUP BY b1
"""


QUERIES: dict[str, QuerySpec] = {
    "stream_countmin_users": QuerySpec(
        "stream_countmin_users", _countmin_users_q, _countmin_users_oracle(),
        doc="Count-min counters over the user-id event stream: bounded "
        "(d×1024-row) additive aggregation state at any user cardinality; "
        "streaming twin pytest-equal in complete mode.",
        tags=("streaming", "sketch", "approx"),
    ),
    "stream_scd2_intervals": QuerySpec(
        "stream_scd2_intervals", _scd2_us_q, _SCD2_US_ORACLE,
        doc="Streaming CDC/SCD2 compaction (applyInPandasWithState twin; "
        "batch form = the islands plan with µs-integer validity bounds).",
        tags=("streaming", "stateful", "cdc", "scd2"),
    ),
    "stream_topk_types": QuerySpec(
        "stream_topk_types", _topk_q, _TOPK_ORACLE,
        doc="Top-3 event types per tumbling hour (rank in foreachBatch when streaming).",
        tags=("streaming", "window", "rank"),
    ),
    "stream_interval_join": QuerySpec(
        "stream_interval_join", _interval_join_q, _INTERVAL_JOIN_ORACLE,
        doc="Stream-stream interval self-join per user (watermark-bounded state in streaming).",
        tags=("streaming", "join"),
    ),
    "stream_dedup_events": QuerySpec(
        "stream_dedup_events", _dedup_events_q, _DEDUP_EVENTS_ORACLE,
        doc="Exactly-once event stream: dedup by event_id (watermark-bounded state in streaming).",
        tags=("streaming", "dedup"),
    ),
    "stream_tumbling_hourly": QuerySpec(
        "stream_tumbling_hourly", _tumbling_q, _TUMBLING_ORACLE,
        doc="Tumbling 1h windows × event_type: counts + value aggregates.",
        tags=("streaming", "window"),
    ),
    "stream_sliding_2h": QuerySpec(
        "stream_sliding_2h", _sliding_q, _SLIDING_ORACLE,
        doc="Sliding 2h/1h windows × event_type: counts (each event in 2 windows).",
        tags=("streaming", "window"),
    ),
    "stream_sessions": QuerySpec(
        "stream_sessions", _sessions_q, _SESSIONS_ORACLE,
        doc="Per-user 30-minute-gap session windows (start, size, last event).",
        tags=("streaming", "session"),
    ),
    "stream_user_state": QuerySpec(
        "stream_user_state", _user_state_q, _USER_STATE_ORACLE,
        doc="Final per-user state of the stateful accumulator (batch equivalent).",
        tags=("streaming", "stateful"),
    ),
}
