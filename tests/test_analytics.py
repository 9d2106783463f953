"""Unit tests for event-analytics operators (funnel, retention, gap-fill,
robust anomalies)."""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from duckdb_ml_spark.tables import load

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def spark():
    from duckdb_ml_spark.session import get_spark

    return get_spark("test_analytics", shuffle_partitions=8)


def _ev(rows, spark):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
    )


T0 = dt.datetime(2024, 1, 1)


def ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def us(minutes):
    """Exact epoch-µs of ts(minutes) under the UTC session timezone."""
    d = ts(minutes) - dt.datetime(1970, 1, 1)
    return (d.days * 86400 + d.seconds) * 1_000_000 + d.microseconds


def test_funnel_requires_stage_order(spark):
    from duckdb_ml_spark.operators.analytics import funnel_counts

    rows = [
        # user 1: view -> click -> purchase (completes all 3)
        (1, ts(0), 1, "view", 1.0),
        (2, ts(1), 1, "click", 1.0),
        (3, ts(2), 1, "purchase", 1.0),
        # user 2: click BEFORE view, purchase after view but no click-after-view
        (4, ts(0), 2, "click", 1.0),
        (5, ts(1), 2, "view", 1.0),
        (6, ts(2), 2, "purchase", 1.0),
        # user 3: view only
        (7, ts(0), 3, "view", 1.0),
        # user 4: purchase only (reaches no stage-1)
        (8, ts(0), 4, "purchase", 1.0),
    ]
    got = {r.stage: r.n_users for r in funnel_counts(_ev(rows, spark)).collect()}
    assert got == {"view": 3, "click": 1, "purchase": 1}


def test_funnel_monotone_on_testdata(spark):
    from duckdb_ml_spark.operators.analytics import _funnel_q

    rows = sorted(_funnel_q(spark, SF_DIR).collect(), key=lambda r: r.stage_idx)
    ns = [r.n_users for r in rows]
    assert len(ns) == 3 and ns[0] >= ns[1] >= ns[2] > 0


def test_funnel_single_exchange(spark):
    """Both window passes share one Exchange on user_id (same window spec)."""
    from duckdb_ml_spark.operators.analytics import _funnel_q

    plan = _funnel_q(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    n_user_exchanges = plan.count("hashpartitioning(user_id")
    assert n_user_exchanges <= 2  # window shuffle + per-user agg reuse


def test_retention_triangle(spark):
    from duckdb_ml_spark.operators.analytics import retention_cohorts

    rows = [
        # user 1 first seen week of Jan 1, active again week of Jan 15 (offset 2)
        (1, dt.datetime(2024, 1, 2), 1, "view", 1.0),
        (2, dt.datetime(2024, 1, 16), 1, "view", 1.0),
        # user 2 first seen week of Jan 8
        (3, dt.datetime(2024, 1, 9), 2, "view", 1.0),
    ]
    got = {
        (r.cohort_week.date(), r.week_offset): r.n_users
        for r in retention_cohorts(_ev(rows, spark)).collect()
    }
    assert got == {
        (dt.date(2024, 1, 1), 0): 1,
        (dt.date(2024, 1, 1), 2): 1,
        (dt.date(2024, 1, 8), 0): 1,
    }


def test_gap_fill_dense_grid(spark):
    from duckdb_ml_spark.operators.analytics import gap_filled_hourly

    ev = load(spark, SF_DIR, "events")
    out = gap_filled_hourly(ev)
    n_types = ev.select("event_type").distinct().count()
    b = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    ).first()
    n_hours = int((b.h1 - b.h0).total_seconds() // 3600) + 1
    assert out.count() == n_hours * n_types
    # zero-filled rows exist at sf0.001 (sparse events) and totals reconcile
    assert out.where(F.col("n_events") == 0).count() > 0
    assert (
        out.agg(F.sum("n_events")).first()[0] == ev.count()
    )


def test_robust_anomalies_plants_outlier(spark):
    from duckdb_ml_spark.operators.analytics import robust_anomalies

    base = [(i, ts(i), 1, "view", float(10 + (i % 5))) for i in range(20)]
    rows = base + [(99, ts(99), 1, "view", 1000.0)]
    out = robust_anomalies(_ev(rows, spark)).collect()
    assert [r.event_id for r in out] == [99]
    assert out[0].modified_z > 3.5


def test_robust_anomalies_broadcast_stats(spark):
    from duckdb_ml_spark.operators.analytics import _anomaly_q

    plan = _anomaly_q(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2


def test_sessionize_gap_islands(spark):
    """Events 0m, 10m, then 7h later two more → exactly two sessions with
    exact integer durations; session ids are 1-based in time order."""
    from duckdb_ml_spark.operators.analytics import sessionize

    rows = [
        (1, ts(0), 1, "view", 1.0),
        (2, ts(10), 1, "view", 1.0),
        (3, ts(7 * 60), 1, "click", 1.0),
        (4, ts(7 * 60 + 5), 1, "view", 1.0),
        # user 2: single event = single 1-event session, duration 0
        (5, ts(0), 2, "view", 1.0),
    ]
    out = {
        (r.user_id, r.session_id): r
        for r in sessionize(_ev(rows, spark)).collect()
    }
    assert set(out) == {(1, 1), (1, 2), (2, 1)}
    assert out[(1, 1)].n_events == 2 and out[(1, 1)].duration_us == 10 * 60 * 1_000_000
    assert out[(1, 2)].n_events == 2 and out[(1, 2)].duration_us == 5 * 60 * 1_000_000
    assert out[(2, 1)].n_events == 1 and out[(2, 1)].duration_us == 0
    # r9 contract: epoch-µs BIGINTs, never raw timestamps (VERDICT r8 item 2)
    assert out[(1, 1)].session_start_us == us(0)
    assert out[(1, 2)].session_end_us == us(7 * 60 + 5)


def test_sessionize_boundary_exactly_gap_is_same_session(spark):
    """A gap of EXACTLY gap_us must NOT break (strict > contract)."""
    from duckdb_ml_spark.operators.analytics import SESSION_GAP_US, sessionize

    rows = [
        (1, ts(0), 1, "view", 1.0),
        (2, T0 + dt.timedelta(microseconds=SESSION_GAP_US), 1, "view", 1.0),
    ]
    out = sessionize(_ev(rows, spark)).collect()
    assert len(out) == 1 and out[0].n_events == 2


def test_scd2_intervals_tile_and_version(spark):
    """A,A,B,A runs → 3 versioned intervals; valid_to chains to the next
    valid_from (half-open tiling), open interval flagged current."""
    from duckdb_ml_spark.operators.analytics import scd2_intervals

    rows = [
        (1, ts(0), 1, "A", 1.0),
        (2, ts(1), 1, "A", 1.0),
        (3, ts(2), 1, "B", 1.0),
        (4, ts(3), 1, "A", 1.0),
    ]
    out = sorted(scd2_intervals(_ev(rows, spark)).collect(), key=lambda r: r.version_n)
    assert [r.event_type for r in out] == ["A", "B", "A"]
    assert [r.n_events for r in out] == [2, 1, 1]
    assert [r.version_n for r in out] == [1, 2, 3]
    # half-open tiling: each interval's valid_to is the successor's valid_from
    # (epoch-µs BIGINTs — the r9 environment-proof contract)
    assert out[0].valid_to_us == out[1].valid_from_us == us(2)
    assert out[1].valid_to_us == out[2].valid_from_us == us(3)
    assert out[2].valid_to_us is None and out[2].is_current
    assert not out[0].is_current and not out[1].is_current


def test_scd2_compacts_on_testdata(spark):
    """Interval count = number of attribute runs < event count; n_events sums
    back to the full stream (lossless compaction)."""
    from duckdb_ml_spark.operators.analytics import scd2_intervals

    ev = load(spark, SF_DIR, "events")
    out = scd2_intervals(ev)
    n_events = ev.count()
    agg = out.agg(F.count(F.lit(1)), F.sum("n_events")).head()
    assert agg[0] < n_events and agg[1] == n_events
    # exactly one open interval per user
    cur = out.where("is_current").groupBy("user_id").count()
    assert cur.where("count != 1").count() == 0


def test_active_streaks_crafted(spark):
    """Jan+Feb+Mar then May → longest 3, 2 streaks, 4 active months; a second
    order in the same month must not double-count."""
    from duckdb_ml_spark.operators.analytics import active_streaks

    d = dt.datetime
    rows = [
        (1, 7, "O", 1.0, d(2024, 1, 5), "1-URGENT"),
        (2, 7, "O", 1.0, d(2024, 1, 20), "1-URGENT"),  # same month dup
        (3, 7, "O", 1.0, d(2024, 2, 1), "1-URGENT"),
        (4, 7, "O", 1.0, d(2024, 3, 30), "1-URGENT"),
        (5, 7, "O", 1.0, d(2024, 5, 15), "1-URGENT"),
    ]
    orders = spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    out = active_streaks(orders).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_active_months == 4 and r.n_streaks == 2 and r.longest_streak == 3


def test_sessionize_single_exchange(spark):
    """Both window passes and the rollup must ride ONE user_id shuffle."""
    from duckdb_ml_spark.operators.analytics import _sessionize_q

    plan = _sessionize_q(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_active_streaks_single_exchange_and_equivalent(spark):
    """r14 epoch-bitmask plan contract: (a) exactly TWO exchanges — the
    big declarative bit_or agg on (cust, mbase) and the tiny cross-epoch
    window repartition on cust (≤⌈span/64⌉ rows/customer); (b) the HEAVY
    aggregation runs in whole-stage codegen (HashAggregate), never
    ObjectHashAggregate (the collect_set form's object-per-row floor,
    probe6/probe7); (c) row-identical to the two-shuffle islands form."""
    from duckdb_ml_spark.operators.analytics import (
        active_streaks,
        active_streaks_window,
    )

    orders = load(spark, SF_DIR, "orders")
    plan = (
        active_streaks(orders)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "ObjectHashAggregate" not in plan, plan
    a = {tuple(r) for r in active_streaks(orders).collect()}
    b = {tuple(r) for r in active_streaks_window(orders).collect()}
    assert a == b
