"""Streaming surface tests: the SAME plans that pass the batch oracle must
produce the SAME rows when run incrementally under readStream (availableNow),
and the stateful accumulator's final state must equal the batch aggregate.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_ml_spark.streaming.stream import (
    read_events_stream,
    session_windows,
    sliding_counts,
    tumbling_counts,
    user_state,
    user_state_stream,
)
from duckdb_ml_spark.tables import load


def _run_stream_to_memory(sdf, name: str, output_mode: str = "complete"):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def _sorted_rows(df, cols):
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


@pytest.mark.parametrize(
    "op,name,cols",
    [
        (
            lambda ev: tumbling_counts(ev, watermark="2 hours"),
            "t_tumbling",
            ["window_start", "event_type", "n_events", "sum_value", "avg_value"],
        ),
        (
            lambda ev: sliding_counts(ev, watermark="3 hours"),
            "t_sliding",
            ["window_start", "event_type", "n_events"],
        ),
        (
            lambda ev: session_windows(ev, watermark="2 hours"),
            "t_sessions",
            ["user_id", "session_start_us", "n_events", "last_ts_us", "sum_value"],
        ),
    ],
)
def test_stream_matches_batch(spark, sf_dir, op, name, cols):
    batch = op(load(spark, sf_dir, "events"))
    stream = op(read_events_stream(spark, sf_dir))
    assert stream.isStreaming
    _run_stream_to_memory(stream, name)
    got = _sorted_rows(spark.table(name), cols)
    want = _sorted_rows(batch, cols)
    assert got == want and len(got) > 0


def test_stateful_user_state_matches_batch(spark, sf_dir):
    ev = read_events_stream(spark, sf_dir)
    _run_stream_to_memory(user_state_stream(ev), "t_state", output_mode="update")
    # last emission per user == final state
    final = (
        spark.table("t_state")
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("max_value").alias("max_value"),
            F.max("last_ts_us").alias("last_ts_us"),
        )
    )
    got = _sorted_rows(final, ["user_id", "n_events", "max_value", "last_ts_us"])
    # user_state emits last_ts_us directly since r9 (epoch-µs contract)
    want_df = user_state(load(spark, sf_dir, "events")).select(
        "user_id", "n_events", "max_value", "last_ts_us"
    )
    want = _sorted_rows(want_df, ["user_id", "n_events", "max_value", "last_ts_us"])
    assert got == want and len(got) > 0


def test_stream_dedup_drops_cross_batch_duplicates(spark, sf_dir):
    """Union the stream with itself: every event arrives twice; the
    watermark-bounded dedup must emit each event_id exactly once."""
    from duckdb_ml_spark.streaming.stream import dedup_events

    ev = read_events_stream(spark, sf_dir)
    doubled = ev.union(read_events_stream(spark, sf_dir))
    deduped = dedup_events(doubled, watermark="2 hours")
    q = (
        deduped.select("event_id").writeStream.format("memory")
        .queryName("t_dedup").outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.table("t_dedup")
    n_batch = load(spark, sf_dir, "events").count()
    assert got.count() == n_batch
    assert got.distinct().count() == n_batch


def test_parquet_sink_checkpoint_recovery(spark, sf_dir, tmp_path):
    """File sink + checkpoint: re-running the query over an unchanged source
    must be a no-op (exactly-once output), and the sink contents must equal
    the batch answer."""
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        agg = tumbling_counts(read_events_stream(spark, sf_dir), watermark="2 hours")
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    n1 = spark.read.parquet(out).count()
    run_once()  # same files, same checkpoint: nothing new to process
    n2 = spark.read.parquet(out).count()
    assert n1 == n2 > 0
    # append-mode file sink only emits windows closed by the watermark: the
    # emitted rows must be exactly-valued batch rows, missing only the tail
    # windows (≤ one open hour per event_type) still inside the watermark
    cols = ["window_start", "event_type", "n_events", "sum_value", "avg_value"]
    sink_rows = {tuple(r) for r in spark.read.parquet(out).select(*cols).collect()}
    batch_rows = {tuple(r) for r in tumbling_counts(load(spark, sf_dir, "events")).select(*cols).collect()}
    n_types = load(spark, sf_dir, "events").select("event_type").distinct().count()
    assert sink_rows <= batch_rows
    assert len(batch_rows) - len(sink_rows) <= 3 * n_types


def test_stream_stream_interval_join_matches_batch(spark, sf_dir):
    """Stream-stream inner join with an event-time interval condition and
    watermarks on both sides (Spark buffers each side's state only within the
    watermark horizon). Must equal the same join run in batch."""
    from duckdb_ml_spark.streaming.stream import interval_join_pairs as pairs

    sev = read_events_stream(spark, sf_dir)
    q = (
        pairs(sev, read_events_stream(spark, sf_dir))
        .writeStream.format("memory").queryName("t_ssjoin")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    bev = load(spark, sf_dir, "events")
    got = {(r.id_a, r.id_b) for r in spark.table("t_ssjoin").collect()}
    want = {(r.id_a, r.id_b) for r in pairs(bev, bev).collect()}
    assert got == want and len(want) > 0


def test_sql_ml_list_udtf(spark):
    from duckdb_ml_spark import functions as fn
    from duckdb_ml_spark import registry

    registry.clear()
    fn.ml_create("udtf_a", '{"layers": [{"in": 2, "out": 4}, {"in": 4, "out": 1}]}')
    fn.register_all(spark)
    rows = spark.sql("SELECT * FROM ml_list()").collect()
    assert [(r.model) for r in rows] == ["udtf_a"]
    assert '"in": 2' in rows[0].json


def test_watermark_in_plan(spark, sf_dir):
    ev = read_events_stream(spark, sf_dir)
    agg = tumbling_counts(ev, watermark="2 hours")
    assert "EventTimeWatermark" in agg._jdf.queryExecution().analyzed().toString()


def test_foreach_batch_upsert_sink(spark, sf_dir, tmp_path):
    """foreachBatch upsert: first run seeds the keyed target; a second stream
    carrying updated values for a key subset replaces exactly those rows."""
    from pyspark.sql import functions as F

    from duckdb_ml_spark.sinks import foreach_batch_upsert

    target = str(tmp_path / "upsert_target")
    ev_cols = ["event_id", "user_id", "value"]

    q = foreach_batch_upsert(
        read_events_stream(spark, sf_dir).select(*ev_cols),
        target,
        key_cols=["event_id"],
        checkpoint=str(tmp_path / "ckpt1"),
    )
    q.awaitTermination(120)
    base = load(spark, sf_dir, "events").select(*ev_cols)
    assert spark.read.parquet(target).count() == base.count()

    updated = (
        read_events_stream(spark, sf_dir)
        .select(*ev_cols)
        .where(F.col("event_id") % 10 == 0)
        .withColumn("value", F.col("value") + 1000.0)
    )
    q2 = foreach_batch_upsert(
        updated, target, key_cols=["event_id"], checkpoint=str(tmp_path / "ckpt2")
    )
    q2.awaitTermination(120)
    out = spark.read.parquet(target)
    assert out.count() == base.count()  # replaced, not appended
    n_upd = out.where((F.col("event_id") % 10 == 0) & (F.col("value") >= 1000.0)).count()
    n_expected = base.where(F.col("event_id") % 10 == 0).count()
    assert n_upd == n_expected


def test_rocksdb_state_store_provider(spark, sf_dir):
    """Windowed streaming agg under the RocksDB state store — the state
    backend a 100 TB streaming job runs (bounded executor heap: state lives
    off-heap/on-disk instead of the default in-memory HDFS-backed map).
    Results must be identical to the default provider's batch twin."""
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        batch = tumbling_counts(load(spark, sf_dir, "events"))
        stream = tumbling_counts(read_events_stream(spark, sf_dir))
        _run_stream_to_memory(stream, "t_rocks")
        got = _sorted_rows(
            spark.table("t_rocks"),
            ["window_start", "event_type", "n_events", "sum_value", "avg_value"],
        )
        want = _sorted_rows(
            batch, ["window_start", "event_type", "n_events", "sum_value", "avg_value"]
        )
        assert got == want
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_stream_topk_foreachbatch_matches_batch(spark, sf_dir, tmp_path):
    """Windowed top-k under streaming: the watermark-finalized tumbling
    aggregate streams into a foreachBatch sink that applies the SAME rank
    stage as the batch plan; sink rows must be a subset of the batch top-k
    missing only watermark-open tail windows."""
    import os

    from duckdb_ml_spark.streaming.stream import (
        hourly_topk_types,
        rank_topk_types,
        read_events_stream,
        tumbling_counts,
    )

    out = str(tmp_path / "topk")

    def sink(batch_df, batch_id):
        ranked = rank_topk_types(
            batch_df.select("window_start", "event_type", "n_events")
        )
        ranked.write.mode("append").parquet(out)

    agg = tumbling_counts(read_events_stream(spark, sf_dir), watermark="2 hours")
    q = (
        agg.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert os.path.isdir(out)
    sink_rows = {tuple(r) for r in spark.read.parquet(out).collect()}
    batch_rows = {
        tuple(r) for r in hourly_topk_types(load(spark, sf_dir, "events")).collect()
    }
    assert sink_rows and sink_rows <= batch_rows


def test_scd2_fold_split_invariance():
    """Folding a stream batch-by-batch (any split) must equal folding it
    whole — the cross-batch stitching property the streaming compactor
    rests on — and match the hand-computed intervals."""
    import numpy as np

    from duckdb_ml_spark.streaming.stream import scd2_fold

    et = np.array(["A", "A", "B", "B", "B", "A", "C", "C"])
    us = np.array([10, 20, 30, 40, 50, 60, 70, 80], dtype="int64")

    def run(splits):
        state, closed = (None, 0, 0, 0), []
        for lo, hi in splits:
            state, c = scd2_fold(*state, et[lo:hi], us[lo:hi])
            closed.extend(c)
        return state, closed

    whole_state, whole_closed = run([(0, 8)])
    assert whole_closed == [("A", 1, 10, 30, 2), ("B", 2, 30, 60, 3), ("A", 3, 60, 70, 1)]
    assert whole_state == ("C", 70, 4, 2)
    for splits in ([(0, 1), (1, 8)], [(0, 2), (2, 5), (5, 8)], [(0, i) for i in []] or [(0, 4), (4, 4), (4, 8)],
                   [(i, i + 1) for i in range(8)]):
        st, cl = run(splits)
        assert st == whole_state and cl == whole_closed, splits


def test_stateful_scd2_stream_matches_batch(spark, sf_dir):
    """Last emission per (user, version) from the stateful stream == the
    batch islands compaction, value-for-value."""
    from duckdb_ml_spark.streaming.stream import scd2_compact, scd2_stream

    ev = read_events_stream(spark, sf_dir)
    _run_stream_to_memory(scd2_stream(ev), "t_scd2", output_mode="update")
    emitted = spark.table("t_scd2")
    # a version's final emission is the closed one when it exists (valid_to
    # set), else the open snapshot with the largest n_events
    from pyspark.sql import Window as W

    last = (
        emitted.withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("user_id", "version_n").orderBy(
                    F.col("is_current").asc(), F.desc("n_events")
                )
            ),
        )
        .where("rk = 1")
        .drop("rk")
    )
    cols = ["user_id", "event_type", "version_n", "valid_from_us", "valid_to_us", "n_events", "is_current"]
    got = _sorted_rows(last, cols)
    want = _sorted_rows(scd2_compact(load(spark, sf_dir, "events")), cols)
    assert got == want and len(got) > 0


def test_stream_countmin_matches_batch(spark, sf_dir):
    """The count-min counter table must be identical computed incrementally
    (complete mode -- additive sums, bounded d x width state) and as a batch."""
    from duckdb_ml_spark.operators.text import CM_DEPTH, CM_WIDTH
    from duckdb_ml_spark.streaming.stream import countmin_user_counters

    batch = countmin_user_counters(load(spark, sf_dir, "events"))
    stream = countmin_user_counters(read_events_stream(spark, sf_dir))
    assert stream.isStreaming
    _run_stream_to_memory(stream, "t_countmin", output_mode="complete")
    got = _sorted_rows(spark.table("t_countmin"), ["r", "b", "c"])
    want = _sorted_rows(batch, ["r", "b", "c"])
    assert got == want and 0 < len(got) <= CM_DEPTH * CM_WIDTH
