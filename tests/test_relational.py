"""Every relational QuerySpec must hash-match its DuckDB oracle (driver t2 contract)."""

from __future__ import annotations

import pytest

from duckdb_ml_spark.plans.relational import RELATIONAL_QUERIES
from duckdb_ml_spark.testing import compare_to_oracle


@pytest.mark.parametrize("name", sorted(RELATIONAL_QUERIES))
def test_relational_query_matches_oracle(name, spark, sf_dir, oracle_con):
    spec = RELATIONAL_QUERIES[name]
    df = spec.builder(spark, sf_dir)
    if spec.oracle is None:
        assert df.count() >= 0
        return
    report = compare_to_oracle(df, spec.oracle, oracle_con)
    assert report["match"], report


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_queries_oracle_keys_subset():
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 19


def test_revenue_by_nation_plan_shape(spark, sf_dir):
    """Q5 star join, below-gate plan contract: every join side that reaches
    lineitem broadcasts (ASIA suppliers, the narrow orderkey→nationkey map,
    the dimension chain), the region filter reaches its scan, and the fact
    NEVER shuffles — the ONLY Exchange in the whole plan is the 5-row final
    aggregate. A second Exchange appearing means the fact got re-partitioned
    (the exact regression the r11 256x variant probe measured at 4-10x)."""
    from duckdb_ml_spark.plans.relational import revenue_by_nation

    plan = revenue_by_nation(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 4, plan
    assert "ASIA" in plan  # r_name filter pushed toward the region scan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_unpivot_uses_expand_not_union(spark, sf_dir):
    """DataFrame.unpivot must plan an Expand (in-stage row fan-out), not a
    union of two scans — one pass over part, not two."""
    from duckdb_ml_spark.plans.relational import unpivot_part_measures

    plan = unpivot_part_measures(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan, plan
    assert "Union" not in plan, plan


def test_orders_rank_metrics_single_window_exchange(spark, sf_dir):
    """ntile/percent_rank/cume_dist share one frame: exactly one shuffle on
    the partition key and one Window node computing all three."""
    from duckdb_ml_spark.plans.relational import orders_rank_metrics

    plan = orders_rank_metrics(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") >= 1
    # one exchange for the window partition; none extra for the projection
    assert plan.count("Exchange") == 1, plan


def test_price_quantiles_approx_mode_close_to_exact(spark, sf_dir):
    """mode='approx' (mergeable sketch — the 100 TB default) must agree with
    the exact percentile within the sketch's rank-error bound (1/accuracy)."""
    from duckdb_ml_spark.plans.relational import price_quantiles_by_flag

    exact = {r.l_returnflag: r for r in price_quantiles_by_flag(spark, sf_dir).collect()}
    approx = {
        r.l_returnflag: r
        for r in price_quantiles_by_flag(spark, sf_dir, mode="approx").collect()
    }
    assert exact.keys() == approx.keys()
    for flag, e in exact.items():
        a = approx[flag]
        for col in ("p25", "p50", "p75"):
            # generous value tolerance: rank error 1e-4 on a smooth price
            # distribution stays well under 1% in value
            assert abs(getattr(a, col) - getattr(e, col)) <= 0.01 * abs(getattr(e, col))


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """The point of bucketing: both sides pre-shuffled at write time, so the
    join plans with zero Exchange nodes (broadcast disabled to force the
    merge-join path a 100 TB fact-fact join would take)."""
    from duckdb_ml_spark.sources.readers import bucketed_orders_lineitem

    o, l = bucketed_orders_lineitem(spark, sf_dir)
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = o.join(l, o.o_orderkey == l.l_orderkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan


def test_partitioned_scan_prunes_directories(spark, sf_dir):
    """The partition-column filter must appear as a PartitionFilters entry on
    the scan (directory pruning at plan time), not a post-scan Filter over all
    partitions; and the ORC roundtrip must preserve the schema exactly."""
    from duckdb_ml_spark.sources.readers import _orc_roundtrip_q, _partitioned_parquet_q
    from duckdb_ml_spark.tables import load

    df = _partitioned_parquet_q(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    scan_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "src1" in scan_line or "isnotnull(source" in scan_line

    orc = _orc_roundtrip_q(spark, sf_dir)
    assert orc.schema == load(spark, sf_dir, "customer").schema


def test_merge_upsert_semantics(spark, tmp_path):
    """merge_upsert_parquet: matched keys replaced, unmatched inserted,
    others carried; last-writer-wins inside the update batch; atomic target
    (no .staging/.old leftovers)."""
    import os

    from duckdb_ml_spark.sinks import merge_upsert_parquet

    target = str(tmp_path / "t")
    base = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, v string")
    base.write.parquet(target)
    updates = spark.createDataFrame(
        [(2, "B1"), (2, "B2"), (4, "d")], "k long, v string"
    )
    merge_upsert_parquet(spark, target, updates, ["k"])
    got = {r.k: r.v for r in spark.read.parquet(target).collect()}
    assert got[1] == "a" and got[3] == "c" and got[4] == "d"
    assert got[2] in ("B1", "B2")  # last-writer-wins is per-batch dedup
    assert not os.path.isdir(target + ".staging") and not os.path.isdir(target + ".old")
    # merging the same batch again is idempotent
    merge_upsert_parquet(spark, target, updates, ["k"])
    assert {r.k: r.v for r in spark.read.parquet(target).collect()} == got


def test_compaction_collapses_files_preserving_rows(spark, sf_dir, tmp_path):
    from duckdb_ml_spark.sinks import compact_small_files
    from duckdb_ml_spark.tables import load
    import os

    docs = load(spark, sf_dir, "documents")
    shards = str(tmp_path / "shards")
    out = str(tmp_path / "out")
    docs.repartition(32).write.parquet(shards)
    n_in = sum(1 for f in os.listdir(shards) if f.endswith(".parquet"))
    n_out = compact_small_files(spark, shards, out, target_bytes=128 << 20)
    assert n_in == 32 and n_out < n_in
    assert spark.read.parquet(out).count() == docs.count()


def test_two_pass_rank_equals_single_window(spark, sf_dir):
    """The r5 two-pass range-bucket rank (orderstats.keyed_global_rank) must
    produce row-for-row the same distribution values as the reference
    single-window form it replaced — the strategy-equivalence anchor."""
    from duckdb_ml_spark.plans.relational import (
        orders_rank_distribution,
        orders_rank_distribution_single_window,
    )

    two = {
        r.o_orderkey: (r.pct_rank, r.cum_dist)
        for r in orders_rank_distribution(spark, sf_dir, mode="two_pass").collect()
    }
    one = {
        r.o_orderkey: (r.pct_rank, r.cum_dist)
        for r in orders_rank_distribution_single_window(spark, sf_dir).collect()
    }
    assert two == one


def test_two_pass_rank_parallelism(spark, sf_dir):
    """The whole point of the two-pass form: the big window partitions on
    (key, bucket), never on the bare 5-value key — assert the plan's window
    spec carries the bucket column so no key sorts on one task. The r6 size
    gate (RANK_WINDOW_GATE) must also pick the plain window below the gate:
    the test corpus is far under 4 M rows, so mode='auto' must NOT pay the
    two-pass machinery there."""
    from duckdb_ml_spark.plans.relational import orders_rank_distribution

    def plan_of(mode):
        return (
            orders_rank_distribution(spark, sf_dir, mode=mode)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    assert "__b" in plan_of("two_pass")
    assert "__b" not in plan_of("auto")  # small input → plain window


def test_winsorized_kernel_equals_distributed(spark, sf_dir):
    """The two sides of the fused winsorized gate must agree exactly —
    same strategy-equivalence contract as the quantile gate (and bitwise
    bounds: both interpolate via quantile_cont_sorted / the h=p(n-1)
    formula, never np.percentile — ADVICE r5 high)."""
    from duckdb_ml_spark.plans.relational import orders_winsorized_stats

    def rows(mode):
        return {
            r.o_orderpriority: tuple(r)[1:]
            for r in orders_winsorized_stats(spark, sf_dir, mode=mode).collect()
        }

    assert rows("kernel") == rows("distributed")


def test_quantile_cont_sorted_matches_duckdb():
    """quantile_cont_sorted must be BITWISE equal to DuckDB quantile_cont
    (the ADVICE r5 divergence was np.percentile's pct*100/100 round-trip and
    asymmetric lerp — ulp-level, so the assertion is exact equality, not
    approx)."""
    import duckdb
    import numpy as np

    from duckdb_ml_spark.plans.orderstats import quantile_cont_sorted

    rng = np.random.default_rng(7)
    con = duckdb.connect()
    probs = [0.05, 0.25, 0.5, 0.75, 0.95, 0.999]
    for n in (2, 3, 17, 1000):
        v = np.sort(rng.uniform(1e3, 5e5, n))
        # tie-heavy variant too: quantize to force repeated values
        for arr in (v, np.round(v, -3)):
            got = quantile_cont_sorted(arr, probs)
            ref = [
                con.execute(
                    "SELECT quantile_cont(x, ?) FROM (SELECT unnest(?) AS x)",
                    [p, arr.tolist()],
                ).fetchone()[0]
                for p in probs
            ]
            assert got == ref, (n, got, ref)


def test_distributed_quantiles_equal_kernel(spark, sf_dir):
    """The two sides of the quantile size gate must agree exactly: the
    bucket-pruned distributed form (forced) vs the whole-group Arrow kernel
    (quantile_cont_sorted) — same strategy-equivalence contract as the
    collect gates elsewhere."""
    from duckdb_ml_spark.plans.orderstats import quantiles_wide
    from duckdb_ml_spark.tables import load

    li = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    args = ("l_returnflag", "l_extendedprice", [0.25, 0.5, 0.75], ["p25", "p50", "p75"])
    dist = {
        r.l_returnflag: (r.p25, r.p50, r.p75)
        for r in quantiles_wide(li, *args, mode="distributed").collect()
    }
    kern = {
        r.l_returnflag: (r.p25, r.p50, r.p75)
        for r in quantiles_wide(li, *args, mode="kernel").collect()
    }
    assert dist == kern


def test_exact_quantiles_randomized_distributions_match_duckdb(spark):
    """Randomized sweep: 24 groups with adversarial shapes — constant,
    two-point, heavy ties, exponential tails, negatives, tiny n — ALL
    checked in ONE Spark job (both winsorized decomposition and quantiles)
    against DuckDB, exact equality."""
    import duckdb
    import numpy as np

    from duckdb_ml_spark.plans.orderstats import (
        exact_group_quantiles,
        winsorized_stats,
    )

    rng = np.random.default_rng(23)
    groups = {}
    for i in range(24):
        kind = i % 6
        n = int(rng.integers(2, 400))
        if kind == 0:
            v = np.full(n, float(rng.uniform(-50, 50)))  # constant
        elif kind == 1:
            v = rng.choice([1.5, 99.5], size=n)  # two-point
        elif kind == 2:
            v = np.round(rng.normal(0, 100, n), 0)  # heavy ties, negatives
        elif kind == 3:
            v = rng.exponential(1e4, n)  # heavy tail
        elif kind == 4:
            v = rng.uniform(-1e6, 1e6, n)
        else:
            v = np.round(rng.uniform(0, 1, n), 2)  # dense small ties
        groups[f"g{i}"] = [float(x) for x in v]
    rows = [(k, v) for k, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "k string, v double")
    probs = [0.01, 0.05, 0.5, 0.95, 0.99]
    got = {
        (r["k"], r["__p"]): r["__q"]
        for r in exact_group_quantiles(df, "k", "v", probs, n_buckets=16).collect()
    }
    con = duckdb.connect()
    for k, vs in groups.items():
        for p in probs:
            ref = con.execute(
                "SELECT quantile_cont(x, ?) FROM (SELECT unnest(?) AS x)", [p, vs]
            ).fetchone()[0]
            assert got[(k, p)] == ref, (k, p, got[(k, p)], ref)
    # winsorized decomposition: integer outputs exact vs per-row compare
    w = {
        r["k"]: r
        for r in winsorized_stats(df, "k", "v", 0.05, 0.95, mode="distributed").collect()
    }
    for k, vs in groups.items():
        lo = con.execute(
            "SELECT quantile_cont(x, 0.05), quantile_cont(x, 0.95) FROM (SELECT unnest(?) AS x)",
            [vs],
        ).fetchone()
        n_lo = sum(1 for v in vs if v < lo[0])
        n_hi = sum(1 for v in vs if v > lo[1])
        assert (w[k]["__n"], w[k]["__n_lo"], w[k]["__n_hi"]) == (len(vs), n_lo, n_hi), k
        mean_wins = sum(max(lo[0], min(lo[1], v)) for v in vs) / len(vs)
        assert abs(w[k]["__mean_wins"] - mean_wins) < 1e-6 * max(1.0, abs(mean_wins)), k


def test_bucket_of_matches_bucket_expr(spark):
    """The driver-side bucket_of MUST agree with the executor-side
    bucket_expr on every input, including values exactly equal to a bound —
    the decomposed winsorized correctness argument rests on this."""
    from pyspark.sql import functions as F

    from duckdb_ml_spark.plans.orderstats import bucket_expr, bucket_of

    bounds = [10.0, 20.0, 20.5, 100.0]
    vals = [0.0, 9.9, 10.0, 10.1, 19.9, 20.0, 20.4, 20.5, 99.9, 100.0, 101.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = {
        r["v"]: r["b"]
        for r in df.select("v", bucket_expr(F.col("v"), bounds).alias("b")).collect()
    }
    for v in vals:
        assert got[v] == bucket_of(v, bounds), v


def test_exact_quantiles_tie_heavy_matches_duckdb(spark):
    """End-to-end exact_group_quantiles on a TIE-HEAVY distribution (one
    value dominates, values collide with bucket bounds) vs DuckDB
    quantile_cont — the data class where bucket-edge and tie-block bugs
    would hide. Exact equality (both engines interpolate bitwise-identically
    after the r6 symmetric-form fix)."""
    import duckdb
    import numpy as np

    from duckdb_ml_spark.plans.orderstats import exact_group_quantiles

    rng = np.random.default_rng(11)
    # 3 keys × 4000 rows; 60% of rows share one of 3 values, rest uniform
    rows = []
    for k in ("a", "b", "c"):
        vals = np.where(
            rng.uniform(size=4000) < 0.6,
            rng.choice([100.0, 250.0, 250.0, 999.5], size=4000),
            np.round(rng.uniform(1, 1000, size=4000), 1),
        )
        rows += [(k, float(v)) for v in vals]
    df = spark.createDataFrame(rows, "k string, v double")
    probs = [0.01, 0.25, 0.5, 0.75, 0.99]
    got = {
        (r["k"], r["__p"]): r["__q"]
        for r in exact_group_quantiles(df, "k", "v", probs, n_buckets=16).collect()
    }
    con = duckdb.connect()
    for k in ("a", "b", "c"):
        vs = [v for kk, v in rows if kk == k]
        for p in probs:
            ref = con.execute(
                "SELECT quantile_cont(x, ?) FROM (SELECT unnest(?) AS x)",
                [p, vs],
            ).fetchone()[0]
            assert got[(k, p)] == ref, (k, p, got[(k, p)], ref)


def test_exact_quantiles_ignore_nulls_and_mirror_key_type(spark):
    """review r6: (a) NULL values must be EXCLUDED (quantile_cont
    semantics) — the bucket tree would otherwise route NULLs to bucket 0 and
    shift every target position; (b) the result key column mirrors the
    input key type (was hardcoded string)."""
    import duckdb

    from duckdb_ml_spark.plans.orderstats import (
        exact_group_quantiles,
        group_quantiles_kernel,
        winsorized_stats,
    )

    rows = [(1, float(v)) for v in range(1, 101)] + [(1, None)] * 20
    df = spark.createDataFrame(rows, "k bigint, v double")
    q = exact_group_quantiles(df, "k", "v", [0.5], n_buckets=8)
    assert dict(q.dtypes)["k"] == "bigint"
    got = q.collect()[0]["__q"]
    ref = duckdb.connect().execute(
        "SELECT quantile_cont(x, 0.5) FROM (SELECT unnest(?) AS x)",
        [[float(v) for v in range(1, 101)]],
    ).fetchone()[0]
    assert got == ref == 50.5
    kq = group_quantiles_kernel(df, "k", "v", [0.5], ["p50"]).collect()[0]
    assert kq["p50"] == ref
    w = winsorized_stats(df, "k", "v", 0.05, 0.95, mode="kernel").collect()[0]
    assert w["__n"] == 100  # NULLs excluded from the count too


def test_partitioned_merge_refuses_other_partition_column(spark, tmp_path):
    """review r6: a target partitioned by a DIFFERENT column must be
    refused, not treated as empty (the interleave corruption class)."""
    import pytest
    from pyspark.sql import functions as F

    from duckdb_ml_spark.sinks import merge_upsert_partitioned

    target = str(tmp_path / "t")
    base = spark.range(0, 16).select(
        F.col("id").alias("k"),
        (F.col("id") % 2).cast("int").alias("region"),
        (F.col("id") % 4).cast("int").alias("part"),
    )
    base.write.partitionBy("region").parquet(target)
    with pytest.raises(ValueError, match="different column"):
        merge_upsert_partitioned(spark, target, base, ["k"], "part")


def test_exact_quantiles_lazy_fallback_equivalent(spark, sf_dir):
    """The collect-based two-scan form (default) and the all-lazy semi-join
    fallback (key cardinality above CELL_COLLECT_GATE) must produce identical
    quantiles — the two sides of the cell-collect gate."""
    from duckdb_ml_spark.plans.orderstats import (
        exact_group_quantiles,
        exact_group_quantiles_lazy,
    )
    from duckdb_ml_spark.tables import load

    li = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    args = ("l_returnflag", "l_extendedprice", [0.05, 0.5, 0.999])
    a = {(r[0], r[1]): r[2] for r in exact_group_quantiles(li, *args).collect()}
    b = {(r[0], r[1]): r[2] for r in exact_group_quantiles_lazy(li, *args).collect()}
    assert a == b


def test_exact_quantiles_pass2_filter_is_pushed(spark, sf_dir):
    """Pass 2's bucket prune must reach the parquet scan as a pushed value-
    range predicate (row-group min/max pruning at scale), not a post-scan
    semi-join."""
    from duckdb_ml_spark.plans.orderstats import exact_group_quantiles
    from duckdb_ml_spark.tables import load

    li = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    plan = (
        exact_group_quantiles(li, "l_returnflag", "l_extendedprice", [0.25, 0.5])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan
    # the pass-2 scan carries a GreaterThanOrEqual/LessThan range on the value
    assert "GreaterThanOrEqual(l_extendedprice" in plan or "LessThan(l_extendedprice" in plan, plan


def test_exact_group_quantiles_prunes_buckets(spark, sf_dir):
    """Pass 2 must scan only the buckets holding target ranks: the pruned
    relation is a small fraction of the facts."""
    from duckdb_ml_spark.plans.orderstats import (
        bucket_expr,
        value_range_bounds,
        exact_group_quantiles,
    )
    from duckdb_ml_spark.tables import load
    from pyspark.sql import functions as F

    li = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    bounds = value_range_bounds(li, "l_extendedprice", 32)
    t = li.withColumn("__b", bucket_expr(F.col("l_extendedprice"), bounds))
    # quantiles at 3 probs touch at most 3 flags * 6 buckets (floor/ceil per
    # prob); the pruned scan must be well under a quarter of the table
    q = exact_group_quantiles(li, "l_returnflag", "l_extendedprice", [0.25, 0.5, 0.75])
    assert q.count() == 3 * 3
    total = li.count()
    needed = (
        t.groupBy("l_returnflag", "__b")
        .count()
        .where(F.col("__b").isin([b for b in range(0, 33)]))
    )
    # structural check: 32 buckets exist, each well-bounded
    per_bucket_max = t.groupBy("__b").count().agg(F.max("count")).head()[0]
    assert per_bucket_max < total / 4


def test_token_shards_byte_layout(spark, sf_dir, tmp_path):
    """The .bin/.idx byte contract a dataloader depends on: uint16
    little-endian ids, file length a seq_len multiple, tail padded with
    pad_id = |vocab|, idx holds int64 sequence offsets, and the decoded
    unpadded stream equals the corpus token stream in (doc_id, pos) order."""
    import numpy as np

    from duckdb_ml_spark.operators.bpe import token_id_lexicon, token_pad_id
    from duckdb_ml_spark.operators.textnorm import tokens
    from duckdb_ml_spark.sinks import write_token_shards
    from duckdb_ml_spark.tables import load
    from pyspark.sql import functions as F

    sf = sf_dir
    out = str(tmp_path / "shards")
    seq_len = 16
    manifest = {r["source"]: r for r in write_token_shards(spark, sf, out, seq_len=seq_len)}
    vocab = token_id_lexicon()
    pad_id = token_pad_id()
    docs = (
        load(spark, sf, "documents")
        .select("doc_id", "source", tokens(F.col("text")).alias("w"))
        .collect()
    )
    streams: dict = {}
    for r in sorted(docs, key=lambda r: r.doc_id):
        streams.setdefault(r.source, []).extend(
            vocab[w] for w in r.w if w in vocab  # OOV dropped, like the sink
        )
    for src, expect in streams.items():
        ids = np.fromfile(f"{out}/shard_{src}.bin", dtype="<u2")
        assert len(ids) % seq_len == 0
        n = manifest[src]["n_tokens"]
        assert list(ids[:n]) == expect  # exact stream, (doc_id, pos) order
        assert all(i == pad_id for i in ids[n:])  # tail padding only
        idx = np.fromfile(f"{out}/shard_{src}.idx", dtype="<i8")
        assert list(idx) == list(range(0, len(ids), seq_len))
        assert manifest[src]["n_seqs"] == len(ids) // seq_len


def test_token_shards_oov_and_empty_docs(spark, tmp_path):
    """review r6c: out-of-lexicon words are DROPPED (the oracle's inner-join
    semantics, not a KeyError), NULL/empty texts contribute nothing, and
    n_docs counts only documents that contributed at least one token."""
    import numpy as np

    from duckdb_ml_spark.operators.bpe import token_id_lexicon
    from duckdb_ml_spark.sinks import write_token_shards

    rows = [
        (1, "hash join UNKNOWNWORD batch", "s0"),
        (2, "zzz qqq", "s0"),  # all OOV -> contributes nothing
        (3, None, "s0"),  # NULL text
        (4, "scan", "s1"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    out = str(tmp_path / "oov")
    m = {r["source"]: r for r in write_token_shards(spark, "", out, seq_len=4, docs=docs)}
    vocab = token_id_lexicon()
    assert m["s0"]["n_docs"] == 1 and m["s0"]["n_tokens"] == 3
    assert m["s1"]["n_docs"] == 1 and m["s1"]["n_tokens"] == 1
    ids = np.fromfile(f"{out}/shard_s0.bin", dtype="<u2")
    assert list(ids[:3]) == [vocab["hash"], vocab["join"], vocab["batch"]]


def test_partitioned_merge_refuses_flat_target_and_bad_values(spark, tmp_path):
    """ADVICE r5: a flat (non-partitioned) parquet target must be refused —
    not silently treated as empty (old+new rows would interleave); and
    non-integral partition values must be rejected before any write (the
    Hive dir naming below only matches Spark's escaping for ints)."""
    import pytest
    from pyspark.sql import functions as F

    from duckdb_ml_spark.sinks import merge_upsert_partitioned

    flat = str(tmp_path / "flat")
    base = spark.range(0, 10).select(
        F.col("id").alias("k"), (F.col("id") % 2).cast("int").alias("part")
    )
    base.write.parquet(flat)  # non-partitioned layout
    with pytest.raises(ValueError, match="non-partitioned"):
        merge_upsert_partitioned(spark, flat, base, ["k"], "part")

    strpart = base.withColumn("part", F.col("part").cast("string"))
    with pytest.raises(ValueError, match="integral"):
        merge_upsert_partitioned(
            spark, str(tmp_path / "t2"), strpart, ["k"], "part"
        )


def test_partitioned_merge_rewrites_only_affected_partitions(spark, tmp_path):
    """merge_upsert_partitioned (VERDICT r4 item 3): updates touching 2 of 8
    partitions must leave the other 6 partition directories byte-identical
    (same files, same bytes, same mtimes — never opened for write)."""
    import os

    from pyspark.sql import functions as F

    from duckdb_ml_spark.sinks import merge_upsert_partitioned

    target = str(tmp_path / "t")
    base = spark.range(0, 800).select(
        F.col("id").alias("k"),
        (F.col("id") % 8).cast("int").alias("part"),
        (F.col("id") * 2.0).alias("v"),
    )
    base.write.partitionBy("part").parquet(target)

    def snapshot(part_values):
        out = {}
        for p in part_values:
            d = os.path.join(target, f"part={p}")
            for f in sorted(os.listdir(d)):
                if f.endswith(".parquet"):
                    st = os.stat(os.path.join(d, f))
                    out[(p, f)] = (st.st_size, st.st_mtime_ns)
        return out

    before = snapshot(range(8))
    updates = spark.range(0, 800).where((F.col("id") % 8).isin(2, 5)).select(
        F.col("id").alias("k"),
        (F.col("id") % 8).cast("int").alias("part"),
        F.lit(-1.0).alias("v"),
    )
    affected = merge_upsert_partitioned(spark, target, updates, ["k"], "part")
    assert affected == [2, 5]
    after = snapshot(range(8))
    untouched_before = {k: v for k, v in before.items() if k[0] not in (2, 5)}
    untouched_after = {k: v for k, v in after.items() if k[0] not in (2, 5)}
    assert untouched_before == untouched_after  # same files, bytes, mtimes
    # merged content: parts 2/5 fully replaced with v=-1, rest carried
    got = spark.read.parquet(target)
    assert got.count() == 800
    assert got.where(F.col("part").isin(2, 5)).where(F.col("v") != -1.0).count() == 0
    assert got.where(~F.col("part").isin(2, 5)).where(F.col("v") == -1.0).count() == 0
    # partition pruning reaches the scan: the merge's read plan filters dirs
    # (structural check on a fresh pruned read of the same target)
    plan = (
        spark.read.parquet(target)
        .where(F.col("part").isin(2, 5))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan


def test_winsorized_fixed_scale_deterministic_across_modes_and_partitionings(spark):
    """r8 de-flake (VERDICT r7 item 1a): with fixed_scale, the unrounded
    means must be BITWISE identical across kernel / distributed / lazy modes
    AND across arbitrary repartitionings — sums accumulate as exact int64
    and the means assemble via one pinned IEEE expression, so there is no
    summation-order degree of freedom left for an environment to flip."""
    import numpy as np

    from duckdb_ml_spark.plans import orderstats
    from duckdb_ml_spark.plans.orderstats import winsorized_stats

    rng = np.random.default_rng(11)
    rows = [
        (f"g{i % 4}", float(np.round(rng.uniform(1e3, 5e5), 2)))
        for i in range(4000)
    ]
    df = spark.createDataFrame(rows, "k string, v double")

    def run(d, mode, disc_fracs=None):
        return {
            r["k"]: (r["__n"], r["__mean_raw"], r["__mean_wins"],
                     r["__n_lo"], r["__n_hi"])
            for r in winsorized_stats(
                d, "k", "v", 0.05, 0.95, mode=mode, fixed_scale=100,
                disc_fracs=disc_fracs,
            ).collect()
        }

    disc = ((1, 20), (19, 20))
    ref = run(df, "kernel")
    ref_disc = run(df, "kernel", disc)
    for nparts in (1, 7, 32):
        d = df.repartition(nparts)
        assert run(d, "kernel") == ref, nparts
        assert run(d, "distributed") == ref, nparts
        assert run(d, "kernel", disc) == ref_disc, nparts
        assert run(d, "distributed", disc) == ref_disc, nparts
    # lazy branch (cell collect above the gate) — force it by shrinking the
    # gate; must hit the fixed-scale Spark-expression path and stay bitwise.
    # ADVICE r9 low: also exercise the disc_fracs all-lazy branch
    # (exact_group_order_stats_lazy — the >gate scale path of the
    # re-engineered orders_winsorized_stats), not just the cont one.
    old = orderstats.CELL_COLLECT_GATE
    orderstats.CELL_COLLECT_GATE = 2
    try:
        assert run(df.repartition(13), "distributed") == ref
        assert run(df.repartition(13), "distributed", disc) == ref_disc
    finally:
        orderstats.CELL_COLLECT_GATE = old


def test_cached_count_null_discriminator(spark):
    """ADVICE r7 low / VERDICT r7 item 2: winsorized_stats counts the
    NULL-FILTERED relation, keyed_global_rank/quantiles_wide the unfiltered
    one — the shared cache_key slot let the first caller seed the other's
    gate decision. Each must see its own count."""
    from duckdb_ml_spark.operators.dedup import _COUNT_CACHE
    from duckdb_ml_spark.plans.orderstats import quantiles_wide, winsorized_stats

    rows = [("a", float(i)) for i in range(50)] + [("a", None)] * 10
    df = spark.createDataFrame(rows, "k string, v double")
    ck = ("test_cc_discriminator", "v")
    winsorized_stats(df, "k", "v", 0.05, 0.95, cache_key=ck, mode="auto").collect()
    assert _COUNT_CACHE[(ck, "notnull", "v")] == 50
    quantiles_wide(df, "k", "v", [0.5], ["p50"], cache_key=ck, mode="auto").collect()
    assert _COUNT_CACHE[ck] == 60  # unfiltered callers still see all rows


def test_mismatch_forensics_dump(spark, tmp_path):
    """VERDICT r7 item 1b: a failing oracle compare must leave a diagnosable
    artifact — both engines' hashed lines, the differing lines, and the
    per-column max delta localizing a float divergence."""
    import json

    import duckdb

    from duckdb_ml_spark.testing import compare_to_oracle

    con = duckdb.connect()
    sdf = spark.createDataFrame([(1, 2.5), (2, 7.0)], "k int, v double")
    report = compare_to_oracle(
        sdf,
        "SELECT * FROM (VALUES (1, CAST(2.5001 AS DOUBLE)), (2, CAST(7.0 AS DOUBLE))) t(k, v)",
        con,
        dump_to=str(tmp_path),
        name="synthetic_mismatch",
    )
    assert not report["match"]
    with open(report["dump"]) as f:
        data = json.load(f)
    assert data["spark_rows"] == 2 and data["duckdb_rows"] == 2
    assert data["n_lines_only_in_spark"] == 1
    assert abs(data["per_column_max_delta"]["v"]["max_abs_delta"] - 1e-4) < 1e-9
    assert "per_column_max_delta" in data and "k" not in data["per_column_max_delta"]
    # a MATCHING compare must write nothing
    ok = compare_to_oracle(
        sdf,
        "SELECT * FROM (VALUES (1, CAST(2.5 AS DOUBLE)), (2, CAST(7.0 AS DOUBLE))) t(k, v)",
        con,
        dump_to=str(tmp_path),
        name="synthetic_ok",
    )
    assert ok["match"] and "dump" not in ok
    assert not (tmp_path / "synthetic_ok.json").exists()


def test_keyed_prefix_sum_two_pass_equals_window(spark):
    """The prefix-sum primitive's two forms must agree exactly (same
    strategy-equivalence contract as the rank/quantile gates)."""
    import numpy as np

    from duckdb_ml_spark.plans.orderstats import keyed_prefix_sum

    rng = np.random.default_rng(3)
    rows = [
        (f"s{i % 3}", int(i * 7 + i % 5), int(rng.integers(0, 40)))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "k string, oid bigint, v bigint")

    def run(mode):
        return {
            (r["k"], r["oid"]): r["__start"]
            for r in keyed_prefix_sum(
                df, "k", "oid", "v", mode=mode, n_buckets=8
            ).collect()
        }

    w, t = run("window"), run("two_pass")
    assert w == t
    # spot-check exactness against a driver-side replay
    by_k: dict = {}
    for k, oid, v in rows:
        by_k.setdefault(k, []).append((oid, v))
    for k, items in by_k.items():
        run_sum = 0
        for oid, v in sorted(items):
            assert w[(k, oid)] == run_sum, (k, oid)
            run_sum += v


def test_token_shards_capped_split_equals_uncapped(spark, tmp_path):
    """VERDICT r7 item 4: a skewed giant source must split into
    (source, shard_i) pieces under max_tokens_per_shard — every shard
    bounded by cap + max_doc_tokens, concatenation in shard order
    reproducing the uncapped stream bit-for-bit (same readback md5)."""
    import os

    import numpy as np

    from duckdb_ml_spark.sinks import read_token_shards_manifest, write_token_shards

    # skewed corpus: 'big' dwarfs 'small' (the one-shard-per-source wall)
    rows = [(i, "hash join scan batch merge sort", "big") for i in range(60)]
    rows += [(1000, "scan filter", "small"), (1001, "merge", "small")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, source string")

    out_u = str(tmp_path / "uncapped")
    out_c = str(tmp_path / "capped")
    write_token_shards(spark, "", out_u, seq_len=8, docs=docs)
    cap = 50  # 60 docs x 6 tokens = 360 -> 8 shards
    mc = write_token_shards(
        spark, "", out_c, seq_len=8, docs=docs, max_tokens_per_shard=cap
    )
    big = sorted(r for r in mc if r["source"] == "big")
    assert len(big) >= 2, "skewed source did not split"
    max_doc = 6
    assert all(r["n_tokens"] <= cap + max_doc for r in mc)
    assert sum(r["n_tokens"] for r in big) == 360
    # files named shard_big__<i>.bin, one pair per shard
    bins = sorted(f for f in os.listdir(out_c) if f.endswith(".bin"))
    assert sum(f.startswith("shard_big__") for f in bins) == len(big)
    # under the cap a source still gets indexed naming (shard_small__00000):
    # one group per (source, shard_i) — the readback parses both layouts
    assert "shard_small.bin" not in bins and "shard_small__00000.bin" in bins
    small = [r for r in mc if r["source"] == "small"]
    assert len(small) == 1 and small[0]["n_tokens"] == 3
    # readback reassembles shard order -> identical manifest rows
    ru = {
        r["source"]: (r["n_tokens"], r["stream_md5"])
        for r in read_token_shards_manifest(spark, out_u, seq_len=8).collect()
    }
    rc = {
        r["source"]: (r["n_tokens"], r["stream_md5"])
        for r in read_token_shards_manifest(spark, out_c, seq_len=8).collect()
    }
    assert ru == rc
    # per-shard byte bound: every capped .bin fits cap + max_doc + padding
    for f in bins:
        n_ids = os.path.getsize(os.path.join(out_c, f)) // 2
        assert n_ids <= ((cap + max_doc + 7) // 8) * 8


def test_token_shards_all_oov_source_skipped(spark, tmp_path):
    """ADVICE r7 low: a source whose documents are ALL out-of-lexicon must
    emit no files and no manifest row — matching the oracle's inner join
    (the old empty row was a row-count divergence waiting for data)."""
    import os

    from duckdb_ml_spark.sinks import read_token_shards_manifest, write_token_shards

    rows = [
        (1, "zzz qqq yyy", "dead"),  # every word OOV
        (2, None, "dead"),
        (3, "scan merge", "live"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    out = str(tmp_path / "oovsrc")
    m = write_token_shards(spark, "", out, seq_len=4, docs=docs)
    assert [r["source"] for r in m] == ["live"]
    files = os.listdir(out)
    assert not any("dead" in f for f in files)
    back = read_token_shards_manifest(spark, out, seq_len=4).collect()
    assert [r["source"] for r in back] == ["live"]


def test_rank_metrics_two_pass_equals_single_window(spark, sf_dir):
    """orders_rank_metrics rides keyed_global_rank (r11): ntile/percent_rank/
    cume_dist reconstructed from (rn, n) must match the window-function forms
    row-for-row on BOTH gate sides — in particular ntile_from_rank's BIGINT
    div tile rule against catalyst's NTile, including the n % tiles != 0
    uneven-tile boundaries."""
    from duckdb_ml_spark.plans.relational import (
        orders_rank_metrics,
        orders_rank_metrics_single_window,
    )

    one = {
        r.o_orderkey: (r.price_quartile, r.pct_rank, r.cume)
        for r in orders_rank_metrics_single_window(spark, sf_dir).collect()
    }
    for mode in ("window", "two_pass"):
        got = {
            r.o_orderkey: (r.price_quartile, r.pct_rank, r.cume)
            for r in orders_rank_metrics(spark, sf_dir, mode=mode).collect()
        }
        assert got == one, mode


def test_ntile_from_rank_matches_window_ntile_small_groups(spark):
    """Adversarial ntile boundaries: group sizes below, at, and just above the
    tile count (q = 0 and q = 1 arms), plus an uneven 4k+r size — the exact
    cases where the div/mod tile rule has branch seams."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from duckdb_ml_spark.plans.orderstats import ntile_from_rank

    rows = [
        (g, i) for g, size in enumerate((1, 2, 3, 4, 5, 7, 8, 11))
        for i in range(size)
    ]
    df = spark.createDataFrame(rows, "g INT, v INT")
    w = Window.partitionBy("g").orderBy("v")
    expected = df.select("g", "v", F.ntile(4).over(w).alias("t"))
    got = (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(Window.partitionBy("g")))
        .select("g", "v", ntile_from_rank(4).alias("t"))
    )
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in expected.collect()}


def test_ntile_from_rank_exhaustive_small_n(spark):
    """Exhaustive check of the (rn, n) tile rule for every group size n in
    1..200 at t=4 (~20k pairs, one Spark job) against an independent Python
    reference built from the definition (sizes = [q+1]*r + [q]*(t-r)) — the
    full boundary space below, at, and far above the tile count, not just
    the sampled seams."""
    from pyspark.sql import functions as F

    from duckdb_ml_spark.plans.orderstats import ntile_from_rank

    def ref_ntile(rn, n, t=4):
        q, r = divmod(n, t)
        sizes = [q + 1] * r + [q] * (t - r)
        acc = 0
        for tile, s in enumerate(sizes, start=1):
            acc += s
            if rn <= acc:
                return tile
        raise AssertionError("rn out of range")

    pairs = [(rn, n) for n in range(1, 201) for rn in range(1, n + 1)]
    df = spark.createDataFrame(pairs, "__rn INT, __n INT")
    got = {
        (r["__rn"], r["__n"]): r["t"]
        for r in df.select("__rn", "__n", ntile_from_rank(4).alias("t")).collect()
    }
    for rn, n in pairs:
        assert got[(rn, n)] == ref_ntile(rn, n), (rn, n)


def test_distinct_users_approx_null_semantics(spark, tmp_path):
    """ADVICE r13 (medium): the dedup-first rewrite must not count a NULL
    user_id as a distinct user — count(user_id) on the deduped pair set
    matches count(DISTINCT user_id) NULL semantics, and an all-NULL event
    type stays in the output with exact_users = 0 (band trivially true)."""
    import datetime

    from duckdb_ml_spark.plans.relational import events_distinct_users_approx

    ts = datetime.datetime(2024, 1, 1)
    rows = (
        [("click", i % 3, ts) for i in range(30)]          # users {0,1,2}
        + [("click", None, ts)] * 5                         # NULLs: ignored
        + [("ghost", None, ts)] * 4                         # all-NULL type
    )
    df = spark.createDataFrame(rows, "event_type string, user_id bigint, ts timestamp")
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        r.event_type: (r.exact_users, r.approx_within_5pct)
        for r in events_distinct_users_approx(spark, str(tmp_path)).collect()
    }
    assert out["click"] == (3, True)
    assert out["ghost"] == (0, True)
