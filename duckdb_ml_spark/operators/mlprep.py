"""Feature-engineering operators: one-hot encoding, the hashing trick, and
model evaluation metrics — the ML-prep surface between the relational engine
and `ml_train` (reference scope ends at min-max scaling, `autompg.test:12-14`;
real pipelines need categorical encodings and eval rollups too).

All three are pure column-expression plans (no Python in the hot path, no
collect except the documented bounded vocabulary fetch in the generic one-hot
API), each with an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_ml_spark.plans.relational import QuerySpec
from duckdb_ml_spark.tables import load

# --- one-hot encoding ---------------------------------------------------------

# TPC-H o_orderpriority enum — schema-level knowledge, hardcoded in BOTH the
# Spark builder and the oracle (an order-priority is a closed vocabulary; the
# generic API below derives vocabularies from data instead).
ORDERPRIORITY_VALUES = (
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
)


def one_hot(col: Column, categories: tuple, other: bool = True) -> list[Column]:
    """One indicator Column per category (+ optional catch-all), map-only.

    CASE-WHEN form, not a bare boolean cast: `(col == lit).cast(int)` is NULL
    for NULL input while the oracle's `CASE WHEN ... THEN 1 ELSE 0` is 0 —
    when/otherwise matches SQL semantics exactly (a NULL value encodes as
    all-zeros, including is_other, on both engines)."""
    cols = [
        F.when(col == F.lit(c), 1).otherwise(0).alias(f"is_{i}")
        for i, c in enumerate(categories)
    ]
    if other:
        cols.append(F.when(~col.isin(list(categories)), 1).otherwise(0).alias("is_other"))
    return cols


def one_hot_encode(
    df: DataFrame, column: str, categories: tuple | None = None, max_categories: int = 256
) -> DataFrame:
    """Generic one-hot: vocabulary from `categories`, else derived from the
    data via a BOUNDED distinct collect (raises above max_categories — one-hot
    over an unbounded-cardinality column is a modeling error, use
    feature_hash below). Column names carry the sanitized category value."""
    if categories is None:
        # NULL is not a category (a NULL row correctly encodes as all-zeros) —
        # and it must be filtered BEFORE the limited distinct, or a NULL
        # landing inside the max+1 sample would mask a real cardinality
        # overflow (review finding: the guard then passed nondeterministically)
        rows = (
            df.select(column)
            .where(F.col(column).isNotNull())
            .distinct()
            .limit(max_categories + 1)
            .collect()
        )
        vals = [r[0] for r in rows]
        if len(vals) > max_categories:
            raise ValueError(
                f"{column} has >{max_categories} distinct values; use feature_hash"
            )
        categories = tuple(sorted(vals))
    import re

    # sanitized names can collide ("a b" and "a_b") or be empty ("!!!") —
    # dedupe with a positional suffix so the projection never has duplicate
    # column names (Spark would accept the select but any later reference
    # raises AMBIGUOUS_REFERENCE)
    names: list[str] = []
    seen: set[str] = set()
    for i, c in enumerate(categories):
        base = "is_" + re.sub(r"[^A-Za-z0-9]+", "_", str(c)).strip("_").lower()
        name = base if base != "is_" else f"is_cat{i}"
        # retry until unique: a single suffix pass can itself collide with a
        # later category's base name (e.g. 'a 1', 'a 1 2', 'a-1')
        while name in seen:
            name = f"{name}_{i}"
        seen.add(name)
        names.append(name)
    cols = [
        F.when(F.col(column) == F.lit(c), 1).otherwise(0).alias(n)
        for c, n in zip(categories, names)
    ]
    return df.select("*", *cols)


def _onehot_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    return orders.select(
        "o_orderkey", *one_hot(F.col("o_orderpriority"), ORDERPRIORITY_VALUES)
    )


def _onehot_oracle() -> str:
    cases = ", ".join(
        f"(CASE WHEN o_orderpriority = '{c}' THEN 1 ELSE 0 END) AS is_{i}"
        for i, c in enumerate(ORDERPRIORITY_VALUES)
    )
    in_list = ", ".join(f"'{c}'" for c in ORDERPRIORITY_VALUES)
    return f"""
SELECT o_orderkey, {cases},
       (CASE WHEN o_orderpriority NOT IN ({in_list}) THEN 1 ELSE 0 END) AS is_other
FROM orders
"""


# --- hashing trick (feature hashing) ------------------------------------------

FH_BUCKETS = 32
FH_SALT = "fh"


def feature_hash_counts(
    docs: DataFrame, n_buckets: int = FH_BUCKETS,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, bucket, cnt) sparse hashed bag-of-words — the hashing trick
    (Weinberger et al. 2009): token → md5-bucket, counts summed per bucket.
    Unbounded vocabularies become a FIXED feature space with no vocabulary
    table, no fit step, and no driver state — the categorical encoder that
    actually works at 100 TB. Long-form output (the relational shape; pivot
    to columns at the consumer if a dense matrix is wanted).

    Bucket function shares the md5 contract of sampling.hash_bucket, so it is
    engine-portable and partition-order independent. Plan: tokenize+explode →
    one groupBy(doc, bucket) — the same single-shuffle shape as word counts."""
    from duckdb_ml_spark.operators.textnorm import tokens

    tok = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    ).where(F.col("term") != "")
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{FH_SALT}:"), F.col("term"))), 1, 8), 16, 10
    )
    bucket = (h.cast("bigint") % n_buckets).cast("int")
    return (
        tok.select(id_col, bucket.alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _feature_hash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return feature_hash_counts(load(spark, sf_dir, "documents"))


def _feature_hash_oracle() -> str:
    from duckdb_ml_spark.operators.textnorm import tokens_sql

    return f"""
WITH toks AS (SELECT doc_id, unnest({tokens_sql("text")}) AS term FROM documents),
b AS (
    SELECT doc_id,
           (('0x' || substr(md5('{FH_SALT}:' || term), 1, 8))::BIGINT % {FH_BUCKETS})::INT AS bucket
    FROM toks WHERE term != ''
)
SELECT doc_id, bucket, count(*)::BIGINT AS cnt FROM b GROUP BY doc_id, bucket
"""


# --- model evaluation metrics -------------------------------------------------

# Fixed linear scorer (literal weights) so predictions are a deterministic
# IEEE expression chain on BOTH engines — the eval-metrics OPERATOR is the
# thing under test, not a trained model's float noise (which is why the
# ml_train rows stay rows-only but this is oracle-paired).
EVAL_W = (0.1, 8.0, -2.0)  # l_quantity, l_discount, l_tax
EVAL_B = 1.0


def eval_metrics_by_group(
    df: DataFrame, pred: Column, target: Column, group_col: str
) -> DataFrame:
    """Per-group regression metrics: MSE, MAE, R² = 1 − SS_res/SS_tot —
    one aggregation pass (sums of squares computed map-side; R² from the
    computational formula SS_tot = Σy² − (Σy)²/n, so no second pass over the
    data). Aggregates rounded (summation-order noise), per-row errors never."""
    e = pred - target
    agg = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(e * e).alias("__sse"),
        F.sum(F.abs(e)).alias("__sae"),
        F.sum(target).alias("__sy"),
        F.sum(target * target).alias("__syy"),
    )
    ss_tot = F.col("__syy") - F.col("__sy") * F.col("__sy") / F.col("n")
    return agg.select(
        group_col,
        "n",
        F.round(F.col("__sse") / F.col("n"), 4).alias("mse"),
        F.round(F.col("__sae") / F.col("n"), 4).alias("mae"),
        F.round(F.lit(1.0) - F.col("__sse") / ss_tot, 4).alias("r2"),
    )


def _eval_metrics_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_discount", "l_tax", "l_extendedprice"
    )
    w1, w2, w3 = EVAL_W
    pred = (
        F.lit(w1) * F.col("l_quantity")
        + F.lit(w2) * F.col("l_discount")
        + F.lit(w3) * F.col("l_tax")
        + F.lit(EVAL_B)
    )
    target = F.col("l_extendedprice") / F.lit(1000.0)
    return eval_metrics_by_group(li, pred, target, "l_returnflag")


def _eval_metrics_oracle() -> str:
    w1, w2, w3 = EVAL_W
    pred = f"({w1} * l_quantity + {w2} * l_discount + {w3} * l_tax + {EVAL_B})"
    y = "(l_extendedprice / 1000.0)"
    e = f"({pred} - {y})"
    return f"""
SELECT l_returnflag,
       count(*)::BIGINT AS n,
       round(sum({e} * {e}) / count(*), 4) AS mse,
       round(sum(abs({e})) / count(*), 4) AS mae,
       round(1.0 - sum({e} * {e})
             / (sum({y} * {y}) - sum({y}) * sum({y}) / count(*)), 4) AS r2
FROM lineitem
GROUP BY l_returnflag
"""


QUERIES: dict[str, QuerySpec] = {
    "ml_onehot_orders": QuerySpec(
        name="ml_onehot_orders",
        builder=_onehot_q,
        oracle=_onehot_oracle(),
        doc="One-hot encoding of the order-priority enum (+ catch-all column); "
        "map-only indicator projection.",
        tags=("ml-prep", "encoding"),
    ),
    "ml_feature_hash": QuerySpec(
        name="ml_feature_hash",
        builder=_feature_hash_q,
        oracle=_feature_hash_oracle(),
        doc="Hashing-trick bag-of-words: token → md5 bucket (32), counts per "
        "(doc, bucket) — fixed feature space, no vocabulary state.",
        tags=("ml-prep", "encoding", "text"),
    ),
    "ml_eval_metrics": QuerySpec(
        name="ml_eval_metrics",
        builder=_eval_metrics_q,
        oracle=_eval_metrics_oracle(),
        doc="Per-group regression eval rollup (MSE/MAE/R²) of a fixed linear "
        "scorer — single aggregation pass, computational-formula R².",
        tags=("ml-prep", "metrics"),
    ),
}
