"""Flagship end-to-end pipeline: the reference's autompg demo re-expressed Spark-first.

Reference pipeline (/root/reference/test/sql/autompg.sql:1-72):
    scan CSV → scaling_params macro (avg/std/min/max per column) → min-max scale
    → ml_create(5→16→1) → ml_train → ml_pred projection.

Here: lineitem numeric columns are the features (l_quantity, l_discount, l_tax →
predict l_extendedprice scaled), the 1-row params table is broadcast-cross-joined
(BroadcastNestedLoopJoin — no fact shuffle), and the MLP train/predict runs through
the engine's ml_* operators when available.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_ml_spark.tables import load

FEATURES = ("l_quantity", "l_discount", "l_tax")
TARGET = "l_extendedprice"
_ALL = FEATURES + (TARGET,)


def scaled_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-max-scaled numeric lineitem columns (the autompg.sql scaling stage)."""
    li = load(spark, sf_dir, "lineitem")
    params = li.agg(
        *[x for c in _ALL for x in (F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}"))]
    )
    scaled = [
        (
            (F.col(c) - F.col(f"min_{c}"))
            / F.nullif(F.col(f"max_{c}") - F.col(f"min_{c}"), F.lit(0))
        ).alias(f"scaled_{c}")
        for c in _ALL
    ]
    return li.crossJoin(F.broadcast(params)).select("l_orderkey", "l_linenumber", *scaled)


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale → train a small MLP → return per-row predictions next to the target."""
    df = scaled_lineitem(spark, sf_dir)
    feats = F.array(*[F.col(f"scaled_{c}").cast("float") for c in FEATURES])
    targs = F.array(F.col(f"scaled_{TARGET}").cast("float"))
    xy = df.select(
        "l_orderkey", "l_linenumber", feats.alias("features"), targs.alias("targets")
    )
    try:
        from duckdb_ml_spark import functions as mlfn
    except ImportError:
        return xy  # ML core not built yet: return the scaled feature table

    spec = '{"layers": [{"in": 3, "out": 16, "activation": "relu"}, {"in": 16, "out": 1}]}'
    mlfn.ml_create("flagship_mlp", spec)
    mlfn.ml_train(
        spark,
        "flagship_mlp",
        xy,
        features_col="features",
        targets_col="targets",
        config='{"epochs": 5, "batch_size": 256, "seed": 42, "learning_rate": 0.01}',
    )
    pred = mlfn.ml_pred(xy, "flagship_mlp", features_col="features")
    return pred.select(
        "l_orderkey",
        "l_linenumber",
        F.element_at("targets", 1).alias("target"),
        F.element_at("prediction", 1).alias("predicted"),
    )
