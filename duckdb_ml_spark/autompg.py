"""Auto-MPG literal-parity pipeline — the reference's flagship e2e demo.

Reference: /root/reference/test/sql/autompg.sql:1-72 (scaling-params table
macro -> min_max_scaler scalar macro -> scaled projection -> 5->16->1 train ->
predict) and /root/reference/test/sql/autompg.test:13-22 (CSV scan, default
train, explicit {epochs:100, learning_rate:0.0003, batch_size:32, seed:42}
retrain).

The reference ships the classic 392-row Auto-MPG CSV; this repo generates a
deterministic SYNTHETIC dataset of the same shape (same header, same row
count, plausible ranges, mpg correlated with weight/horsepower so training
has signal) — reference data files are not copied. The CSV is written once
under .tmp/ by plain Python (no Spark), so the DuckDB oracle can read the
same file regardless of which side the driver runs first.

Pipeline parity map:
- CSV scan header+inference  -> sources.readers.read_csv     (autompg.sql:12)
- scaling_params table macro -> scaling_params() aggregates  (autompg.sql:4-10)
- min_max_scaler scalar macro-> min_max_scaler() Column fn   (autompg.sql:14-16)
- ON-true 1-row cross join   -> crossJoin(broadcast(params)) (autompg.sql:67)
- train + predict            -> functions.ml_train/ml_pred   (autompg.test:16-22)
"""

from __future__ import annotations

import os
import random

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_ml_spark.plans.relational import QuerySpec

COLUMNS = ("cylinders", "displacement", "horsepower", "weight", "acceleration", "mpg")
FEATURES = COLUMNS[:5]
TARGET = "mpg"
N_ROWS = 392  # the reference dataset's row count (test/auto_mpg.csv)

_CSV_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp", "auto_mpg_synth.csv"
)


def ensure_autompg_csv() -> str:
    """Write the deterministic synthetic Auto-MPG CSV if missing; return path.

    All values carry one decimal place so both engines infer DOUBLE and parse
    the identical text to the identical float64.
    """
    if os.path.exists(_CSV_PATH):
        return _CSV_PATH
    os.makedirs(os.path.dirname(_CSV_PATH), exist_ok=True)
    rng = random.Random(0xA0703)
    lines = [",".join(COLUMNS)]
    for _ in range(N_ROWS):
        cylinders = float(rng.choice((3, 4, 4, 4, 5, 6, 6, 8, 8)))
        displacement = round(rng.uniform(68.0, 455.0), 1)
        horsepower = round(rng.uniform(46.0, 230.0), 1)
        weight = round(rng.uniform(1613.0, 5140.0), 1)
        acceleration = round(rng.uniform(8.0, 24.8), 1)
        mpg = round(
            max(5.0, 46.0 - 0.0058 * weight - 0.045 * horsepower + rng.gauss(0.0, 2.0)), 1
        )
        lines.append(
            ",".join(f"{v:.1f}" for v in (cylinders, displacement, horsepower, weight, acceleration, mpg))
        )
    tmp = _CSV_PATH + ".part"
    with open(tmp, "w") as f:
        f.write("\n".join(lines) + "\n")
    os.replace(tmp, _CSV_PATH)
    return _CSV_PATH


def scaling_params(df: DataFrame, cols: tuple[str, ...] = COLUMNS) -> DataFrame:
    """The scaling_params table macro (autompg.sql:4-10): one row of
    avg/stddev_pop/min/max per column — COLUMNS() expansion as a comprehension."""
    aggs = []
    for c in cols:
        aggs += [
            F.avg(c).alias(f"avg_{c}"),
            F.stddev_pop(c).alias(f"std_{c}"),
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
        ]
    return df.agg(*aggs)


def min_max_scaler(c: str) -> Column:
    """The min_max_scaler scalar macro (autompg.sql:14-16):
    (val - min) / nullif(max - min, 0)."""
    rng = F.col(f"max_{c}") - F.col(f"min_{c}")
    return (F.col(c) - F.col(f"min_{c}")) / F.nullif(rng, F.lit(0))


def register_sql_macros(spark: SparkSession) -> None:
    """The reference's CREATE MACRO surface at the SQL level (SURVEY §2.3 #13):
    Spark 3.5 SQL scalar functions are the direct analogue of DuckDB scalar
    macros — same declaration shape, same SQL-callable ergonomics. The Python
    Column form (min_max_scaler above) stays the engine-internal path; this
    registration serves users who write SQL, exactly like autompg.sql:14-16."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION min_max_scaler(v DOUBLE, mn DOUBLE, mx DOUBLE) "
        "RETURNS DOUBLE RETURN (v - mn) / nullif(mx - mn, 0)"
    )


def scaled_autompg(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """CSV scan -> params cross join -> min-max-scaled projection of all six
    columns (autompg.sql:25-68). sf_dir is unused (the dataset is fixed-shape)
    but kept for the queries() signature."""
    from duckdb_ml_spark.sources.readers import read_csv

    path = ensure_autompg_csv()
    df = read_csv(spark, path)
    params = scaling_params(df)
    return df.crossJoin(F.broadcast(params)).select(
        *[min_max_scaler(c).alias(f"scaled_{c}") for c in COLUMNS]
    )


def _autompg_oracle() -> str:
    path = ensure_autompg_csv()
    params = ", ".join(
        f"avg({c}) AS avg_{c}, stddev_pop({c}) AS std_{c}, min({c}) AS min_{c}, max({c}) AS max_{c}"
        for c in COLUMNS
    )
    scaled = ", ".join(
        f"({c} - min_{c}) / nullif(max_{c} - min_{c}, 0) AS scaled_{c}" for c in COLUMNS
    )
    return f"""
    WITH data AS (SELECT * FROM read_csv_auto('{path}', header=true)),
    params AS (SELECT {params} FROM data)
    SELECT {scaled} FROM data JOIN params ON true
    """


def train_autompg(spark: SparkSession, config: str | None = None, name: str = "autompg_mlp"):
    """Train the reference's 5->16->1 net on the scaled features/target
    (autompg.test:4,16) and return the prediction DataFrame. Pass the explicit
    retrain config of autompg.test:22 to reproduce that leg."""
    from duckdb_ml_spark import functions as fn

    spec = (
        '{"layers": [{"in": 5, "out": 16, "activation": "relu"}, {"in": 16, "out": 1}]}'
    )
    scaled = scaled_autompg(spark)
    xy = scaled.select(
        F.array(*[F.col(f"scaled_{c}").cast("float") for c in FEATURES]).alias("features"),
        F.array(F.col(f"scaled_{TARGET}").cast("float")).alias("targets"),
    )
    fn.ml_create(name, spec)
    return fn.ml_train(spark, name, xy, config=config, save=False)


QUERIES: dict[str, QuerySpec] = {
    "autompg_scaled": QuerySpec(
        name="autompg_scaled",
        builder=scaled_autompg,
        oracle=_autompg_oracle(),
        doc="Auto-MPG flagship scaling pipeline: CSV header+inference scan -> "
        "scaling-params macro -> 1-row broadcast cross join -> min-max-scaled "
        "projection (reference autompg.sql:1-72, literal parity).",
        tags=("autompg", "csv", "flagship"),
    ),
}
