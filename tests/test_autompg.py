"""Auto-MPG literal-parity e2e: the reference's flagship pipeline
(/root/reference/test/sql/autompg.sql, autompg.test:13-22) re-expressed
Spark-first on a deterministic synthetic dataset of the same shape."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from duckdb_ml_spark import functions as fn
from duckdb_ml_spark.autompg import (
    COLUMNS,
    FEATURES,
    N_ROWS,
    ensure_autompg_csv,
    scaled_autompg,
    train_autompg,
)


def test_csv_scan_header_inference(spark):
    """autompg.test:13 — CSV scan with header + type inference yields 392
    all-DOUBLE rows (SURVEY §2.3 #5)."""
    from duckdb_ml_spark.sources.readers import read_csv

    df = read_csv(spark, ensure_autompg_csv())
    assert df.columns == list(COLUMNS)
    assert df.count() == N_ROWS
    assert all(t == "double" for _, t in df.dtypes)


def test_scaled_projection_in_unit_range(spark):
    """autompg.sql:25-68 — every min-max-scaled column lies in [0, 1]."""
    scaled = scaled_autompg(spark)
    conds = [
        F.min(f"scaled_{c}").alias(f"lo_{c}") for c in COLUMNS
    ] + [F.max(f"scaled_{c}").alias(f"hi_{c}") for c in COLUMNS]
    row = scaled.agg(*conds).first()
    for c in COLUMNS:
        assert 0.0 <= row[f"lo_{c}"] and row[f"hi_{c}"] <= 1.0


def test_train_default_then_explicit_retrain(spark):
    """autompg.test:16 (default config train) then :22 (explicit
    {epochs:100, learning_rate:0.0003, batch_size:32, seed:42} retrain):
    each returns one prediction per input row, and the default-config
    training beats the untrained net on MSE."""
    name = "autompg_e2e"
    spec = '{"layers": [{"in": 5, "out": 16, "activation": "relu"}, {"in": 16, "out": 1}]}'
    scaled = scaled_autompg(spark)
    xy = scaled.select(
        F.array(*[F.col(f"scaled_{c}").cast("float") for c in FEATURES]).alias("features"),
        F.array(F.col("scaled_mpg").cast("float")).alias("targets"),
    ).persist()
    fn.ml_create(name, spec)

    def mse():
        p = fn.ml_pred(xy, name).select(
            F.col("prediction")[0].alias("p"), F.col("targets")[0].alias("t")
        )
        return p.agg(F.avg((F.col("p") - F.col("t")) ** 2).alias("m")).first().m

    mse_untrained = mse()
    pred = fn.ml_train(spark, name, xy, save=False)  # default TrainingConfig
    assert pred.count() == N_ROWS
    mse_default = mse()
    assert mse_default < mse_untrained, (mse_default, mse_untrained)

    # the explicit retrain leg of autompg.test:22
    pred2 = train_autompg(
        spark,
        config='{"epochs": 100, "learning_rate": 0.0003, "batch_size": 32, "seed": 42}',
        name=name,
    )
    rows = pred2.collect()
    assert len(rows) == N_ROWS
    assert all(len(r.prediction) == 1 and np.isfinite(r.prediction[0]) for r in rows)


def test_reference_autompg_test_translated(spark):
    """The reference's autompg sqllogictest executed statement-for-statement
    through the guarded SQL dispatcher (VERDICT r2 #5) — including the
    {epochs:100, learning_rate:0.0003, batch_size:32, seed:42} retrain leg
    (reference test/sql/autompg.test:1-22)."""
    from duckdb_ml_spark import registry, sqltrain
    from duckdb_ml_spark.autompg import ensure_autompg_csv

    fn.ml_drop("autompg")
    csv_path = ensure_autompg_csv()  # synthetic stand-in for test/auto_mpg.csv
    spec = (
        '{"layers": [{"in": 5, "out": 16, "activation": "relu"}, {"in": 16, "out": 1}]}'
    )
    arr = "[cylinders::float, displacement::float, horsepower::float, weight::float, acceleration::float]"

    # autompg.test:4 — query I: ml_create
    r = sqltrain.sql(spark, f"select ml_create('autompg', '{spec}');").collect()
    assert [row.status for row in r] == ["Ok"]

    # autompg.test:7 — query II: from ml_list();
    listed = sqltrain.sql(spark, "from ml_list();").collect()
    assert ("autompg", spec) in [(row.model, row.json) for row in listed]

    # autompg.test:13 — create table autompg as from '<csv>';
    tbl = sqltrain.sql(spark, f"create table autompg as from '{csv_path}';")
    assert tbl.count() == 392

    # autompg.test:16 — default-config train returns per-row predictions
    pred1 = sqltrain.sql(spark, f"select ml_train('autompg', {arr}, [mpg::float]) from autompg;")
    rows1 = pred1.collect()
    assert len(rows1) == 392 and len(rows1[0].prediction) == 1

    # autompg.test:19 — SQL ml_pred over the trained model
    pred_sql = sqltrain.sql(spark, f"select ml_pred('autompg', {arr}) from autompg;")
    rows_sql = pred_sql.collect()
    assert len(rows_sql) == 392

    # autompg.test:22 — explicit retrain config
    pred2 = sqltrain.sql(
        spark,
        f"select ml_train('autompg', {arr}, [mpg::float], "
        "{epochs: 100, learning_rate: 0.0003, batch_size: 32, seed: 42}::json) from autompg;",
    )
    assert pred2.count() == 392
    fn.ml_drop("autompg")


def test_reference_functions_test_translated(spark):
    """The reference's functions sqllogictest statement-for-statement
    (reference test/sql/functions.test:1-14): create → list → FROM-less
    constant-row train → SQL ml_pred over range(3)+random()."""
    from duckdb_ml_spark import sqltrain

    fn.ml_drop("foo")
    spec = '{"layers": [{"in": 2, "out": 8, "activation": "relu"}, {"in": 8, "out": 1}]}'

    r = sqltrain.sql(spark, f"select ml_create('foo', '{spec}');").collect()
    assert [row.status for row in r] == ["Ok"]

    listed = sqltrain.sql(spark, "from ml_list();").collect()
    assert ("foo", spec) in [(row.model, row.json) for row in listed]

    pred = sqltrain.sql(spark, "select ml_train('foo', [0.,0.], [0.]);").collect()
    assert len(pred) == 1 and len(pred[0].prediction) == 1

    out = sqltrain.sql(
        spark,
        "select ml_pred('foo', [random()::float, random()::float])\nfrom range(3);",
    ).collect()
    assert len(out) == 3 and all(len(r[0]) == 1 for r in out)
    fn.ml_drop("foo")


def test_sqltrain_list_rewrite_spares_indexing_and_strings():
    """[a, b] → array(a, b) must not corrupt DuckDB 1-based indexing (w[1])
    or brackets inside string literals (ADVICE r3)."""
    from duckdb_ml_spark.sqltrain import _rewrite_list_literals

    assert _rewrite_list_literals("SELECT [1, 2]") == "SELECT array(1, 2)"
    assert _rewrite_list_literals("SELECT w[1] FROM t") == "SELECT w[1] FROM t"
    assert (
        _rewrite_list_literals("SELECT '[not a list]', [3]")
        == "SELECT '[not a list]', array(3)"
    )
    assert _rewrite_list_literals("SELECT f(x)[2]") == "SELECT f(x)[2]"


def test_sql_macro_form_matches_column_macro(spark):
    """The SQL-surface scalar macro (CREATE FUNCTION ... RETURN, SURVEY §2.3
    #13) must scale identically to the Python Column macro."""
    from duckdb_ml_spark.autompg import (
        COLUMNS,
        ensure_autompg_csv,
        register_sql_macros,
        scaled_autompg,
        scaling_params,
    )
    from duckdb_ml_spark.sources.readers import read_csv

    register_sql_macros(spark)
    df = read_csv(spark, ensure_autompg_csv())
    df.crossJoin(scaling_params(df)).createOrReplaceTempView("__amg")
    exprs = ", ".join(
        f"min_max_scaler({c}, min_{c}, max_{c}) AS scaled_{c}" for c in COLUMNS
    )
    sql_rows = {tuple(r) for r in spark.sql(f"SELECT {exprs} FROM __amg").collect()}
    col_rows = {tuple(r) for r in scaled_autompg(spark).collect()}
    assert sql_rows == col_rows and sql_rows
