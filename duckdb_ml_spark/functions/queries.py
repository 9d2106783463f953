"""Driver-checkable queries for the ML operator surface (SURVEY §2.1).

ml_create / ml_list produce exact, SQL-expressible outputs → full value-hash
oracles. ml_train / ml_pred outputs are float32 network outputs (not
SQL-expressible) → rows-only checks, per FIXTURES.md §F7; their structural
invariants (arity, row counts, loss decrease) are pytest-tested instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_ml_spark.plans.relational import QuerySpec

SPEC_2_8_1 = '{"layers": [{"in": 2, "out": 8, "activation": "relu"}, {"in": 8, "out": 1}]}'
SPEC_3_16_1 = '{"layers": [{"in": 3, "out": 16, "activation": "relu"}, {"in": 16, "out": 1}]}'


def _ml_create_ok(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_ml_spark import functions as fn

    result = fn.ml_create("q_create_mlp", SPEC_2_8_1)
    return spark.createDataFrame([(result,)], "result string")


def _ml_list_models(spark: SparkSession, sf_dir: str) -> DataFrame:
    # No registry.clear(): a global mutation here could interleave with other
    # queries' registered models under driver reordering. Instead scope the
    # golden check to this query's own uniquely-named models — any execution
    # order yields the same result.
    from duckdb_ml_spark import functions as fn

    fn.ml_create("q_list_a", SPEC_2_8_1)
    fn.ml_create("q_list_b", SPEC_3_16_1)
    return fn.ml_list(spark).filter(F.col("model").startswith("q_list_"))


def _ml_train_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's flagship train→predict path on scaled lineitem features
    (autompg.sql pattern); returns per-row predictions (rows-only check)."""
    from duckdb_ml_spark import functions as fn
    from duckdb_ml_spark.flagship import FEATURES, TARGET, scaled_lineitem

    df = scaled_lineitem(spark, sf_dir)
    xy = df.select(
        "l_orderkey",
        "l_linenumber",
        F.array(*[F.col(f"scaled_{c}").cast("float") for c in FEATURES]).alias("features"),
        F.array(F.col(f"scaled_{TARGET}").cast("float")).alias("targets"),
    )
    fn.ml_create("q_train_mlp", SPEC_3_16_1)
    pred = fn.ml_train(
        spark,
        "q_train_mlp",
        xy,
        config='{"epochs": 3, "batch_size": 512, "seed": 42, "learning_rate": 0.01}',
        save=False,
    )
    return pred.select(
        "l_orderkey", "l_linenumber", F.element_at("prediction", 1).alias("predicted")
    )


def _ml_pred_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-callable ml_pred over range+random features — the reference's smoke test
    (functions.test:13-14). Values are nondeterministic → rows-only check."""
    from duckdb_ml_spark import functions as fn

    fn.ml_create("q_sql_mlp", SPEC_2_8_1)
    fn.register_all(spark)
    # Project SCALAR columns only: the driver's canonicalizer sorts each
    # column with pandas, and an array<float> column crashes it (r3 driver
    # error). The smoke contract here is arity/shape (reference
    # functions.test:13-14), which size() captures; values are rand()-fed.
    return spark.sql(
        "SELECT id, ml_pred('q_sql_mlp', array(cast(rand() as float), cast(rand() as float))) AS pred "
        "FROM range(3)"
    ).selectExpr("id", "size(pred) AS pred_dim", "element_at(pred, 1) AS p1")


def _ml_pred_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First hash-checkable row touching the pandas_udf inference path
    (VERDICT r10 item 4): deterministic lineitem features through the
    SQL-registered ml_pred, reduced to engine-stable integers. The reference
    scores exactly one output row per input row with width = the spec's last
    layer `out` (src/lib.rs:204-238), so n_rows and out_dim are
    DuckDB-computable from the input table + the spec literal; n_bad = 0
    additionally proves the Arrow kernel returned a well-formed finite
    vector for every row (float VALUES stay rows-only per FIXTURES §F7)."""
    from duckdb_ml_spark import functions as fn
    from duckdb_ml_spark.tables import load

    fn.ml_create("q_shape_mlp", SPEC_2_8_1)
    fn.register_all(spark)
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.array(
            (F.col("l_quantity") / 50.0).cast("float"),
            F.col("l_discount").cast("float"),
        ).alias("features"),
    )
    li.createOrReplaceTempView("__ml_pred_shape_in")
    pred = spark.sql(
        "SELECT ml_pred('q_shape_mlp', features) AS pred FROM __ml_pred_shape_in"
    )
    p1 = F.element_at("pred", 1)
    bad = (
        F.col("pred").isNull()
        | (F.size("pred") != 1)
        | F.isnan(p1)
        | (F.abs(p1) > F.lit(float("1e30")))
    )
    return pred.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(F.size("pred")).cast("long").alias("out_dim_min"),
        F.max(F.size("pred")).cast("long").alias("out_dim_max"),
        F.sum(F.when(bad, 1).otherwise(0)).cast("long").alias("n_bad"),
    )


def _shape_of(pred: DataFrame, value_col) -> DataFrame:
    """Reduce a prediction DataFrame to engine-stable structural integers:
    row count, constant output width (min==max==last-layer `out`), and a
    zero malformed/non-finite count."""
    bad = (
        value_col.isNull()
        | F.isnan(value_col)
        | (F.abs(value_col) > F.lit(float("1e30")))
    )
    return pred.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(bad, 1).otherwise(0)).cast("long").alias("n_bad"),
    )


_TRAIN_SHAPE_ORACLE = """
SELECT count(*)::BIGINT AS n_rows, 0::BIGINT AS n_bad FROM lineitem
"""


def _ml_train_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checkable structural twin of the ml_train→predict path (the
    inference twin is ml_pred_shape): output rows == input rows with a
    finite prediction on every row — reference semantics src/lib.rs:128-176
    (train consumes all rows, then scores each). Trains 1 epoch (shape is
    epoch-invariant). Bench-excluded (tags) — it re-executes the SAME
    training ml_train_predict already pays in the bench, so timing it
    would double-count the trainer, exactly the bisect-probe rationale."""
    from duckdb_ml_spark import functions as fn
    from duckdb_ml_spark.flagship import FEATURES, TARGET, scaled_lineitem

    df = scaled_lineitem(spark, sf_dir)
    xy = df.select(
        F.array(*[F.col(f"scaled_{c}").cast("float") for c in FEATURES]).alias("features"),
        F.array(F.col(f"scaled_{TARGET}").cast("float")).alias("targets"),
    )
    fn.ml_create("q_tshape_mlp", SPEC_3_16_1)
    pred = fn.ml_train(
        spark,
        "q_tshape_mlp",
        xy,
        config='{"epochs": 1, "batch_size": 512, "seed": 42, "learning_rate": 0.01}',
        save=False,
    )
    return _shape_of(pred, F.element_at("prediction", 1))


def _ml_train_distributed_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same structural contract through the DISTRIBUTED trainer
    (per-partition training + weight averaging, functions/distributed.py) —
    proves the mapInPandas train/score plumbing preserves rows and emits
    finite vectors at the driver gate. Bench-excluded like ml_train_shape."""
    from duckdb_ml_spark import functions as fn
    from duckdb_ml_spark.flagship import FEATURES, TARGET, scaled_lineitem
    from duckdb_ml_spark.functions.distributed import ml_train_distributed

    df = scaled_lineitem(spark, sf_dir)
    xy = df.select(
        F.array(*[F.col(f"scaled_{c}").cast("float") for c in FEATURES]).alias("features"),
        F.array(F.col(f"scaled_{TARGET}").cast("float")).alias("targets"),
    )
    fn.ml_create("q_dshape_mlp", SPEC_3_16_1)
    pred = ml_train_distributed(
        spark,
        "q_dshape_mlp",
        xy,
        config='{"epochs": 1, "batch_size": 512, "seed": 42, "learning_rate": 0.01}',
        mode="avg",
        save=False,
    )
    return _shape_of(pred, F.element_at("prediction", 1))


def _ml_train_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed training path (per-partition training + sample-weighted
    averaging via mapInPandas) — the 100 TB alternative to driver collect.
    Float outputs → rows-only; avg-vs-local equivalence is pytest-covered."""
    from duckdb_ml_spark import functions as fn
    from duckdb_ml_spark.flagship import FEATURES, TARGET, scaled_lineitem
    from duckdb_ml_spark.functions.distributed import ml_train_distributed

    df = scaled_lineitem(spark, sf_dir)
    xy = df.select(
        "l_orderkey",
        "l_linenumber",
        F.array(*[F.col(f"scaled_{c}").cast("float") for c in FEATURES]).alias("features"),
        F.array(F.col(f"scaled_{TARGET}").cast("float")).alias("targets"),
    )
    fn.ml_create("q_dist_mlp", SPEC_3_16_1)
    pred = ml_train_distributed(
        spark,
        "q_dist_mlp",
        xy,
        config='{"epochs": 2, "batch_size": 512, "seed": 42, "learning_rate": 0.01}',
        mode="avg",
        save=False,
    )
    return pred.select(
        "l_orderkey", "l_linenumber", F.element_at("prediction", 1).alias("predicted")
    )


def _ml_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-family composition: text-analysis features → MLP regression —
    the 'train a learned quality filter on cheap heuristic signals' pipeline
    every curation stack eventually builds. Features are the quality_score
    components; the target is (scaled) document length, a genuinely learnable
    signal on this corpus. Float outputs → rows-only check; the composition
    (text ops feeding ml_train in one lazy plan) is the point."""
    from duckdb_ml_spark import functions as fn
    from duckdb_ml_spark.operators.text import quality_score
    from duckdb_ml_spark.tables import load

    q = quality_score(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    stats = docs.agg(F.max("n_chars").alias("mx")).first()
    xy = q.join(docs, "doc_id").select(
        "doc_id",
        F.array(
            F.col("alpha_ratio").cast("float"),
            F.col("uniq_ratio").cast("float"),
            F.col("stop_ratio").cast("float"),
        ).alias("features"),
        F.array((F.col("n_chars") / F.lit(float(stats.mx))).cast("float")).alias("targets"),
    )
    fn.ml_create("q_quality_mlp", SPEC_3_16_1)
    pred = fn.ml_train(
        spark,
        "q_quality_mlp",
        xy,
        config='{"epochs": 5, "batch_size": 128, "seed": 42, "learning_rate": 0.01}',
        save=False,
    )
    return pred.select("doc_id", F.element_at("prediction", 1).alias("predicted_quality"))


QUERIES: dict[str, QuerySpec] = {
    "ml_quality_filter": QuerySpec(
        name="ml_quality_filter",
        builder=_ml_quality_filter,
        oracle=None,  # float network outputs — rows-only
        doc="Learned quality filter: text-heuristic features → MLP regression (cross-family pipeline).",
        tags=("ml", "text", "pipeline"),
    ),
    "ml_train_distributed": QuerySpec(
        name="ml_train_distributed",
        builder=_ml_train_distributed,
        oracle=None,  # float network outputs — rows-only
        doc="Distributed MLP training (partition-train + weight averaging), no driver collect.",
        tags=("ml", "distributed"),
    ),
    "ml_create_ok": QuerySpec(
        name="ml_create_ok",
        builder=_ml_create_ok,
        oracle="SELECT 'Ok' AS result",
        doc="ml_create returns 'Ok' (reference lib.rs:64-65).",
        tags=("ml",),
    ),
    "ml_list_models": QuerySpec(
        name="ml_list_models",
        builder=_ml_list_models,
        oracle=f"""
        SELECT 'q_list_a' AS model, '{SPEC_2_8_1}' AS json
        UNION ALL
        SELECT 'q_list_b' AS model, '{SPEC_3_16_1}' AS json
        """,
        doc="ml_list emits (name, specjson) per registered model — exact golden "
        "output, like the reference's only golden test (autompg.test:6-10).",
        tags=("ml",),
    ),
    "ml_train_predict": QuerySpec(
        name="ml_train_predict",
        builder=_ml_train_predict,
        oracle=None,  # float32 training output — rows-only (FIXTURES §F7)
        doc="End-to-end train→predict on scaled lineitem (autompg pipeline shape).",
        tags=("ml",),
    ),
    "ml_pred_shape": QuerySpec(
        name="ml_pred_shape",
        builder=_ml_pred_shape,
        oracle="""
        SELECT count(*)::BIGINT AS n_rows,
               1::BIGINT AS out_dim_min,
               1::BIGINT AS out_dim_max,
               0::BIGINT AS n_bad
        FROM lineitem
        """,
        doc="Structural twin of ml_pred: row preservation + last-layer width "
        "+ zero malformed outputs, hash-checkable (reference output shape "
        "semantics src/lib.rs:204-238).",
        tags=("ml", "sql"),
    ),
    "ml_train_shape": QuerySpec(
        name="ml_train_shape",
        builder=_ml_train_shape,
        oracle=_TRAIN_SHAPE_ORACLE,
        doc="Structural twin of ml_train→predict: row preservation + finite "
        "predictions, hash-checkable (reference src/lib.rs:128-176). "
        "Bench-excluded: re-executes the training ml_train_predict already "
        "pays (the bisect-probe double-count rationale).",
        tags=("ml", "nobench"),
    ),
    "ml_train_distributed_shape": QuerySpec(
        name="ml_train_distributed_shape",
        builder=_ml_train_distributed_shape,
        oracle=_TRAIN_SHAPE_ORACLE,
        doc="Structural twin of the distributed trainer: row preservation + "
        "finite predictions through the mapInPandas train/score path. "
        "Bench-excluded like ml_train_shape.",
        tags=("ml", "distributed", "nobench"),
    ),
    "ml_pred_sql": QuerySpec(
        name="ml_pred_sql",
        builder=_ml_pred_sql,
        oracle=None,  # rand() features — rows-only
        doc="SQL-registered ml_pred over range(3)+rand() (functions.test:13-14).",
        tags=("ml", "sql"),
    ),
}
