"""ml_create / ml_list / ml_train / ml_pred operator tests against Spark."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from duckdb_ml_spark import artifacts, functions as fn, nn, registry
from duckdb_ml_spark.tables import load
from duckdb_ml_spark.spec import parse_spec

SPEC = '{"layers": [{"in": 2, "out": 8, "activation": "relu"}, {"in": 8, "out": 1}]}'


@pytest.fixture(autouse=True)
def _clean_registry():
    registry.clear()
    yield
    registry.clear()


def _xy_df(spark, n=256, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 1, size=(n, 2)).astype(np.float32)
    y = (x @ np.array([[1.5], [-0.5]], dtype=np.float32)) + 0.2
    rows = [(x[i].tolist(), y[i].tolist()) for i in range(n)]
    return spark.createDataFrame(rows, "features array<float>, targets array<float>")


def test_ml_create_returns_ok_and_registers(spark):
    assert fn.ml_create("m1", SPEC) == "Ok"
    rows = fn.ml_list(spark).collect()
    assert [(r.model, r.json) for r in rows] == [("m1", SPEC)]


def test_ml_create_rejects_bad_spec():
    from duckdb_ml_spark.spec import SpecError

    with pytest.raises(SpecError):
        fn.ml_create("bad", '{"layers": [{"in": 2}]}')


def test_ml_pred_shapes_and_determinism(spark):
    fn.ml_create("m2", SPEC, seed=42)
    df = _xy_df(spark, 64)
    out1 = fn.ml_pred(df, "m2").select("prediction").collect()
    out2 = fn.ml_pred(df, "m2").select("prediction").collect()
    assert all(len(r.prediction) == 1 for r in out1)
    assert [r.prediction for r in out1] == [r.prediction for r in out2]


def test_ml_pred_ragged_input_raises(spark):
    fn.ml_create("m3", SPEC)
    df = spark.createDataFrame(
        [([0.1, 0.2],), ([0.1, 0.2, 0.3],)], "features array<float>"
    )
    with pytest.raises(Exception, match="identical length|expected length"):
        fn.ml_pred(df, "m3").collect()


def test_ml_pred_wrong_dim_raises(spark):
    fn.ml_create("m4", SPEC)
    df = spark.createDataFrame([([0.1, 0.2, 0.3],)], "features array<float>")
    with pytest.raises(Exception, match="expected length 2"):
        fn.ml_pred(df, "m4").collect()


def test_ml_train_improves_fit_and_returns_predictions(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(artifacts, "DEFAULT_ROOT", str(tmp_path))
    fn.ml_create("m5", SPEC)
    df = _xy_df(spark, 512)
    before = fn.ml_pred(df, "m5").select(F.col("prediction")[0].alias("p"), F.col("targets")[0].alias("t"))
    mse_before = before.select(F.avg((F.col("p") - F.col("t")) ** 2).alias("m")).first().m
    pred = fn.ml_train(spark, "m5", df, config='{"epochs": 40, "batch_size": 64}')
    assert pred.count() == 512
    after = fn.ml_pred(df, "m5").select(F.col("prediction")[0].alias("p"), F.col("targets")[0].alias("t"))
    mse_after = after.select(F.avg((F.col("p") - F.col("t")) ** 2).alias("m")).first().m
    assert mse_after < mse_before / 5
    # artifact written with weights + spec + config
    m = registry.get_model("m5")
    assert m.artifacts, "training must save an artifact dir"
    loaded = artifacts.load_weights(m.artifacts[-1])
    spec = parse_spec(SPEC)
    x = np.zeros((2, 2), dtype=np.float32)
    np.testing.assert_array_equal(
        nn.forward(spec, loaded, x)[0], nn.forward(spec, m.params, x)[0]
    )


def test_ml_create_with_weights_path(spark, tmp_path):
    fn.ml_create("src", SPEC)
    d = artifacts.save_model("src", SPEC, registry.get_model("src").params, root=str(tmp_path))
    fn.ml_create("dst", SPEC, weights_path=d)
    df = _xy_df(spark, 16)
    a = fn.ml_pred(df, "src").select("prediction").collect()
    b = fn.ml_pred(df, "dst").select("prediction").collect()
    assert [r.prediction for r in a] == [r.prediction for r in b]


def test_sql_registered_ml_pred(spark):
    fn.ml_create("msql", SPEC)
    fn.register_all(spark)
    rows = spark.sql(
        "SELECT ml_pred('msql', array(cast(0.5 as float), cast(0.5 as float))) AS p FROM range(3)"
    ).collect()
    assert len(rows) == 3 and all(len(r.p) == 1 for r in rows)


def test_ml_pred_expression_matches_driver_forward(spark):
    """The arrow_udf scoring expression (r15: replaced the mapInArrow
    kernel) must be bit-identical to a driver-side nn.forward over the
    same float32 matrix — pins the flat-buffer reshape path."""
    fn.ml_create("mexpr", SPEC, seed=7)
    df = _xy_df(spark, 512, seed=3)
    got = [
        r.prediction
        for r in fn.ml_pred(df, "mexpr").select("prediction").collect()
    ]
    spec_json, params = registry.snapshot_params("mexpr")
    spec = parse_spec(spec_json)
    x = np.asarray(
        [r.features for r in df.select("features").collect()], dtype=np.float32
    )
    want, _ = nn.forward(spec, params, x, training=False)
    assert np.array_equal(
        np.asarray(got, dtype=np.float32), want.astype(np.float32)
    )


def test_sql_ml_pred_matches_dataframe_ml_pred(spark):
    """SQL-registered arrow_udf form == DataFrame-API form on the same
    features (both r15 Arrow paths score through the same kernel math)."""
    fn.ml_create("mpar", SPEC, seed=11)
    fn.register_all(spark)
    df = _xy_df(spark, 256, seed=5)
    df.createOrReplaceTempView("__mpar_in")
    via_sql = [
        r.p
        for r in spark.sql(
            "SELECT ml_pred('mpar', features) AS p FROM __mpar_in"
        ).collect()
    ]
    via_api = [
        r.prediction
        for r in fn.ml_pred(df, "mpar").select("prediction").collect()
    ]
    assert via_sql == via_api


def test_collect_xy_arrow_matches_pandas_path():
    """The distributed trainer's Arrow flat-buffer collection (r15) must
    produce the exact matrices the pandas object path produced."""
    import pandas as pd
    import pyarrow as pa

    from duckdb_ml_spark.functions import _as_matrix
    from duckdb_ml_spark.functions.distributed import _collect_xy, _collect_xy_arrow

    rng = np.random.default_rng(0)
    feats = rng.uniform(-1, 1, size=(100, 3)).astype(np.float32)
    targs = rng.uniform(-1, 1, size=(100, 1)).astype(np.float32)
    tbl = pa.table(
        {
            "__x": pa.array([row.tolist() for row in feats], type=pa.list_(pa.float32())),
            "__y": pa.array([row.tolist() for row in targs], type=pa.list_(pa.float32())),
        }
    )
    batches = tbl.to_batches(max_chunksize=32)
    ax, ay = _collect_xy_arrow(iter(batches), 3, 1)
    pdf = tbl.to_pandas()
    px, py = _collect_xy(iter([pdf.iloc[:40], pdf.iloc[40:]]), 3, 1)
    assert np.array_equal(ax, px) and np.array_equal(ay, py)
    # empty stream -> (None, None), matching the pandas path
    assert _collect_xy_arrow(iter([]), 3, 1) == (None, None)


def test_ml_drop(spark):
    fn.ml_create("gone", SPEC)
    assert fn.ml_drop("gone") is True
    assert fn.ml_drop("gone") is False
    assert fn.ml_list(spark).count() == 0


def test_ml_train_distributed_avg_and_grad(spark, tmp_path, monkeypatch):
    from duckdb_ml_spark.functions.distributed import ml_train_distributed

    monkeypatch.setattr(artifacts, "DEFAULT_ROOT", str(tmp_path))
    df = _xy_df(spark, 1024).repartition(4)
    for mode, epochs in (("avg", 30), ("grad", 80)):
        registry.clear()
        fn.ml_create("md", SPEC)
        before = fn.ml_pred(df, "md").select(
            F.avg((F.col("prediction")[0] - F.col("targets")[0]) ** 2).alias("m")
        ).first().m
        ml_train_distributed(
            spark, "md", df, config=f'{{"epochs": {epochs}, "learning_rate": 0.02}}', mode=mode
        )
        after = fn.ml_pred(df, "md").select(
            F.avg((F.col("prediction")[0] - F.col("targets")[0]) ** 2).alias("m")
        ).first().m
        assert after < before / 2, f"mode={mode}: {before} -> {after}"


def test_grad_mode_rejects_dropout(spark):
    """Grad mode can't reproduce a single global dropout draw across
    partitions (no stable global row index) — it must refuse, not silently
    train a different model. (batch_norm IS supported — sync-BN protocol.)"""
    from duckdb_ml_spark.functions.distributed import ml_train_distributed

    spec = (
        '{"layers": [{"in": 2, "out": 8, "activation": "relu", "dropout": 0.2},'
        ' {"in": 8, "out": 1}]}'
    )
    fn.ml_create("graddrop", spec)
    df = _xy_df(spark, 64)
    with pytest.raises(ValueError, match="dropout"):
        ml_train_distributed(spark, "graddrop", df, mode="grad", save=False)


def test_grad_mode_syncbn_matches_single_node(spark):
    """mode='grad' on a batch_norm net must follow the single-node FULL-BATCH
    trajectory: same global batch stats forward, same batch-coupled backward,
    same running-stat momentum updates — partition count must not matter."""
    import numpy as np

    from duckdb_ml_spark import nn
    from duckdb_ml_spark.functions.distributed import ml_train_distributed
    from duckdb_ml_spark.spec import parse_spec

    spec = (
        '{"layers": [{"in": 2, "out": 8, "activation": "relu", "batch_norm": true},'
        ' {"in": 8, "out": 4, "activation": "tanh", "batch_norm": true},'
        ' {"in": 4, "out": 1}]}'
    )
    epochs, lr = 6, 0.02
    fn.ml_create("gradbn", spec)
    init = [{k: v.copy() for k, v in p.items()} for p in registry.get_model("gradbn").params]
    df = _xy_df(spark, 512).repartition(4)
    ml_train_distributed(
        spark, "gradbn", df, config=f'{{"epochs": {epochs}, "learning_rate": {lr}}}',
        mode="grad", save=False,
    )
    from duckdb_ml_spark import registry as reg

    got = reg.get_model("gradbn").params

    # single-node full-batch reference with nn.forward's own batch-stat path
    rows = df.select("features", "targets").collect()
    x = np.array([r.features for r in rows], dtype=np.float32)
    y = np.array([r.targets for r in rows], dtype=np.float32)
    sp = parse_spec(spec)
    ref = [{k: v.copy() for k, v in p.items()} for p in init]
    opt = nn.Adam(lr)
    for _ in range(epochs):
        pred, caches = nn.forward(sp, ref, x, training=True)
        _, grad = nn.mse_loss_and_grad(pred, y)
        grads = nn.backward(sp, ref, caches, grad)
        opt.step(ref, grads)

    # Under BN the linear bias is a GAUGE direction: it cancels exactly in the
    # batch standardization, its gradient is float noise, and Adam's
    # normalization amplifies that noise into a random walk (mirrored by
    # running_mean, leaving the function unchanged). So the equivalence
    # contract is: non-gauge parameters match tightly, and the model FUNCTION
    # (train-mode forward, which uses batch stats) matches tightly.
    for li, (pg, pr) in enumerate(zip(got, ref)):
        gauge = {"b", "running_mean"} if "gamma" in pr else set()
        for k in pr:
            if k in gauge:
                continue
            np.testing.assert_allclose(
                pg[k], pr[k], rtol=2e-3, atol=2e-4,
                err_msg=f"layer {li} param {k} diverged from single-node trajectory",
            )
    xt = np.random.default_rng(7).uniform(0, 1, size=(64, 2)).astype(np.float32)
    pred_got, _ = nn.forward(sp, [dict(p) for p in got], xt, training=True)
    pred_ref, _ = nn.forward(sp, [dict(p) for p in ref], xt, training=True)
    np.testing.assert_allclose(pred_got, pred_ref, rtol=1e-3, atol=1e-4)


def test_sql_ml_pred_rejects_mixed_model_names(spark):
    """A batch mixing model names must error, not silently score every row
    with the first row's model (the reference's lib.rs:213-219 behavior)."""
    fn.ml_create("mixa", SPEC)
    fn.ml_create("mixb", SPEC)
    fn.register_all(spark)
    df = spark.range(16).coalesce(1).selectExpr(
        "ml_pred(CASE WHEN id % 2 = 0 THEN 'mixa' ELSE 'mixb' END, "
        "array(cast(0.1 as float), cast(0.2 as float))) AS p"
    )
    with pytest.raises(Exception, match="constant per query"):
        df.collect()


def test_one_hot_encode_generic_derives_vocabulary(spark):
    from duckdb_ml_spark.operators.mlprep import one_hot_encode

    df = spark.createDataFrame(
        [(1, "red"), (2, "blue"), (3, "red"), (4, "green!")],
        "id bigint, color string",
    )
    out = one_hot_encode(df, "color")
    rows = {r.id: r for r in out.collect()}
    assert rows[1].is_red == 1 and rows[1].is_blue == 0
    assert rows[2].is_blue == 1
    assert rows[4].is_green == 1  # sanitized column name
    # exactly one indicator fires per row
    ind_cols = [c for c in out.columns if c.startswith("is_")]
    for r in rows.values():
        assert sum(getattr(r, c) for c in ind_cols) == 1


def test_one_hot_encode_rejects_unbounded_cardinality(spark):
    import pytest as _pytest

    from duckdb_ml_spark.operators.mlprep import one_hot_encode

    df = spark.range(300).select("id", F.col("id").cast("string").alias("cat"))
    with _pytest.raises(ValueError, match="feature_hash"):
        one_hot_encode(df, "cat", max_categories=256)


def test_feature_hash_partition_independent(spark, sf_dir):
    """Hashed counts must not depend on partitioning (pure column expr)."""
    from duckdb_ml_spark.operators.mlprep import feature_hash_counts

    docs = load(spark, sf_dir, "documents")
    a = {(r.doc_id, r.bucket): r.cnt for r in feature_hash_counts(docs).collect()}
    b = {
        (r.doc_id, r.bucket): r.cnt
        for r in feature_hash_counts(docs.repartition(7)).collect()
    }
    assert a == b
    from duckdb_ml_spark.operators.mlprep import FH_BUCKETS

    assert all(0 <= k[1] < FH_BUCKETS for k in a)


def test_eval_metrics_perfect_and_imperfect(spark):
    """R² is 1 for a perfect scorer, < 1 with error; MSE/MAE match numpy."""
    import numpy as np

    from duckdb_ml_spark.operators.mlprep import eval_metrics_by_group

    df = spark.createDataFrame(
        [("g", float(i), float(2 * i + 1)) for i in range(50)],
        "grp string, x double, y double",
    )
    perfect = eval_metrics_by_group(
        df, F.col("x") * 2 + 1, F.col("y"), "grp"
    ).collect()[0]
    assert perfect.mse == 0.0 and perfect.mae == 0.0 and perfect.r2 == 1.0
    noisy = eval_metrics_by_group(df, F.col("x") * 2, F.col("y"), "grp").collect()[0]
    xs = np.arange(50.0)
    err = (2 * xs) - (2 * xs + 1)
    assert abs(noisy.mse - np.mean(err**2)) < 1e-6
    assert abs(noisy.mae - np.mean(np.abs(err))) < 1e-6
    assert noisy.r2 < 1.0
