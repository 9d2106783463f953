"""NumPy MLP core tests: shapes (port of reference model.rs tests), analytic
gradients vs finite differences, convergence, spec parsing, save/load."""

from __future__ import annotations

import numpy as np
import pytest

from duckdb_ml_spark import artifacts, nn
from duckdb_ml_spark.spec import SpecError, parse_spec

SPEC_BN_DROP = """{"layers": [
    {"in": 5, "out": 16, "activation": "relu", "batch_norm": true, "dropout": 0.1},
    {"in": 16, "out": 1}
]}"""


def test_parse_spec_canonical():
    spec = parse_spec(SPEC_BN_DROP)
    assert spec.input_dim == 5 and spec.output_dim == 1
    assert spec.layers[0].batch_norm and spec.layers[0].dropout == pytest.approx(0.1)
    assert spec.layers[1].activation is None


@pytest.mark.parametrize(
    "bad",
    [
        "not json",
        "{}",
        '{"layers": []}',
        '{"layers": [{"in": 0, "out": 4}]}',
        '{"layers": [{"in": 2, "out": 4}, {"in": 5, "out": 1}]}',  # dim mismatch
        '{"layers": [{"out": 4}]}',
    ],
)
def test_parse_spec_rejects(bad):
    with pytest.raises(SpecError):
        parse_spec(bad)


def test_unknown_activation_is_identity():
    # reference model.rs:131 `_ => {}`: unknown strings silently no-op
    spec = parse_spec('{"layers": [{"in": 3, "out": 3, "activation": "gelu_nope"}]}')
    params = nn.init_params(spec, seed=1)
    x = np.random.default_rng(0).normal(size=(4, 3)).astype(np.float32)
    out, _ = nn.forward(spec, params, x)
    np.testing.assert_allclose(out, x @ params[0]["W"] + params[0]["b"], rtol=1e-5)


def test_forward_shapes_bn_dropout():
    # port of reference model.rs:163-192 shape test
    spec = parse_spec(SPEC_BN_DROP)
    params = nn.init_params(spec, seed=42)
    x = np.random.default_rng(0).normal(size=(32, 5)).astype(np.float32)
    out, _ = nn.forward(spec, params, x, training=False)
    assert out.shape == (32, 1)
    out_tr, caches = nn.forward(
        spec, params, x, training=True, rng=np.random.default_rng(1)
    )
    assert out_tr.shape == (32, 1) and len(caches) == 2


def test_gradients_match_finite_differences():
    spec = parse_spec(
        '{"layers": [{"in": 4, "out": 6, "activation": "tanh", "batch_norm": true},'
        ' {"in": 6, "out": 2}]}'
    )
    rng = np.random.default_rng(7)
    params = nn.init_params(spec, seed=7)
    # float64 copies for numeric stability of the check
    p64 = [{k: v.astype(np.float64) for k, v in p.items()} for p in params]
    x = rng.normal(size=(16, 4))
    y = rng.normal(size=(16, 2))

    def loss_of(p):
        pc = [{k: v.copy() for k, v in lp.items()} for lp in p]  # forward mutates bn stats
        out, _ = nn.forward(spec, pc, x, training=True)
        return float(np.mean((out - y) ** 2))

    pc = [{k: v.copy() for k, v in lp.items()} for lp in p64]
    out, caches = nn.forward(spec, pc, x, training=True)
    _, grad = nn.mse_loss_and_grad(out, y)
    grads = nn.backward(spec, pc, caches, grad)

    eps = 1e-6
    for li in range(len(p64)):
        for key in grads[li]:
            flat = p64[li][key].ravel()
            for idx in range(0, flat.size, max(1, flat.size // 5)):
                orig = flat[idx]
                flat[idx] = orig + eps
                lp = loss_of(p64)
                flat[idx] = orig - eps
                lm = loss_of(p64)
                flat[idx] = orig
                num = (lp - lm) / (2 * eps)
                ana = grads[li][key].ravel()[idx]
                assert num == pytest.approx(ana, rel=2e-3, abs=1e-6), (li, key, idx)


def test_training_converges_on_linear_function():
    # autompg-shaped synthetic regression: loss must decrease to a small value
    rng = np.random.default_rng(42)
    x = rng.uniform(0, 1, size=(400, 5)).astype(np.float32)
    w = np.array([[0.5], [-1.0], [2.0], [0.3], [-0.7]], dtype=np.float32)
    y = x @ w + 0.1
    spec = parse_spec('{"layers": [{"in": 5, "out": 16, "activation": "relu"}, {"in": 16, "out": 1}]}')
    params = nn.init_params(spec, seed=42)
    cfg = nn.TrainingConfig(epochs=60, batch_size=64, seed=42, learning_rate=0.01)
    report = nn.train_reg(spec, params, x, y, cfg)
    assert report.n_train == 280 and report.n_test == 120  # intended 70/30 split
    assert report.epoch_train_loss[-1] < 0.002
    assert report.epoch_train_loss[-1] < report.epoch_train_loss[0] / 10


def test_training_config_defaults_and_json():
    cfg = nn.TrainingConfig.from_json(None)
    assert (cfg.epochs, cfg.batch_size, cfg.seed, cfg.learning_rate) == (10, 64, 42, 0.01)
    cfg2 = nn.TrainingConfig.from_json('{"epochs": 100, "learning_rate": 0.0003}')
    assert cfg2.epochs == 100 and cfg2.learning_rate == pytest.approx(0.0003)
    assert cfg2.batch_size == 64  # untouched default


def test_save_load_roundtrip(tmp_path):
    spec_json = '{"layers": [{"in": 3, "out": 4, "batch_norm": true}, {"in": 4, "out": 2}]}'
    spec = parse_spec(spec_json)
    params = nn.init_params(spec, seed=3)
    d = artifacts.save_model("rt", spec_json, params, nn.TrainingConfig(), root=str(tmp_path))
    loaded = artifacts.load_weights(d)
    x = np.random.default_rng(0).normal(size=(8, 3)).astype(np.float32)
    np.testing.assert_array_equal(
        nn.forward(spec, params, x)[0], nn.forward(spec, loaded, x)[0]
    )


def test_lr_schedules():
    from duckdb_ml_spark.nn import TrainingConfig

    step = TrainingConfig.from_json(
        '{"epochs": 6, "lr_schedule": "step", "lr_step_epochs": 2, "lr_decay": 0.5, "learning_rate": 0.08}'
    )
    assert [step.lr_at(e) for e in (1, 2, 3, 4, 5)] == [0.08, 0.08, 0.04, 0.04, 0.02]
    cos = TrainingConfig.from_json('{"epochs": 5, "lr_schedule": "cosine", "learning_rate": 0.1}')
    assert cos.lr_at(1) == 0.1
    assert 0 < cos.lr_at(5) < cos.lr_at(2) < 0.1
    import pytest as _pytest

    with _pytest.raises(ValueError):
        TrainingConfig.from_json('{"lr_schedule": "linear"}')


def test_early_stopping_restores_best_epoch():
    rng = np.random.default_rng(7)
    x = rng.uniform(0, 1, size=(300, 5)).astype(np.float32)
    w = np.array([[0.5], [-1.0], [2.0], [0.3], [-0.7]], dtype=np.float32)
    y = (x @ w + 0.1 + rng.normal(0, 0.3, size=(300, 1))).astype(np.float32)
    spec = parse_spec(
        '{"layers": [{"in": 5, "out": 16, "activation": "relu"}, {"in": 16, "out": 1}]}'
    )
    params = nn.init_params(spec, seed=7)
    cfg = nn.TrainingConfig.from_json(
        '{"epochs": 50, "batch_size": 32, "seed": 7, "learning_rate": 0.05,'
        ' "early_stop_patience": 3, "early_stop_min_delta": 1e-9}'
    )
    report = nn.train_reg(spec, params, x, y, cfg)
    if report.stopped_epoch:
        assert report.stopped_epoch < 50
        assert 1 <= report.best_epoch <= report.stopped_epoch
        # restored weights reproduce the best monitored loss
        monitored = report.epoch_test_loss if report.n_test else report.epoch_train_loss
        assert min(monitored[: report.stopped_epoch]) == monitored[report.best_epoch - 1]
