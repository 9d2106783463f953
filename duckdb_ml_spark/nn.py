"""NumPy MLP core: forward, backward, Adam, MSE training loop.

Reimplements the reference's burn-backed network semantics (forward pass
/root/reference/src/nn/model.rs:110-136, training loop
/root/reference/src/nn/train.rs:39-135, Adam defaults /root/reference/src/nn/mod.rs:124)
in float32 NumPy. MLlib's MultilayerPerceptronClassifier cannot express MSE
*regression*, so the net is custom — ~250 lines, no framework dependency.

A model's parameters are a list of per-layer dicts of float32 ndarrays, which
serializes cheaply (np.savez / Spark broadcast) and crosses into pandas_udf
workers without custom pickling.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import numpy as np

from duckdb_ml_spark.spec import NetworkSpec, parse_spec

_EPS = 1e-5  # batchnorm epsilon (burn default)


@dataclass
class TrainingConfig:
    """Defaults match the reference (/root/reference/src/nn/train.rs:20-30)."""

    epochs: int = 10
    batch_size: int = 64
    seed: int = 42
    learning_rate: float = 0.01
    # beyond-reference knobs (train.rs:79 TODO leaves loss/schedule unparametrized):
    # lr_schedule: "constant" | "step" (×lr_decay every lr_step_epochs) |
    # "cosine" (anneal to 0 over `epochs`); early_stop_patience > 0 stops after
    # that many epochs without ≥ early_stop_min_delta improvement in the
    # monitored loss (test loss when a test split exists, else train loss) and
    # restores the best-epoch weights.
    lr_schedule: str = "constant"
    lr_decay: float = 0.5
    lr_step_epochs: int = 0
    early_stop_patience: int = 0
    early_stop_min_delta: float = 0.0

    @classmethod
    def from_json(cls, config_json: str | None) -> "TrainingConfig":
        if not config_json:
            return cls()
        doc = json.loads(config_json)
        if not isinstance(doc, dict):
            raise ValueError("training config must be a JSON object")
        cfg = cls()
        for k in ("epochs", "batch_size", "seed", "lr_step_epochs", "early_stop_patience"):
            if k in doc:
                setattr(cfg, k, int(doc[k]))
        for k in ("learning_rate", "lr_decay", "early_stop_min_delta"):
            if k in doc:
                setattr(cfg, k, float(doc[k]))
        if "lr_schedule" in doc:
            if doc["lr_schedule"] not in ("constant", "step", "cosine"):
                raise ValueError(f"unknown lr_schedule '{doc['lr_schedule']}'")
            cfg.lr_schedule = doc["lr_schedule"]
        return cfg

    def lr_at(self, epoch: int) -> float:
        """Learning rate for 1-based `epoch` under the configured schedule."""
        if self.lr_schedule == "step" and self.lr_step_epochs > 0:
            import math

            return self.learning_rate * self.lr_decay ** ((epoch - 1) // self.lr_step_epochs)
        if self.lr_schedule == "cosine":
            import math

            return self.learning_rate * 0.5 * (1 + math.cos(math.pi * (epoch - 1) / max(1, self.epochs)))
        return self.learning_rate

    def to_json(self) -> str:
        return json.dumps(
            {
                "epochs": self.epochs,
                "batch_size": self.batch_size,
                "seed": self.seed,
                "learning_rate": self.learning_rate,
            }
        )


def init_params(spec: NetworkSpec, seed: int = 42) -> list[dict[str, np.ndarray]]:
    """Kaiming-uniform-style init (burn LinearConfig default: U(-k, k), k=1/sqrt(in))."""
    rng = np.random.default_rng(seed)
    params = []
    for layer in spec.layers:
        k = 1.0 / np.sqrt(layer.in_dim)
        p = {
            "W": rng.uniform(-k, k, size=(layer.in_dim, layer.out_dim)).astype(np.float32),
            "b": rng.uniform(-k, k, size=(layer.out_dim,)).astype(np.float32),
        }
        if layer.batch_norm:
            p["gamma"] = np.ones(layer.out_dim, dtype=np.float32)
            p["beta"] = np.zeros(layer.out_dim, dtype=np.float32)
            p["running_mean"] = np.zeros(layer.out_dim, dtype=np.float32)
            p["running_var"] = np.ones(layer.out_dim, dtype=np.float32)
        params.append(p)
    return params


_TRAINABLE = ("W", "b", "gamma", "beta")


def _activate(name: str | None, x: np.ndarray) -> np.ndarray:
    if name == "relu":
        return np.maximum(x, 0.0)
    if name == "tanh":
        return np.tanh(x)
    return x  # unknown activation → identity (reference model.rs:131 `_ => {}`)


def forward(
    spec: NetworkSpec,
    params: list[dict[str, np.ndarray]],
    x: np.ndarray,
    training: bool = False,
    rng: np.random.Generator | None = None,
    momentum: float = 0.1,
):
    """Run the network. Returns (output, caches) — caches only kept when training."""
    x = np.asarray(x, dtype=np.float32)
    caches = []
    for layer, p in zip(spec.layers, params):
        cache: dict = {"x": x}
        z = x @ p["W"] + p["b"]
        cache["z"] = z
        if layer.batch_norm:
            if training:
                mu = z.mean(axis=0)
                var = z.var(axis=0)
                p["running_mean"] = ((1 - momentum) * p["running_mean"] + momentum * mu).astype(
                    np.float32
                )
                p["running_var"] = ((1 - momentum) * p["running_var"] + momentum * var).astype(
                    np.float32
                )
            else:
                mu, var = p["running_mean"], p["running_var"]
            inv_std = 1.0 / np.sqrt(var + _EPS)
            zhat = (z - mu) * inv_std
            z = p["gamma"] * zhat + p["beta"]
            cache.update(zhat=zhat, inv_std=inv_std)
        if layer.dropout > 0.0 and training:
            # inverted dropout; identity at inference (reference disables via .valid())
            mask = (rng or np.random.default_rng()).random(z.shape) >= layer.dropout
            z = z * mask / (1.0 - layer.dropout)
            cache["drop_mask"] = mask
        cache["pre_act"] = z
        x = _activate(layer.activation, z)
        caches.append(cache)
    return x, caches


def backward(
    spec: NetworkSpec,
    params: list[dict[str, np.ndarray]],
    caches: list[dict],
    grad_out: np.ndarray,
) -> list[dict[str, np.ndarray]]:
    """Backprop grad_out (dL/d_output) through the network; returns per-layer grads."""
    grads: list[dict[str, np.ndarray]] = [None] * len(params)  # type: ignore[list-item]
    dy = grad_out
    for i in range(len(params) - 1, -1, -1):
        layer, p, cache = spec.layers[i], params[i], caches[i]
        # activation
        if layer.activation == "relu":
            dy = dy * (cache["pre_act"] > 0)
        elif layer.activation == "tanh":
            a = np.tanh(cache["pre_act"])
            dy = dy * (1.0 - a * a)
        # dropout
        if "drop_mask" in cache:
            dy = dy * cache["drop_mask"] / (1.0 - layer.dropout)
        g: dict[str, np.ndarray] = {}
        # batchnorm
        if layer.batch_norm:
            zhat, inv_std = cache["zhat"], cache["inv_std"]
            g["gamma"] = (dy * zhat).sum(axis=0)
            g["beta"] = dy.sum(axis=0)
            n = dy.shape[0]
            dzhat = dy * p["gamma"]
            dy = (
                inv_std
                / n
                * (n * dzhat - dzhat.sum(axis=0) - zhat * (dzhat * zhat).sum(axis=0))
            )
        # linear
        x = cache["x"]
        g["W"] = x.T @ dy
        g["b"] = dy.sum(axis=0)
        grads[i] = g
        if i > 0:
            dy = dy @ p["W"].T
    return grads


def mse_loss_and_grad(pred: np.ndarray, target: np.ndarray):
    """Mean-over-all-elements squared error (burn MseLoss Mean reduction)."""
    diff = pred - target
    loss = float(np.mean(diff * diff))
    grad = (2.0 / diff.size) * diff
    return loss, grad.astype(np.float32)


class Adam:
    """Adam with burn/standard defaults (β1=0.9, β2=0.999, ε=1e-8)."""

    def __init__(self, lr: float, beta1: float = 0.9, beta2: float = 0.999, eps: float = 1e-8):
        self.lr, self.beta1, self.beta2, self.eps = lr, beta1, beta2, eps
        self.t = 0
        self.m: list[dict[str, np.ndarray]] | None = None
        self.v: list[dict[str, np.ndarray]] | None = None

    def step(self, params: list[dict[str, np.ndarray]], grads: list[dict[str, np.ndarray]]):
        if self.m is None:
            self.m = [{k: np.zeros_like(p[k]) for k in p if k in _TRAINABLE} for p in params]
            self.v = [{k: np.zeros_like(p[k]) for k in p if k in _TRAINABLE} for p in params]
        self.t += 1
        b1c = 1 - self.beta1**self.t
        b2c = 1 - self.beta2**self.t
        for p, g, m, v in zip(params, grads, self.m, self.v):
            for k, gk in g.items():
                m[k] = self.beta1 * m[k] + (1 - self.beta1) * gk
                v[k] = self.beta2 * v[k] + (1 - self.beta2) * gk * gk
                p[k] = (p[k] - self.lr * (m[k] / b1c) / (np.sqrt(v[k] / b2c) + self.eps)).astype(
                    np.float32
                )


@dataclass
class TrainReport:
    epoch_train_loss: list[float] = field(default_factory=list)
    epoch_test_loss: list[float] = field(default_factory=list)
    n_train: int = 0
    n_test: int = 0
    stopped_epoch: int = 0  # 0 = ran all epochs; else the early-stop epoch
    best_epoch: int = 0  # epoch whose weights were restored (early stop only)


def train_reg(
    spec: NetworkSpec,
    params: list[dict[str, np.ndarray]],
    x: np.ndarray,
    y: np.ndarray,
    config: TrainingConfig,
    test_frac: float = 0.3,
    log=None,
) -> TrainReport:
    """In-place Adam+MSE training (reference train.rs:39-135 semantics).

    Deviation documented in SURVEY §2.2: the reference's `split_off` keeps the FIRST
    30% as train (an inverted-split bug); we implement the intended 70/30 split.
    """
    x = np.ascontiguousarray(x, dtype=np.float32)
    y = np.ascontiguousarray(y, dtype=np.float32)
    rng = np.random.default_rng(config.seed)
    n = x.shape[0]
    n_test = int(n * test_frac) if n >= 10 else 0
    perm = rng.permutation(n)
    test_idx, train_idx = perm[:n_test], perm[n_test:]
    xtr, ytr, xte, yte = x[train_idx], y[train_idx], x[test_idx], y[test_idx]

    opt = Adam(config.learning_rate)
    report = TrainReport(n_train=len(train_idx), n_test=len(test_idx))
    best_loss = float("inf")
    best_params: list[dict[str, np.ndarray]] | None = None
    best_epoch = 0
    stale = 0
    for epoch in range(1, config.epochs + 1):
        opt.lr = config.lr_at(epoch)
        order = rng.permutation(len(xtr))
        for start in range(0, len(xtr), config.batch_size):
            idx = order[start : start + config.batch_size]
            pred, caches = forward(spec, params, xtr[idx], training=True, rng=rng)
            _, grad = mse_loss_and_grad(pred, ytr[idx])
            grads = backward(spec, params, caches, grad)
            opt.step(params, grads)
        tr_pred, _ = forward(spec, params, xtr, training=False)
        tr_loss, _ = mse_loss_and_grad(tr_pred, ytr)
        report.epoch_train_loss.append(tr_loss)
        if n_test:
            te_pred, _ = forward(spec, params, xte, training=False)
            te_loss, _ = mse_loss_and_grad(te_pred, yte)
            report.epoch_test_loss.append(te_loss)
        if log:
            te = f" test_loss={report.epoch_test_loss[-1]:.6f}" if n_test else ""
            log(f"epoch {epoch}/{config.epochs} train_loss={tr_loss:.6f}{te}")
        if config.early_stop_patience > 0:
            monitored = report.epoch_test_loss[-1] if n_test else tr_loss
            if monitored < best_loss - config.early_stop_min_delta:
                best_loss = monitored
                best_epoch = epoch
                best_params = [{k: v.copy() for k, v in p.items()} for p in params]
                stale = 0
            else:
                stale += 1
                if stale >= config.early_stop_patience:
                    report.stopped_epoch = epoch
                    break
    if config.early_stop_patience > 0 and best_params is not None:
        for p, bp in zip(params, best_params):
            for k in p:
                p[k] = bp[k]
        report.best_epoch = best_epoch
    return report


def predict(spec_json: str, params: list[dict[str, np.ndarray]], x: np.ndarray) -> np.ndarray:
    """Inference-mode forward (the reference's `.valid()` path, mod.rs:66-82)."""
    spec = parse_spec(spec_json)
    out, _ = forward(spec, params, x, training=False)
    return out
