"""Distributed training — the 100 TB path (SURVEY §7 step 7).

Driver-side `ml_train` collects the training set; that caps out around driver
memory. Two genuinely distributed strategies, both expressed over mapInPandas so
data never leaves executors:

- mode="avg"  (parallel SGD / local training + weight averaging): each partition
  trains a full local model from the same broadcast init, the driver
  example-weight-averages the resulting weights. ONE pass over the data, no
  per-epoch synchronization — the right default when partitions are IID samples.

- mode="grad" (synchronous full-batch gradient descent): per optimizer step, every
  partition computes its gradient sum against broadcast weights; the driver reduces
  (a tiny collect of one flattened-gradient row per partition — equivalent to
  treeAggregate with a far smaller Python overhead) and takes an Adam step.
  Deterministic and exactly the single-node full-batch trajectory, at the cost of
  one cluster round-trip per step — use few epochs / large effective batch.
"""

from __future__ import annotations

import pickle
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_ml_spark import artifacts, nn, registry
from duckdb_ml_spark.functions import _as_matrix

_RESULT_SCHEMA = "payload binary, n long"


def _collect_xy(pdfs: Iterator[pd.DataFrame], in_dim: int, out_dim: int):
    xs, ys = [], []
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        xs.append(_as_matrix(pdf["__x"], in_dim, "features"))
        ys.append(_as_matrix(pdf["__y"], out_dim, "targets"))
    if not xs:
        return None, None
    return np.concatenate(xs), np.concatenate(ys)


def ml_train_distributed(
    spark: SparkSession,
    name: str,
    df: DataFrame,
    features_col: str = "features",
    targets_col: str = "targets",
    config: str | nn.TrainingConfig | None = None,
    mode: str = "avg",
    save: bool = True,
) -> DataFrame:
    """Train the named registry model on `df` without collecting it to the driver."""
    from duckdb_ml_spark.session import ensure_shipped

    ensure_shipped(spark)
    cfg = config if isinstance(config, nn.TrainingConfig) else nn.TrainingConfig.from_json(config)
    model = registry.get_model(name)
    spec, spec_json = model.spec, model.spec_json
    in_dim, out_dim = spec.input_dim, spec.output_dim
    init = [{k: v.copy() for k, v in p.items()} for p in model.params]
    xy = df.select(F.col(features_col).alias("__x"), F.col(targets_col).alias("__y"))

    if mode == "avg":
        init_b = spark.sparkContext.broadcast(pickle.dumps(init))
        cfg_json = cfg.to_json()

        def _train_partition(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            x, y = _collect_xy(pdfs, in_dim, out_dim)
            if x is None:
                return
            local = pickle.loads(init_b.value)
            local_cfg = nn.TrainingConfig.from_json(cfg_json)
            nn.train_reg(parse_spec_cached(spec_json), local, x, y, local_cfg, test_frac=0.0)
            yield pd.DataFrame({"payload": [pickle.dumps(local)], "n": [len(x)]})

        rows = xy.mapInPandas(_train_partition, schema=_RESULT_SCHEMA).collect()
        if not rows:
            raise ValueError("ml_train_distributed: empty input")
        total = sum(r.n for r in rows)
        acc = None
        for r in rows:
            local = pickle.loads(r.payload)
            w = r.n / total
            if acc is None:
                acc = [{k: w * v for k, v in p.items()} for p in local]
            else:
                for pa, pl in zip(acc, local):
                    for k in pa:
                        pa[k] += w * pl[k]
        params = [{k: v.astype(np.float32) for k, v in p.items()} for p in acc]

    elif mode == "grad":
        # Full-batch synchronous GD is only exactly the single-node trajectory
        # for pure linear/activation stacks: per-partition batchnorm would use
        # partition-local batch stats (and discard running-stat updates), and
        # per-partition dropout masks can't reproduce a single global draw.
        # Refuse loudly rather than silently train a subtly-different model;
        # mode="avg" supports both (running stats are averaged with the params).
        unsupported = [
            f"layer {i}: {'batch_norm' if layer.batch_norm else ''}"
            f"{'dropout' if layer.dropout > 0.0 else ''}"
            for i, layer in enumerate(spec.layers)
            if layer.batch_norm or layer.dropout > 0.0
        ]
        if unsupported:
            raise ValueError(
                "ml_train_distributed(mode='grad') does not support batch_norm/dropout "
                f"({'; '.join(unsupported)}); use mode='avg' or driver-side ml_train"
            )
        xy = xy.persist()
        try:
            n_total = xy.count()
            params = init
            opt = nn.Adam(cfg.learning_rate)
            for _ in range(cfg.epochs):
                params_b = spark.sparkContext.broadcast(pickle.dumps(params))

                def _grad_partition(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                    x, y = _collect_xy(pdfs, in_dim, out_dim)
                    if x is None:
                        return
                    local = pickle.loads(params_b.value)
                    sp = parse_spec_cached(spec_json)
                    pred, caches = nn.forward(sp, local, x, training=True)
                    # un-meaned grad: sum of per-element 2*diff; driver divides by N
                    grad = (2.0 * (pred - y)).astype(np.float32)
                    grads = nn.backward(sp, local, caches, grad)
                    yield pd.DataFrame({"payload": [pickle.dumps(grads)], "n": [len(x)]})

                rows = xy.mapInPandas(_grad_partition, schema=_RESULT_SCHEMA).collect()
                params_b.unpersist()
                if not rows:
                    raise ValueError("ml_train_distributed: empty input")
                denom = float(sum(r.n for r in rows)) * out_dim
                gsum = None
                for r in rows:
                    g = pickle.loads(r.payload)
                    if gsum is None:
                        gsum = g
                    else:
                        for ga, gl in zip(gsum, g):
                            for k in ga:
                                ga[k] += gl[k]
                grads = [{k: (v / denom).astype(np.float32) for k, v in p.items()} for p in gsum]
                opt.step(params, grads)
        finally:
            xy.unpersist()
    else:
        raise ValueError(f"unknown mode '{mode}' (use 'avg' or 'grad')")

    model.params = params
    if save:
        model.artifacts.append(artifacts.save_model(name, spec_json, params, cfg))
    registry.put_model(model)
    from duckdb_ml_spark.functions import ml_pred

    return ml_pred(df, name, features_col=features_col)


_SPEC_CACHE: dict[str, object] = {}


def parse_spec_cached(spec_json: str):
    from duckdb_ml_spark.spec import parse_spec

    if spec_json not in _SPEC_CACHE:
        _SPEC_CACHE[spec_json] = parse_spec(spec_json)
    return _SPEC_CACHE[spec_json]
