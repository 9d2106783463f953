"""Driver-side model registry.

The reference keeps a process-global mutex-guarded map name→Model
(/root/reference/src/nn/mod.rs:25,36-64). Here the registry lives on the Spark
DRIVER only; executors never mutate it — inference UDFs receive an immutable
weights snapshot (closure-captured / broadcast). This is the central architectural
correction over the reference (SURVEY §4.1): no side effects inside UDFs, so task
retries and speculative execution are safe.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field

import numpy as np

from duckdb_ml_spark.spec import NetworkSpec


@dataclass
class RegisteredModel:
    name: str
    spec_json: str
    spec: NetworkSpec
    params: list[dict[str, np.ndarray]]
    artifacts: list[str] = field(default_factory=list)  # saved artifact dirs, newest last


_LOCK = threading.Lock()
_REGISTRY: dict[str, RegisteredModel] = {}


def put_model(model: RegisteredModel) -> None:
    with _LOCK:
        _REGISTRY[model.name] = model


def get_model(name: str) -> RegisteredModel:
    with _LOCK:
        if name not in _REGISTRY:
            raise KeyError(f"model '{name}' not found (have: {sorted(_REGISTRY)})")
        return _REGISTRY[name]


def drop_model(name: str) -> bool:
    with _LOCK:
        return _REGISTRY.pop(name, None) is not None


def list_models() -> list[tuple[str, str]]:
    """(name, spec_json) pairs — the ml_list table-function output (lib.rs:94-95)."""
    with _LOCK:
        return [(m.name, m.spec_json) for m in _REGISTRY.values()]


def snapshot_params(name: str) -> tuple[str, list[dict[str, np.ndarray]]]:
    """Deep-copied (spec_json, params) safe to ship into a UDF closure."""
    m = get_model(name)
    with _LOCK:
        return m.spec_json, [{k: v.copy() for k, v in p.items()} for p in m.params]


def clear() -> None:
    with _LOCK:
        _REGISTRY.clear()
