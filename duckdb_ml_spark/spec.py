"""Model-spec JSON parsing.

Canonical format (reference: /root/reference/src/nn/model.rs:11-26, example
/root/reference/test/sql/autompg.test:4):

    {"layers": [
        {"in": 5, "out": 16, "activation": "relu", "batch_norm": true, "dropout": 0.1},
        {"in": 16, "out": 1}
    ]}

`activation` ∈ {"relu","tanh"}; any other value is silently treated as identity
(the reference's `_ => {}` arm, model.rs:127-133). `batch_norm` defaults false,
`dropout` defaults 0.0 (applied only when > 0, model.rs:85-93).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


class SpecError(ValueError):
    """Raised on malformed spec JSON."""


@dataclass(frozen=True)
class LayerSpec:
    in_dim: int
    out_dim: int
    activation: str | None = None
    batch_norm: bool = False
    dropout: float = 0.0


@dataclass(frozen=True)
class NetworkSpec:
    layers: tuple[LayerSpec, ...] = field(default=())

    @property
    def input_dim(self) -> int:
        return self.layers[0].in_dim

    @property
    def output_dim(self) -> int:
        return self.layers[-1].out_dim


def parse_spec(spec_json: str) -> NetworkSpec:
    try:
        doc = json.loads(spec_json)
    except json.JSONDecodeError as e:
        raise SpecError(f"spec is not valid JSON: {e}") from e
    if not isinstance(doc, dict) or "layers" not in doc:
        raise SpecError('spec must be an object with a "layers" array')
    raw_layers = doc["layers"]
    if not isinstance(raw_layers, list) or not raw_layers:
        raise SpecError('"layers" must be a non-empty array')
    layers = []
    prev_out: int | None = None
    for i, lr in enumerate(raw_layers):
        if not isinstance(lr, dict) or "in" not in lr or "out" not in lr:
            raise SpecError(f'layer {i} must be an object with "in" and "out"')
        in_dim, out_dim = int(lr["in"]), int(lr["out"])
        if in_dim <= 0 or out_dim <= 0:
            raise SpecError(f"layer {i}: dims must be positive (got {in_dim}→{out_dim})")
        if prev_out is not None and in_dim != prev_out:
            # The reference lets burn fail at runtime on a dim mismatch; we fail at parse.
            raise SpecError(f"layer {i}: in={in_dim} does not match previous out={prev_out}")
        prev_out = out_dim
        layers.append(
            LayerSpec(
                in_dim=in_dim,
                out_dim=out_dim,
                activation=lr.get("activation"),
                batch_norm=bool(lr.get("batch_norm", False)),
                dropout=float(lr.get("dropout", 0.0)),
            )
        )
    return NetworkSpec(layers=tuple(layers))
