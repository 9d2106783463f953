"""SQL-statement parity for the reference's training surface.

The reference trains FROM SQL (`/root/reference/test/sql/autompg.test:16,22`,
dispatched in `src/lib.rs:128-202`): `SELECT ml_train('m', [feats], [tgt])
FROM t`. This repo deliberately keeps `ml_train`/`ml_create` out of executor
UDFs — registry/filesystem side effects inside a task are re-run on retry and
lost on speculation (functions/__init__.py docstring). The SQL surface is
preserved anyway via a GUARDED driver-side dispatcher: `sql()` recognizes the
reference's ML statement forms, rewrites the DuckDB-isms to Spark SQL, and
routes training/creation through the driver-side Python API (materializing the
input via `spark.sql` — the engine-correct place for side effects). Everything
else passes through `spark.sql` unchanged, so a reference .test file executes
statement-for-statement (tests/test_autompg.py::test_reference_autompg_test_translated).

Retry semantics: ml_train runs exactly once per `sql()` call on the driver. A
failed Spark job inside the input materialization simply propagates — no
partial registry mutation (the registry is only updated after the collect
succeeds, functions/__init__.py:180-185).

Rewrites applied (all DuckDB → Spark SQL):
- `expr::float`            → `float(expr)`        (cast operator)
- `[a, b, c]`              → `array(a, b, c)`     (list literal only: skipped
  after `\\w`/`)`/`]` — that's 1-based indexing — and inside string literals)
- `FROM f()` bare leading  → `SELECT * FROM f()`  (DuckDB's FROM-first form)
- `{k: v, ...}::json`      → JSON config string   (struct literal → TrainingConfig)
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame, SparkSession

_CAST_FLOAT = re.compile(r"(\w+(?:\(\))?)::float\b", re.IGNORECASE)
# list literal ONLY: a bracket preceded by a word char / ')' / ']' is DuckDB
# 1-based indexing (w[1]), not a list — leave those intact (ADVICE r3)
_LIST = re.compile(r"(?<![\w\)\]])\[([^\[\]]*)\]")
_SQUOTE = re.compile(r"('(?:[^']|'')*')")


def _rewrite_list_literals(stmt: str) -> str:
    """`[a, b]` → `array(a, b)` outside string literals and never after an
    identifier/closing bracket (indexing). Quoted segments pass through
    verbatim so brackets inside strings are not corrupted."""
    parts = _SQUOTE.split(stmt)
    return "".join(
        p if i % 2 else _LIST.sub(lambda mm: f"array({mm.group(1)})", p)
        for i, p in enumerate(parts)
    )
_ML_TRAIN = re.compile(
    r"^\s*select\s+ml_train\(\s*'(?P<name>[^']+)'\s*,\s*"
    r"\[(?P<feats>[^\]]*)\]\s*,\s*\[(?P<tgts>[^\]]*)\]\s*"
    r"(?:,\s*(?P<cfg>\{[^}]*\})\s*::\s*json\s*)?\)\s*"
    r"(?:from\s+(?P<table>\w+)\s*)?;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_ML_CREATE = re.compile(
    r"^\s*select\s+ml_create\(\s*'(?P<name>[^']+)'\s*,\s*'(?P<spec>.*)'\s*\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_CTAS_FILE = re.compile(
    r"^\s*create\s+table\s+(?P<table>\w+)\s+as\s+from\s+'(?P<path>[^']+)'\s*;?\s*$",
    re.IGNORECASE,
)


def _struct_literal_to_json(struct: str) -> str:
    """DuckDB `{epochs: 100, learning_rate: 0.0003}` → JSON object string."""
    body = struct.strip()[1:-1]
    doc = {}
    for part in body.split(","):
        if not part.strip():
            continue
        k, v = part.split(":", 1)
        doc[k.strip().strip("'\"")] = json.loads(v.strip())
    return json.dumps(doc)


def _spark_expr(duck_expr: str) -> str:
    """Rewrite a DuckDB scalar expression to Spark SQL (float casts incl.
    zero-arg calls like random()::float, and random() → rand())."""
    e = re.sub(r"\brandom\(\)", "rand()", duck_expr, flags=re.IGNORECASE)
    return _CAST_FLOAT.sub(r"float(\1)", e)


def sql(spark: SparkSession, statement: str) -> DataFrame:
    """Execute one statement with reference-ML-SQL parity (see module doc)."""
    from duckdb_ml_spark import functions as fn

    m = _ML_CREATE.match(statement)
    if m:
        status = fn.ml_create(m.group("name"), m.group("spec"))
        fn.register_all(spark)  # refresh SQL view of the registry (ml_list/ml_pred)
        return spark.createDataFrame([(status,)], "status string")

    m = _ML_TRAIN.match(statement)
    if m:
        feats = _spark_expr(m.group("feats"))
        tgts = _spark_expr(m.group("tgts"))
        # outer array<float> cast: DuckDB numeric literals like `0.` land as
        # decimals; ml_train's Arrow path wants float lists either way
        src = f" FROM {m.group('table')}" if m.group("table") else ""
        xy = spark.sql(
            f"SELECT CAST(array({feats}) AS array<float>) AS features, "
            f"CAST(array({tgts}) AS array<float>) AS targets{src}"
        )
        cfg = _struct_literal_to_json(m.group("cfg")) if m.group("cfg") else None
        pred = fn.ml_train(spark, m.group("name"), xy, config=cfg, save=False)
        fn.register_all(spark)  # retrained weights visible to SQL ml_pred
        return pred

    m = _CTAS_FILE.match(statement)
    if m:
        from duckdb_ml_spark.sources.readers import read_csv

        df = read_csv(spark, m.group("path"))
        df.createOrReplaceTempView(m.group("table"))
        return df

    stmt = statement.strip().rstrip(";")
    if stmt.lower().startswith("from "):
        stmt = "SELECT * " + stmt  # DuckDB FROM-first form
    # array literals in plain SQL (e.g. the ml_pred projection)
    stmt = _rewrite_list_literals(_spark_expr(stmt))
    return spark.sql(stmt)
