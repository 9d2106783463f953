"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship pipeline on sf0.001 (smoke check, rows > 0).
queries()     — every implemented operator from SURVEY.md §2 as (spark, sf_dir) → DataFrame.
oracle_sql()  — matching DuckDB ANSI-SQL for the value-hash correctness gate.

Implementations live in duckdb_ml_spark/; this module only collects them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _all_query_specs():
    """Collect QuerySpec registries from every engine module."""
    from duckdb_ml_spark.plans.relational import RELATIONAL_QUERIES

    specs = {}
    specs.update(RELATIONAL_QUERIES)
    for modname in (
        "duckdb_ml_spark.operators.dedup",
        "duckdb_ml_spark.operators.similarity",
        "duckdb_ml_spark.operators.text",
        "duckdb_ml_spark.operators.multimodal",
        "duckdb_ml_spark.operators.asof",
        "duckdb_ml_spark.operators.analytics",
        "duckdb_ml_spark.operators.sampling",
        "duckdb_ml_spark.operators.pipeline",
        "duckdb_ml_spark.plans.scale",
        "duckdb_ml_spark.functions.queries",
        "duckdb_ml_spark.sources.readers",
        "duckdb_ml_spark.streaming.queries",
        "duckdb_ml_spark.autompg",
    ):
        try:
            import importlib

            mod = importlib.import_module(modname)
            specs.update(getattr(mod, "QUERIES", {}))
        except ImportError:
            continue  # module not built yet
    return specs


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's autompg pipeline pattern (scaling params → min-max
    scale → MLP train + predict) on sf0.001 lineitem, Spark-first."""
    from duckdb_ml_spark.flagship import flagship

    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.builder for name, spec in _all_query_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in _all_query_specs().items() if spec.oracle is not None
    }
