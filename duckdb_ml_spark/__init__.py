"""duckdb_ml_spark — a PySpark-native analytics engine with the capabilities of
the `alamminsalo/duckdb-ml` DuckDB extension (reference at /root/reference), built
Spark-first on DataFrame/SQL/Catalyst and extended with LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns) designed for 100 TB.

Public surface
--------------
ML operators (reference parity, SURVEY.md §2.1):
    ml_create(name, spec_json)         -> 'Ok'      (driver-side DDL)
    ml_list(spark)                     -> DataFrame(model string, json string)
    ml_train(spark, name, df, ...)     -> DataFrame with predictions
    ml_pred(df, name, features_col)    -> DataFrame with predictions column
    register_all(spark)                -> installs SQL-callable UDFs

Relational surface (SURVEY.md §2.3) lives in `plans.relational`;
pipeline operators live in `operators.*`; streaming in `streaming.*`.
"""

from duckdb_ml_spark.functions import (  # noqa: F401
    ml_create,
    ml_drop,
    ml_list,
    ml_pred,
    ml_train,
    register_all,
)
from duckdb_ml_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
