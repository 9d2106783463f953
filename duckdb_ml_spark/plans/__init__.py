"""Query plans: the relational surface (SURVEY.md §2.3) and plan-audit helpers."""

from duckdb_ml_spark.plans.relational import RELATIONAL_QUERIES, QuerySpec  # noqa: F401
