"""Test-table access + temp-view registration.

Tables are the driver-generated TPC-H-ish parquet files (TESTDATA.md):
region nation customer supplier part orders lineitem events documents embeddings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table. Plain parquet scan → Catalyst gets full pushdown/pruning.

    The events table stores TIMESTAMP(NANOS) which the Spark parquet reader rejects;
    it is read with nanosAsLong and converted to a microsecond timestamp with integer
    division (matches DuckDB's ns→µs truncation; a double-typed division would lose
    precision above 2^53 ns).
    """
    # Time-window semantics (window/date_trunc/session_window) follow the
    # session timezone; the testdata and every oracle assume naive-UTC. The
    # driver harness builds its own SparkSession, so pin it here — the entry
    # point every query builder goes through — rather than trusting session.py
    # to have been used. Runtime-settable; no-op when already UTC.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # likewise make the package importable on executors whatever the cwd
    from duckdb_ml_spark.session import ensure_shipped

    ensure_shipped(spark)
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES) -> None:
    """Register every test table as a temp view so spark.sql queries can use them."""
    for name in names:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
