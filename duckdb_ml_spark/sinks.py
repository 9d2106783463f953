"""Sinks: partitioned parquet, bucketed tables, CSV/JSONL exports.

The reference has no write surface (its only artifact is model weights); these
are the sinks a 100 TB training-data pipeline needs:

- `write_parquet_partitioned` — hive-style directory partitioning: partition
  pruning makes `WHERE pcol = x` skip whole directories at the scan.
- `write_bucketed_table` — pre-shuffled, co-located storage: joins and
  aggregations on the bucket key need NO exchange at read time (verified by
  plan-shape test: tests/test_scale.py). This is the canonical way to amortize
  one shuffle across many downstream joins of the same key.
- `write_csv` / `write_jsonl` — interchange exports (roundtrip-checked against
  the DuckDB oracle via sources/readers.py queries).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_parquet_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    df.write.partitionBy(*partition_cols).mode(mode).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    Readers joining/grouping on `bucket_col` with a table bucketed the same way
    skip the exchange entirely — at 100 TB that is the difference between a
    full-corpus shuffle per join and zero."""
    if mode == "overwrite":
        # clear both the catalog entry and any orphaned location (a managed
        # table dir left by a previous session fails LOCATION_ALREADY_EXISTS)
        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        loc = os.path.join(wh.removeprefix("file:"), name.split(".")[-1])
        if os.path.isdir(loc):
            shutil.rmtree(loc, ignore_errors=True)
    w = df.write.bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.mode(mode).format("parquet").saveAsTable(name)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", **options) -> None:
    df.write.options(header=True, **options).mode(mode).csv(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite", **options) -> None:
    df.write.options(**options).mode(mode).json(path)
