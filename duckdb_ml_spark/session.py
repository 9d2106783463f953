"""SparkSession construction tuned for this engine.

Defaults target the test rig (local[$SPARK_GRAFT_CPUS], 128 GiB, single JVM) but
every setting is chosen to also be the right default on a large cluster:

- AQE on (runtime re-planning, skew-join splitting, partition coalescing);
- Arrow on (pandas_udf / mapInPandas hot paths are Arrow-batched);
- shuffle partitions sized for the local rig via env, overridable per-cluster;
- UTC session timezone so timestamp semantics match naive-UTC parquet and the
  DuckDB oracle regardless of host timezone.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(app_name: str = "duckdb_ml_spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults applied."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


_SHIPPED_CONTEXTS: set[int] = set()


def ensure_shipped(spark: SparkSession) -> None:
    """Make `duckdb_ml_spark` importable on executor Python workers regardless
    of the driver's cwd/PYTHONPATH.

    Workers resolve imports from their own sys.path; when the harness launches
    with a cwd outside the repo, closure-pickled references to this package
    (pandas_udf/mapInPandas kernels) would raise ModuleNotFoundError at task
    time. Shipping a package zip via addPyFile fixes that through Spark's own
    file-distribution channel — the same mechanism a real cluster deploy uses.
    Idempotent per SparkContext; zip is rebuilt only when missing."""
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED_CONTEXTS:
        return
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(pkg_dir)
    zip_path = os.path.join(repo, ".tmp", "duckdb_ml_spark.zip")
    os.makedirs(os.path.dirname(zip_path), exist_ok=True)
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    zf.write(full, os.path.relpath(full, repo))
    sc.addPyFile(zip_path)
    _SHIPPED_CONTEXTS.add(key)


def apply_session_defaults(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine defaults to an externally-created session.

    The driver harness constructs its own SparkSession; only conf keys that are
    runtime-mutable are set here (timezone matters for timestamp queries vs the
    naive-UTC DuckDB oracle).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    except Exception:
        pass  # static conf on some builds; harmless
    return spark
