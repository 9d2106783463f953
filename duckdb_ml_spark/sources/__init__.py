"""Source connectors: CSV / JSONL / Parquet readers with schema inference.

The reference's only source is a header+inference CSV scan
(`/root/reference/test/sql/autompg.sql:12` — `FROM 'test/auto_mpg.csv'`);
Parquet is the driver-testdata path (tables.py). This package adds the
explicit reader surface plus ROUNDTRIP oracle queries: a table is exported to
the format under `.tmp/`, read back with inference, and value-hash compared to
the original parquet view — proving type fidelity of the connector, not just
"it parses".

Scale notes: all readers return plain `spark.read` DataFrames, so partition
discovery, predicate pushdown (Parquet), and parallel split reading (CSV/JSON
are splittable uncompressed) come from the source framework. Schema inference
is a separate pass over the data — production pipelines at 100 TB should pass
an explicit schema (every reader here accepts one) and keep inference for
interactive exploration.
"""

from duckdb_ml_spark.sources.readers import read_csv, read_jsonl, read_parquet  # noqa: F401
