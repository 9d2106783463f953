"""Structured Streaming surface: event-time windowed aggregation, session
windows, and stateful per-key processing over the `events` stream table.

The reference (alamminsalo/duckdb-ml) has no streaming surface — this package
is part of the BASELINE.json north star (streams as first-class inputs). Every
operator is defined by its BATCH-equivalent DataFrame plan (Spark's unified
semantics: the same plan runs under readStream); `queries.py` exposes the batch
form for the DuckDB value-hash oracle, and tests/test_streaming.py runs the
same plans through readStream + availableNow triggers and asserts the results
match the batch answers exactly.
"""
