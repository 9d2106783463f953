"""Every relational QuerySpec must hash-match its DuckDB oracle (driver t2 contract)."""

from __future__ import annotations

import pytest

from duckdb_ml_spark.plans.relational import RELATIONAL_QUERIES
from duckdb_ml_spark.testing import compare_to_oracle


@pytest.mark.parametrize("name", sorted(RELATIONAL_QUERIES))
def test_relational_query_matches_oracle(name, spark, sf_dir, oracle_con):
    spec = RELATIONAL_QUERIES[name]
    df = spec.builder(spark, sf_dir)
    if spec.oracle is None:
        assert df.count() >= 0
        return
    report = compare_to_oracle(df, spec.oracle, oracle_con)
    assert report["match"], report


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_queries_oracle_keys_subset():
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 19
