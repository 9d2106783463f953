"""Pytest gate for the two retired r10 canaries (VERDICT r11 item 7).

`canary_events_ts_sum` and `canary_null_bool` were registry entries from the
r10 bisection era; both went driver-green (r10/r11) and their diagnostic job
is done, so r12 retires them from the registry. The axes they pin — events
content reaching both engines identically, NULL BIGINT and BOOLEAN hash
normalization — stay enforced here, through the SAME compare_to_oracle path
the local gate replica (tools/oracle_check.py) uses.
"""

from __future__ import annotations

import pytest


def _gate_specs():
    from duckdb_ml_spark.plans.bisect import GATE_SPECS

    return [pytest.param(spec, id=name) for name, spec in GATE_SPECS.items()]


@pytest.mark.parametrize("spec", _gate_specs())
def test_retired_canary_still_matches_oracle(spark, sf_dir, oracle_con, spec):
    from duckdb_ml_spark.testing import compare_to_oracle

    df = spec.builder(spark, sf_dir)
    report = compare_to_oracle(df, spec.oracle, oracle_con, name=spec.name)
    assert report["match"], f"{spec.name}: {report}"


def test_retired_canaries_not_registered():
    import __spark_entry__ as entrymod

    names = set(entrymod.queries())
    assert "canary_events_ts_sum" not in names
    assert "canary_null_bool" not in names


def test_plan_cache_resets_on_session_change(spark):
    """VERDICT r13 nit: the queries() plan cache keyed on id(spark) must not
    accumulate entries for dead sessions — a new session id resets it."""
    import __spark_entry__ as entrymod

    entrymod._PLAN_CACHE.clear()
    entrymod._PLAN_CACHE_SESSION[0] = None
    qs = entrymod.queries()
    qs["range_ids"](spark, "/root/testdata/sf0.001")
    n1 = len(entrymod._PLAN_CACHE)
    assert n1 >= 1 and entrymod._PLAN_CACHE_SESSION[0] == id(spark)

    class _Fake:  # a different session identity; builder never executes it
        pass

    fake = _Fake()
    try:
        qs["range_ids"](fake, "/root/testdata/sf0.001")
    except Exception:
        pass  # the builder will choke on the fake session — irrelevant here
    assert entrymod._PLAN_CACHE_SESSION[0] == id(fake)
    # the real-session entries are GONE (no cross-session growth)
    assert all(k[0] == id(fake) for k in entrymod._PLAN_CACHE)
    entrymod._PLAN_CACHE.clear()
    entrymod._PLAN_CACHE_SESSION[0] = None
