"""Driver-check freshness invariant (VERDICT r11 item 2).

tools/check_ledger.py derives, from the committed CORRECTNESS_r*.json files
and git history, which registered queries are STALE — their registering
module was committed to after their last driver-green round, so the driver
has never hashed the current plan. This test pins the freshness contract:

  every stale query is either inside the declared driver window
  (the first 50 registry entries, i.e. _CHECK_PRIORITY) or explicitly
  declared in __spark_entry__._WINDOW_CARRYOVER (the committed rotation
  plan for the rounds after next).

So a plan-touching commit can never silently leave a query unchecked — it
either fits the next window or the carryover declaration must be updated in
the same change, which the judge and the ledger (CHECKLEDGER.md) both see.

No SparkSession needed: the ledger only imports registries, reads JSON, and
runs `git log` — a few seconds.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))


def _ledger():
    import check_ledger

    return check_ledger.build_ledger()


def test_every_stale_query_is_windowed_or_carried():
    import __spark_entry__ as entrymod

    ledger = _ledger()
    window = set(ledger["window"])
    carry = set(entrymod._WINDOW_CARRYOVER)
    stale = {r["query"] for r in ledger["rows"] if r["stale"]}
    orphans = stale - window - carry
    assert not orphans, (
        f"{len(orphans)} stale queries neither in the driver window nor "
        f"declared in _WINDOW_CARRYOVER: {sorted(orphans)} — add them to the "
        "next window or the carryover rotation in __spark_entry__.py"
    )


def test_carryover_names_are_registered():
    import __spark_entry__ as entrymod

    names = set(entrymod._all_query_specs())
    unknown = set(entrymod._WINDOW_CARRYOVER) - names
    assert not unknown, f"carryover lists unregistered queries: {sorted(unknown)}"


def test_window_priority_names_are_registered():
    import __spark_entry__ as entrymod

    names = set(entrymod._all_query_specs())
    unknown = set(entrymod._CHECK_PRIORITY) - names
    assert not unknown, f"_CHECK_PRIORITY lists unregistered queries: {sorted(unknown)}"
    # the window must actually fill the driver's 50 slots with priority rows
    assert len(entrymod._CHECK_PRIORITY) == 50


def test_checkledger_md_exists():
    assert (REPO / "CHECKLEDGER.md").exists(), (
        "run tools/check_ledger.py and commit CHECKLEDGER.md"
    )
