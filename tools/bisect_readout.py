#!/usr/bin/env python
"""Interpret CORRECTNESS_r10's bisect/canary block (historical decoder).

Encodes the decision table from NOTES.md / plans/bisect.py@r10: given the
driver's CORRECTNESS_r{N}.json, prints per-red-query the localized column
set and the prescribed contract fix. Run:

    python tools/bisect_readout.py CORRECTNESS_r10.json

RESOLVED r11: the readout (tf RED + numden GREEN, counts RED + cents GREEN,
all-sessionize/scd2 RED) decoded to uncast DuckDB integer `sum()` columns —
HUGEINT under typed serialization vs Spark LONG. The probes are retired from
the registry; this tool remains to decode the archived r10 artifact. ADVICE
r10 low: value-contradictory patterns (a probe RED while an exact function
of the same values is GREEN) now flag the SERIALIZATION axis instead of
printing a single-axis value prescription — which is precisely the pattern
the real root cause produced.
"""

from __future__ import annotations

import json
import sys


def _state(d: dict, name: str) -> str:
    row = d.get(name)
    if row is None:
        return "ABSENT"
    if row.get("err"):
        return "ERR"
    if not row.get("rows_match"):
        return "ROWS-RED"
    return "GREEN" if row.get("hash_match") else "RED"


GROUPS = {
    "events_sessionize": [
        "bisect_sess_ids",
        "bisect_sess_start_mod",
        "bisect_sess_bounds",
    ],
    "events_scd2_intervals": [
        "bisect_scd2_nonnull",
        "bisect_scd2_validto_coalesce",
        "bisect_scd2_validto",
        "bisect_scd2_bool",
    ],
    "text_bm25_scores": [
        "bisect_bm25_dl",
        "bisect_bm25_tf",
        "bisect_bm25_numden",
        "bisect_bm25_score",
    ],
    "orders_winsorized_stats": [
        "bisect_wins_counts",
        "bisect_wins_means",
        "bisect_wins_bounds",
        "bisect_wins_bounds_cents",
        "bisect_wins_cents",
        "bisect_wins_mean_e4",
    ],
}

CANARIES = [
    "canary_ts_raw",
    "canary_ts_epoch_us",
    "canary_quantile_interp",
    "canary_decimal_literal",
    "canary_float_repr",
    "canary_events_ts_sum",
    "canary_null_bool",
]


def diagnose(d: dict) -> list[str]:
    out = []
    s = lambda n: _state(d, n)  # noqa: E731

    if s("canary_events_ts_sum") == "RED":
        out.append(
            "!! canary_events_ts_sum RED: events CONTENT differs between the"
            " engines in the driver env — not a query-contract problem."
            " Escalate: add per-column 1-row sum canaries before any fix."
        )
    if s("canary_null_bool") == "RED":
        out.append(
            "!! canary_null_bool RED: NULL/BOOLEAN normalization diverges —"
            " explains the SCD2 pair. Fix: emit valid_to_us coalesced to a"
            " sentinel + is_current::INT."
        )

    for orig, probes in GROUPS.items():
        states = {p: s(p) for p in probes}
        o = s(orig)
        if o == "ABSENT":
            continue
        out.append(f"{orig}: {o}; " + ", ".join(f"{p}={v}" for p, v in states.items()))
        reds = [p for p, v in states.items() if v == "RED"]
        greens = [p for p, v in states.items() if v == "GREEN"]
        if o == "GREEN":
            out.append("   -> original now GREEN: driver env moved or the r9 "
                       "contract was right; keep probes one more round, then retire.")
            continue
        if not reds and len(greens) == len(probes):
            out.append("   -> ALL bisects green but original red: the exact "
                       "column COMBINATION diverges — harness row-assembly "
                       "axis. Next: a 1-row sum-of-row-md5 canary over this "
                       "output on both engines.")
            continue
        if reds and len(reds) == len(probes):
            out.append("   -> ALL bisects red with driver-equal row counts: "
                       "no single column axis — suspect a type/serialization "
                       "property every probe shares with the original (e.g. "
                       "an uncast integer sum() → HUGEINT in the oracle); "
                       "DESCRIBE the oracle and compare result types, don't "
                       "re-engineer values.")
            continue
        if orig == "events_sessionize" and "bisect_sess_bounds" in reds and \
                states["bisect_sess_ids"] == "GREEN" and states["bisect_sess_start_mod"] == "GREEN":
            out.append("   -> large-magnitude BIGINT axis (epoch-µs > 1e15): "
                       "emit times as offsets from a fixed base (µs since "
                       "2024-01-01 ≤ 2.6e12) in both engines.")
        if orig == "events_scd2_intervals":
            if states["bisect_scd2_validto"] == "RED" and states["bisect_scd2_validto_coalesce"] == "GREEN":
                out.append("   -> NULL normalization: coalesce valid_to_us to "
                           "a sentinel in the contract.")
            if states["bisect_scd2_bool"] == "RED":
                out.append("   -> BOOLEAN normalization: emit is_current::INT.")
            if states["bisect_scd2_nonnull"] == "RED":
                out.append("   -> diverges already without NULL/BOOL: same "
                           "axis as sessionize (see its probes).")
        if orig == "text_bm25_scores":
            if states["bisect_bm25_score"] == "RED" and states["bisect_bm25_numden"] == "GREEN":
                out.append("   -> the derived double is the culprit: drop the "
                           "score column (rationals carry full info) or emit "
                           "round(1e9*score)::BIGINT.")
            if states["bisect_bm25_numden"] == "RED" and states["bisect_bm25_tf"] == "GREEN":
                out.append("   -> rational assembly diverges on identical tf/df: "
                           "suspect BIGINT-vs-HUGEINT product normalization; "
                           "probe num mod 2^30 next.")
            if states["bisect_bm25_tf"] == "RED" and states["bisect_bm25_numden"] == "GREEN":
                # num/den are exact functions of tf/df: if tf VALUES diverged,
                # num/den must too. tf-RED + numden-GREEN is value-contradictory
                # — the divergence is in how tf is TYPED/serialized, not what
                # it equals (the r10 real-world case: uncast sum() → HUGEINT).
                out.append("   -> INCONSISTENT readout: tf RED but num/den "
                           "(exact functions of tf/df) GREEN — values cannot "
                           "differ; suspect the tf column's oracle TYPE "
                           "(uncast sum() → HUGEINT) or the harness, not "
                           "tokenization.")
            elif states["bisect_bm25_dl"] == "RED" or states["bisect_bm25_tf"] == "RED":
                out.append("   -> tokenization itself diverges in the driver "
                           "oracle engine: pin the oracle tokenizer (compare "
                           "tokens_sql output vs Spark tokens on one doc).")
        if orig == "orders_winsorized_stats":
            if states["bisect_wins_means"] == "RED" and \
                    all(states[p] == "GREEN" for p in ("bisect_wins_cents", "bisect_wins_counts", "bisect_wins_bounds_cents")):
                out.append("   -> the float division/round(...,4) stage: switch "
                           "the contract to the _mean_e4 integer fixed-point "
                           "form (its green IS the fix preview).")
            if states["bisect_wins_bounds"] == "RED" and states["bisect_wins_bounds_cents"] == "GREEN":
                out.append("   -> bound VALUES agree, double normalization of "
                           "2-dp data differs: emit bounds as cents BIGINTs.")
            if states["bisect_wins_counts"] == "RED" and \
                    states["bisect_wins_means"] == "GREEN" and \
                    states["bisect_wins_bounds_cents"] == "GREEN":
                # mean_winsorized is an exact function of the counts and
                # bounds: counts-RED + means-GREEN is value-contradictory —
                # the counts' oracle TYPE diverges, not the bound compares.
                out.append("   -> INCONSISTENT readout: counts RED but means "
                           "(exact functions of the counts+bounds) and bounds "
                           "GREEN — values cannot differ; suspect the count "
                           "columns' oracle TYPE (uncast sum(CASE) → HUGEINT "
                           "vs the cents probe's count(*)::BIGINT).")
            elif states["bisect_wins_counts"] == "RED":
                out.append("   -> clip counts diverge -> the bounds themselves "
                           "differ: order-statistic position semantics in the "
                           "driver's DuckDB; compare bounds_cents row.")
    return out


def main() -> int:
    d = json.load(open(sys.argv[1]))
    print("canaries:", {c: _state(d, c) for c in CANARIES})
    for line in diagnose(d):
        print(line)
    return 0


if __name__ == "__main__":
    sys.exit(main())
