#!/usr/bin/env python
"""Regenerate BASELINE.md's operative table from a committed PAIRED run.

Usage: python tools/gen_baseline.py bench/BENCH_PAIRED_r3.json bench/DUCK_PAIRED_r3.json

The two inputs must come from the same idle host window, run back-to-back:
    python bench.py > bench/BENCH_PAIRED_rN.json
    python tools/duck_bench.py > bench/DUCK_PAIRED_rN.json
This prints ONLY the markdown table + aggregate line (stdout); splice into
BASELINE.md under the operative-baseline heading.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    bench_path, duck_path = sys.argv[1], sys.argv[2]
    b = json.load(open(bench_path))
    d = json.load(open(duck_path))
    bq, dq = b["queries"], d["queries"]
    lines = ["| query | duckdb sec @ sf0.1 | spark sec @ sf0.1 | ratio |", "|---|---|---|---|"]
    bs = ds = 0.0
    n_shared = 0
    for name, sv in bq.items():
        dv = dq.get(name)
        if dv is not None and dv >= 0 and sv >= 0:
            bs += sv
            ds += dv
            n_shared += 1
            ratio = sv / dv if dv > 0 else float("inf")
            lines.append(f"| {name} | {dv:.3f} | {sv:.3f} | {ratio:.1f}× |")
        else:
            lines.append(f"| {name} | — (rows-only) | {sv:.3f} | — |")
    lines.append(
        f"| **total ({n_shared} oracle-shared)** | **{ds:.2f}** | **{bs:.2f}** | "
        f"**{bs / ds:.2f}×** |"
    )
    print("\n".join(lines))
    return 0


if __name__ == "__main__":
    sys.exit(main())
