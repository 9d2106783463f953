#!/usr/bin/env python
"""Dump `.explain("formatted")` for declared queries into plans/<tag>/.

Usage:
  python tools/explain_dump.py --tag r15 --suffix before [--only a,b,c]

Writes plans/<tag>/<query>_<suffix>.txt per query. Queries whose builders
EXECUTE work at build time (collects, file writes, training) still produce a
plan for the RETURNED DataFrame — the build-time work is annotated by a
header line so the reader knows the plan covers only the final relation.
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r15")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--only", default=None)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from duckdb_ml_spark.session import get_spark

    spark = get_spark("explain_dump")
    spark.sparkContext.setLogLevel("ERROR")

    out_dir = Path(__file__).resolve().parent.parent / "plans" / args.tag
    out_dir.mkdir(parents=True, exist_ok=True)

    qs = entrymod.queries()
    if args.only:
        keep = set(args.only.split(","))
        qs = {k: v for k, v in qs.items() if k in keep}

    specs = entrymod._all_query_specs()
    n_ok = 0
    for name, fn in qs.items():
        try:
            df = fn(spark, args.sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
        except Exception as e:
            print(f"explain: {name} FAILED: {str(e).splitlines()[0][:160]}", file=sys.stderr)
            continue
        hdr = [f"# query: {name}", f"# sf_dir: {args.sf_dir}"]
        if name in entrymod._EXEC_AT_BUILD:
            hdr.append("# note: builder executes work at build time; this plan covers the returned relation only")
        tags = getattr(specs.get(name), "tags", ()) or ()
        if tags:
            hdr.append(f"# tags: {','.join(tags)}")
        (out_dir / f"{name}_{args.suffix}.txt").write_text("\n".join(hdr) + "\n\n" + plan)
        n_ok += 1
    print(f"explain_dump: wrote {n_ok}/{len(qs)} plans to {out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
