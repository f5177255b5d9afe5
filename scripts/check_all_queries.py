#!/usr/bin/env python3
"""Replicate the driver's correctness gate across EVERY registered query
(the driver itself checks only the first 50 per round): run each
queries() entry at sf0.01 and compare rows/schema/value-hash against its
oracle_sql() via the shared DuckDB harness. Use after refactors that
touch SHARED helpers — the per-query source-hash binding in
operators/__init__.py cannot detect a shared-helper change breaking a
query whose own source is untouched.

Usage: python scripts/check_all_queries.py [sf_dir] [--only substr,...]
(~10 min at sf0.01 for the full registry). --only filters query names by
case-insensitive substring match (comma-separated, any-of) for quick
targeted re-checks after touching one family — the FULL sweep remains
the per-round record; an --only run never substitutes for it.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from distributed_video_analytics_flink_spark.session import get_spark  # noqa: E402
from oracle_harness import duck_connection, compare  # noqa: E402

import __spark_entry__ as E  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    only: list[str] = []
    if "--only" in args:
        i = args.index("--only")
        if i + 1 >= len(args):  # ADVICE r16: trailing --only raised IndexError
            print("usage: check_all_queries.py [sf_dir] --only substr[,substr...]")
            return 2
        only = [t.strip().lower() for t in args[i + 1].split(",") if t.strip()]
        del args[i : i + 2]
    sf = args[0] if args else "/root/testdata/sf0.01"
    spark = get_spark()
    con = duck_connection(sf)
    qs, osql = E.queries(), E.oracle_sql()
    if only:
        qs = {n: f for n, f in qs.items() if any(t in n.lower() for t in only)}
        print(f"--only {','.join(only)}: {len(qs)} of {len(E.queries())} queries")
    bad = []
    for i, name in enumerate(qs):
        try:
            df = qs[name](spark, sf)
            if name in osql:
                r = compare(df, con, osql[name])
                ok = r["rowcount_match"] and r["schema_match"] and r["hash_match"]
            else:  # rows-only check, matching the driver's no_oracle path
                ok = df.count() >= 0
                r = {"rows_only": True}
            if not ok:
                bad.append((name, r))
            print(f"{i + 1:3d} " + ("OK  " if ok else "BAD ") + name, flush=True)
        except Exception as e:  # noqa: BLE001 — a crash IS the finding
            bad.append((name, str(e)[:200]))
            print(f"{i + 1:3d} ERR {name} {str(e)[:120]}", flush=True)
    print("---")
    print("FAILURES:", json.dumps(bad, default=str) if bad else "none")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
