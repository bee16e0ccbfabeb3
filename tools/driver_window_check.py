"""Simulate the driver's correctness gate ORDERING: run registered
queries in REGISTRATION order in one SparkSession via toPandas — the
exact sequence CORRECTNESS_r{N}.json executes.

The alphabetical oracle sweep (tools/oracle_sweep.py) verifies VALUES;
this tool verifies the SEQUENCE: a sequence-dependent failure (r7 found
one — AQE re-optimization binding a computed join key against a
broadcast LocalRelation, triggered only when another query ran first)
is invisible to any other ordering.  No oracle compare here — crash
coverage only, cache deliberately NOT cleared between queries (the
driver doesn't clear either).

Usage:
    python tools/driver_window_check.py            # first 50 (the window)
    python tools/driver_window_check.py --all      # whole registry
    python tools/driver_window_check.py --sf-dir /root/testdata/sf0.001
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from newspapers_etl_spark.registry import all_queries  # noqa: E402
from newspapers_etl_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--window", type=int, default=50)
    args = ap.parse_args()

    spark = get_spark("driver_window_check")
    queries = all_queries()
    names = list(queries) if args.all else list(queries)[: args.window]
    failed: list[str] = []
    for i, name in enumerate(names):
        t0 = time.perf_counter()
        try:
            rows = len(queries[name](spark, args.sf_dir).toPandas())
            detail = f"rows={rows}"
        except Exception as e:  # a crash is the finding
            failed.append(f"{name}: {type(e).__name__}: {e}"[:200])
            detail = f"ERROR {type(e).__name__}"
        print(
            f"[window] {i:3d} {name}: {detail} "
            f"({time.perf_counter() - t0:.2f}s)",
            file=sys.stderr,
        )
    print(json.dumps({"checked": len(names), "failed": failed}))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
