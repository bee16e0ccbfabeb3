"""Driver-row union check: which registered queries still lack a green
driver correctness row, across every round so far.

The driver hashes only the first ~50 registered queries per round
(CORRECTNESS_r{N}.json), so full-registry coverage is a UNION across
rounds — with historical names chained through RENAMES.json (three
waves r3/r4/r6, wave 4 in r8).  This tool is the machine form of the
math both the rotation ledger (registry.py) and the judge's verdict
perform: it loads every CORRECTNESS_r0*.json, resolves each key to its
current registry name, classifies the row (hash-green / rows-only /
error), and reports

  * historical keys that resolve to nothing in the registry (a rename
    ledger bug — must be empty),
  * registered queries with NO green row in any round (these MUST lead
    the next window, or carry an explicit ledger note), and
  * the latest-green histogram (the staleness profile the next
    rotation should drain oldest-first).

Usage:
    python tools/union_check.py            # human report
    python tools/union_check.py --json     # one JSON line
"""

from __future__ import annotations

import argparse
import glob
import json
import sys
from collections import Counter
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    from newspapers_etl_spark import renames
    from newspapers_etl_spark.registry import all_queries

    reg = set(all_queries())
    unresolved: dict[str, list[tuple[str, str]]] = {}
    latest_green: dict[str, str] = {}
    errors: dict[str, list[str]] = {}
    for f in sorted(glob.glob(str(REPO / "CORRECTNESS_r0*.json"))):
        rnd = Path(f).stem[len("CORRECTNESS_"):]
        for key, row in json.load(open(f)).items():
            cur = renames.resolve(key)
            if cur not in reg:
                unresolved.setdefault(cur, []).append((rnd, key))
                continue
            green = (row.get("hash_match") is True) or (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
            )
            if green:
                latest_green[cur] = max(latest_green.get(cur, ""), rnd)
            elif row.get("err") not in (None, "no_oracle"):
                errors.setdefault(cur, []).append(rnd)
    never = sorted(reg - set(latest_green))
    hist = dict(sorted(Counter(latest_green.values()).items()))
    # an error row is only live if no LATER round is green for the query
    live_errors = {
        q: rs
        for q, rs in errors.items()
        if latest_green.get(q, "") < max(rs)
    }
    out = {
        "registered": len(reg),
        "unresolved_historical_keys": unresolved,
        "never_green": never,
        "live_errors": live_errors,
        "latest_green_histogram": hist,
    }
    if args.json:
        print(json.dumps(out, sort_keys=True))
    else:
        print(f"registered queries: {len(reg)}")
        print(f"unresolved historical keys (must be empty): {unresolved}")
        print(f"never green (must lead the next window or be ledgered): {never}")
        print(f"live errors (green never re-established): {live_errors}")
        print(f"latest-green histogram: {hist}")
    return 1 if unresolved or live_errors else 0


if __name__ == "__main__":
    sys.exit(main())
