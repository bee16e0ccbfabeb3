"""Driver-row union check: which registered queries still lack a green
driver correctness row, across every round so far.

The driver hashes only the first ~50 registered queries per round
(CORRECTNESS_r{N}.json), so full-registry coverage is a UNION across
rounds — with historical names chained through RENAMES.json (waves
r3/r4/r6/r8/r10/r10b/...).  This tool is the machine form of the math
both the rotation ledger (registry.py) and the judge's verdict
perform: it loads every CORRECTNESS_r*.json, resolves each key to its
current registry name, classifies the row (hash-green / rows-only /
error), and reports

  * historical keys that resolve to nothing in the registry (a rename
    ledger bug — must be empty),
  * registered queries with NO green row in any round (these MUST lead
    the next window, or carry an explicit ledger note), and
  * the latest-green histogram (the staleness profile the next
    rotation should drain oldest-first).

Round ordering is NUMERIC on the digits after the leading "r"
(r9 < r10 < r100): round 10 was the first two-digit round and the
original lexicographic max — plus a `CORRECTNESS_r0*.json` glob —
silently dropped it, making the final round-end gate lie.

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


def round_num(rnd: str) -> int:
    """Numeric round order for names like 'r06', 'r9', 'r10', 'r100'.
    Prefix slice, NOT lstrip (a character-set strip would also eat
    leading digits it happens to match in other alphabets of names)."""
    return int(rnd[1:] if rnd.startswith("r") else rnd)


def correctness_files(repo_dir) -> list[str]:
    """Driver correctness artifacts, skipping letter-suffixed side
    files (e.g. a CORRECTNESS_r11b scratch copy) — same filter as
    tools/compare_rounds.py; round_num() would raise on them and
    crash the round-end gate instead of ignoring them."""
    return [
        f
        for f in glob.glob(str(Path(repo_dir) / "CORRECTNESS_r*.json"))
        if Path(f).stem[len("CORRECTNESS_r"):].isdigit()
    ]


def compute_union(files, registered, resolve):
    """Union the driver correctness rows in ``files`` over the current
    ``registered`` query names, chaining historical keys through
    ``resolve``.  Returns the report dict.  Pure so tests can feed
    synthetic CORRECTNESS files (incl. two/three-digit rounds)."""
    reg = set(registered)
    unresolved: dict[str, list[tuple[str, str]]] = {}
    latest_green: dict[str, str] = {}
    errors: dict[str, list[str]] = {}
    for f in sorted(files, key=lambda p: round_num(Path(p).stem[len("CORRECTNESS_"):])):
        rnd = Path(f).stem[len("CORRECTNESS_"):]
        for key, row in json.load(open(f)).items():
            cur = resolve(key)
            if cur not in reg:
                unresolved.setdefault(cur, []).append((rnd, key))
                continue
            green = (row.get("hash_match") is True) or (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
            )
            if green:
                prev = latest_green.get(cur)
                if prev is None or round_num(rnd) > round_num(prev):
                    latest_green[cur] = rnd
            elif row.get("err") not in (None, "no_oracle"):
                errors.setdefault(cur, []).append(rnd)
    never = sorted(reg - set(latest_green))
    hist = dict(
        sorted(Counter(latest_green.values()).items(), key=lambda kv: round_num(kv[0]))
    )
    # an error row is only live if no LATER round is green for the query
    live_errors = {
        q: rs
        for q, rs in errors.items()
        if q not in latest_green
        or round_num(latest_green[q]) < max(round_num(r) for r in rs)
    }
    return {
        "registered": len(reg),
        "unresolved_historical_keys": unresolved,
        "never_green": never,
        "live_errors": live_errors,
        "latest_green_histogram": hist,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    from newspapers_etl_spark import renames
    from newspapers_etl_spark.registry import all_queries

    files = correctness_files(REPO)
    out = compute_union(files, all_queries(), renames.resolve)
    if args.json:
        print(json.dumps(out, sort_keys=True))
    else:
        print(f"rounds read: {len(files)}")
        print(f"registered queries: {out['registered']}")
        print(f"unresolved historical keys (must be empty): {out['unresolved_historical_keys']}")
        print(f"never green (must lead the next window or be ledgered): {out['never_green']}")
        print(f"live errors (green never re-established): {out['live_errors']}")
        print(f"latest-green histogram: {out['latest_green_histogram']}")
    return 1 if out["unresolved_historical_keys"] or out["live_errors"] else 0


if __name__ == "__main__":
    sys.exit(main())
