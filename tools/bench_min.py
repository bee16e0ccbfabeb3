"""Min-merge bench captures into the committed BENCH_SELF.json.

The committed snapshot protocol (VERDICT r5 #6): the host shows ~16%
intermittent noise windows, so ONE integrated capture over-reports the
sum even when every query is individually inside the retry-policy bar.
The committed BENCH_SELF is therefore the PER-QUERY MINIMUM across the
round's cold captures — each number something the current code actually
did, the sum no longer dominated by whichever queries ran inside a
noise window.

Usage:
    python bench.py                      # capture 1 (writes BENCH_SELF.json)
    python tools/bench_min.py --stash    # stash it
    python bench.py                      # capture 2
    python tools/bench_min.py --stash
    python tools/bench_min.py --merge    # min-merge stashes -> BENCH_SELF.json

Every stashed capture must cover the full registry (a partial capture
would silently drop queries from the min).  --merge REFUSES when any
query failed (negative time) in any capture — an intermittent failure
must be fixed or re-captured, not masked by its best success — and
writes metric="wall_min_merged" so the committed number cannot be read
as a single-run wall time.  --merge also reports any query whose merged
minimum beats its BENCH_REF entry (fold those in deliberately —
BENCH_REF stays the all-time best-known).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
STASH_DIR = REPO / ".bench_captures"


def stash() -> int:
    src = REPO / "BENCH_SELF.json"
    snap = json.loads(src.read_text())
    STASH_DIR.mkdir(exist_ok=True)
    # max existing index + 1, NOT the file count: after a capture is
    # hand-deleted (e.g. a known-noisy one), a count-based name would
    # silently overwrite a surviving capture.
    taken = [
        int(p.stem.split("_")[1])
        for p in STASH_DIR.glob("capture_*.json")
        if p.stem.split("_")[1].isdigit()
    ]
    dst = STASH_DIR / f"capture_{max(taken, default=0) + 1}.json"
    dst.write_text(json.dumps(snap, indent=1))
    print(f"[bench_min] stashed {dst.name}: {len(snap['queries'])} queries, "
          f"sum {snap['value']}s")
    return 0


def _registry_names() -> set[str]:
    sys.path.insert(0, str(REPO))
    from newspapers_etl_spark.registry import all_queries

    return set(all_queries())


def merge() -> int:
    captures = sorted(STASH_DIR.glob("capture_*.json"))
    if len(captures) < 2:
        print(f"[bench_min] need >= 2 stashed captures, found {len(captures)}",
              file=sys.stderr)
        return 1
    snaps = [json.loads(p.read_text()) for p in captures]
    # Every capture must span the CURRENT registry — captures taken
    # before a registration (or after a removal) have mutually-equal
    # key sets, so comparing them only against each other cannot catch
    # a stale set; the registry is the authority.
    keys = _registry_names()
    for p, s in zip(captures, snaps):
        if set(s["queries"]) != keys:
            missing = sorted(keys - set(s["queries"]))[:5]
            extra = sorted(set(s["queries"]) - keys)[:5]
            print(f"[bench_min] {p.name} does not span the current registry "
                  f"(missing {missing}, stale {extra}) — re-capture",
                  file=sys.stderr)
            return 1
    # A query that failed (negative time) in ANY capture is intermittent:
    # committing its best success would mask the flake behind a number no
    # honest single run achieved.  Refuse the merge outright — fix or
    # re-capture first (ADVICE r6 #1).
    flaky = sorted(
        q for q in keys if any(s["queries"][q] < 0 for s in snaps)
    )
    if flaky:
        per = {
            q: [s["queries"][q] for s in snaps] for q in flaky
        }
        print(f"[bench_min] refusing merge: {len(flaky)} queries failed in "
              f"at least one capture (times per capture): {per}",
              file=sys.stderr)
        return 1
    merged = {
        q: min(s["queries"][q] for s in snaps) for q in sorted(keys)
    }
    out = dict(snaps[-1])
    # Not a single-run wall time: each entry is the per-query minimum
    # across captures_merged cold runs, and the sum is synthetic.
    out["metric"] = "wall_min_merged"
    out["queries"] = merged
    out["value"] = round(sum(merged.values()), 3)
    out["captures_merged"] = len(snaps)
    (REPO / "BENCH_SELF.json").write_text(json.dumps(out, indent=1))
    print(f"[bench_min] merged {len(snaps)} captures -> BENCH_SELF.json: "
          f"sum {out['value']}s over {len(merged)} queries")
    ref = json.loads((REPO / "BENCH_REF.json").read_text())
    better = {
        q: (t, ref[q]) for q, t in merged.items()
        if q in ref and 0 <= t < ref[q]
    }
    if better:
        print(f"[bench_min] {len(better)} new best-known minima (fold into "
              f"BENCH_REF deliberately): "
              f"{ {q: f'{t}<{r}' for q, (t, r) in sorted(better.items())} }")
    # Consume the captures: the stash dir survives rounds (gitignored),
    # and a leftover capture from an earlier round's code would
    # min-fold numbers the CURRENT code never achieved into a future
    # merge — exactly the masking the protocol exists to prevent.
    for p in captures:
        p.unlink()
    print(f"[bench_min] consumed {len(captures)} captures (stash cleared)")
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    g = ap.add_mutually_exclusive_group(required=True)
    g.add_argument("--stash", action="store_true")
    g.add_argument("--merge", action="store_true")
    args = ap.parse_args()
    return stash() if args.stash else merge()


if __name__ == "__main__":
    sys.exit(main())
