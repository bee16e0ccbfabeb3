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
would silently drop queries from the min).  --merge also reports any
query whose merged minimum beats its BENCH_REF entry (fold those in
deliberately — BENCH_REF stays the all-time best-known).
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
    n = len(list(STASH_DIR.glob("capture_*.json")))
    dst = STASH_DIR / f"capture_{n + 1}.json"
    dst.write_text(json.dumps(snap, indent=1))
    print(f"[bench_min] stashed {dst.name}: {len(snap['queries'])} queries, "
          f"sum {snap['value']}s")
    return 0


def merge() -> int:
    captures = sorted(STASH_DIR.glob("capture_*.json"))
    if len(captures) < 2:
        print(f"[bench_min] need >= 2 stashed captures, found {len(captures)}",
              file=sys.stderr)
        return 1
    snaps = [json.loads(p.read_text()) for p in captures]
    keys = set(snaps[0]["queries"])
    for p, s in zip(captures, snaps):
        if set(s["queries"]) != keys:
            print(f"[bench_min] {p.name} covers a different query set — "
                  "all captures must span the full registry", file=sys.stderr)
            return 1
    merged = {
        q: min(s["queries"][q] for s in snaps if s["queries"][q] >= 0)
        if any(s["queries"][q] >= 0 for s in snaps)
        else -1.0
        for q in sorted(keys)
    }
    out = dict(snaps[-1])
    out["queries"] = merged
    out["value"] = round(sum(t for t in merged.values() if t >= 0), 3)
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
