"""Summarize a tools/scale_curve.py run into the BASELINE.md table.

Reads the curve's JSON lines (one per (op, factor)) from a file or
stdin and prints the markdown table BASELINE.md commits: one row per
op, one column per factor, plus the max/min factor ratio that the
flat-vs-growing reading rests on.

Usage:
    python tools/scale_curve.py | tee curve.jsonl
    python tools/scale_report.py curve.jsonl
    # or: python tools/scale_report.py < curve.jsonl
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    src = open(sys.argv[1]) if len(sys.argv) > 1 else sys.stdin
    rows: dict[str, dict[int, float]] = {}
    factors: list[int] = []
    for line in src:
        line = line.strip()
        if not line or not line.startswith("{"):
            continue
        d = json.loads(line)
        rows.setdefault(d["op"], {})[d["factor"]] = d["sec"]
        if d["factor"] not in factors:
            factors.append(d["factor"])
    if not rows:
        print("[scale_report] no curve lines found", file=sys.stderr)
        return 1
    factors.sort()
    lo, hi = factors[0], factors[-1]
    head = " | ".join(f"×{f}" for f in factors)
    print(f"| step | {head} | ×{hi}/×{lo} |")
    print("|---|" + "---|" * (len(factors) + 1))
    for op, by_f in rows.items():  # insertion order = curve order
        cells = " | ".join(
            f"{by_f[f]:.2f}" if f in by_f else "—" for f in factors
        )
        ratio = (
            f"{by_f[hi] / by_f[lo]:.2f}"
            if lo in by_f and hi in by_f and by_f[lo] > 0
            else "—"
        )
        print(f"| {op} | {cells} | {ratio} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
