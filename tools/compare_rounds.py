"""Longitudinal per-query bench comparison across rounds.

Joins every parseable BENCH_r*.json (plus BENCH_SELF/BENCH_REF)
through the rename ledger (RENAMES.json via renames.resolve), so a
query's full timing lineage survives the r3/r4 rename waves.  Prints
one row per current registry query with its per-round times and the
ratio of the newest time to the best-known reference, flagging
anything over the retry-policy bar (max(2x, +0.5s)).

Usage: python tools/compare_rounds.py [--flag-only]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from newspapers_etl_spark.registry import all_queries  # noqa: E402
from newspapers_etl_spark.renames import resolve  # noqa: E402


def _load_capture(path: Path) -> dict[str, float] | None:
    try:
        doc = json.loads(path.read_text())
    except (json.JSONDecodeError, OSError):
        return None  # truncated stdout tails (BENCH_r02) are known-bad
    # Driver-recorded BENCH_r*.json wraps the bench line: the timing map
    # is under parsed.queries, or must be recovered from the raw stdout
    # tail when the driver's own parse came back null.
    if isinstance(doc, dict) and "tail" in doc:
        parsed = doc.get("parsed")
        if isinstance(parsed, dict) and isinstance(parsed.get("queries"), dict):
            doc = parsed
        else:
            tail = doc.get("tail") or ""
            start = tail.find('{"metric"')
            if start < 0:
                return None
            try:
                doc = json.loads(tail[start:].splitlines()[0])
            except json.JSONDecodeError:
                return None
    queries = (doc or {}).get("queries")
    if not isinstance(queries, dict):
        return None
    out: dict[str, float] = {}
    for k, v in queries.items():
        cur = resolve(k)
        # keep the per-round minimum if two old names map to one query
        if isinstance(v, (int, float)) and (cur not in out or v < out[cur]):
            out[cur] = float(v)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--flag-only", action="store_true")
    args = ap.parse_args()

    rounds: list[tuple[str, dict[str, float]]] = []
    # numeric round order (r9 < r10 < r100); zero-padding makes the
    # lexicographic sort coincide today but don't rely on it
    bench_files = [
        p for p in REPO.glob("BENCH_r*.json")
        if p.stem[len("BENCH_r"):].isdigit()  # skip letter-suffixed side artifacts
    ]
    for f in sorted(bench_files, key=lambda p: int(p.stem[len("BENCH_r"):])):
        cap = _load_capture(f)
        if cap:
            rounds.append((f.stem.replace("BENCH_", ""), cap))
    self_cap = _load_capture(REPO / "BENCH_SELF.json")
    if self_cap:
        rounds.append(("self", self_cap))
    ref = {
        resolve(k): float(v)
        for k, v in json.loads((REPO / "BENCH_REF.json").read_text()).items()
    }

    names = sorted(all_queries())
    cols = [r for r, _ in rounds]
    header = f"{'query':<14}" + "".join(f"{c:>8}" for c in cols) + f"{'ref':>8}{'x':>6}"
    print(header)
    flagged = 0
    for n in names:
        latest = self_cap.get(n) if self_cap else None
        best = ref.get(n)
        ratio = (latest / best) if latest and best else None
        over = (
            latest is not None
            and best is not None
            and latest > max(2.0 * best, best + 0.5)
        )
        flagged += bool(over)
        if args.flag_only and not over:
            continue
        cells = "".join(
            f"{cap.get(n, float('nan')):>8.2f}" if n in cap else f"{'-':>8}"
            for _r, cap in rounds
        )
        mark = " <-- over bar" if over else ""
        rx = f"{ratio:>6.2f}" if ratio is not None else f"{'-':>6}"
        print(f"{n:<14}{cells}{best if best else float('nan'):>8.2f}{rx}{mark}")
    print(f"\n{len(names)} queries, {flagged} over the retry-policy bar")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
