"""Guard the committed BENCH_SELF.json lineage (VERDICT r16 #6).

Every sf0.1 bench run — including the DRIVER's own capture — overwrites
the working-tree ``BENCH_SELF.json`` with a single-capture ``wall``
snapshot, clobbering the committed min-merged lineage; the restore has
been a manual per-round ritual for ~10 rounds (and in r16 the overwrite
even got committed).  This makes it mechanical:

    python tools/bench_guard.py --check     # exit 1 if the tree (or HEAD)
                                            # holds a single-capture 'wall'
                                            # snapshot over a min-merged
                                            # lineage
    python tools/bench_guard.py --restore   # restore BENCH_SELF.json from
                                            # the newest commit whose
                                            # snapshot is min-merged

Run ``--restore`` at round start and ``--check`` before committing
bench artifacts.  The rule: a ``wall`` metric must never replace a
``wall_min_merged`` file — min-merged snapshots only move through
``tools/bench_min.py --merge``.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
NAME = "BENCH_SELF.json"


def _metric(text: str | None) -> str | None:
    if not text:
        return None
    try:
        return json.loads(text).get("metric")
    except ValueError:
        return None


def _git_show(ref: str) -> str | None:
    try:
        return subprocess.run(
            ["git", "show", f"{ref}:{NAME}"],
            cwd=REPO, capture_output=True, text=True, check=True,
        ).stdout
    except subprocess.CalledProcessError:
        return None


def _lineage_has_min_merged() -> str | None:
    """The newest commit whose BENCH_SELF.json is min-merged."""
    revs = subprocess.run(
        ["git", "rev-list", "HEAD", "--", NAME],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.split()
    for rev in revs:
        if _metric(_git_show(rev)) == "wall_min_merged":
            return rev
    return None


def check() -> int:
    tree = _metric((REPO / NAME).read_text() if (REPO / NAME).exists() else None)
    if tree == "wall_min_merged":
        print("[bench_guard] OK: working tree holds the min-merged snapshot")
        return 0
    src = _lineage_has_min_merged()
    if src is None:
        print("[bench_guard] OK: no min-merged lineage to protect")
        return 0
    print(
        f"[bench_guard] VIOLATION: working-tree {NAME} is metric={tree!r} "
        f"but the lineage is min-merged (e.g. {src[:9]}) — a bench run "
        "overwrote the committed snapshot; run "
        "'python tools/bench_guard.py --restore' (or min-merge fresh "
        "captures via tools/bench_min.py) before committing",
        file=sys.stderr,
    )
    return 1


def restore() -> int:
    tree = _metric((REPO / NAME).read_text() if (REPO / NAME).exists() else None)
    if tree == "wall_min_merged":
        print("[bench_guard] nothing to do: tree snapshot is min-merged")
        return 0
    src = _lineage_has_min_merged()
    if src is None:
        print("[bench_guard] no min-merged snapshot anywhere in history",
              file=sys.stderr)
        return 1
    (REPO / NAME).write_text(_git_show(src))
    print(f"[bench_guard] restored {NAME} from {src[:9]} "
          f"(metric wall_min_merged)")
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    g = ap.add_mutually_exclusive_group(required=True)
    g.add_argument("--check", action="store_true")
    g.add_argument("--restore", action="store_true")
    args = ap.parse_args()
    return check() if args.check else restore()


if __name__ == "__main__":
    sys.exit(main())
