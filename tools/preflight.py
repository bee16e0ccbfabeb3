"""One-command pre-commit gate for a build round.

Chains the checks every round needs before committing operator work,
in cheap-to-expensive order, and exits nonzero on the first failure:

1. Registry sanity — imports every module, window position report.
2. Meta tests — bench format/freshness, registry order, renames,
   QUERIES.md index (pytest, seconds).
3. Targeted oracle sweep — ONLY the queries whose defining modules
   changed vs ``--since`` (default HEAD), so the feedback loop stays
   proportional to the change, plus anything named in ``--also``.

Usage:
    python tools/preflight.py                  # changed vs HEAD
    python tools/preflight.py --since HEAD~3   # changed in last 3 commits
    python tools/preflight.py --full           # sweep everything

For broader per-change coverage run the FAST pytest tier alongside
(`python -m pytest tests/ -q -m "not heavy"`, <8 min — every
oracle-parity and plan-shape test); the full tier including the
`heavy` batteries runs at round end (see pytest.ini).
"""

from __future__ import annotations

import argparse
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

META_TESTS = [
    "tests/test_bench_format.py",
    "tests/test_sql_entrypoint.py",
    "tests/test_renames.py",
]


def _changed_modules(since: str) -> set[str]:
    diff = subprocess.run(
        ["git", "diff", "--name-only", since, "--", "newspapers_etl_spark"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout.split()
    status = subprocess.run(
        ["git", "status", "--porcelain", "--", "newspapers_etl_spark"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout.splitlines()
    files = set(diff) | {line[3:] for line in status if line}
    return {
        f.removesuffix(".py").replace("/", ".")
        for f in files
        if f.endswith(".py")
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--since", default="HEAD")
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--also", nargs="*", default=[])
    args = ap.parse_args()

    # 1. registry sanity + window report
    from newspapers_etl_spark.registry import QUERIES, all_queries

    names = list(all_queries())
    print(f"[preflight] registry: {len(names)} queries; window ends at "
          f"{names[49] if len(names) >= 50 else names[-1]!r}")

    # 2. meta tests
    rc = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", *META_TESTS], cwd=REPO
    ).returncode
    if rc:
        print("[preflight] META TESTS FAILED", file=sys.stderr)
        return rc

    # 3. targeted sweep
    if args.full:
        targets = names
    else:
        changed = _changed_modules(args.since)
        targets = sorted(
            {
                name
                for name, fn in QUERIES.items()
                if fn.__module__ in changed
            }
            | set(args.also)
        )
    if not targets:
        print("[preflight] no changed queries to sweep — done")
        return 0
    print(f"[preflight] sweeping {len(targets)} queries: {targets}")
    return subprocess.run(
        [sys.executable, "tools/oracle_sweep.py", "--only", *targets],
        cwd=REPO,
    ).returncode


if __name__ == "__main__":
    sys.exit(main())
