"""Dump ``explain("formatted")`` for a list of registered queries into
``plans/<tag>/<query>_<suffix>.txt`` — the judge-facing plan evidence
for OPTIMIZATION_r{N}.md.

Usage:
    python tools/dump_plans.py --tag r16 --suffix after q1 q2 ...
    (run from any checkout; --sf-dir defaults to sf0.01 — plan shape is
    scale-free, and the lifecycle queries execute their fixture walks
    while building the returned DataFrame, so the small SF keeps this
    cheap)

Also dumps the append-path merged-stats subplan under
``_merge_stats_<suffix>.txt`` when requested with --merge-stats: the
r16 exchange-count claim lives in a write job's plan, which the
returned DataFrame of the registered queries never shows.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--tag", default="r16")
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--merge-stats", action="store_true")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from newspapers_etl_spark import registry
    from newspapers_etl_spark.session import get_spark

    spark = get_spark("dump_plans")
    out = Path(_REPO) / "plans" / args.tag
    out.mkdir(parents=True, exist_ok=True)
    queries = registry.all_queries()
    for name in args.names:
        df = queries[name](spark, args.sf_dir)
        (out / f"{name}_{args.suffix}.txt").write_text(_formatted(df))
        print(f"[plans] {name}_{args.suffix}.txt")

    if args.merge_stats:
        from pyspark.sql import functions as F

        from newspapers_etl_spark.operators.ivf_maintenance import (
            _merge_cell_stats,
        )

        both = spark.createDataFrame(
            [(0, 2, [1.0, 2.0]), (0, 1, [0.5, 0.5]), (1, 3, [3.0, 1.0])],
            "cell int, n long, svec array<double>",
        ).repartition(2, "cell")
        (out / f"_merge_stats_{args.suffix}.txt").write_text(
            _formatted(_merge_cell_stats(both))
        )
        print(f"[plans] _merge_stats_{args.suffix}.txt")
    return 0


if __name__ == "__main__":
    sys.exit(main())
