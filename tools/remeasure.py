"""Dedicated per-query re-measurement — the "agg_cdist protocol"
(BASELINE.md round-7 notes) as a reusable tool instead of an ad-hoc
snippet: N sequential cold-cache runs of each named query at a given
fixture dir, in ONE warmed session, printing every run plus the
minimum vs the committed best-known (BENCH_REF.json).

The integrated bench (bench.py) measures each query ONCE per capture
inside a 155-query pass, so a query that happens to run inside one of
the host's intermittent noise windows over-reports; this tool answers
the follow-up question the noise-retry policy mandates before any
re-baseline: does the committed minimum still reproduce on an idle
host?  Six runs is the documented protocol (first run carries
codegen).

Usage:
    python tools/remeasure.py acdst lgcf lshst lshtk ivfrb
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_RUNS=6 \
        python tools/remeasure.py <names...>

Prints one JSON line per query:
    {"query": ..., "runs": [...], "min": ..., "ref": ..., "verdict": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    if not names:
        print(__doc__, file=sys.stderr)
        return 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_RUNS", "6"))

    from newspapers_etl_spark import registry
    from newspapers_etl_spark.session import get_spark

    queries = registry.all_queries()
    unknown = [n for n in names if n not in queries]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2
    try:
        ref = json.loads((REPO / "BENCH_REF.json").read_text())
    except OSError:
        ref = {}

    spark = get_spark("newspapers_etl_spark_remeasure")
    # Same warmup as bench.py: codegen + session paths off the clock.
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    for name in names:
        times: list[float] = []
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        best = ref.get(name)
        mn = min(times)
        verdict = (
            "no-ref"
            if best is None
            else "reproduces"
            if mn <= max(2.0 * best, best + 0.5)
            else "regressed"
        )
        print(
            json.dumps(
                {
                    "query": name,
                    "sf_dir": sf_dir,
                    "runs": times,
                    "min": mn,
                    "ref": best,
                    "verdict": verdict,
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
