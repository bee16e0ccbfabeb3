#!/usr/bin/env python
"""Pre-flight for the driver's correctness gate: run EVERY registered
query with an oracle at a chosen SF (default sf0.01, the driver's
compare scale) side-by-side with its DuckDB oracle and report per-query
row-count / column / value-multiset matches.

Usage:
    python tools/oracle_sweep.py [--sf-dir /root/testdata/sf0.01] [--only name ...]

Exit code 1 if any oracle-backed query mismatches.  Rows-only queries
(no oracle entry) are executed for crash-coverage and reported as
``rows_only``.  Comparison semantics mirror tests/conftest.py's
normalize_rows (sorted columns, sorted row multiset, 6-dp float
rounding) which in turn mirrors the driver's value-hash.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
sys.path.insert(0, str(Path(_REPO) / "tests"))

import duckdb  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from conftest import normalize_rows  # noqa: E402
from newspapers_etl_spark.catalog import TABLES, table_path  # noqa: E402
from newspapers_etl_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    spark = get_spark("oracle_sweep")
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{table_path(args.sf_dir, name)}')"
        )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    names = args.only or sorted(queries)
    bad: list[str] = []
    for name in names:
        t0 = time.perf_counter()
        status = "ok"
        detail = ""
        try:
            sdf = queries[name](spark, args.sf_dir).toPandas()
            if name not in oracles:
                status = "rows_only"
                detail = f"spark_rows={len(sdf)}"
            else:
                odf = con.sql(oracles[name]).df()
                s_cols, s_rows = normalize_rows(
                    list(sdf.columns),
                    [tuple(r) for r in sdf.itertuples(index=False)],
                )
                o_cols, o_rows = normalize_rows(
                    list(odf.columns),
                    [tuple(r) for r in odf.itertuples(index=False)],
                )
                if s_cols != o_cols:
                    status = "COLS_MISMATCH"
                    detail = f"spark={s_cols} oracle={o_cols}"
                elif len(s_rows) != len(o_rows):
                    status = "ROWS_MISMATCH"
                    detail = f"spark={len(s_rows)} oracle={len(o_rows)}"
                elif s_rows != o_rows:
                    status = "VALUES_MISMATCH"
                    diff = [
                        (a, b) for a, b in zip(s_rows, o_rows) if a != b
                    ][:2]
                    detail = f"first diffs: {diff}"
                else:
                    detail = f"rows={len(s_rows)}"
        except Exception as e:  # a crash is a finding, not a sweep abort
            status = "ERROR"
            detail = f"{type(e).__name__}: {e}"[:300]
        sec = time.perf_counter() - t0
        # Release any query-internal persist() (jaccard/dd_spans/
        # sh_pairs/sh32) so a full sweep doesn't accumulate cached
        # relations across 130+ queries (ADVICE r6 #3; the documented
        # caller-owned release path, newspapers_etl_spark/cache.py).
        spark.catalog.clearCache()
        line = f"[sweep] {name}: {status} ({sec:.2f}s) {detail}"
        print(line, file=sys.stderr)
        if status not in ("ok", "rows_only"):
            bad.append(f"{name}: {status} {detail}")

    print(json.dumps({"checked": len(names), "failed": bad}))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
