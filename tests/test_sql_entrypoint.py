"""The second entry point (SURVEY.md §3.4): spark.sql over the
registered fixture views must agree with the DataFrame API, and
df.observe() must deliver streaming-safe metrics without a second scan
(§2.4 A3)."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from newspapers_etl_spark.catalog import load_table, register_views


def test_sql_over_registered_views_matches_dataframe_api(spark, sf_dir):
    register_views(spark, sf_dir)
    via_sql = spark.sql(
        """
        SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
        FROM orders GROUP BY o_orderstatus
        """
    ).collect()
    o = load_table(spark, sf_dir, "orders")
    via_df = (
        o.groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .collect()
    )
    assert sorted(map(tuple, via_sql)) == sorted(map(tuple, via_df))


def test_malformed_json_degrades_to_sentinel_not_failure(spark):
    """F16 resilience: from_json yields NULL for malformed documents and
    the sentinel default fills it (the reference's Unknown/Unknown_Date
    degradation, src/01-scrape-images.py:413-420) — one bad row never
    aborts the scan."""
    from newspapers_etl_spark.functions.extraction import with_sentinel

    rows = [
        (0, '{"k": 1}'),
        (1, "not json at all"),
        (2, '{"k": "type-mismatch"}'),
        (3, None),
        (4, '{"k": 4}'),
    ]
    df = spark.createDataFrame(rows, "id long, props string")
    k = F.from_json("props", "k INT").getField("k")
    out = df.select(
        "id", with_sentinel(k.cast("string"), "Unknown").alias("k")
    ).collect()
    got = {r.id: r.k for r in out}
    assert got[0] == "1" and got[4] == "4"
    assert got[1] == "Unknown" and got[2] == "Unknown" and got[3] == "Unknown"


def test_observe_collects_metrics_in_one_pass(spark, sf_dir):
    """observe() attaches aggregates to a plan without re-scanning —
    the replacement for the reference's len()-based progress logging
    (src/01-scrape-images.py:500,553) that also works under streaming."""
    obs = Observation("scan_metrics")
    o = load_table(spark, sf_dir, "orders").observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum("o_totalprice").alias("value_seen"),
    )
    kept = o.filter(F.col("o_orderstatus") == "O").count()
    got = obs.get
    assert got["rows_seen"] == load_table(spark, sf_dir, "orders").count()
    assert got["rows_seen"] >= kept
    assert got["value_seen"] > 0


def test_bench_stdout_line_fits_capture_window():
    """The driver keeps only the last 2000 chars of bench stdout and
    parses the JSON line from that window (BENCH_r02 lost its head at
    2470 chars).  Feed the LIVE registry's worst-case timings through
    bench.format_stdout_line: the emitted line must fit the window AND
    keep every query (precision degradation is fine — dropping to the
    queries_omitted regime is not; at that point names need shortening,
    see the BASELINE.md rename table)."""
    import json

    from bench import format_stdout_line
    from newspapers_etl_spark.registry import all_queries

    names = sorted(all_queries())
    # Realistic worst case: every query at single-digit seconds ("9.99"
    # = 4 chars — true of all committed BENCH_REF values bar a handful
    # under 21s).  The full map must fit WITHOUT precision loss.  At 92
    # queries the real 2-decimal line runs ~1938/1990 chars: ~2 more
    # registrations of headroom at 2 decimals, ~8 in the 1-decimal
    # band — shorten names (BASELINE.md rename table) past that.
    timings = {n: 9.99 for n in names}
    result = {
        "metric": "wall",
        "value": 9999.999,
        "unit": "sec",
        "queries": timings,
        "sf": 0.01,
    }
    line = format_stdout_line(result, timings, cap=1990)
    assert len(line) < 1990
    parsed = json.loads(line)
    assert set(parsed["queries"]) == set(timings), (
        "bench line overflow forced query omission: shorten query names "
        "(see BASELINE.md rename table) before registering more"
    )
    # Catastrophic case (every query at the 150s watchdog cap, "150.0"
    # = 5 chars each): omission is acceptable, a parseable line is not
    # negotiable.
    worst = {n: 150.0 for n in names}
    wline = format_stdout_line(dict(result, queries=worst), worst, cap=1990)
    assert len(wline) < 1990
    json.loads(wline)


def test_registry_registration_order_is_contiguous_per_module():
    """The driver's correctness window is the FIRST ~50 registered
    queries, so rotation only works if each module's queries register
    contiguously.  A module imported transitively DURING another
    module's registration splices its queries into the wrong slot
    (this happened in r4: stream_sessions' decorator imported
    events_windows, injecting 6 events_* queries into the streaming
    slot and pushing the round's new queries out of the window).

    Checked in a FRESH interpreter: inside pytest, collection imports
    operator modules in test-file order, which scrambles registration
    order for this process — the driver imports __spark_entry__ into a
    clean process, and that is the order that matters."""
    import json
    import subprocess
    import sys
    from pathlib import Path

    code = (
        "import json\n"
        "from newspapers_etl_spark import registry\n"
        "qs = registry.all_queries()\n"
        "print(json.dumps([[n, qs[n].__module__] for n in qs]))\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=str(Path(__file__).resolve().parent.parent),
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    pairs = json.loads(proc.stdout.strip().splitlines()[-1])
    names = [n for n, _ in pairs]
    mods = [m for _, m in pairs]
    seen: set[str] = set()
    prev = None
    block_order: list[str] = []
    for m in mods:
        if m != prev:
            assert m not in seen, (
                f"{m} registers non-contiguously — a transitive import "
                "during another module's registration is splicing it"
            )
            seen.add(m)
            block_order.append(m)
            prev = m
    # Contiguity alone misses a WHOLE-module splice: a top-level import
    # of a later operator module registers that module's entire block
    # early, contiguous but in the wrong slot (scd_stream importing
    # operators.scd did exactly this — 3 scd queries landed at the
    # streaming position).  The realized module order must match the
    # declared _OPERATOR_MODULES order exactly.
    from newspapers_etl_spark.registry import _OPERATOR_MODULES

    declared = [m for m in _OPERATOR_MODULES if m in set(block_order)]
    assert block_order == declared, (
        "module registration order diverges from _OPERATOR_MODULES — "
        f"realized {block_order} vs declared {declared}; a top-level "
        "cross-module operator import is splicing a whole block"
    )
    # And the r15 window design holds (rotation ledger in registry.py):
    # the six r14 post-window registrations get their FIRST driver rows
    # at slots 7-12 behind the six queries whose modules they top-level-
    # import (ivfapp/bm25/ivfdel/bm25d/ivfup/bm25u at slots 1-6 —
    # the import price), then the AMENDED dedup block (nine r10-stale
    # rows + ddex) at slots 13-22, the r12-hashed stale families at
    # 23-48, and diagnostics/url_ops closing the window (urlcn at 50
    # exactly, no straddle).
    window = set(names[:50])
    for required in (
        # the only queries with no driver hash row in the r1-r14 union
        "stdel", "bmpol", "ivfpit", "bmpit", "stbdl", "stbup",
        # import price: their modules must precede the newcomers
        "ivfapp", "bm25", "ivfdel", "bm25d", "ivfup", "bm25u",
        # the amended dedup block: nine r10-stale rows (oldest union
        # history) + ddex riding its module
        "ddex", "jacc", "ddspn", "lshst", "lshver", "ddemb",
        "shprs", "shbkts", "decon", "cccl",
        # the r12-hashed stale families
        "dremb", "bftk", "cents", "lshtk", "ivftk", "annst",
        "ivfrec", "pdsts", "pdchk", "pdqnt",
        "mmman", "mmmet", "mmfrm", "mmdec",
        "q3shp", "q5vol", "unpvt", "expo", "apctl", "tdig",
        "argmm", "wdist", "cohrt",
        "scd2", "s2pit", "scdenr", "skew", "urlcn",
    ):
        assert required in window, f"{required} fell out of the window"
    assert names[:12] == [
        "ivfapp", "bm25", "ivfdel", "bm25d", "ivfup", "bm25u",
        "stdel", "bmpol", "ivfpit", "bmpit", "stbdl", "stbup",
    ], f"r15 lifecycle lead drifted: {names[:12]}"
    # urlcn closes the window at slot 50 exactly; the displaced
    # r12-hashed riders (incremental first) ride behind and lead r16.
    assert names[49] == "urlcn", f"window boundary drifted: {names[45:52]}"
    assert names[50] == "incct", (
        f"boundary riders drifted: {names[50:53]}"
    )


def test_queries_md_index_matches_registry():
    """QUERIES.md is the human-facing query index; a registry addition
    without a doc row (or a stale renamed row) silently misdescribes
    the surface.  One row per registered query, name-exact."""
    import re
    from pathlib import Path

    from newspapers_etl_spark.registry import all_oracles, all_queries

    text = (Path(__file__).resolve().parent.parent / "QUERIES.md").read_text()
    documented = set(re.findall(r"^\| `([a-z0-9_]+)` \|", text, re.M))
    registered = set(all_queries())
    assert documented == registered, (
        f"missing rows: {sorted(registered - documented)}; "
        f"stale rows: {sorted(documented - registered)}"
    )
    n_q, n_o = len(all_queries()), len(all_oracles())
    assert f"{n_q} registered queries, {n_o} with a DuckDB oracle" in text


def test_entry_module_import_registers_nothing():
    """__spark_entry__ must stay a thin adapter: importing it (which the
    driver does before anything else) must not register a single query —
    a module-scope operator import there would splice that operator's
    block to the front of the registration order and silently shift the
    driver's ~50-query correctness window (entry() resolving flagship
    through the registry, not a direct import, is the other half)."""
    import subprocess
    import sys
    from pathlib import Path

    code = (
        "import __spark_entry__\n"
        "from newspapers_etl_spark.registry import QUERIES\n"
        "assert QUERIES == {}, f'entry import registered {list(QUERIES)[:5]}...'\n"
        "print('clean')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=str(Path(__file__).resolve().parent.parent),
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert proc.stdout.strip().endswith("clean")
