"""RENAMES.json integrity: every historical CORRECTNESS/BENCH key must
resolve through the rename chain to a CURRENT registry name, and
current names must be fixed points — so the driver's longitudinal
2×-check can never silently lose a query's lineage to a rename wave
(VERDICT r4 "Next round" #8)."""

from __future__ import annotations

import json
from pathlib import Path

from newspapers_etl_spark.registry import all_queries
from newspapers_etl_spark.renames import resolve

REPO = Path(__file__).resolve().parent.parent


def _historical_key_files() -> dict[str, set[str]]:
    out: dict[str, set[str]] = {}
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        out[f.name] = set(json.loads(f.read_text()))
    for f in sorted(REPO.glob("BENCH_r*.json")):
        try:
            doc = json.loads(f.read_text())
        except json.JSONDecodeError:
            continue  # BENCH_r02 is a truncated stdout tail, known-bad
        queries = (doc or {}).get("queries")
        if isinstance(queries, dict):
            out[f.name] = set(queries)
    out["BENCH_REF.json"] = set(json.loads((REPO / "BENCH_REF.json").read_text()))
    return out


def test_every_historical_key_resolves_to_a_current_query():
    current = set(all_queries())
    for fname, keys in _historical_key_files().items():
        lost = sorted(k for k in keys if resolve(k) not in current)
        assert lost == [], f"{fname}: keys with no current lineage: {lost}"


def test_current_names_are_fixed_points():
    """No registry name may appear as an OLD name in any wave — that
    would make a current query's history ambiguous."""
    moved = sorted(n for n in all_queries() if resolve(n) != n)
    assert moved == [], f"current names that still resolve onward: {moved}"


def test_rename_waves_are_acyclic_and_terminate():
    waves = json.loads((REPO / "RENAMES.json").read_text())
    for wave, table in waves.items():
        for old in table:
            resolve(old)  # raises on a cycle
        assert all(old != new for old, new in table.items()), (
            f"{wave} contains identity rows"
        )


def test_compare_rounds_parses_driver_capture_formats(tmp_path):
    """tools/compare_rounds must read both capture shapes: the driver's
    wrapped form (timings under parsed.queries, or recoverable from the
    raw stdout tail when parsed is null) and bench.py's plain form —
    and must route names through the rename ledger."""
    import importlib.util
    import json as _json
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "compare_rounds", Path(__file__).resolve().parent.parent / "tools" / "compare_rounds.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    plain = tmp_path / "plain.json"
    plain.write_text(_json.dumps({"queries": {"flagship": 1.0}}))
    assert mod._load_capture(plain) == {"flags": 1.0}

    wrapped = tmp_path / "wrapped.json"
    wrapped.write_text(
        _json.dumps({"tail": "x", "parsed": {"queries": {"text_lang_id": 2.0}}})
    )
    # chained: text_lang_id -> lang_id (r4) -> lg_id (r13) -> lgid (r15)
    assert mod._load_capture(wrapped) == {"lgid": 2.0}

    tail_only = tmp_path / "tail.json"
    line = _json.dumps({"metric": "wall", "queries": {"agg_approx_distinct": 3.0}})
    tail_only.write_text(_json.dumps({"tail": "junk\n" + line, "parsed": None}))
    # chained rename: agg_approx_distinct -> ... -> agg_ndv -> andv (r13)
    assert mod._load_capture(tail_only) == {"andv": 3.0}

    broken = tmp_path / "broken.json"
    broken.write_text("{not json")
    assert mod._load_capture(broken) is None
