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
