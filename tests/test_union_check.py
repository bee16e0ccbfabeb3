"""Regression tests for tools/union_check.py.

Round 10 was the first two-digit round and the original tool both
globbed ``CORRECTNESS_r0*.json`` (dropping r10's file entirely) and
took the latest-green round by LEXICOGRAPHIC max (where "r9" > "r10").
These tests feed synthetic two- and three-digit round files through
the same loader the CLI uses, pinning numeric round ordering.
"""

import glob
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

from union_check import compute_union, round_num  # noqa: E402


def _write(tmp_path, rnd, rows):
    p = tmp_path / f"CORRECTNESS_{rnd}.json"
    p.write_text(json.dumps(rows))
    return str(p)


GREEN = {"hash_match": True}
ROWS_ONLY = {"hash_match": None, "err": "no_oracle", "spark_rows": 3}
FAIL = {"hash_match": False, "err": "hash mismatch"}


def test_round_num_orders_two_and_three_digit_rounds():
    assert round_num("r06") == 6
    assert round_num("r9") < round_num("r10") < round_num("r100")


def test_two_digit_round_is_read_and_wins_latest_green(tmp_path):
    files = [
        _write(tmp_path, "r09", {"a": GREEN, "b": GREEN}),
        _write(tmp_path, "r10", {"a": GREEN, "c": ROWS_ONLY}),
    ]
    out = compute_union(files, ["a", "b", "c", "d"], lambda k: k)
    assert out["never_green"] == ["d"]
    assert out["latest_green_histogram"] == {"r09": 1, "r10": 2}


def test_three_digit_round_orders_numerically(tmp_path):
    files = [
        _write(tmp_path, "r99", {"a": FAIL}),
        _write(tmp_path, "r100", {"a": GREEN}),
    ]
    out = compute_union(files, ["a"], lambda k: k)
    # a later numeric round's green row clears the earlier error
    assert out["live_errors"] == {}
    assert out["latest_green_histogram"] == {"r100": 1}


def test_error_with_no_later_green_stays_live(tmp_path):
    files = [
        _write(tmp_path, "r09", {"a": GREEN}),
        _write(tmp_path, "r10", {"a": FAIL}),
    ]
    out = compute_union(files, ["a"], lambda k: k)
    assert out["live_errors"] == {"a": ["r10"]}


def test_historical_key_resolves_through_renames(tmp_path):
    files = [_write(tmp_path, "r10", {"old_name": GREEN})]
    out = compute_union(
        files, ["new_name"], lambda k: {"old_name": "new_name"}.get(k, k)
    )
    assert out["never_green"] == []
    assert out["unresolved_historical_keys"] == {}


def test_repo_glob_includes_round_10_file():
    """The actual CLI glob must pick up every committed round file,
    including the first two-digit one that the old r0* glob dropped."""
    globbed = {Path(p).name for p in glob.glob(str(REPO / "CORRECTNESS_r*.json"))}
    committed = {p.name for p in REPO.glob("CORRECTNESS_r*.json")}
    assert "CORRECTNESS_r10.json" in globbed
    assert globbed == committed


def test_letter_suffixed_side_artifacts_are_skipped(tmp_path):
    """ADVICE r11: the CORRECTNESS_r*.json glob also matches scratch
    copies like CORRECTNESS_r11b.json, and round_num() raises on them —
    the loader must filter non-digit stems (compare_rounds.py already
    does) instead of crashing the round-end gate."""
    from union_check import correctness_files

    _write(tmp_path, "r09", {"a": GREEN})
    _write(tmp_path, "r10", {"a": GREEN})
    (tmp_path / "CORRECTNESS_r11b.json").write_text(json.dumps({"a": GREEN}))
    files = correctness_files(tmp_path)
    assert sorted(Path(f).stem for f in files) == [
        "CORRECTNESS_r09",
        "CORRECTNESS_r10",
    ]
    # and the filtered list flows through compute_union without raising
    out = compute_union(files, ["a"], lambda k: k)
    assert out["latest_green_histogram"] == {"r10": 1}
