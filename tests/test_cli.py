"""CLI surface: the argparse entry mirrors the reference's main()
(reference src/01-scrape-images.py:532-543) — operation dispatch over a
date range, ad-hoc query runs, and a registry listing."""

from __future__ import annotations

import pytest

from newspapers_etl_spark.cli import build_parser, main


def test_parser_requires_operation_arguments():
    p = build_parser()
    with pytest.raises(SystemExit):
        p.parse_args(["run", "--operation", "start"])  # missing dates/target
    args = p.parse_args(
        [
            "run",
            "--operation",
            "verify",
            "--start-date",
            "2024-01-01",
            "--end-date",
            "2024-01-31",
            "--target",
            "/tmp/x",
        ]
    )
    assert args.operation == "verify" and args.command == "run"


def test_list_prints_registry(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "q1pr\toracle" in out
    assert len(out.strip().splitlines()) >= 70


def test_start_then_verify_roundtrip(spark, sf_dir, tmp_path, capsys):
    """start writes the ranged batch, verify over the same range exits 0
    with zero incomplete days (the spark fixture session is reused via
    getOrCreate, so the CLI runs in-process)."""
    target = str(tmp_path / "sink")
    base = ["--sf-dir", sf_dir, "--cpus", "8"]
    rng = ["--start-date", "2024-01-01", "--end-date", "2024-01-15"]
    assert main(base + ["run", "--operation", "start", *rng, "--target", target]) == 0
    assert (
        main(base + ["run", "--operation", "verify", *rng, "--target", target]) == 0
    )
    err = capsys.readouterr().err
    assert "incomplete days: 0" in err


def test_unknown_query_fails_cleanly(spark):
    assert main(["query", "--name", "no_such_query"]) == 2


def test_explain_prints_plan_audit(spark, sf_dir, capsys):
    assert main(["--sf-dir", sf_dir, "explain", "--name", "skew"]) == 0
    out = capsys.readouterr().out
    assert "shuffles (hash exchanges):" in out
    assert "PushedFilters" in out or "exchange:" in out
    assert "ReadSchema" in out


def test_explain_unknown_query_fails_cleanly(spark):
    assert main(["explain", "--name", "no_such_query"]) == 2


def test_lint_single_query_clean(spark, sf_dir, capsys):
    assert main(["--sf-dir", sf_dir, "lint", "--name", "q1pr"]) == 0
    assert "0 violations" in capsys.readouterr().err


def test_lint_unknown_query_fails_cleanly(spark):
    assert main(["lint", "--name", "nope"]) == 2
