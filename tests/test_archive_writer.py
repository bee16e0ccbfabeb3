"""Verified-archive writer tests (S4): commit publishes a per-file md5
manifest, the audit passes on intact data and catches tampering."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from newspapers_etl_spark.catalog import load_table
from newspapers_etl_spark.sinks.archive_writer import (
    MANIFEST,
    SINK_NAME,
    register,
    verify_archive,
)


def _write(spark, sf_dir, path, n=300):
    register(spark)
    df = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < n)
        .select("doc_id", "text", "lang")
        .repartition(4)
    )
    df.write.format(SINK_NAME).option("path", path).mode("append").save()
    return df


def test_commit_writes_verifiable_manifest(spark, sf_dir, tmp_path):
    path = str(tmp_path / "arch")
    df = _write(spark, sf_dir, path)
    manifest = json.load(open(os.path.join(path, MANIFEST)))
    assert manifest["total_rows"] == df.count()
    assert len(manifest["files"]) == 4  # one part per task
    assert verify_archive(path) == []
    # round-trip: the parts are readable JSON lines with all rows intact
    back = spark.read.json(os.path.join(path, "part-*.jsonl"))
    assert back.count() == df.count()
    assert set(back.columns) == {"doc_id", "text", "lang"}


def test_audit_flags_orphan_parts_and_commit_reconciles(spark, sf_dir, tmp_path):
    """A part file on disk that the manifest never lists (failed or
    speculative task attempt, prior-generation leftovers) must be
    flagged by the audit, and a re-write over the same path must
    reconcile the directory so only committed parts remain."""
    path = str(tmp_path / "arch")
    _write(spark, sf_dir, path)
    orphan = os.path.join(path, "part-deadbeef.jsonl")
    with open(orphan, "w") as f:
        f.write('{"doc_id": 1, "text": "phantom", "lang": "xx"}\n')
    problems = verify_archive(path)
    assert any("orphan part file" in p for p in problems)
    # second commit over the same path: orphan and prior generation gone
    _write(spark, sf_dir, path, n=100)
    assert not os.path.exists(orphan)
    assert verify_archive(path) == []
    manifest = json.load(open(os.path.join(path, MANIFEST)))
    on_disk = {p for p in os.listdir(path) if p.endswith(".jsonl")}
    assert on_disk == {e["name"] for e in manifest["files"]}


def test_audit_detects_tamper_and_loss(spark, sf_dir, tmp_path):
    path = str(tmp_path / "arch")
    _write(spark, sf_dir, path)
    parts = sorted(p for p in os.listdir(path) if p.startswith("part-"))
    # corrupt one file, delete another
    with open(os.path.join(path, parts[0]), "ab") as f:
        f.write(b'{"doc_id": 99999, "text": "injected", "lang": "xx"}\n')
    os.remove(os.path.join(path, parts[1]))
    problems = verify_archive(path)
    assert any("digest mismatch" in p for p in problems)
    assert any("missing part file" in p for p in problems)
