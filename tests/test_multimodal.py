"""Multimodal plumbing tests: the real binaryFile DataSource (S3) and
the mapInPandas decode stub's schema/batch contract."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from newspapers_etl_spark.operators.multimodal import (
    DECODE_SCHEMA,
    decode_image_batches,
)


def test_binaryfile_source_reads_content_and_metadata(spark, tmp_path):
    """spark.read.format('binaryFile') — the Spark-native replacement for
    the reference's chunked HTTP fetch (src/01-scrape-images.py:353-385):
    path/length/content columns, md5 computable over content (S4)."""
    from newspapers_etl_spark.sources.binary import (
        read_binary_files,
        with_binary_metadata,
    )

    payloads = {f"bib{i}_page.jp2": bytes([i]) * (100 + i) for i in range(5)}
    for name, data in payloads.items():
        (tmp_path / name).write_bytes(data)
    (tmp_path / "ignored.txt").write_bytes(b"not an image")
    df = with_binary_metadata(
        read_binary_files(spark, str(tmp_path), glob="*.jp2")
    )
    rows = {r.filename: r for r in df.collect()}
    assert set(rows) == set(payloads), "glob filter leaked non-matching files"
    for name, data in payloads.items():
        assert rows[name].n_bytes == len(data)
        assert rows[name].content_md5 == hashlib.md5(data).hexdigest()
        assert bytes(rows[name].content) == data


def test_decode_stub_schema_and_determinism(spark, sf_dir):
    """The stubbed decode keeps a real contract: output matches
    DECODE_SCHEMA exactly, one output row per input row, deterministic
    across runs (so retries/speculative tasks agree)."""
    from newspapers_etl_spark.catalog import load_table

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .select("doc_id", F.encode("text", "UTF-8").alias("content"))
    )
    out1 = d.mapInPandas(decode_image_batches, DECODE_SCHEMA)
    assert out1.schema == DECODE_SCHEMA
    r1 = sorted(out1.collect())
    r2 = sorted(d.mapInPandas(decode_image_batches, DECODE_SCHEMA).collect())
    assert r1 == r2
    assert len(r1) == d.count()
    assert all(r.decode_ok for r in r1)


def test_frame_sample_fans_out_and_is_deterministic(spark, sf_dir):
    """The frame sampler's 1→N contract: every doc yields
    ceil(n_frames / stride) rows (≥1 even for tiny payloads), frame
    indices step by the stride, and re-running reproduces the exact
    rows (retry/speculation safety)."""
    from newspapers_etl_spark.catalog import load_table
    from newspapers_etl_spark.operators.multimodal import (
        FRAME_BYTES,
        FRAME_SCHEMA,
        FRAME_STRIDE,
        sample_frame_batches,
    )

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .select("doc_id", F.encode("text", "UTF-8").alias("content"))
    )
    out = d.mapInPandas(sample_frame_batches, FRAME_SCHEMA)
    assert out.schema == FRAME_SCHEMA
    rows = sorted(out.collect())
    assert sorted(d.mapInPandas(sample_frame_batches, FRAME_SCHEMA).collect()) == rows
    lengths = {r.doc_id: len(bytes(r.content)) for r in d.collect()}
    by_doc: dict[int, list[int]] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    assert set(by_doc) == set(lengths)
    for doc_id, idxs in by_doc.items():
        n_frames = max(1, lengths[doc_id] // FRAME_BYTES)
        expect = list(range(0, n_frames, FRAME_STRIDE))
        assert sorted(idxs) == expect, f"doc {doc_id}: {idxs} != {expect}"


def test_manifest_parse_audit_surfaces_malformed_json(spark):
    """from_json is PERMISSIVE: malformed manifests become NULL structs
    and the flatten drops them SILENTLY — the audit must retain one row
    per manifest with the parse status so nothing is lost unseen."""
    from newspapers_etl_spark.sources.manifest import (
        flatten_manifests,
        manifest_parse_audit,
    )

    good = (
        '{"items":[{"id":"c1","items":[{"items":'
        '[{"body":{"id":"page1.jp2"}}]}]}]}'
    )
    rows = [("m-good", good), ("m-bad", "{not json"), ("m-null", None)]
    df = spark.createDataFrame(rows, "mkey string, manifest string")

    audit = {
        r["manifest_key"]: (r["parsed"], r["n_canvases"])
        for r in manifest_parse_audit(df, "mkey", "manifest").collect()
    }
    assert audit == {
        "m-good": (True, 1),
        "m-bad": (False, 0),
        "m-null": (False, 0),
    }

    flat = flatten_manifests(df, "mkey", "manifest").collect()
    assert [r["manifest_key"] for r in flat] == ["m-good"]
    assert flat[0]["jp2_url"] == "page1.jp2"
