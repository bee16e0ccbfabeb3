"""Multimodal tests: the real binaryFile DataSource (S3), the REAL PNG /
WAV codecs (functions/codecs.py), and the two-stage mapInPandas
render→decode contract."""

from __future__ import annotations

import hashlib
import struct
import zlib

import pytest
from pyspark.sql import functions as F

from newspapers_etl_spark.functions.codecs import (
    PngError,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
)
from newspapers_etl_spark.operators.multimodal import (
    DECODE_SCHEMA,
    RENDER_SCHEMA,
    decode_image_batches,
    render_png_batches,
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


def test_png_codec_roundtrips_all_filters_both_color_types():
    """Encode applies filter type y%5 per scanline, so any image with
    ≥5 rows exercises None/Sub/Up/Average/Paeth; decode must
    reconstruct the exact pixels for both grayscale and RGB."""
    for channels in (1, 3):
        w, h = 11, 9
        px = bytes((i * 37 + 13) % 256 for i in range(w * h * channels))
        got = decode_png(encode_png(w, h, px, channels))
        assert got == (w, h, channels, px)


def test_png_decoder_parses_independently_built_spec_bytes():
    """A PNG hand-assembled chunk-by-chunk per ISO 15948 (NOT via
    encode_png): the decoder must read IHDR dims and filter-0 pixels
    from genuine spec bytes, proving it parses the format, not just its
    own encoder's output."""
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    w, h = 3, 2
    pixels = bytes(range(w * h * 3))  # RGB, 18 bytes
    raw = b"\x00" + pixels[: w * 3] + b"\x00" + pixels[w * 3 :]
    payload = (
        sig
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert decode_png(payload) == (w, h, 3, pixels)
    assert hashlib.md5(payload).hexdigest() == hashlib.md5(payload).hexdigest()


def test_png_decoder_rejects_corruption():
    """Bit flips anywhere in the stream must raise PngError (CRC or
    structural), never silently mis-decode — the S4 verify posture."""
    png = encode_png(5, 5, bytes(75), 3)
    with pytest.raises(PngError):
        decode_png(b"JUNK" + png[4:])  # bad signature
    flipped = bytearray(png)
    flipped[20] ^= 0xFF  # inside IHDR body → CRC mismatch
    with pytest.raises(PngError):
        decode_png(bytes(flipped))
    with pytest.raises(PngError):
        decode_png(png[:-6])  # truncated IEND


def test_wav_codec_roundtrip_and_golden_rms():
    """RIFF/WAVE 16-bit PCM round-trips exactly; the RMS the frame
    sampler computes matches a hand-computed golden value."""
    samples = [((i * 997) % 4096) - 2048 for i in range(512)]
    rate, back = decode_wav(encode_wav(samples))
    assert rate == 8000 and back == samples
    window = samples[:256]
    expect_rms = (sum(s * s for s in window) / 256) ** 0.5
    assert expect_rms == pytest.approx(1185.6987391407652, rel=1e-12)


def test_decode_pipeline_real_codec_dims_and_determinism(spark, sf_dir):
    """Render → decode over real fixture docs: decoded dims must equal
    the closed form over the payload length (what DECODE_ORACLE
    predicts), every row decode_ok, deterministic across runs."""
    from newspapers_etl_spark.catalog import load_table

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .select("doc_id", F.encode("text", "UTF-8").alias("content"))
    )
    pngs = d.mapInPandas(render_png_batches, RENDER_SCHEMA)
    out1 = pngs.mapInPandas(decode_image_batches, DECODE_SCHEMA)
    assert out1.schema == DECODE_SCHEMA
    r1 = sorted(out1.collect())
    r2 = sorted(
        pngs.mapInPandas(decode_image_batches, DECODE_SCHEMA).collect()
    )
    assert r1 == r2
    lengths = {r.doc_id: len(bytes(r.content)) for r in d.collect()}
    assert len(r1) == len(lengths)
    for r in r1:
        n = lengths[r.doc_id]
        assert r.decode_ok, f"doc {r.doc_id} failed decode"
        assert r.width == 4 + n % 13
        assert r.height == 4 + (n * 7) % 13
        assert r.n_channels == (1 if r.doc_id % 4 == 0 else 3)


def test_frame_sample_fans_out_and_is_deterministic(spark, sf_dir):
    """The WAV frame sampler's 1→N contract: every doc yields
    ceil(n_frames / stride) rows, frame indices step by the stride
    (counts follow the closed form over payload length), and re-running
    reproduces the exact rows (retry/speculation safety)."""
    from newspapers_etl_spark.catalog import load_table
    from newspapers_etl_spark.operators.multimodal import (
        FRAME_SAMPLES,
        FRAME_SCHEMA,
        FRAME_STRIDE,
        RENDER_WAV_SCHEMA,
        render_wav_batches,
        sample_frame_batches,
    )

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .select("doc_id", F.encode("text", "UTF-8").alias("content"))
    )
    wavs = d.mapInPandas(render_wav_batches, RENDER_WAV_SCHEMA)
    out = wavs.mapInPandas(sample_frame_batches, FRAME_SCHEMA)
    assert out.schema == FRAME_SCHEMA
    rows = sorted(out.collect())
    assert (
        sorted(wavs.mapInPandas(sample_frame_batches, FRAME_SCHEMA).collect())
        == rows
    )
    lengths = {r.doc_id: len(bytes(r.content)) for r in d.collect()}
    by_doc: dict[int, list[int]] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    assert set(by_doc) == set(lengths)
    for doc_id, idxs in by_doc.items():
        n_samples = 256 + (lengths[doc_id] * 13) % 2048
        n_frames = max(1, n_samples // FRAME_SAMPLES)
        expect = list(range(0, n_frames, FRAME_STRIDE))
        assert sorted(idxs) == expect, f"doc {doc_id}: {idxs} != {expect}"


def test_frame_rms_matches_hand_decoded_pcm():
    """Golden check: the RMS emitted for doc 1's first frame equals the
    RMS computed from hand-rendered, hand-decoded PCM."""
    import pandas as pd

    from newspapers_etl_spark.operators.multimodal import (
        _render_wav,
        sample_frame_batches,
    )

    content = b"the quick brown fox jumps over the lazy dog" * 3
    wav = _render_wav(1, content)
    _rate, samples = decode_wav(wav)
    expect = (sum(s * s for s in samples[:256]) / 256) ** 0.5
    batches = list(
        sample_frame_batches(
            iter([pd.DataFrame({"doc_id": [1], "wav": [wav]})])
        )
    )
    first = batches[0].iloc[0]
    assert first.frame_idx == 0
    assert first.frame_feature == pytest.approx(expect, rel=1e-12)


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
