"""Multimodal columns: nested-JSON manifest source (S2), binary payload
metadata (S3/S4), and stubbed decode operators with real Spark plumbing.

The reference's multimodal surface is the IIIF manifest → JP2 image
pipeline: fetch deeply nested JSON (4 levels of ``items``, then
``body.id`` — reference src/01-scrape-images.py:319-351), stream binary
page images (src/01-scrape-images.py:353-385), verify MD5 end-to-end
(src/01-scrape-images.py:78-83,126-131), and classify MIME by extension
(src/01-scrape-images.py:110-116).

Spark-first re-expression:
- Manifests are ``from_json`` with a DECLARED StructType (inference at
  100 TB is a full extra pass) flattened by CHAINED ``explode`` — each
  explode is a map-side lateral expansion, no shuffle; the query below
  round-trips fixtures through to_json/from_json so the DuckDB oracle
  can check the flatten against the un-nested base tables.
- Binary payloads are opaque ``binary`` columns with typed metadata
  (length, md5, MIME) computed by built-in expressions.
- Image/audio decode needs codec libraries this container doesn't ship,
  so ``decode_image_batches`` is a deterministic STUB behind
  ``mapInPandas`` — the schema, Arrow batch shape, and partitioning are
  real; swap `_decode_stub` for a PIL/ffmpeg call in production.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from newspapers_etl_spark.catalog import load_table
from newspapers_etl_spark.functions.extraction import mime_for_filename
from newspapers_etl_spark.registry import query
from newspapers_etl_spark.sources.manifest import flatten_manifests

# ---------------------------------------------------------------------------
# S2: nested-JSON manifest flatten (4-level items → body.id)
# ---------------------------------------------------------------------------

MANIFEST_FLATTEN_ORACLE = """
SELECT o.o_orderkey AS manifest_key,
       'page-' || CAST(l.l_linenumber AS VARCHAR) AS canvas_id,
       'https://img/' || CAST(o.o_orderkey AS VARCHAR) || '/'
         || CAST(l.l_partkey AS VARCHAR) || '.jp2' AS jp2_url
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey % 100 = 0
"""


@query("mm_manifest", oracle=MANIFEST_FLATTEN_ORACLE)
def mm_manifest_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build IIIF-shaped manifest JSON documents (one per order, pages
    from its lineitems), then flatten them back with from_json + chained
    explode + body.id projection.  The oracle checks the flatten against
    the un-nested join, proving the nested traversal is lossless.

    Construction: orders×lineitem → per-order collect_list of canvas
    structs → to_json.  Flatten: from_json(declared schema) → explode
    canvases → explode annotation pages → explode annotations →
    body.id, keeping only .jp2 bodies (P7's endswith predicate)."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.pmod("o_orderkey", F.lit(100)) == 0
    )
    li = load_table(spark, sf_dir, "lineitem")
    # --- build nested manifests (the synthetic stand-in for the fetched JSON)
    canvas = F.struct(
        F.concat(F.lit("page-"), F.col("l_linenumber")).alias("id"),
        F.array(
            F.struct(
                F.array(
                    F.struct(
                        F.struct(
                            F.concat(
                                F.lit("https://img/"),
                                F.col("o_orderkey"),
                                F.lit("/"),
                                F.col("l_partkey"),
                                F.lit(".jp2"),
                            ).alias("id")
                        ).alias("body")
                    )
                ).alias("items")
            )
        ).alias("items"),
    )
    manifests = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select("o_orderkey", canvas.alias("canvas"))
        .groupBy("o_orderkey")
        .agg(F.collect_list("canvas").alias("canvases"))
        .select(
            "o_orderkey",
            F.to_json(
                F.struct(
                    F.concat(F.lit("manifest-"), F.col("o_orderkey")).alias("id"),
                    F.col("canvases").alias("items"),
                )
            ).alias("manifest_json"),
        )
    )
    # --- the actual S2 operator (sources/manifest.py): parse + 3 chained
    # explodes + body.id projection + .jp2 suffix filter
    return flatten_manifests(manifests, "o_orderkey", "manifest_json")


# ---------------------------------------------------------------------------
# S3/S4: binary payload metadata (length, md5, MIME)
# ---------------------------------------------------------------------------

BINARY_META_ORACLE = """
SELECT 'bib' || CAST(doc_id AS VARCHAR)
         || CASE WHEN doc_id % 3 = 0 THEN '.jp2'
                 WHEN doc_id % 3 = 1 THEN '.pdf' ELSE '.txt' END AS filename,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       md5(text)                    AS content_md5,
       CASE WHEN doc_id % 3 = 0 THEN 'image/jp2'
            WHEN doc_id % 3 = 1 THEN 'application/pdf'
            ELSE 'application/octet-stream' END AS mime
FROM documents
"""


@query("mm_meta", oracle=BINARY_META_ORACLE)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over an opaque binary column: byte length, md5
    audit digest (S4's verify, src/01-scrape-images.py:78-83,126-131),
    and the P9 MIME case expression.  The binary payload is the document
    text encoded — same shape as a binaryFile read's `content` column
    (which tests/test_multimodal.py exercises against real files)."""
    d = load_table(spark, sf_dir, "documents")
    ext = (
        F.when(F.pmod("doc_id", F.lit(3)) == 0, ".jp2")
        .when(F.pmod("doc_id", F.lit(3)) == 1, ".pdf")
        .otherwise(".txt")
    )
    filename = F.concat(F.lit("bib"), F.col("doc_id"), ext)
    content = F.encode("text", "UTF-8")  # the opaque binary column
    return d.select(
        filename.alias("filename"),
        F.octet_length(content).cast("long").alias("n_bytes"),
        F.md5(content).alias("content_md5"),
        mime_for_filename(filename).alias("mime"),
    )


# ---------------------------------------------------------------------------
# Decode stubs: real mapInPandas plumbing, deterministic fake codec
# ---------------------------------------------------------------------------

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)


def _decode_stub(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake image decode: dimensions derived from the
    payload bytes.  Production swaps this one function for a real codec
    (PIL.Image.open etc. — not installed in this container); everything
    around it (schema, Arrow batching, partitioning) is unchanged."""
    n = len(payload)
    return (64 + n % 512, 64 + (n * 31) % 512, 3)


def decode_image_batches(
    it: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: one Arrow batch of (doc_id, content) in, one
    batch of decoded metadata out.  Per-batch vectorization keeps the
    Python overhead at O(batches), not O(rows); heavy codecs would also
    amortize per-batch setup here."""
    for pdf in it:
        dims = [_decode_stub(b) for b in pdf["content"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": [d[0] for d in dims],
                "height": [d[1] for d in dims],
                "n_channels": [d[2] for d in dims],
                "decode_ok": True,
            }
        )


# ---------------------------------------------------------------------------
# Video/audio frame sampling: 1→N Arrow fan-out (stub codec)
# ---------------------------------------------------------------------------

FRAME_BYTES = 256  # stub container: fixed-size byte windows are "frames"
FRAME_STRIDE = 4  # keep every 4th frame

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_feature", T.DoubleType()),
    ]
)


def sample_frame_batches(
    it: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker with 1→N fan-out: each (doc_id, content) row
    yields one output row per SAMPLED frame — the batch shape a real
    video/audio pipeline has (ffmpeg frame iterators, PCM windows),
    which the 1→1 image decode above does not exercise.  The "codec" is
    a stub (fixed-size byte windows, mean-byte feature); the fan-out,
    schema, and per-batch vectorization are the production plumbing."""
    for pdf in it:
        ids, idxs, feats = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
            n_frames = max(1, len(payload) // FRAME_BYTES)
            for fi in range(0, n_frames, FRAME_STRIDE):
                window = payload[fi * FRAME_BYTES : (fi + 1) * FRAME_BYTES]
                ids.append(doc_id)
                idxs.append(fi)
                feats.append(sum(window) / max(1, len(window)))
        yield pd.DataFrame(
            {"doc_id": ids, "frame_idx": idxs, "frame_feature": feats}
        )


@query("mm_frames")  # rows-only: stub codec, no SQL analog
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sample a binary AV column via mapInPandas (stride-4 over
    fixed-size stub frames) and roll the sampled frames up per doc.
    The production plan shape: narrow scan → ArrowEvalPython fan-out
    (one row per sampled frame) → partial agg; frame rows never carry
    the payload, so the post-fan-out shuffle is skinny.  At 100 TB,
    repartition upstream so one Arrow batch of containers fits executor
    memory, exactly as for the image decode."""
    d = load_table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.encode("text", "UTF-8").alias("content"))
    frames = payloads.mapInPandas(sample_frame_batches, FRAME_SCHEMA)
    return frames.groupBy("doc_id").agg(
        F.count("*").alias("n_sampled_frames"),
        F.max("frame_idx").alias("last_frame_idx"),
        F.round(F.avg("frame_feature"), 4).alias("avg_feature"),
    )


@query("mm_decode")  # rows-only: stub decode, no SQL analog
def mm_image_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode a binary image column via mapInPandas (stub codec) and
    aggregate the decoded dimensions.  The plan is the production plan:
    narrow scan → ArrowEvalPython over (id, content) only — metadata
    columns stay JVM-side — → partial agg; at 100 TB add a repartition
    upstream sized so one Arrow batch of images fits executor memory."""
    d = load_table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.encode("text", "UTF-8").alias("content"))
    decoded = payloads.mapInPandas(decode_image_batches, DECODE_SCHEMA)
    return decoded.groupBy("n_channels").agg(
        F.count("*").alias("n_images"),
        F.sum(F.when(F.col("decode_ok"), 1).otherwise(0)).alias("n_ok"),
        F.min("width").alias("min_width"),
        F.max("width").alias("max_width"),
        F.round(F.avg("height"), 4).alias("avg_height"),
    )
