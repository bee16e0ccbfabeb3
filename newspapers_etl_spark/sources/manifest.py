"""Nested-JSON manifest source (SURVEY.md §2.1 S2).

The reference fetches ``{manifest_url}/manifest`` and walks 4 levels of
``items`` arrays down to ``body.id`` in imperative Python (reference
src/01-scrape-images.py:319-351).  Here the manifest is a first-class
source: a DECLARED IIIF-shaped StructType (inference at 100 TB is a full
extra pass over the JSON), ``from_json`` to parse, and chained
``explode`` to flatten — each explode is a map-side lateral expansion,
no shuffle, so a billion manifests flatten in one scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# manifest.items[] (canvases) → items[] (annotation pages) → items[]
# (annotations) → body.id — the traversal shape of
# src/01-scrape-images.py:332-343.
MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField(
            "items",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.StringType()),
                        T.StructField(
                            "items",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField(
                                            "items",
                                            T.ArrayType(
                                                T.StructType(
                                                    [
                                                        T.StructField(
                                                            "body",
                                                            T.StructType(
                                                                [
                                                                    T.StructField(
                                                                        "id",
                                                                        T.StringType(),
                                                                    )
                                                                ]
                                                            ),
                                                        )
                                                    ]
                                                )
                                            ),
                                        )
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        ),
    ]
)


def flatten_manifests(
    df: DataFrame, key_col: str, json_col: str, suffix: str = ".jp2"
) -> DataFrame:
    """S2 flatten: parse ``json_col`` with the declared schema, explode
    canvases → annotation pages → annotations, project ``body.id``,
    keep only ids ending in ``suffix`` (P7's endswith predicate,
    src/01-scrape-images.py:340).  Output: (key, canvas_id, jp2_url)."""
    parsed = df.select(
        F.col(key_col).alias("manifest_key"),
        F.from_json(json_col, MANIFEST_SCHEMA).alias("m"),
    )
    return (
        parsed.select("manifest_key", F.explode("m.items").alias("canvas"))
        .select(
            "manifest_key",
            F.col("canvas.id").alias("canvas_id"),
            F.explode("canvas.items").alias("page"),
        )
        .select("manifest_key", "canvas_id", F.explode("page.items").alias("ann"))
        .select("manifest_key", "canvas_id", F.col("ann.body.id").alias("jp2_url"))
        .filter(F.col("jp2_url").endswith(suffix))
    )


def manifest_parse_audit(
    df: DataFrame, key_col: str, json_col: str
) -> DataFrame:
    """Per-manifest parse accounting: PERMISSIVE ``from_json`` turns
    malformed JSON into a struct of NULL fields (not a null struct!),
    and the chained explodes in :func:`flatten_manifests` then drop
    those rows SILENTLY.  This is the anti-silent-loss companion the
    reference implements as try/except-with-counters around its
    manifest fetch (reference src/01-scrape-images.py:319-351,
    456-477): one row per manifest with its parse status and canvas
    count, so a pipeline can alert on ``parsed = false`` instead of
    discovering missing pages in the sink audit.  Malformed input is
    detected the supported way — a ``columnNameOfCorruptRecord`` field
    appended to the parse schema, which from_json populates with the
    raw text exactly when parsing failed.  Pure map-side expression —
    no shuffle; at 100 TB the rollup over it is one partial-aggregable
    groupBy."""
    audit_schema = T.StructType(
        list(MANIFEST_SCHEMA.fields)
        + [T.StructField("_corrupt_record", T.StringType())]
    )
    parsed = df.select(
        F.col(key_col).alias("manifest_key"),
        F.col(json_col).alias("raw"),
        F.from_json(
            json_col,
            audit_schema,
            {"columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("m"),
    )
    return parsed.select(
        "manifest_key",
        (
            F.col("raw").isNotNull() & F.col("m._corrupt_record").isNull()
        ).alias("parsed"),
        F.coalesce(F.size("m.items"), F.lit(0)).alias("n_canvases"),
    )


def read_manifest_json(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory of manifest JSON documents (one per line/file)
    with the declared schema — the batch ingestion path for pre-fetched
    manifests."""
    return spark.read.schema(
        T.StructType([T.StructField("manifest", MANIFEST_SCHEMA)])
    ).json(path)
