"""Delimited-text ingestion with a declared schema and a corrupt-row
audit — the raw-dump face of the source layer.

Real corpora arrive as CSV/TSV dumps with broken lines; the Spark-first
discipline is the same as the manifest source (sources/manifest.py):
NEVER infer the schema (inference is a full extra pass over 100 TB and
silently widens types), read PERMISSIVE with a corrupt-record column so
bad lines are counted and quarantined instead of killing the job or
vanishing, and audit the parse before anything consumes the table.

The registered ``src_csv`` query proves the loop end to end: fixture
tables round-trip through a genuine CSV encode (quoting, headers,
multi-part files) and back under the declared schema, then join and
aggregate; the DuckDB oracle computes the same result from the original
parquet, so the hash match certifies the text round-trip byte-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from newspapers_etl_spark.catalog import SCHEMAS, load_table
from newspapers_etl_spark.registry import query

CORRUPT_COL = "_corrupt_record"


def read_jsonl_with_audit(
    spark: SparkSession, path: str, schema: T.StructType, **options: str
) -> DataFrame:
    """PERMISSIVE JSON-lines read under a DECLARED schema — the LLM
    corpus interchange format gets the same quarantine discipline as
    CSV: malformed lines survive in ``_corrupt_record``, the audit
    counts them, nothing dies and nothing vanishes."""
    audited = schema.add(T.StructField(CORRUPT_COL, T.StringType()))
    return (
        spark.read.options(
            mode="PERMISSIVE",
            columnNameOfCorruptRecord=CORRUPT_COL,
            **options,
        )
        .schema(audited)
        .json(path)
    )


def read_csv_with_audit(
    spark: SparkSession, path: str, schema: T.StructType, **options: str
) -> DataFrame:
    """PERMISSIVE CSV read under a DECLARED schema, with the corrupt
    raw line preserved in ``_corrupt_record``.  Callers split the
    result on ``_corrupt_record IS NULL`` — good rows flow on, bad rows
    go to the audit/quarantine path with their original text intact."""
    audited = schema.add(T.StructField(CORRUPT_COL, T.StringType()))
    return (
        spark.read.options(
            header="true",
            mode="PERMISSIVE",
            columnNameOfCorruptRecord=CORRUPT_COL,
            **options,
        )
        .schema(audited)
        .csv(path)
    )


def csv_parse_audit(df: DataFrame) -> DataFrame:
    """One row: total / parsed / corrupt counts for a read_csv_with_audit
    result — the gate a pipeline checks before consuming the table.

    The input is cached first: Spark (correctly) refuses queries whose
    referenced columns are ONLY the internal corrupt-record column —
    the raw line isn't retained unless the parse materializes — and the
    consumer reads the same parsed relation right after the audit, so
    the cache is reused, not wasted."""
    df = df.cache()
    return df.agg(
        F.count("*").alias("n_rows"),
        F.count(F.when(F.col(CORRUPT_COL).isNull(), 1)).alias("n_parsed"),
        F.count(CORRUPT_COL).alias("n_corrupt"),
    )


CSV_ROUNDTRIP_ORACLE = """
SELECT r.r_name AS region,
       CAST(count(*) AS BIGINT) AS n_nations,
       CAST(sum(n.n_nationkey) AS BIGINT) AS key_sum
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY 1
"""


@query("scsv", oracle=CSV_ROUNDTRIP_ORACLE)
def csv_roundtrip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write nation + region to genuine CSV files (headers, quoting,
    Spark's multi-part layout), read them back PERMISSIVE under the
    DECLARED schemas, assert zero corrupt rows, then broadcast-join and
    aggregate.  The oracle runs on the original parquet, so the hash
    match certifies the text encode/decode preserved every value."""
    import tempfile

    out = tempfile.mkdtemp(prefix="csv_src_")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    nation.write.mode("overwrite").option("header", "true").csv(f"{out}/nation")
    region.write.mode("overwrite").option("header", "true").csv(f"{out}/region")

    # The DECLARED schemas are the catalog's own (catalog.py SCHEMAS) —
    # the single source of truth the parquet loaders use, so the CSV
    # path can never drift from the table contract.
    n_csv = read_csv_with_audit(
        spark, f"{out}/nation", T.StructType(list(SCHEMAS["nation"].fields))
    )
    r_csv = read_csv_with_audit(
        spark, f"{out}/region", T.StructType(list(SCHEMAS["region"].fields))
    )
    # The self-written files must parse clean; a corrupt row here means
    # the writer/reader disagree on quoting — fail loudly, not silently.
    bad = (
        csv_parse_audit(n_csv).first()["n_corrupt"]
        + csv_parse_audit(r_csv).first()["n_corrupt"]
    )
    if bad:
        raise ValueError(f"CSV round-trip produced {bad} corrupt rows")
    n = n_csv.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    r = r_csv.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count("*").alias("n_nations"),
            F.sum("n_nationkey").alias("key_sum"),
        )
    )


XML_ROUNDTRIP_ORACLE = """
SELECT lang,
       CAST(count(*) AS BIGINT)     AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       max(md5(text))               AS max_text_md5
FROM documents
GROUP BY 1
"""


@query("sxml", oracle=XML_ROUNDTRIP_ORACLE)
def xml_roundtrip_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip the documents table through XML (Spark 4's native XML
    source) under the declared catalog schema, then roll up per lang
    with an md5 witness over the text column.  XML is the nastiest
    escaping surface in the source layer (&amp;/&lt; entities, CDATA-
    free quoting, whitespace handling) — the hash can only match the
    parquet-side oracle if every document body survived entity
    encode/decode byte-exactly.  ``ignoreSurroundingSpaces`` is forced
    off: the reader's default trims element whitespace, which would
    silently corrupt documents with leading/trailing spaces."""
    import tempfile

    out = tempfile.mkdtemp(prefix="xml_src_")
    docs = load_table(spark, sf_dir, "documents")
    docs.write.format("xml").option("rowTag", "doc").mode("overwrite").save(
        f"{out}/documents"
    )
    d = (
        spark.read.format("xml")
        .option("rowTag", "doc")
        .option("ignoreSurroundingSpaces", "false")
        .schema(SCHEMAS["documents"])
        .load(f"{out}/documents")
    )
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.max(F.md5(F.encode("text", "UTF-8"))).alias("max_text_md5"),
    )


ORC_ROUNDTRIP_ORACLE = """
SELECT l_returnflag,
       l_linestatus,
       CAST(count(*) AS BIGINT)       AS n_rows,
       round(sum(l_extendedprice), 2) AS total_price
FROM lineitem
WHERE l_quantity >= 25
GROUP BY 1, 2
"""


@query("sorc", oracle=ORC_ROUNDTRIP_ORACLE)
def orc_roundtrip_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip the fact table through ORC — Spark's second native
    columnar format, the interchange target for Hive-era lakes — read
    back under the DECLARED catalog schema (no inference pass), then
    aggregate behind a pushed predicate.  The oracle runs on the
    original parquet, so the hash match certifies the ORC encode/decode
    value-exactly; the quantity filter reaching the ORC scan as a
    PushedFilter (row-group skipping via ORC min/max stripe stats —
    asserted in tests/test_schemas.py) is what makes the format a
    first-class 100 TB citizen rather than a dump target."""
    import tempfile

    out = tempfile.mkdtemp(prefix="orc_src_")
    li = load_table(spark, sf_dir, "lineitem")
    li.write.mode("overwrite").orc(f"{out}/lineitem")
    l = spark.read.schema(SCHEMAS["lineitem"]).orc(f"{out}/lineitem")
    return (
        l.filter(F.col("l_quantity") >= 25)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
    )


JSONL_ROUNDTRIP_ORACLE = """
SELECT lang,
       source,
       CAST(count(*) AS BIGINT)       AS n_docs,
       CAST(sum(n_chars) AS BIGINT)   AS total_chars,
       min(md5(text))                 AS min_text_md5
FROM documents
GROUP BY 1, 2
"""


@query("sjsl", oracle=JSONL_ROUNDTRIP_ORACLE)
def jsonl_roundtrip_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip the documents table through genuine JSON-lines files
    (Spark json writer — real escaping of quotes/newlines/unicode in
    document text) and back under the declared catalog schema, then
    roll up per (lang, source) with an md5 witness over the text
    column.  The oracle reads the original parquet: the hash can only
    match if every document body survived the JSONL encode/decode
    byte-exactly — the integrity property an LLM-corpus interchange
    dump needs."""
    import tempfile

    out = tempfile.mkdtemp(prefix="jsonl_src_")
    docs = load_table(spark, sf_dir, "documents")
    docs.write.mode("overwrite").json(f"{out}/documents")
    d_csv = read_jsonl_with_audit(
        spark,
        f"{out}/documents",
        T.StructType(list(SCHEMAS["documents"].fields)),
    )
    audit = csv_parse_audit(d_csv).first()
    if audit["n_corrupt"]:
        raise ValueError(
            f"JSONL round-trip produced {audit['n_corrupt']} corrupt rows"
        )
    d = d_csv.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    return d.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min(F.md5(F.encode("text", "UTF-8"))).alias("min_text_md5"),
    )
