"""Extraction-family queries (SURVEY.md §2.2 P1-P9, §2.6 F1-F17).

The reference's defining transform logic is per-row Python regex over
scraped HTML (extract_manifest_id_from_html, reference
src/01-scrape-images.py:270-279; extract_date_from_html :281-294;
extract_filenames_from_html :296-299; process_search_result sanitize
:413-420; MIME dispatch :110-116; url basename/decode :458).  Here every
one is a pure Column expression — JVM-side, codegen-friendly, zero
Python UDFs — so the same extraction runs over 100 TB of scanned text
without a Python-worker bottleneck.

The fixture `documents.text` is synthetic word soup, so each query first
*constructs* the reference-shaped input (HTML attribute strings, archive
filenames, percent-encoded URLs) deterministically from doc fields —
with the identical construction in the DuckDB oracle — then extracts it
back.  What the oracle checks is the extraction pipeline, byte-for-byte,
in both dialects (patterns kept to the Java-regex ∩ RE2 common subset,
SURVEY.md §7.4).

Scale note: all of these are narrow per-row transforms — no shuffle at
all; the plan is Scan → Project (whole-stage codegen) → small final agg
where present.  They scale linearly with scanned bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from newspapers_etl_spark.catalog import load_table
from newspapers_etl_spark.functions.extraction import (
    basename,
    first_match,
    mime_for_filename,
    recompose_date,
    sanitize_title,
    with_sentinel,
)
from newspapers_etl_spark.registry import query

# ---------------------------------------------------------------------------
# P1/P4: regex extract with fallback chain (data-src= first, then src=)
# ---------------------------------------------------------------------------

MANIFEST_FALLBACK_ORACLE = """
WITH html AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0
              THEN 'data-src="https://data.kb.se/iiif/' || CAST(doc_id AS VARCHAR)
                   || '/' || source || '/manifest"'
              ELSE '<img src="https://data.kb.se/iiif/' || CAST(doc_id AS VARCHAR)
                   || '/' || source || '/manifest">'
         END AS inner_html
  FROM documents
)
SELECT doc_id,
       coalesce(
         nullif(regexp_extract(inner_html,
           'data-src="https://data\\.kb\\.se/iiif/\\d+/([^/%"]+)', 1), ''),
         nullif(regexp_extract(inner_html,
           'src="https://data\\.kb\\.se/iiif/\\d+/([^/%"]+)', 1), '')
       ) AS manifest_id
FROM html
"""


@query("exfl", oracle=MANIFEST_FALLBACK_ORACLE)
def extract_manifest_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: first-pattern-wins fallback chain (reference tries data-src=
    then src=, src/01-scrape-images.py:270-279)."""
    d = load_table(spark, sf_dir, "documents")
    inner_html = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(
            F.lit('data-src="https://data.kb.se/iiif/'),
            F.col("doc_id").cast("string"),
            F.lit("/"),
            F.col("source"),
            F.lit('/manifest"'),
        ),
    ).otherwise(
        F.concat(
            F.lit('<img src="https://data.kb.se/iiif/'),
            F.col("doc_id").cast("string"),
            F.lit("/"),
            F.col("source"),
            F.lit('/manifest">'),
        )
    )
    return d.select(
        "doc_id",
        first_match(
            inner_html,
            r'data-src="https://data\.kb\.se/iiif/\d+/([^/%"]+)',
            r'src="https://data\.kb\.se/iiif/\d+/([^/%"]+)',
        ).alias("manifest_id"),
    )


# ---------------------------------------------------------------------------
# P2/F12/F13: date extraction from filename digits + recomposition
# ---------------------------------------------------------------------------

DATE_RECOMPOSE_ORACLE = """
WITH named AS (
  SELECT doc_id,
         'bib' || CAST(doc_id AS VARCHAR) || '_'
          || CAST(1990 + doc_id % 30 AS VARCHAR)
          || lpad(CAST(1 + doc_id % 12 AS VARCHAR), 2, '0')
          || lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0')
          || '_0001.jp2' AS filename
  FROM documents
)
SELECT doc_id,
       regexp_extract(filename, 'bib\\d+_(\\d{4})(\\d{2})(\\d{2})_', 1)
        || '-' || regexp_extract(filename, 'bib\\d+_(\\d{4})(\\d{2})(\\d{2})_', 2)
        || '-' || regexp_extract(filename, 'bib\\d+_(\\d{4})(\\d{2})(\\d{2})_', 3)
        AS date_str,
       CAST(regexp_extract(filename, 'bib\\d+_(\\d{4})(\\d{2})(\\d{2})_', 1)
        || '-' || regexp_extract(filename, 'bib\\d+_(\\d{4})(\\d{2})(\\d{2})_', 2)
        || '-' || regexp_extract(filename, 'bib\\d+_(\\d{4})(\\d{2})(\\d{2})_', 3)
        AS DATE) AS iso_date
FROM named
"""


@query("exdt", oracle=DATE_RECOMPOSE_ORACLE)
def extract_date_recompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 pattern 3: rebuild YYYY-MM-DD from archive-filename digit groups
    (reference src/01-scrape-images.py:290-293), with the zero-padded
    month/day construction exercising lpad (F13, reference
    .github/workflows/main.yml:78-79 printf %02d)."""
    d = load_table(spark, sf_dir, "documents")
    fname = F.concat(
        F.lit("bib"),
        F.col("doc_id").cast("string"),
        F.lit("_"),
        (F.lit(1990) + F.col("doc_id") % 30).cast("string"),
        F.lpad((F.lit(1) + F.col("doc_id") % 12).cast("string"), 2, "0"),
        F.lpad((F.lit(1) + F.col("doc_id") % 28).cast("string"), 2, "0"),
        F.lit("_0001.jp2"),
    )
    pat = r"bib\d+_(\d{4})(\d{2})(\d{2})_"
    date_str = recompose_date(
        F.regexp_extract(fname, pat, 1),
        F.regexp_extract(fname, pat, 2),
        F.regexp_extract(fname, pat, 3),
    )
    return d.select(
        "doc_id",
        date_str.alias("date_str"),
        F.to_date(date_str).alias("iso_date"),
    )


# ---------------------------------------------------------------------------
# P3/F2: regex find-all + dedup
# ---------------------------------------------------------------------------

FINDALL_ORACLE = """
WITH html AS (
  SELECT doc_id,
         'x bib1_p1.jp2 y bib1_p2.jp2 bib1_p1.jp2 '
          || CASE WHEN doc_id % 2 = 1 THEN 'bib1_p3.jp2 noise.txt' ELSE 'noise.txt' END
          AS page_html
  FROM documents
)
SELECT doc_id,
       CAST(len(list_distinct(regexp_extract_all(page_html, '(bib\\d+_p\\d+\\.jp2)', 1))) AS INT)
         AS n_unique_files
FROM html
"""


@query("exfnd", oracle=FINDALL_ORACLE)
def extract_filenames_findall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: findall + set-dedup (reference re.findall + list(set(...)),
    src/01-scrape-images.py:296-299) as
    array_distinct(regexp_extract_all(...))."""
    d = load_table(spark, sf_dir, "documents")
    page_html = F.concat(
        F.lit("x bib1_p1.jp2 y bib1_p2.jp2 bib1_p1.jp2 "),
        F.when(F.col("doc_id") % 2 == 1, F.lit("bib1_p3.jp2 noise.txt")).otherwise(
            F.lit("noise.txt")
        ),
    )
    return d.select(
        "doc_id",
        F.size(
            F.array_distinct(
                F.regexp_extract_all(page_html, F.lit(r"(bib\d+_p\d+\.jp2)"), 1)
            )
        ).alias("n_unique_files"),
    )


# ---------------------------------------------------------------------------
# P5/P8/F3/F5/F6: sanitizing projection + sentinel defaults
# ---------------------------------------------------------------------------

SANITIZE_ORACLE = """
WITH raw AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN NULL
              ELSE '  ' || upper(source) || '!! (' || lang || ')?  '
         END AS raw_title,
         CAST(1990 + doc_id % 30 AS VARCHAR) || '/'
          || lpad(CAST(1 + doc_id % 12 AS VARCHAR), 2, '0') || '/'
          || lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0') AS raw_date
  FROM documents
)
SELECT doc_id,
       coalesce(nullif(trim(regexp_replace(raw_title, '[^\\w\\s-]', '', 'g')), ''),
                'Unknown') AS clean_title,
       replace(raw_date, '/', '-') AS norm_date
FROM raw
"""


@query("exsan", oracle=SANITIZE_ORACLE)
def extract_sanitize_sentinel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: strip punctuation + trim + '/'→'-' + NULL→'Unknown' sentinel
    (reference process_search_result, src/01-scrape-images.py:413-420)."""
    d = load_table(spark, sf_dir, "documents")
    raw_title = F.when(F.col("doc_id") % 7 == 0, F.lit(None).cast("string")).otherwise(
        F.concat(
            F.lit("  "),
            F.upper("source"),
            F.lit("!! ("),
            F.col("lang"),
            F.lit(")?  "),
        )
    )
    raw_date = F.concat(
        (F.lit(1990) + F.col("doc_id") % 30).cast("string"),
        F.lit("/"),
        F.lpad((F.lit(1) + F.col("doc_id") % 12).cast("string"), 2, "0"),
        F.lit("/"),
        F.lpad((F.lit(1) + F.col("doc_id") % 28).cast("string"), 2, "0"),
    )
    return d.select(
        "doc_id",
        with_sentinel(F.nullif(sanitize_title(raw_title), F.lit("")), "Unknown").alias(
            "clean_title"
        ),
        F.translate(raw_date, "/", "-").alias("norm_date"),
    )


# ---------------------------------------------------------------------------
# P6/F4: rlike row-validation filter
# ---------------------------------------------------------------------------

RLIKE_ORACLE = """
WITH dated AS (
  SELECT lang,
         CASE WHEN doc_id % 5 = 0
              THEN CAST(1990 + doc_id % 30 AS VARCHAR) || '/01/15'
              ELSE CAST(1990 + doc_id % 30 AS VARCHAR) || '-01-15'
         END AS date_str
  FROM documents
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_valid
FROM dated
WHERE regexp_matches(date_str, '^\\d{4}-\\d{2}-\\d{2}$')
GROUP BY lang
"""


@query("rlike", oracle=RLIKE_ORACLE)
def filter_rlike_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: reject rows whose date doesn't match ^\\d{4}-\\d{2}-\\d{2}$
    (reference scrape_by_date_range validation,
    src/01-scrape-images.py:483-485)."""
    d = load_table(spark, sf_dir, "documents")
    date_str = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat((F.lit(1990) + F.col("doc_id") % 30).cast("string"), F.lit("/01/15")),
    ).otherwise(
        F.concat((F.lit(1990) + F.col("doc_id") % 30).cast("string"), F.lit("-01-15"))
    )
    return (
        d.select("lang", date_str.alias("date_str"))
        .where(F.col("date_str").rlike(r"^\d{4}-\d{2}-\d{2}$"))
        .groupBy("lang")
        .agg(F.count("*").alias("n_valid"))
    )


# ---------------------------------------------------------------------------
# P7/P9/F7: MIME classification case expression
# ---------------------------------------------------------------------------

MIME_ORACLE = """
WITH files AS (
  SELECT CASE doc_id % 5
           WHEN 0 THEN 'page_' || CAST(doc_id AS VARCHAR) || '.jp2'
           WHEN 1 THEN 'page_' || CAST(doc_id AS VARCHAR) || '.JP2'
           WHEN 2 THEN 'page_' || CAST(doc_id AS VARCHAR) || '.jpg'
           WHEN 3 THEN 'scan_' || CAST(doc_id AS VARCHAR) || '.pdf'
           ELSE 'notes_' || CAST(doc_id AS VARCHAR) || '.txt'
         END AS filename
  FROM documents
)
SELECT CASE
         WHEN lower(filename) LIKE '%.jp2' THEN 'image/jp2'
         WHEN lower(filename) LIKE '%.jpg' OR lower(filename) LIKE '%.jpeg'
           THEN 'image/jpeg'
         WHEN lower(filename) LIKE '%.pdf' THEN 'application/pdf'
         ELSE 'application/octet-stream'
       END AS mime,
       CAST(count(*) AS BIGINT) AS n_files
FROM files
GROUP BY 1
"""


@query("exmim", oracle=MIME_ORACLE)
def extract_mime_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9: extension→MIME dispatch with default (reference
    src/01-scrape-images.py:110-116); the .JP2 branch exercises the
    lower() step (F7)."""
    d = load_table(spark, sf_dir, "documents")
    doc_s = F.col("doc_id").cast("string")
    filename = (
        F.when(F.col("doc_id") % 5 == 0, F.concat(F.lit("page_"), doc_s, F.lit(".jp2")))
        .when(F.col("doc_id") % 5 == 1, F.concat(F.lit("page_"), doc_s, F.lit(".JP2")))
        .when(F.col("doc_id") % 5 == 2, F.concat(F.lit("page_"), doc_s, F.lit(".jpg")))
        .when(F.col("doc_id") % 5 == 3, F.concat(F.lit("scan_"), doc_s, F.lit(".pdf")))
        .otherwise(F.concat(F.lit("notes_"), doc_s, F.lit(".txt")))
    )
    return (
        d.select(mime_for_filename(filename).alias("mime"))
        .groupBy("mime")
        .agg(F.count("*").alias("n_files"))
    )


# ---------------------------------------------------------------------------
# F8/F9/F10: url decode + basename
# ---------------------------------------------------------------------------

URL_ORACLE = """
WITH urls AS (
  SELECT doc_id,
         'https://data.kb.se/files/dark%20archive/' || source || '%20'
          || CAST(doc_id AS VARCHAR) || '.jp2' AS url
  FROM documents
)
SELECT doc_id,
       (string_split(replace(url, '%20', ' '), '/'))[-1] AS decoded_name
FROM urls
"""


@query("exbas", oracle=URL_ORACLE)
def extract_url_basename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9/F10: percent-decode then take the last path segment (reference
    unquote + Path(...).name, src/01-scrape-images.py:458)."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://data.kb.se/files/dark%20archive/"),
        F.col("source"),
        F.lit("%20"),
        F.col("doc_id").cast("string"),
        F.lit(".jp2"),
    )
    return d.select(
        "doc_id", basename(F.url_decode(url)).alias("decoded_name")
    )


# ---------------------------------------------------------------------------
# F15: md5 digest
# ---------------------------------------------------------------------------

MD5_ORACLE = """
SELECT doc_id,
       md5(text)                  AS text_md5,
       substr(md5(source || ':' || text), 1, 8) AS short_key
FROM documents
"""


@query("exmd5", oracle=MD5_ORACLE)
def extract_md5_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F15: content digest (reference compute_md5,
    src/01-scrape-images.py:78-83) — the integrity-audit primitive the
    verified sink compares against."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.substring(F.md5(F.concat_ws(":", "source", "text")), 1, 8).alias(
            "short_key"
        ),
    )
