"""Extraction & sanitization expressions (SURVEY.md §2.2 P1-P9, §2.6).

The reference implements these as per-row Python regex calls
(extract_manifest_id_from_html, reference src/01-scrape-images.py:270-279;
extract_date_from_html :281-294; process_search_result sanitize :413-420;
MIME dispatch :110-116).  Here each is a composable Column expression:
JVM-side, codegen-friendly, no Python round-trip — which is what lets the
same extraction run over 100 TB of scanned text without a Python worker
bottleneck.

Note Spark's ``regexp_extract`` returns ``''`` (not NULL) on no-match —
identical to DuckDB — so fallback chains must ``nullif`` before
``coalesce`` (SURVEY.md §7.4).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def regexp_extract_or_null(col: Column | str, pattern: str, idx: int = 1) -> Column:
    """``regexp_extract`` that yields NULL instead of '' on no-match."""
    return F.nullif(F.regexp_extract(col, pattern, idx), F.lit(""))


def first_match(col: Column | str, *patterns: str, group: int = 1) -> Column:
    """First-pattern-wins fallback chain (reference
    src/01-scrape-images.py:270-279 tries data-src= then src=; :281-294
    chains three date patterns).  NULL if nothing matches."""
    return F.coalesce(*[regexp_extract_or_null(col, p, group) for p in patterns])


def sanitize_title(col: Column | str) -> Column:
    """Strip non word/space/dash chars and trim (reference
    src/01-scrape-images.py:414 ``re.sub(r'[^\\w\\s-]', '', title).strip()``)."""
    return F.trim(F.regexp_replace(col, r"[^\w\s-]", ""))


def normalize_date(col: Column | str) -> Column:
    """``/`` → ``-`` date separator normalization (reference
    src/01-scrape-images.py:418)."""
    return F.translate(col, "/", "-")


def recompose_date(y: Column, m: Column, d: Column) -> Column:
    """Reassemble YYYY-MM-DD from digit groups (reference
    src/01-scrape-images.py:290-293 rebuilds from ``bibNNN_YYYYMMDD_``)."""
    return F.concat_ws("-", y, m, d)


def with_sentinel(col: Column | str, sentinel: str) -> Column:
    """NULL → sentinel default (reference src/01-scrape-images.py:413-420
    degrades missing title/date to 'Unknown'/'Unknown_Date')."""
    return F.coalesce(col, F.lit(sentinel))


def mime_for_filename(col: Column | str) -> Column:
    """Extension → MIME 3-branch case expression with default (reference
    src/01-scrape-images.py:110-116)."""
    lower = F.lower(col)
    return (
        F.when(lower.endswith(".jp2"), F.lit("image/jp2"))
        .when(lower.endswith(".jpg") | lower.endswith(".jpeg"), F.lit("image/jpeg"))
        .when(lower.endswith(".pdf"), F.lit("application/pdf"))
        .otherwise(F.lit("application/octet-stream"))
    )


def basename(col: Column | str) -> Column:
    """Last path/URL segment (reference src/01-scrape-images.py:342,458
    ``url.split('/')[-1]`` / ``Path(...).name``)."""
    return F.element_at(F.split(col, "/"), -1)
