"""Pure column-expression function library — zero Python UDFs.

Every extraction/sanitization the reference performs per-row in Python
(reference src/01-scrape-images.py:270-317, 387-432) compiles here to
built-in Spark column expressions, so the whole layer stays inside
Tungsten whole-stage codegen (SURVEY.md §2.8: "the single biggest
idiomatic-Spark win").
"""

from newspapers_etl_spark.functions.extraction import (  # noqa: F401
    basename,
    first_match,
    mime_for_filename,
    normalize_date,
    recompose_date,
    regexp_extract_or_null,
    sanitize_title,
    with_sentinel,
)
from newspapers_etl_spark.functions.text import (  # noqa: F401
    doc_fingerprint,
    quality_score,
    token_count_regex,
    token_count_ws,
    words,
)
from newspapers_etl_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_norm,
)
