"""URL canonicalization — the normalization step a web-corpus pipeline
runs before URL-level dedup and per-domain capping.

The reference touches this space twice: it percent-decodes download
URLs before deriving filenames (reference src/01-scrape-images.py:458,
covered by `extract_basename`) and keys its existence checks on exact
name matches (src/01-scrape-images.py:141-149) — which silently treats
`https://Example.com/a?utm_source=x` and `https://example.com/a` as
different resources.  Canonicalization closes that class of miss:
scheme+host lowercase (path stays case-sensitive per RFC 3986), a
leading `www.` stripped, tracking (`utm_*`) parameters dropped, the
fragment removed, and the trailing slash trimmed; the registered
domain (last two host labels) becomes the grouping key for per-domain
corpus caps.

The fixture has no URL column, so the query synthesizes deterministic
messy URLs from (source, doc_id) — uppercase host, utm noise, fragment
— and the oracle synthesizes the identical strings, so the full
canonicalization expression participates in the value hash.

Scale design: pure per-row regexp/array expressions, zero UDFs, zero
shuffles until the final per-domain rollup (partial-aggregable, a few
dozen groups).  At 100 TB this is a map-only pass fused into whatever
scan precedes it."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from newspapers_etl_spark.catalog import load_table
from newspapers_etl_spark.registry import query

HOST_RE = r"^https?://([^/?#]+)"
PATH_RE = r"^https?://[^/?#]+([^?#]*)"
QUERY_RE = r"\?([^#]*)"
DOMAIN_RE = r"([^.]+\.[^.]+)$"


def canonical_url(url: Column) -> Column:
    """Lowercased scheme+host (www-stripped), original-case path minus
    any trailing slash, query minus utm_* params, no fragment."""
    host = F.regexp_replace(
        F.lower(F.regexp_extract(url, HOST_RE, 1)), r"^www\.", ""
    )
    path = F.regexp_replace(F.regexp_extract(url, PATH_RE, 1), r"/$", "")
    params = F.filter(
        F.split(F.regexp_extract(url, QUERY_RE, 1), "&"),
        lambda p: (p != "") & ~F.startswith(p, F.lit("utm_")),
    )
    q = F.array_join(params, "&")
    return F.concat(
        F.lit("https://"),
        host,
        path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )


def registered_domain(url: Column) -> Column:
    """Last two labels of the canonical host — the per-domain capping
    key (a public-suffix list refines this for ccTLDs; two labels is
    the dependency-free approximation)."""
    host = F.regexp_replace(
        F.lower(F.regexp_extract(url, HOST_RE, 1)), r"^www\.", ""
    )
    return F.regexp_extract(host, DOMAIN_RE, 1)


URL_CANON_ORACLE = f"""
WITH urls AS (
  SELECT doc_id,
         'https://WWW.' || source || '.Example.'
          || CASE doc_id % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org' ELSE 'net' END
          || '/Articles/' || CAST(doc_id AS VARCHAR)
          || CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END
          || '?utm_source=feed&id=' || CAST(doc_id AS VARCHAR)
          || '&utm_campaign=x#sec' AS url
  FROM documents
),
canon AS (
  SELECT doc_id,
         'https://'
          || regexp_replace(lower(regexp_extract(url, '{HOST_RE}', 1)), '^www\\.', '')
          || regexp_replace(regexp_extract(url, '{PATH_RE}', 1), '/$', '')
          || CASE WHEN array_to_string(list_filter(
                    string_split(regexp_extract(url, '{QUERY_RE}', 1), '&'),
                    p -> p != '' AND NOT starts_with(p, 'utm_')), '&') != ''
                  THEN '?' || array_to_string(list_filter(
                    string_split(regexp_extract(url, '{QUERY_RE}', 1), '&'),
                    p -> p != '' AND NOT starts_with(p, 'utm_')), '&')
                  ELSE '' END AS canon_url,
         regexp_extract(
           regexp_replace(lower(regexp_extract(url, '{HOST_RE}', 1)), '^www\\.', ''),
           '{DOMAIN_RE}', 1) AS domain
  FROM urls
)
SELECT domain,
       CAST(count(*) AS BIGINT)                    AS n_urls,
       CAST(count(DISTINCT canon_url) AS BIGINT)   AS n_canon,
       min(canon_url)                              AS sample_url
FROM canon
GROUP BY domain
"""


@query("urlcn", oracle=URL_CANON_ORACLE)
def url_canon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalize synthesized messy URLs and roll up per registered
    domain (url count, distinct canonical count, deterministic sample).
    The sample_url in the hash proves the full canonical form —
    lowercased www-stripped host, trailing-slash trim, utm_* removal,
    fragment drop — matches the oracle byte for byte."""
    d = load_table(spark, sf_dir, "documents")
    doc_s = F.col("doc_id").cast("string")
    tld = (
        F.when(F.col("doc_id") % 3 == 0, "com")
        .when(F.col("doc_id") % 3 == 1, "org")
        .otherwise("net")
    )
    url = F.concat(
        F.lit("https://WWW."),
        F.col("source"),
        F.lit(".Example."),
        tld,
        F.lit("/Articles/"),
        doc_s,
        F.when(F.col("doc_id") % 4 == 0, "/").otherwise(""),
        F.lit("?utm_source=feed&id="),
        doc_s,
        F.lit("&utm_campaign=x#sec"),
    )
    canon = d.select(
        canonical_url(url).alias("canon_url"),
        registered_domain(url).alias("domain"),
    )
    return canon.groupBy("domain").agg(
        F.count("*").alias("n_urls"),
        F.count_distinct("canon_url").alias("n_canon"),
        F.min("canon_url").alias("sample_url"),
    )
