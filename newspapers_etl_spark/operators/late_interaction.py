"""Late-interaction multi-vector scoring (`mxsim`): MaxSim over
per-document token-vector sets — the ColBERT retrieval pattern
(Khattab & Zaharia, SIGIR 2020), where score(q, d) = Σ over q's token
vectors of the max cosine against d's token vectors.  No reference
counterpart; the shape follows the public late-interaction literature
re-expressed as DataFrame ops.

Why an engine needs this: single-vector search (`bftk`/`ivftk`)
collapses a document to one point, losing term-level matching;
late interaction keeps one vector PER TOKEN and defers the
interaction to query time — better ranking with the corpus-side
encoding still precomputable/indexable.

Multi-vector fixture encoding: the embeddings table's vectors are
grouped ``doc = vec_id div TOKENS_PER_DOC`` — each "document" owns a
contiguous token-vector set, the layout a real multi-vector pipeline
materializes per chunk (`chnk`) or passage.

Scale design:
- The query side (Q probe docs × their token vectors — tens of rows)
  is broadcast; the corpus token relation is scored IN PLACE, one
  linear scan, exactly like the single-vector family.
- The MaxSim reduction runs on the SCORED SKINNY rows (qdoc, doc,
  qtok, sim) — never vectors: per-token max then per-doc sum are both
  algebraic, so partial aggregation folds them map-side before any
  exchange and the shuffle carries candidate ids + doubles only.
- At 100 TB the candidate set comes from an ANN prefilter (`ivftk` /
  `fann` over the token vectors, union of per-token candidates — the
  public ColBERTv2 recipe); the registered fixture query scores
  brute-force so the oracle can replay it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from newspapers_etl_spark.catalog import load_table
from newspapers_etl_spark.functions.lloyd_sql import SQL_DOT, SQL_NORM
from newspapers_etl_spark.functions.vectors import dot, l2_norm
from newspapers_etl_spark.registry import query

TOKENS_PER_DOC = 5
N_PROBE_DOCS = 2
MAXSIM_TOP_K = 10

MAXSIM_ORACLE = f"""
WITH t AS (
  SELECT vec_id // {TOKENS_PER_DOC} AS doc, vec_id, embedding,
         {SQL_NORM.format(a="embedding")} AS nrm
  FROM embeddings WHERE embedding IS NOT NULL
),
pair AS (
  SELECT q.doc AS qdoc, q.vec_id AS qtok, c.doc AS doc,
         round({SQL_DOT.format(a="c.embedding", b="q.embedding")}
               / (q.nrm * c.nrm), 6) AS sim
  FROM t q JOIN t c ON c.doc <> q.doc
  WHERE q.doc < {N_PROBE_DOCS}
),
tokmax AS (
  SELECT qdoc, doc, qtok, max(sim) AS m
  FROM pair GROUP BY qdoc, doc, qtok
),
scored AS (
  SELECT qdoc, doc, round(sum(m), 6) AS score
  FROM tokmax GROUP BY qdoc, doc
)
SELECT qdoc AS probe_doc, doc AS doc_id, score,
       CAST(row_number() OVER (PARTITION BY qdoc
                               ORDER BY score DESC, doc) AS INTEGER) AS rnk
FROM scored
QUALIFY rnk <= {MAXSIM_TOP_K}
"""


def token_relation(e: DataFrame, tokens_per_doc: int = TOKENS_PER_DOC) -> DataFrame:
    """(doc, vec_id, embedding, nrm): the corpus token-vector relation,
    documents = contiguous vec_id groups.  Norms computed once per
    token row, before any scoring join (the `bftk` discipline).

    ids must be non-negative (the fixtures' contract): Spark's ``DIV``
    truncates toward zero while DuckDB's ``//`` floors, so a negative
    vec_id would group differently across engines."""
    return e.filter(F.col("embedding").isNotNull()).select(
        F.expr(f"vec_id DIV {tokens_per_doc}").alias("doc"),
        "vec_id",
        "embedding",
        l2_norm("embedding").alias("nrm"),
    )


def maxsim_topk(
    t: DataFrame,
    n_probe_docs: int = N_PROBE_DOCS,
    k: int = MAXSIM_TOP_K,
) -> DataFrame:
    """MaxSim top-k over a token relation ``t(doc, vec_id, embedding,
    nrm)``: per (probe doc, candidate doc), Σ over probe tokens of the
    max rounded cosine against the candidate's tokens; probe docs are
    ``doc < n_probe_docs`` and never score against themselves.

    Pairwise sims round to 6 dp BEFORE the max/sum (max of rounded
    values is engine-order-free; the ≤TOKENS_PER_DOC-term sum of 6-dp
    multiples re-rounds without boundary risk), so the oracle replays
    the ranking exactly."""
    probes = t.filter(F.col("doc") < n_probe_docs).select(
        F.col("doc").alias("qdoc"),
        F.col("vec_id").alias("qtok"),
        F.col("embedding").alias("qvec"),
        F.col("nrm").alias("qnrm"),
    )
    pair = (
        t.crossJoin(F.broadcast(probes))
        .filter(F.col("doc") != F.col("qdoc"))
        .select(
            "qdoc",
            "qtok",
            "doc",
            F.round(
                dot("qvec", "embedding") / (F.col("qnrm") * F.col("nrm")), 6
            ).alias("sim"),
        )
    )
    # ONE exchange for both reductions: hash-partitioning on (qdoc,
    # doc) satisfies the clustering requirement of the (qdoc, doc,
    # qtok) max AND the (qdoc, doc) sum (partitioning keys ⊆ grouping
    # keys), so neither groupBy adds its own shuffle — without this,
    # Catalyst plans a second exchange to re-cluster the per-token
    # maxes (plan-pinned in tests/test_plans.py).  Map-side partial
    # max still folds before the exchange.
    scored = (
        pair.repartition("qdoc", "doc")
        .groupBy("qdoc", "doc", "qtok")
        .agg(F.max("sim").alias("m"))
        .groupBy("qdoc", "doc")
        .agg(F.round(F.sum("m"), 6).alias("score"))
    )
    w = Window.partitionBy("qdoc").orderBy(F.desc("score"), F.asc("doc"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            F.col("qdoc").alias("probe_doc"),
            F.col("doc").alias("doc_id"),
            "score",
            "rnk",
        )
    )


@query("mxsim", oracle=MAXSIM_ORACLE)
def late_interaction_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MaxSim top-{MAXSIM_TOP_K} per probe document over the fixture's
    multi-vector encoding (embeddings grouped {TOKENS_PER_DOC} token
    vectors per doc), probe docs excluded from their own candidates."""
    e = load_table(spark, sf_dir, "embeddings")
    return maxsim_topk(token_relation(e))
