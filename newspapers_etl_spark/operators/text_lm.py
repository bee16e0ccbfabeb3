"""Bigram language-model surprisal — the context-aware step up from
``ppl``'s unigram scoring (operators/text_scoring.py).

No reference counterpart (the reference's text handling stops at regex
extraction).  Unigram surprisal flags globally-rare VOCABULARY; bigram
surprisal additionally flags incoherent SEQUENCES — word salad built
from common words scores near the unigram baseline but spikes under a
bigram model, which is why perplexity filters for training corpora are
n-gram (KenLM) rather than unigram.  The conditional is the MLE
P(w2|w1) = c(w1 w2) / c(w1 ·) over bigram instances, so every observed
bigram has positive probability and the model needs no smoothing — the
score ranks documents by in-corpus sequence typicality.

Scale design (same shape as ``ppl``, one extra dim):
* Bigram construction is map-side: a guarded index ``transform`` over
  the token array (docs under 2 tokens yield no bigrams and drop out,
  mirrored in the oracle's ``len(ts) >= 2``).
* Two model aggregations — bigram counts and left-context counts —
  shuffle on their keys with map-side partials absorbing the Zipf
  skew, then broadcast back onto the bigram stream; the only
  fact-sized shuffle is the final per-doc mean.  At 100 TB both
  broadcasts are capped: ``text_bigram_ppl(vocab_cap=V)`` keeps the
  top-V contexts and the top-V bigrams WITHIN retained contexts, and
  scores the tail with the smoothed LM_FLOOR_COUNT floor (the ``ppl``
  policy, one dim higher — see the query docstring for the exact
  fallback ladder).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from newspapers_etl_spark.catalog import load_table
from newspapers_etl_spark.functions.text import LM_FLOOR_COUNT, words
from newspapers_etl_spark.registry import query

BIGRAM_PPL_ORACLE = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), x -> x != '') AS ts
  FROM documents
),
b AS (
  SELECT doc_id,
         unnest([{'w1': ts[i], 'bg': ts[i] || ' ' || ts[i+1]}
                 FOR i IN range(1, len(ts))], recursive := true)
  FROM toks WHERE len(ts) >= 2
),
c12 AS (SELECT bg, CAST(count(*) AS DOUBLE) AS c12 FROM b GROUP BY bg),
c1  AS (SELECT w1, CAST(count(*) AS DOUBLE) AS c1  FROM b GROUP BY w1)
SELECT b.doc_id,
       CAST(count(*) AS BIGINT)                       AS n_big,
       round(avg(-ln(c12.c12 / c1.c1)), 6)            AS nll2,
       round(exp(avg(-ln(c12.c12 / c1.c1))), 4)       AS ppl2
FROM b JOIN c12 USING (bg) JOIN c1 USING (w1)
GROUP BY b.doc_id
"""


@query("ppl2", oracle=BIGRAM_PPL_ORACLE)
def text_bigram_ppl(
    spark: SparkSession, sf_dir: str, vocab_cap: int | None = None
) -> DataFrame:
    """Average per-bigram surprisal -ln(c(w1 w2)/c(w1 ·)) under the
    corpus's own bigram model, plus its exp() as a perplexity.

    Whitespace tokens never contain spaces, so ``w1 || ' ' || w2`` is a
    collision-free bigram key.  The token array is MATERIALIZED in a
    first projection before the pairing expression touches it:
    higher-order functions never enter codegen/CSE, so an index
    ``transform`` whose lambda re-references the tokenize expression
    re-splits the whole document PER BIGRAM — measured 17-19 s at
    sf0.1 vs ~2 s for this two-stage ``zip_with``-of-slices form
    (each shifted slice evaluates the stored array once).  The
    ``size >= 2`` guard stays: ``slice`` with length −1 (empty doc)
    errors rather than yielding empty.

    ``vocab_cap`` bounds BOTH model broadcasts at the 100 TB scale
    where the raw bigram vocabulary is data-dependent and unbounded:
    keep the top-V contexts by c(w1 ·), then the top-V bigrams whose
    context is retained (so a retained bigram always has its exact
    denominator, and p = c12/c1 <= 1 by construction; ties break to
    the lexically-smaller gram).  Fallback ladder for an instance
    (w1, bg), floor count f = LM_FLOOR_COUNT:
      * bigram retained:           p = c12 / c1        (exact)
      * context retained only:     p = f / c1          (tail bigram)
      * context not retained:      p = f / N_bigrams   (near-max
        surprisal — an unseen-context sequence is the least typical)
    Every capped score is >= the exact score (floor < any real count),
    head-gram documents score identically, and the broadcasts are
    bounded at V rows each — all three pytest-pinned in
    tests/test_lm_vocab_cap.py.  The registered default (None)
    broadcasts the full model — exact at fixture scale."""
    return bigram_ppl_over(
        load_table(spark, sf_dir, "documents"), vocab_cap=vocab_cap
    )


def bigram_ppl_over(d: DataFrame, vocab_cap: int | None = None) -> DataFrame:
    """The scoring core over ANY (doc_id, text) relation — the
    registered query binds it to the fixture table; the hypothesis
    differential test (tests/test_properties.py) runs it against the
    DuckDB oracle on generated corpora."""
    staged = d.select(
        "doc_id", F.filter(words("text"), lambda x: x != "").alias("t")
    )
    tt = F.col("t")
    pairs = F.zip_with(
        F.slice(tt, 1, F.size(tt) - 1),
        F.slice(tt, 2, F.size(tt) - 1),
        lambda a, b: F.struct(
            a.alias("w1"), F.concat_ws(" ", a, b).alias("bg")
        ),
    )
    bigrams = F.when(F.size(tt) >= 2, pairs).otherwise(
        F.array().cast("array<struct<w1:string,bg:string>>")
    )
    b = staged.select("doc_id", F.explode(bigrams).alias("s")).select(
        "doc_id", F.col("s.w1").alias("w1"), F.col("s.bg").alias("bg")
    )
    c12 = b.groupBy("bg").agg(F.count("*").cast("double").alias("c12"))
    c1 = b.groupBy("w1").agg(F.count("*").cast("double").alias("c1"))
    if vocab_cap is None:
        scored = b.join(F.broadcast(c12), "bg").join(F.broadcast(c1), "w1")
        p = F.col("c12") / F.col("c1")
    else:
        c1_top = c1.orderBy(F.desc("c1"), "w1").limit(vocab_cap)
        # bg determines w1 (tokens are space-free), so the context is
        # recoverable from the key — retain bigrams only inside retained
        # contexts, keeping p <= 1 by construction.
        c12_top = (
            c12.withColumn("w1", F.substring_index("bg", " ", 1))
            .join(c1_top.select("w1"), "w1", "semi")
            .orderBy(F.desc("c12"), "bg")
            .limit(vocab_cap)
        )
        nbig = b.agg(F.count("*").cast("double").alias("nb"))
        scored = (
            b.join(F.broadcast(c12_top.select("bg", "c12")), "bg", "left")
            .join(F.broadcast(c1_top), "w1", "left")
            .crossJoin(F.broadcast(nbig))
        )
        p = F.when(
            F.col("c1").isNotNull(),
            F.coalesce(F.col("c12"), F.lit(LM_FLOOR_COUNT)) / F.col("c1"),
        ).otherwise(F.lit(LM_FLOOR_COUNT) / F.col("nb"))
    nll = F.avg(-F.log(p))
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_big"),
        F.round(nll, 6).alias("nll2"),
        F.round(F.exp(nll), 4).alias("ppl2"),
    )
