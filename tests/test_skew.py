"""Salting equivalence (the 100 TB skew story): salted two-phase
aggregation and salted broadcast join produce exactly the plain plan's
results on a deliberately skewed input."""

from __future__ import annotations

from pyspark.sql import functions as F

from newspapers_etl_spark.functions.skew import salted_agg, salted_broadcast_join


def _skewed(spark, n=20_000):
    """~90% of rows share one hot key — the 'Dagens Nyheter' shape."""
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot"))
        .otherwise(F.concat(F.lit("cold-"), (F.col("id") % 100)))
        .alias("k"),
        (F.col("id") % 7).cast("double").alias("v"),
    )


def test_salted_agg_equals_plain_agg(spark):
    df = _skewed(spark)
    plain = {
        (r.k): (r.n, r.total, r.mx)
        for r in df.groupBy("k")
        .agg(
            F.count("*").alias("n"),
            F.sum("v").alias("total"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r.k): (r.n, r.total, r.mx)
        for r in salted_agg(
            df,
            keys=["k"],
            partials=[
                F.count("*").alias("pn"),
                F.sum("v").alias("pt"),
                F.max("v").alias("pm"),
            ],
            merges=[
                F.sum("pn").alias("n"),
                F.sum("pt").alias("total"),
                F.max("pm").alias("mx"),
            ],
        ).collect()
    }
    assert salted == plain


def test_salted_broadcast_join_equals_plain_join(spark):
    facts = _skewed(spark)
    dim = facts.select("k").distinct().withColumn("attr", F.length("k"))
    plain = sorted(
        map(tuple, facts.join(dim, "k").select("k", "v", "attr").collect())
    )
    salted = sorted(
        map(
            tuple,
            salted_broadcast_join(facts, dim, "k")
            .select("k", "v", "attr")
            .collect(),
        )
    )
    assert salted == plain
