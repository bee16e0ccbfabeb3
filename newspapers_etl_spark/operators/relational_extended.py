"""Extended relational coverage: multi-join analytical queries (TPC-H
Q3/Q5 shapes) and ordered-statistics aggregates.

The reference has no joins at all (SURVEY.md §2.3 — its join semantics
are per-row remote lookups); these queries exercise the join-heavy
plans a real warehouse workload runs over the same star schema, which
is where Catalyst's join reordering, broadcast selection, and AQE
matter most at 100 TB.

Scale notes per query are on the functions; the common theme: dims are
broadcast (explicitly where the stats might not be there at scale),
fact-fact joins shuffle on the join key once, and aggregations sit
above the joins so partial aggregation compresses before the final
exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from newspapers_etl_spark.catalog import load_table
from newspapers_etl_spark.registry import query

# ---------------------------------------------------------------------------
# Q3 shape: shipping-priority top-N over a 3-way join
# ---------------------------------------------------------------------------

Q3_ORACLE = """
SELECT l.l_orderkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       o.o_orderdate,
       o.o_orderpriority
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l.l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@query("q3shp", oracle=Q3_ORACLE)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customers ⋈ date-filtered orders
    ⋈ lineitem, revenue per order, top 10.  Both date predicates push to
    their scans; customer (after the segment filter) broadcasts into
    orders; the surviving orders⋈lineitem is the only fact shuffle;
    orderBy+limit plans TakeOrderedAndProject, never a global sort."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp_ntz")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q5 shape: local-supplier volume over a 6-way join
# ---------------------------------------------------------------------------

Q5_ORACLE = """
SELECT n.n_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM region r
JOIN nation n    ON n.n_regionkey = r.r_regionkey
JOIN supplier s  ON s.s_nationkey = n.n_nationkey
JOIN lineitem l  ON l.l_suppkey   = s.s_suppkey
JOIN orders o    ON o.o_orderkey  = l.l_orderkey
JOIN customer c  ON c.c_custkey   = o.o_custkey
                AND c.c_nationkey = s.s_nationkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
"""


@query("q5vol", oracle=Q5_ORACLE)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with the local-supplier correlation
    (customer nation == supplier nation).  All four dims broadcast —
    region filters nation, nation filters supplier, so the fact only
    meets pre-shrunk build sides; orders⋈lineitem is again the single
    fact-fact shuffle, and the 5-row group-by collapses map-side."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(
            F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
            s.s_nationkey == n.n_nationkey,
        )
        .join(
            F.broadcast(c),
            (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Unpivot (melt) — the inverse of pivot_status_by_priority
# ---------------------------------------------------------------------------

UNPIVOT_ORACLE = """
WITH wide AS (
  SELECT o_orderpriority,
         CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
         CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_o,
         CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_p
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority, status, n
FROM wide UNPIVOT (n FOR status IN (n_f, n_o, n_p))
"""


@query("unpvt", oracle=UNPIVOT_ORACLE)
def agg_unpivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unpivot/melt: wide per-status count columns back to long form —
    the inverse of the pivot operator.  Map-side row expansion (×3), no
    shuffle beyond the upstream aggregate."""
    o = load_table(spark, sf_dir, "orders")
    wide = o.groupBy("o_orderpriority").agg(
        *[
            F.count(F.when(F.col("o_orderstatus") == s, 1)).alias(f"n_{s.lower()}")
            for s in ("F", "O", "P")
        ]
    )
    return wide.unpivot(
        ids=["o_orderpriority"],
        values=["n_f", "n_o", "n_p"],
        variableColumnName="status",
        valueColumnName="n",
    )


# ---------------------------------------------------------------------------
# explode_outer — fan-out that PRESERVES empty parents
# ---------------------------------------------------------------------------

EXPLODE_OUTER_ORACLE = """
WITH manifests AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 4 = 0 THEN CAST([] AS VARCHAR[])
              ELSE ['p1_' || CAST(o_orderkey AS VARCHAR),
                    'p2_' || CAST(o_orderkey AS VARCHAR)] END AS pages
  FROM orders WHERE o_orderkey % 20 = 0
)
SELECT m.o_orderkey, p.page
FROM manifests m LEFT JOIN (
  SELECT o_orderkey, unnest(pages) AS page FROM manifests
) p USING (o_orderkey)
"""


@query("expo", oracle=EXPLODE_OUTER_ORACLE)
def explode_outer_empty_manifests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer: the issue→files fan-out (J3) that KEEPS issues
    whose manifest has no pages (NULL page row) — a plain explode
    silently drops them, which is exactly how an audit misses empty
    manifests (the reference logs-and-continues at
    src/01-scrape-images.py:444-448)."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.pmod("o_orderkey", F.lit(20)) == 0
    )
    manifests = o.select(
        "o_orderkey",
        F.when(
            F.pmod("o_orderkey", F.lit(4)) == 0,
            F.array().cast("array<string>"),
        )
        .otherwise(
            F.array(
                F.concat(F.lit("p1_"), F.col("o_orderkey")),
                F.concat(F.lit("p2_"), F.col("o_orderkey")),
            )
        )
        .alias("pages"),
    )
    return manifests.select(
        "o_orderkey", F.explode_outer("pages").alias("page")
    )


# ---------------------------------------------------------------------------
# Ordered statistics: exact percentiles + argmin/argmax
# ---------------------------------------------------------------------------

PERCENTILES_ORACLE = """
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.25), 4) AS q25,
       round(quantile_cont(l_quantity, 0.50), 4) AS q50,
       round(quantile_cont(l_quantity, 0.75), 4) AS q75,
       round(quantile_cont(l_quantity, 0.99), 4) AS q99
FROM lineitem
GROUP BY l_returnflag
"""


@query("apctl", oracle=PERCENTILES_ORACLE)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles per group (`percentile` =
    DuckDB's quantile_cont).  Exact percentile buffers the group's
    values — fine per (returnflag); for high-cardinality keys at 100 TB
    switch to percentile_approx (t-digest, mergeable, bounded memory)."""
    li = load_table(spark, sf_dir, "lineitem")
    pcts = {"q25": 0.25, "q50": 0.50, "q75": 0.75, "q99": 0.99}
    return li.groupBy("l_returnflag").agg(
        *[
            F.round(F.percentile("l_quantity", F.lit(p)), 4).alias(name)
            for name, p in pcts.items()
        ]
    )


ARGMINMAX_ORACLE = """
SELECT l_returnflag,
       arg_max(l_orderkey, l_extendedprice) AS priciest_order,
       arg_min(l_orderkey, l_extendedprice) AS cheapest_order,
       max(l_extendedprice)                 AS max_price,
       min(l_extendedprice)                 AS min_price
FROM lineitem
GROUP BY l_returnflag
"""


@query("tdig")  # rows-only: t-digest estimates are engine-specific
def agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB percentile path: percentile_approx (t-digest sketch) —
    mergeable partial state, bounded memory per group regardless of
    group size; exact percentiles (agg_percentiles) buffer the group.
    Rows-only because sketch estimates are engine-specific; the exact
    variant is the accuracy oracle.  The quantile array is posexploded
    into one scalar row per (group, quantile) — scalar-only output is
    the driver's de-facto canonicalization contract (array columns are
    unhashable in its pandas sort)."""
    li = load_table(spark, sf_dir, "lineitem")
    qs = [0.25, 0.5, 0.75, 0.99]
    agged = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_quantity", qs, 10_000).alias("quantiles"),
        F.count("*").alias("n_rows"),
    )
    return agged.select(
        "l_returnflag",
        "n_rows",
        F.posexplode("quantiles").alias("q_idx", "quantile_est"),
    ).select(
        "l_returnflag",
        F.element_at(F.array(*[F.lit(q) for q in qs]), F.col("q_idx") + 1).alias("q"),
        "quantile_est",
        "n_rows",
    )


@query("argmm", oracle=ARGMINMAX_ORACLE)
def agg_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (SQL arg_max/arg_min): the 'which row holds the
    extreme' aggregate — one pass, no self-join-on-max anti-pattern.
    Deterministic here because l_extendedprice values are distinct per
    group in the fixtures; on tie-prone data add a tiebreak column."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.max_by("l_orderkey", "l_extendedprice").alias("priciest_order"),
        F.min_by("l_orderkey", "l_extendedprice").alias("cheapest_order"),
        F.max("l_extendedprice").alias("max_price"),
        F.min("l_extendedprice").alias("min_price"),
    )


# ---------------------------------------------------------------------------
# Distribution window functions: ntile / percent_rank / cume_dist
# ---------------------------------------------------------------------------

WIN_DIST_ORACLE = """
SELECT c_custkey,
       c_mktsegment,
       CAST(ntile(10) OVER w AS INT)        AS decile,
       round(percent_rank() OVER w, 6)      AS pct_rank,
       round(cume_dist() OVER w, 6)         AS cume
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
"""


@query("wdist", oracle=WIN_DIST_ORACLE)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-family window functions (ntile decile, percent_rank,
    cume_dist) over account balance per market segment — the last
    window-function class the surface didn't cover.  The c_custkey
    tie-break makes the frame ordering total, so ntile bucket edges are
    identical across engines.  All three functions share ONE window
    spec → one exchange + one sort; segments are balanced, so no salting
    needed (the skewed-stratum variant is topk_lang's two-phase plan)."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(10).over(w).cast("int").alias("decile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


# ---------------------------------------------------------------------------
# Cohort analysis: customers by first-order month × month offset
# ---------------------------------------------------------------------------

COHORTS_ORACLE = """
WITH firsts AS (
  SELECT o_custkey, date_trunc('month', min(o_orderdate)) AS cohort
  FROM orders GROUP BY o_custkey
),
acts AS (
  SELECT o.o_custkey, f.cohort,
         date_diff('month', f.cohort, date_trunc('month', o.o_orderdate)) AS offset_m
  FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
)
SELECT cohort, CAST(offset_m AS INT) AS offset_m,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust
FROM acts
GROUP BY cohort, offset_m
"""


@query("cohrt", oracle=COHORTS_ORACLE)
def order_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort-retention matrix over orders: customers grouped by
    first-order month, activity counted at each month offset.  Two
    shuffles on o_custkey (first-order agg, then the join back — at
    scale these co-locate if orders is bucketed by custkey) and one
    tiny shuffle to the (cohort, offset) grain; the month arithmetic is
    exact integers on month-truncated timestamps, so no float boundary
    can disagree with the oracle."""
    o = load_table(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort")
    )
    acts = o.select(
        "o_custkey", F.date_trunc("month", "o_orderdate").alias("om")
    ).join(firsts, "o_custkey")
    return (
        acts.select(
            "o_custkey",
            "cohort",
            F.months_between("om", "cohort").cast("int").alias("offset_m"),
        )
        .groupBy("cohort", "offset_m")
        .agg(F.count_distinct("o_custkey").alias("n_cust"))
    )
