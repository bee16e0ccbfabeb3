"""Relational core: scans w/ pushdown, joins (inner/semi/anti/broadcast),
aggregations, rollup/cube/grouping sets, windows, top-k, set ops, explode
fan-out (SURVEY.md §2.3-§2.5).

The reference implements join *semantics* as per-row remote lookups (the
skip-existing anti-join, reference src/01-scrape-images.py:181-188,462-465;
the issue→files fan-out :440-459) and aggregation as Python counters
(success accounting :456-477).  Here each is the declarative Spark
primitive so Catalyst picks the physical strategy: broadcast-hash for
dim joins, sort-merge + AQE skew handling for fact-fact, partial
(map-side) aggregation before every shuffle.

Scale notes (100 TB):
- Date-range predicates sit directly on the parquet scan → row-group
  min/max skipping + partition pruning (verified by tests asserting
  PushedFilters in the physical plan).
- Dimension sides of star joins are broadcast explicitly
  (catalog.BROADCAST_TABLES) — no shuffle of the fact table for dims.
- groupBy on (flag, status)-cardinality keys is a 6-group agg: partial
  agg reduces each partition to ~6 rows before the shuffle, so the
  shuffle volume is O(partitions), not O(rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from newspapers_etl_spark.catalog import load_table
from newspapers_etl_spark.registry import query


def _orders_in_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-range scan with pushed-down predicate (reference S1: the archive
    search URL embeds from/to, src/01-scrape-images.py:487-491 — here the
    range reaches the parquet reader as PushedFilters)."""
    return load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )


# ---------------------------------------------------------------------------
# Flagship (SURVEY.md §7.2): one query covering scan-pushdown, filter, join,
# agg, all-success accounting, anti-join, dedup — the spine of the reference:
# "for a date range, which issues exist, how many pages, what's outstanding?"
# orders=issues, lineitem=pages, returned lines=already-processed set.
# ---------------------------------------------------------------------------

FLAGSHIP_ORACLE = """
WITH o AS (
  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate <  TIMESTAMP '1997-01-01'
),
agg AS (
  SELECT o.o_orderkey,
         o.order_date,
         count(*) AS n_files,
         CAST(sum(CASE WHEN l.l_shipdate <= TIMESTAMP '1997-06-30'
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_shipped
  FROM o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
)
SELECT a.o_orderkey, a.order_date, a.n_files, a.n_shipped,
       (a.n_shipped = a.n_files) AS complete
FROM agg a
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem r
  WHERE r.l_returnflag = 'R' AND r.l_orderkey = a.o_orderkey
)
"""


# expl_wrd registers FIRST in this module (moved r11): relational
# straddles the driver's ~50-slot window boundary so this query —
# the oldest union row (r7, missed the r10 cap) — lands at slot 50
# while the 20 r10-hashed queries ride at 51+.
EXPLODE_ORACLE = """
SELECT word, count(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
WHERE length(word) > 0
GROUP BY word
HAVING count(*) >= 5
"""


@query("explw", oracle=EXPLODE_ORACLE)
def explode_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Issue→files 1:N fan-out (J3, reference download_newspaper_issue
    src/01-scrape-images.py:440-459) as explode + count."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= 5)
    )


@query("flags", oracle=FLAGSHIP_ORACLE)
def flagship_issue_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's daily loop as ONE declarative plan (S1+J1+A1):
    date-range scan with the predicate pushed to the source (reference
    src/01-scrape-images.py builds the search URL per day), fan-out to
    items, anti-join against already-delivered keys (the skip-if-exists
    idempotency at :357-359,462-465), and per-day success accounting
    (downloaded vs expected, :500,553) — "process only what's missing"
    as a query, not a crawl."""
    orders = _orders_in_range(spark, sf_dir).select(
        "o_orderkey", F.to_date("o_orderdate").alias("order_date")
    )
    li = load_table(spark, sf_dir, "lineitem")
    # J3 fan-out join + A1 success accounting: count(*) vs shipped count.
    agg = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "order_date")
        .agg(
            F.count("*").alias("n_files"),
            F.sum(
                F.when(F.col("l_shipdate") <= "1997-06-30", 1).otherwise(0)
            ).alias("n_shipped"),
        )
    )
    # J1 incremental skip: anti-join against the already-processed set.
    # No distinct on the right side — anti-join semantics don't need a
    # deduplicated build side, and the extra exchange+aggregate stage on
    # lineitem-derived data is pure waste at scale.
    processed = li.where(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        agg.join(processed, agg.o_orderkey == processed.l_orderkey, "left_anti")
        .withColumn("complete", F.col("n_shipped") == F.col("n_files"))
        .select("o_orderkey", "order_date", "n_files", "n_shipped", "complete")
    )


# ---------------------------------------------------------------------------
# Aggregation core
# ---------------------------------------------------------------------------

Q1_ORACLE = """
SELECT l_returnflag,
       l_linestatus,
       round(sum(l_quantity), 2)                                       AS sum_qty,
       round(sum(l_extendedprice), 2)                                  AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)               AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4)                                       AS avg_qty,
       round(avg(l_extendedprice), 4)                                  AS avg_price,
       round(avg(l_discount), 4)                                       AS avg_disc,
       count(*)                                                        AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01'
GROUP BY l_returnflag, l_linestatus
"""


@query("q1pr", oracle=Q1_ORACLE)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: the canonical partial-agg showcase —
    map-side combine collapses every scan partition to ≤6 rows pre-shuffle."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= "2000-12-01"
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
        F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


ROLLUP_ORACLE = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       round(sum(l_quantity), 2)     AS sum_qty,
       count(*)                      AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@query("aroll", oracle=ROLLUP_ORACLE)
def agg_rollup_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (absent from the reference — SURVEY §2.4 lists
    grouping sets as a built-in the rebuild exposes)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count("*").alias("n_rows"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n_rows",
        )
    )


CUBE_ORACLE = """
SELECT coalesce(o_orderstatus, 'ALL')   AS orderstatus,
       coalesce(o_orderpriority, 'ALL') AS orderpriority,
       round(sum(o_totalprice), 2)      AS sum_price,
       count(*)                         AS n_orders
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@query("acube", oracle=CUBE_ORACLE)
def agg_cube_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all 2^2 grouping combinations in
    one pass — map-side expansion, no query union (SURVEY §2.4; absent
    from the reference, which has no grouped reporting at all)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            F.count("*").alias("n_orders"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "sum_price",
            "n_orders",
        )
    )


GROUPING_SETS_ORACLE = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       count(*)                      AS n_rows
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
"""


@query("agset", oracle=GROUPING_SETS_ORACLE)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via DataFrame.groupingSets (Spark 4.x) — no temp-view
    side effect on the shared session (a createOrReplaceTempView here would
    silently shadow catalog.register_views state for concurrent callers)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag"], ["l_linestatus"]], "l_returnflag", "l_linestatus"
        )
        .agg(F.count("*").alias("n_rows"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_rows",
        )
    )


COUNT_DISTINCT_ORACLE = """
SELECT l_returnflag,
       count(DISTINCT l_suppkey)  AS n_suppliers,
       count(DISTINCT l_partkey)  AS n_parts,
       count(*)                   AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""


@query("acdst", oracle=COUNT_DISTINCT_ORACLE)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-column distinct aggregation (Catalyst expands to
    partial-distinct + final agg). The approximate variant is
    agg_approx_distinct (rows-only check — HLL sketches differ by engine)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count("*").alias("n_rows"),
    )


@query("andv")  # rows-only: HLL estimates are engine-specific
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct — the 100 TB path where exact distinct would
    shuffle every key; HLL sketches merge associatively so this needs one
    map-side pass + tiny shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.count("*").alias("n_rows"),
    )


PIVOT_ORACLE = """
SELECT o_orderpriority,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_o,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_p
FROM orders
GROUP BY o_orderpriority
"""


@query("pivot", oracle=PIVOT_ORACLE)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (never let Spark scan for distinct
    pivot values at 100 TB — declare them)."""
    o = load_table(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("n_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("n_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_p"),
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------

STAR_JOIN_ORACLE = """
SELECT n.n_name AS nation,
       r.r_name AS region,
       round(sum(o.o_totalprice), 2) AS revenue,
       count(*) AS n_orders
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
JOIN region r   ON r.r_regionkey = n.n_regionkey
WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY 1, 2
"""


@query("jstar", oracle=STAR_JOIN_ORACLE)
def join_broadcast_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact orders against three dims, all broadcast — the fact
    table never shuffles for the join, only for the final small-key agg."""
    o = _orders_in_range(spark, sf_dir)
    c = F.broadcast(load_table(spark, sf_dir, "customer"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


SEMI_ORACLE = """
SELECT c.c_custkey, c.c_name, c.c_mktsegment
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O'
)
"""


@query("jsemi", oracle=SEMI_ORACLE)
def join_semi_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join — existence filter without duplication: customers
    with at least one open order, never multiplied by their order count
    (the complement of J1's anti-join; the probe side reduces to
    distinct keys before the join under the hood)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


ANTI_ORACLE = """
SELECT c.c_custkey, c.c_name, c.c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


@query("janti", oracle=ANTI_ORACLE)
def join_anti_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's core incremental primitive as a relation op: rows with
    no counterpart in the catalog (J1, src/01-scrape-images.py:181-188)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


OUTER_ORACLE = """
SELECT c.c_custkey,
       CAST(count(o.o_orderkey) AS BIGINT)            AS n_orders,
       round(coalesce(sum(o.o_totalprice), 0.0), 2)   AS total_spent
FROM customer c
LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY 1
"""


@query("jleft", oracle=OUTER_ORACLE)
def join_left_outer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-before-join: orders is reduced to one row per o_custkey
    BEFORE the join, so the shuffle carries the 1-row-per-key aggregate,
    not the whole fact table — at 100× scale this halves shuffled volume
    vs joining raw orders onto customer and grouping after."""
    c = load_table(spark, sf_dir, "customer")
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("o_orderkey").alias("cnt"),
            F.sum("o_totalprice").alias("spent"),
        )
    )
    return c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left").select(
        "c_custkey",
        F.coalesce(F.col("cnt"), F.lit(0).cast("long")).alias("n_orders"),
        F.round(F.coalesce(F.col("spent"), F.lit(0.0)), 2).alias("total_spent"),
    )


RANGE_JOIN_ORACLE = """
SELECT o.o_orderkey,
       CAST(count(*) AS BIGINT) AS n_late_lines
FROM orders o
JOIN lineitem l
  ON l.l_orderkey = o.o_orderkey
 AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
GROUP BY 1
"""


@query("jrang", oracle=RANGE_JOIN_ORACLE)
def join_range_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join with a range residual (ship > order + 90d) — the equi key
    carries the shuffle, the range predicate evaluates post-match, so this
    stays a hash/sort-merge join, never a cartesian."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # Timestamp arithmetic (not date_add, which truncates to DATE) so
    # non-midnight order timestamps match the oracle's INTERVAL semantics.
    cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    return o.join(li, cond).groupBy("o_orderkey").agg(F.count("*").alias("n_late_lines"))


# ---------------------------------------------------------------------------
# Windows, top-k, sorts
# ---------------------------------------------------------------------------

TOP_ORDER_ORACLE = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (
           PARTITION BY o_custkey
           ORDER BY o_totalprice DESC, o_orderkey
         ) AS rn
  FROM orders
)
WHERE rn = 1
"""


@query("wtopn", oracle=TOP_ORDER_ORACLE)
def window_top_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-match-wins semantics (reference P1 fallback chains / files[0],
    src/01-scrape-images.py:270-279,146-147) as row_number()==1. Tie-broken
    on o_orderkey for determinism."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("totalprice")
        )
    )


RUNNING_ORACLE = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey
         ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
       round(coalesce(o_totalprice - lag(o_totalprice) OVER (
         PARTITION BY o_custkey
         ORDER BY o_orderdate, o_orderkey), 0.0), 2)           AS delta_prev,
       CAST(rank() OVER (
         PARTITION BY o_custkey
         ORDER BY o_orderdate, o_orderkey) AS INT)             AS order_seq
FROM orders
"""


@query("wfrm", oracle=RUNNING_ORACLE)
def window_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic windows: running frame sum, lag delta, rank — one shuffle on
    o_custkey serves all three (same partitioning/ordering)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, 0)), 2
        ).alias("running_spend"),
        F.round(
            F.coalesce(
                F.col("o_totalprice") - F.lag("o_totalprice").over(w), F.lit(0.0)
            ),
            2,
        ).alias("delta_prev"),
        F.rank().over(w).cast("int").alias("order_seq"),
    )


TOPK_ORACLE = """
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice * (1 - l_discount), 2) AS net_price
FROM lineitem
ORDER BY net_price DESC, l_orderkey, l_linenumber
LIMIT 10
"""


@query("tkln", oracle=TOPK_ORACLE)
def topk_net_price_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Catalyst plans TakeOrderedAndProject — per-partition
    heap of k then a k-row merge on the driver, no global sort at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 2
            ).alias("net_price"),
        )
        .orderBy(F.col("net_price").desc(), "l_orderkey", "l_linenumber")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Set operations & distinct
# ---------------------------------------------------------------------------

SETOPS_ORACLE = """
WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
     rich     AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
SELECT 'union' AS op, count(*) AS n FROM (SELECT * FROM building UNION SELECT * FROM rich)
UNION ALL
SELECT 'intersect' AS op, count(*) AS n FROM (SELECT * FROM building INTERSECT SELECT * FROM rich)
UNION ALL
SELECT 'except' AS op, count(*) AS n FROM (SELECT * FROM building EXCEPT SELECT * FROM rich)
"""


@query("setop", oracle=SETOPS_ORACLE)
def setops_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union / intersect / except — absent from the reference beyond
    anti-join except-semantics (SURVEY §2.5)."""
    c = load_table(spark, sf_dir, "customer")
    building = c.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = c.where(F.col("c_acctbal") > 5000).select("c_custkey")
    counts = [
        building.union(rich).distinct().agg(
            F.lit("union").alias("op"), F.count("*").alias("n")
        ),
        building.intersect(rich).agg(
            F.lit("intersect").alias("op"), F.count("*").alias("n")
        ),
        # subtract() IS SQL EXCEPT (distinct semantics); exceptAll().distinct()
        # diverges on inputs where the left side has duplicates.
        building.subtract(rich).agg(
            F.lit("except").alias("op"), F.count("*").alias("n")
        ),
    ]
    out = counts[0]
    for df in counts[1:]:
        out = out.unionAll(df)
    return out


DISTINCT_ORACLE = """
SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
"""


@query("dstct", oracle=DISTINCT_ORACLE)
def distinct_segment_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relation-level distinct (A2; reference dedups with list(set(...)),
    src/01-scrape-images.py:299)."""
    return load_table(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_nationkey"
    ).distinct()


# ---------------------------------------------------------------------------
# Explode fan-out (J3)
# ---------------------------------------------------------------------------

COLLECT_ORACLE = """
SELECT l_orderkey,
       string_agg(l_linenumber, ',' ORDER BY l_linenumber) AS linenumbers,
       CAST(count(*) AS BIGINT)                            AS n_lines
FROM lineitem
GROUP BY l_orderkey
"""


@query("acoll", oracle=COLLECT_ORACLE)
def agg_collect_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group collection (A4; reference accumulates per-issue filename
    lists, src/01-scrape-images.py:330-343).  collect_list is arrival-order
    nondeterministic, so the array is sorted before join — deterministic
    output without a window sort."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.col("l_linenumber"))),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("linenumbers"),
        F.count("*").alias("n_lines"),
    )


ASOF_ORACLE = """
WITH errors AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
),
clicks AS (
  SELECT user_id, ts FROM events WHERE event_type = 'click'
)
SELECT e.event_id, e.user_id, c.ts AS last_click_ts
FROM errors e
ASOF LEFT JOIN clicks c
  ON e.user_id = c.user_id AND e.ts >= c.ts
"""


@query("jasof", oracle=ASOF_ORACLE)
def join_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (most recent prior click per error event), implemented as
    union + single window pass instead of the naive join+re-aggregate:
    tag both streams, partition by user, order by ts, carry the last seen
    click ts forward with last_value(ignoreNulls).  ONE shuffle on user_id
    total — the join+groupBy+rejoin formulation needs three.  DuckDB's
    native ASOF JOIN is the oracle."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.lit(None).cast("long").alias("event_id"), "user_id", "ts"
    )
    tagged = errors.withColumn("click_ts", F.lit(None).cast("timestamp")).unionByName(
        clicks.withColumn("click_ts", F.col("ts"))
    )
    # At equal ts the click must sort BEFORE the error so >= semantics hold
    # (clicks have non-null click_ts → asc_nulls_last puts them first).
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("click_ts").asc_nulls_last())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        tagged.withColumn(
            "last_click_ts", F.last("click_ts", ignorenulls=True).over(w)
        )
        .where(F.col("event_id").isNotNull())
        .select("event_id", "user_id", "last_click_ts")
    )
