"""Core relational operators: scan/filter/project, joins (inner/semi/anti,
broadcast), hash aggregation, distinct/approx-distinct, rollup/cube/grouping
sets, window functions, sort/limit/top-k, set operations.

SURVEY.md §2B X1-X8. All built-in DataFrame ops — Catalyst supplies pushdown,
pruning, join selection (broadcast for the tiny dims), partial aggregation and
AQE; nothing here needs a custom physical operator, so the same code scales
from local[32] to a 1000-executor cluster.

Every aggregate / computed column is aliased identically in the Spark query
and the DuckDB oracle (driver hash-compares by sorted column name). Float
aggregates are rounded *in the query* so the cross-engine comparison is not
sensitive to summation order (SURVEY.md §7 step 5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ._rounding import mround
from ..tables import load


# --------------------------------------------------------------------------
# X1 + X3: scan -> filter -> hash aggregate (TPC-H Q1 flavored)
# --------------------------------------------------------------------------

def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary over lineitem. Filter pushes to the parquet scan;
    aggregation is a partial (map-side) + final hash agg on 2 low-cardinality
    keys -- the shuffle moves only #groups * #partitions rows at any SF."""
    li = load(spark, sf_dir, "lineitem")
    # Exact-integer money discipline: quantities/prices are 2dp-quantized
    # and discount/tax are 2dp rates, so every sum accumulates exact
    # integers (cents, cents*pct = 1e-4 units, cents*pct*pct = 1e-6 units)
    # -- order-free where a raw double sum accumulates in partition order
    # and can flip a .xx5 rounding boundary per engine/partitioning. Sums
    # run in decimal(30,0) so a 100 TB group cannot overflow int64; the
    # exact total converts to double ONCE before the rounded division.
    qty_c = F.round(F.col("l_quantity") * 100).cast("bigint")
    ep_c = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    disc_p = F.round(F.col("l_discount") * 100).cast("bigint")
    tax_p = F.round(F.col("l_tax") * 100).cast("bigint")
    dec = "decimal(30,0)"
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(qty_c.cast(dec)).cast("double") / 100.0, 2).alias("sum_qty"),
            F.round(F.sum(ep_c.cast(dec)).cast("double") / 100.0, 2).alias("sum_base_price"),
            mround(
                F.sum((ep_c * (100 - disc_p)).cast(dec)).cast("double") / 10000.0, 2
            ).alias("sum_disc_price"),
            mround(
                F.sum((ep_c * (100 - disc_p) * (100 + tax_p)).cast(dec)).cast("double") / 1000000.0, 2
            ).alias("sum_charge"),
            mround(F.sum(qty_c.cast(dec)).cast("double") / 100.0 / F.count(F.lit(1)), 4).alias("avg_qty"),
            mround(F.sum(ep_c.cast(dec)).cast("double") / 100.0 / F.count(F.lit(1)), 4).alias("avg_price"),
            mround(F.sum(disc_p.cast(dec)).cast("double") / 100.0 / F.count(F.lit(1)), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


ORACLE_Q01 = """
WITH e AS (
  SELECT l_returnflag, l_linestatus,
         CAST(round(l_quantity * 100) AS BIGINT)      AS qty_c,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS ep_c,
         CAST(round(l_discount * 100) AS BIGINT)      AS disc_p,
         CAST(round(l_tax * 100) AS BIGINT)           AS tax_p
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '2000-09-01'
)
SELECT l_returnflag, l_linestatus,
       round(CAST(sum(qty_c) AS DOUBLE) / 100.0, 2)                                     AS sum_qty,
       round(CAST(sum(ep_c) AS DOUBLE) / 100.0, 2)                                      AS sum_base_price,
       round(1.37e-6 + CAST(sum(ep_c * (100 - disc_p)) AS DOUBLE) / 10000.0, 2)         AS sum_disc_price,
       round(1.37e-6 + CAST(sum(ep_c * (100 - disc_p) * (100 + tax_p)) AS DOUBLE) / 1000000.0, 2) AS sum_charge,
       round(1.37e-6 + CAST(sum(qty_c) AS DOUBLE) / 100.0 / count(*), 4)                AS avg_qty,
       round(1.37e-6 + CAST(sum(ep_c) AS DOUBLE) / 100.0 / count(*), 4)                 AS avg_price,
       round(1.37e-6 + CAST(sum(disc_p) AS DOUBLE) / 100.0 / count(*), 4)               AS avg_disc,
       count(*)                                                                         AS count_order
FROM e
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# X2 + X3: multi-way join with broadcast dims (flagship; TPC-H Q5 flavored)
# --------------------------------------------------------------------------

def q02_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem |><| orders |><| customer |><| nation |><| region.

    r16 (guide §3/§2.3): the dimension chain is PRE-JOINED into one
    (c_custkey, n_name, r_name) input with the region filter applied inside
    it, and the fact joins run smallest-first (orders |><| customers, then
    lineitem last). Catalyst cannot reorder this itself (no CBO stats), and
    it wins twice at scale: the r_name filter drops ~3/5 of customers -- and
    therefore of orders -- BEFORE anything order- or lineitem-sized is
    joined, and lineitem (the biggest table) is shuffled into exactly one
    join on its natural key instead of carrying the whole chain. Locally it
    also collapses the 5 sequential AQE broadcast-build jobs to 2-3. The
    dims are broadcast explicitly (tiny at every SF); the surviving big
    joins are equi-joins on natural keys, which AQE skew-splits if needed.
    """
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    nr = (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name").isin("ASIA", "EUROPE"))
        .select("n_nationkey", "n_name", "r_name")
    )
    cust = (
        customer.join(F.broadcast(nr), customer.c_nationkey == nr.n_nationkey)
        .select("c_custkey", "n_name", "r_name")
    )
    return (
        orders.select("o_orderkey", "o_custkey")
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(li.select("l_orderkey", "l_extendedprice", "l_discount"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("r_name", "n_name")
        .agg(
            # exact 1e-4-dollar integers (see q01's money discipline)
            mround(
                F.sum(
                    (
                        F.round(F.col("l_extendedprice") * 100).cast("bigint")
                        * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("bigint"))
                    ).cast("decimal(30,0)")
                ).cast("double")
                / 10000.0,
                2,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


ORACLE_Q02 = """
SELECT r_name, n_name,
       round(1.37e-6 + CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                                * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0, 2) AS revenue,
       count(*)                                          AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name IN ('ASIA', 'EUROPE')
GROUP BY r_name, n_name
"""


# --------------------------------------------------------------------------
# X2: semi join (EXISTS) -- TPC-H Q4 flavored
# --------------------------------------------------------------------------

def q03_order_priority_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


ORACLE_Q03 = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# X2: anti join (NOT EXISTS)
# --------------------------------------------------------------------------

def q04_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no high-value order (anti join against a filtered
    build side -- the filter keeps the result non-empty at every SF)."""
    customer = load(spark, sf_dir, "customer")
    big_orders = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        customer.join(big_orders, customer.c_custkey == big_orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


ORACLE_Q04 = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
"""


# --------------------------------------------------------------------------
# X4: exact distinct (approx variant in q06, rows-only)
# --------------------------------------------------------------------------

def q05_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


ORACLE_Q05 = """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       count(*)                                AS n_events
FROM events
GROUP BY event_type
"""


def q06_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL-sketch distinct audit -- oracle-backed since round 6.

    The 100 TB path is the sketch alone (mergeable registers, no per-key
    expansion; q05 is the exact tier). To make the sketch oracle-checkable
    we emit (a) the exact distinct count, which DuckDB reproduces, and
    (b) a boolean asserting Spark's HLL estimate lies within 3x the
    declared 2% rsd of the exact value. approx_count_distinct is
    deterministic for a fixed input set (HLL registers are max-merged, so
    partitioning/order don't change the estimate), making the boolean a
    stable value both engines can state: the oracle asserts TRUE, and any
    estimator drift beyond the bound breaks the hash match."""
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_exact"),
            F.approx_count_distinct("user_id", 0.02).alias("_est"),
        )
        .select(
            "event_type",
            "n_exact",
            (
                F.abs(F.col("_est") - F.col("n_exact"))
                <= F.greatest(F.lit(1), F.round(F.col("n_exact") * 0.06))
            ).alias("est_within_3rsd"),
        )
    )


ORACLE_Q06 = """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
       TRUE                                    AS est_within_3rsd
FROM events
GROUP BY event_type
"""


# --------------------------------------------------------------------------
# X5: rollup / cube / grouping sets
# --------------------------------------------------------------------------

def q07_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    # integer-cents sum (the q01 money discipline): a raw double sum
    # accumulates in partition order, and the rollup ALL row's total passes
    # 2^53 at large SF where the two engines' orders differ by whole
    # dollars; the cents sum is order-free and exact at any size
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            mround(
                F.sum(cents.cast("decimal(30,0)")).cast("double") / 100.0, 2
            ).alias("sum_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "sum_price",
        )
    )


ORACLE_Q07 = """
SELECT coalesce(o_orderstatus, 'ALL')   AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*)                         AS n_orders,
       round(1.37e-6 + CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS sum_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def q08_cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            # quantities are integral doubles: sum exact integers (order-
            # free, never past 2^53 mid-sum) instead of drifting doubles
            mround(
                F.sum(F.round("l_quantity").cast("bigint").cast("decimal(30,0)"))
                .cast("double"),
                2,
            ).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_items",
            "sum_qty",
        )
    )


ORACLE_Q08 = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       count(*)                      AS n_items,
       round(1.37e-6 + CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE), 2) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q09_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("gs_orders")
    return spark.sql("""
        SELECT coalesce(o_orderstatus, 'ALL')                      AS status,
               coalesce(cast(year(o_orderdate) AS STRING), 'ALL')  AS order_year,
               count(*)                                            AS n_orders,
               -- exact-cents mean: sum the integer cents (order-free),
               -- divide once -- a raw double avg accumulates in partition
               -- order and flakes 4dp ties at scale
               round(1.37e-6 + CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                     / count(*) / 100.0, 4)                        AS avg_price
        FROM gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (year(o_orderdate)), ())
    """)


ORACLE_Q09 = """
SELECT coalesce(o_orderstatus, 'ALL')                       AS status,
       coalesce(CAST(year(o_orderdate) AS VARCHAR), 'ALL')  AS order_year,
       count(*)                                             AS n_orders,
       round(1.37e-6 + CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
             / count(*) / 100.0, 4)                               AS avg_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (year(o_orderdate)), ())
"""


# --------------------------------------------------------------------------
# X6: window functions -- top-k per group, rank, running aggregate, lag
# --------------------------------------------------------------------------

def q10_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price. One shuffle on o_custkey; within a
    partition the sort + row_number stream -- the canonical scalable top-k."""
    orders = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("rn").cast("int").alias("rn"),
            mround("o_totalprice", 2).alias("totalprice"),
        )
    )


ORACLE_Q10 = """
SELECT o_custkey, o_orderkey, CAST(rn AS INT) AS rn, round(1.37e-6 + o_totalprice, 2) AS totalprice
FROM (
  SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
WHERE rn <= 3
"""


def q11_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue + previous-order gap per customer (sum/lag/rank over
    an ordered window)."""
    orders = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        mround(F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, 0)), 2).alias("running_spend"),
        mround(F.lag("o_totalprice", 1).over(w), 2).alias("prev_price"),
        F.rank().over(W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())).cast("int").alias("price_rank"),
    )


ORACLE_Q11 = """
SELECT o_custkey, o_orderkey,
       round(1.37e-6 + sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)              AS running_spend,
       round(1.37e-6 + lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS prev_price,
       CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS INT) AS price_rank
FROM orders
"""


# --------------------------------------------------------------------------
# X7: global sort / limit / top-k
# --------------------------------------------------------------------------

def q12_part_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20: Spark plans orderBy+limit as TakeOrderedAndProject
    (per-partition heap + driver merge) -- no full sort at any scale."""
    part = load(spark, sf_dir, "part")
    return (
        part.orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
        .limit(20)
        .select("p_partkey", "p_name", "p_brand", mround("p_retailprice", 2).alias("retailprice"))
    )


ORACLE_Q12 = """
SELECT p_partkey, p_name, p_brand, round(1.37e-6 + p_retailprice, 2) AS retailprice
FROM part
ORDER BY p_retailprice DESC, p_partkey
LIMIT 20
"""


# --------------------------------------------------------------------------
# X8: set operations
# --------------------------------------------------------------------------

def q13_nation_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION over customer vs supplier nation keys,
    tagged and unioned into one result."""
    cust_n = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp_n = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    both = cust_n.intersect(supp_n).select(F.lit("both").alias("tag"), "nationkey")
    cust_only = cust_n.subtract(supp_n).select(F.lit("cust_only").alias("tag"), "nationkey")
    supp_only = supp_n.subtract(cust_n).select(F.lit("supp_only").alias("tag"), "nationkey")
    return both.unionByName(cust_only).unionByName(supp_only)


ORACLE_Q13 = """
SELECT 'both' AS tag, nationkey FROM
  (SELECT c_nationkey AS nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier)
UNION ALL
SELECT 'cust_only' AS tag, nationkey FROM
  (SELECT c_nationkey AS nationkey FROM customer EXCEPT SELECT s_nationkey FROM supplier)
UNION ALL
SELECT 'supp_only' AS tag, nationkey FROM
  (SELECT s_nationkey AS nationkey FROM supplier EXCEPT SELECT c_nationkey FROM customer)
"""


# --------------------------------------------------------------------------
# q96: customer order-count distribution (TPC-H Q13 shape)
# --------------------------------------------------------------------------

def q96_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13's shape on this schema: LEFT OUTER join customer->orders
    with a predicate on the preserved side's join input (non-urgent orders
    only -- standing in for Q13's comment NOT LIKE), then a two-level
    aggregate: orders per customer, customers per order-count. Exercises
    the outer-join-feeds-reaggregation plan: customers with zero matching
    orders must survive to the c_count=0 bucket, so the filter must stay
    INSIDE the join's right input (pushing it below the outer join is the
    classic wrong-plan; expressing it as a join-input subquery keeps both
    engines honest). Both aggregates are map-side combined; the first
    shuffles on c_custkey, the second on the tiny c_count domain."""
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    ord_ok = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(ord_ok, cust.c_custkey == ord_ok.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


ORACLE_Q96 = """
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN (SELECT o_custkey, o_orderkey FROM orders WHERE o_orderpriority <> '1-URGENT') o
    ON c_custkey = o.o_custkey
  GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist
FROM per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --------------------------------------------------------------------------
# q97: above-average idle customers (TPC-H Q22 shape)
# --------------------------------------------------------------------------

def q97_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22's shape: customers whose balance beats the global average
    positive balance (uncorrelated scalar-aggregate subquery) AND who have
    no urgent order (anti join against a filtered build side; unfiltered,
    every above-average customer has SOME order and the result is vacuous),
    rolled up by market segment.

    The above-average predicate is boundary-exact: both sides work in
    integer cents and compare cents * n_pos > sum_cents (cross-multiplied,
    no division) -- a raw double avg() comparison can flip membership for a
    balance within an ulp of the mean because summation order differs
    across partitionings and engines (the q56 lesson). The 1-row stats
    aggregate broadcasts into the scan; the anti join is the only shuffle
    that grows with data."""
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("cents"),
    )
    stats = cust.filter(F.col("c_acctbal") > 0).agg(
        F.sum("cents").alias("sum_cents"), F.count(F.lit(1)).alias("n_pos")
    )
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_custkey")
    rich = cust.crossJoin(F.broadcast(stats)).filter(
        F.col("cents") * F.col("n_pos") > F.col("sum_cents")
    )
    return (
        rich.join(orders, rich.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            # sum the EXACT cents already computed above (order-free int),
            # divide once -- a raw double sum drifts with partition order
            mround(
                F.sum(F.col("cents").cast("decimal(30,0)")).cast("double") / 100.0, 2
            ).alias("total_bal"),
        )
    )


ORACLE_Q97 = """
WITH cust AS (
  SELECT c_custkey, c_mktsegment, c_acctbal,
         CAST(round(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer
),
stats AS (
  SELECT sum(cents) AS sum_cents, count(*) AS n_pos FROM cust WHERE c_acctbal > 0
)
SELECT c_mktsegment, count(*) AS n_cust,
       round(1.37e-6 + CAST(sum(cents) AS DOUBLE) / 100.0, 2) AS total_bal
FROM cust, stats
WHERE cents * n_pos > sum_cents
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
"""


# --------------------------------------------------------------------------
# q111: TPC-H Q18 shape -- large-volume orders (agg HAVING -> join -> top-k)
# --------------------------------------------------------------------------

BIG_ORDER_QTY = 250  # HAVING threshold (~99th pct of per-order quantity)


def q111_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18's shape: aggregate lineitem per order, keep only orders
    whose total quantity clears a HAVING threshold (~1% of orders), join
    the survivors back to orders and customer, and emit the top 10 by
    quantity. The aggregation runs FIRST so the join sees the ~1%
    survivor set, not the fact table -- and because that set is tiny by
    construction, AQE demotes the orders/customer joins to broadcasts at
    runtime. Quantities are integral doubles, so the sum is exact and
    emitted as BIGINT; top-k ties break on o_orderkey
    (TakeOrderedAndProject, never a global sort)."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > BIG_ORDER_QTY)
    )
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            mround(F.col("o_totalprice"), 2).alias("totalprice"),
            F.col("qty").cast("bigint").alias("total_qty"),
        )
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


ORACLE_Q111 = f"""
SELECT c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d')    AS orderdate,
       round(1.37e-6 + o_totalprice, 2)     AS totalprice,
       CAST(qty AS BIGINT)                  AS total_qty
FROM (SELECT l_orderkey, sum(l_quantity) AS qty FROM lineitem
      GROUP BY l_orderkey HAVING sum(l_quantity) > {BIG_ORDER_QTY}) big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, o_orderkey ASC
LIMIT 10
"""


# --------------------------------------------------------------------------
# q134: TPC-H Q7 shape -- cross-nation shipping volume by year
# --------------------------------------------------------------------------

def q134_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7's shape (`ref: SURVEY.md §2B X2`): revenue shipped between
    every DISTINCT (supplier nation, customer nation) pair per ship year.
    Two independent dimension chains hang off lineitem: supplier->nation on
    l_suppkey and orders->customer->nation on l_orderkey. nation is
    broadcast on both sides (25 rows at every SF); supplier and customer
    are orders-of-magnitude smaller than lineitem, so AQE keeps them as
    the build side of the two fact joins -- the only corpus-sized shuffle
    is lineitem-orders on the natural key. Revenue accumulates exact
    integer 1e-4-dollar units in decimal(30,0) (q01's money discipline):
    order-free at any partitioning, overflow-safe at 100 TB group sizes."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = F.broadcast(
        load(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        load(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
        )
    )
    rev4 = (
        F.round(F.col("l_extendedprice") * 100).cast("bigint")
        * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("bigint"))
    ).cast("decimal(30,0)")
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(n1, supp.s_nationkey == n1.sn_key)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(n2, cust.c_nationkey == n2.cn_key)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("l_year")
        )
        .agg(
            mround(F.sum(rev4).cast("double") / 10000.0, 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


ORACLE_Q134 = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       round(1.37e-6 + CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                                * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0, 2) AS revenue,
       count(*) AS n_lineitems
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
GROUP BY 1, 2, 3
"""


# --------------------------------------------------------------------------
# q135: TPC-H Q8 shape -- a nation's market share by order year
# --------------------------------------------------------------------------

SHARE_NATION = "NATION_0"  # whose market share we track
SHARE_MAX_PSIZE = 25       # part filter (Q8's p_type analogue)


def q135_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8's shape: within ASIA-region customers' orders of small
    parts, what fraction of revenue per order year came from SHARE_NATION's
    suppliers. The CASE-guarded numerator and the total ride ONE aggregate
    over one join tree (no second pass); the share is exact integer
    cross-multiplication (rev4_nation * 1e6 DIV rev4_total) on 1e-4-dollar
    units -- no float division anywhere, so the ppm is cross-engine exact.
    part is filtered BEFORE its join (predicate pushdown to the scan);
    nation/region broadcast; the lineitem-orders equi-join is again the
    only fact-sized shuffle."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_size") <= SHARE_MAX_PSIZE).select("p_partkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat_c = F.broadcast(
        load(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cr_key")
        )
    )
    nat_s = F.broadcast(
        load(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
        )
    )
    region = F.broadcast(
        load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA").select("r_regionkey")
    )
    rev4 = (
        F.round(F.col("l_extendedprice") * 100).cast("bigint")
        * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("bigint"))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nat_s, supp.s_nationkey == nat_s.sn_key)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nat_c, cust.c_nationkey == nat_c.cn_key)
        .join(region, F.col("cr_key") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == SHARE_NATION, rev4).otherwise(F.lit(0)).cast(
                    "decimal(30,0)"
                )
            ).cast("decimal(38,0)").alias("rev4_nation"),
            F.sum(rev4.cast("decimal(30,0)")).cast("decimal(38,0)").alias("rev4_total"),
        )
        .select(
            "o_year",
            mround(F.col("rev4_nation").cast("double") / 10000.0, 2).alias("rev_nation"),
            mround(F.col("rev4_total").cast("double") / 10000.0, 2).alias("rev_total"),
            F.expr("CAST(rev4_nation * 1000000 DIV rev4_total AS BIGINT)").alias("share_ppm"),
        )
    )


ORACLE_Q135 = f"""
WITH j AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         n2.n_name AS supp_nation,
         CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev4
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_size <= {SHARE_MAX_PSIZE}
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
),
agg AS (
  SELECT o_year,
         CAST(sum(CASE WHEN supp_nation = '{SHARE_NATION}' THEN rev4 ELSE 0 END) AS HUGEINT) AS rev4_nation,
         CAST(sum(rev4) AS HUGEINT) AS rev4_total
  FROM j GROUP BY o_year
)
SELECT o_year,
       round(1.37e-6 + CAST(rev4_nation AS DOUBLE) / 10000.0, 2) AS rev_nation,
       round(1.37e-6 + CAST(rev4_total AS DOUBLE) / 10000.0, 2)  AS rev_total,
       CAST(rev4_nation * 1000000 // rev4_total AS BIGINT) AS share_ppm
FROM agg
"""


# --------------------------------------------------------------------------
# q139: TPC-H Q2 shape -- argmin correlated subquery (cheapest supplier)
# --------------------------------------------------------------------------

Q2_MIN_PSIZE = 45  # part filter: the large-size tail (~10% of parts)


def q139_cheapest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2's shape: for each qualifying part, the supplier with the
    MINIMUM account balance among suppliers that actually shipped it -- the
    correlated min-subquery pattern (WHERE x = (SELECT min(..) WHERE
    correlated)). Spark expresses it join-free-then-rejoin: distinct
    (part, supplier) ship pairs from lineitem, a per-part min over the
    joined balance, and an equality filter back -- one window over the
    part key instead of a second aggregation+join pass. Ties on the
    minimum balance keep BOTH suppliers (Q2 semantics); balances are
    compared as exact integer cents so the tie set is cross-engine
    identical. The part filter pushes to the scan; supplier is the small
    side of its join at every SF."""
    part = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_size") > Q2_MIN_PSIZE)
        .select("p_partkey", "p_name", "p_brand")
    )
    supp = load(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_name",
        F.round(F.col("s_acctbal") * 100).cast("bigint").alias("bal_cents"),
    )
    ships = (
        load(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey").alias("p_partkey"), F.col("l_suppkey").alias("s_suppkey"))
        .distinct()
    )
    joined = ships.join(part, "p_partkey").join(supp, "s_suppkey")
    w = W.partitionBy("p_partkey")
    return (
        joined.withColumn("min_bal", F.min("bal_cents").over(w))
        .filter(F.col("bal_cents") == F.col("min_bal"))
        .select("p_partkey", "p_name", "p_brand", "s_suppkey", "s_name", "bal_cents")
    )


ORACLE_Q139 = f"""
WITH ships AS (
  SELECT DISTINCT l_partkey AS p_partkey, l_suppkey AS s_suppkey FROM lineitem
),
j AS (
  SELECT p.p_partkey, p.p_name, p.p_brand, s.s_suppkey, s.s_name,
         CAST(round(s.s_acctbal * 100) AS BIGINT) AS bal_cents
  FROM ships
  JOIN part p USING (p_partkey)
  JOIN supplier s USING (s_suppkey)
  WHERE p.p_size > {Q2_MIN_PSIZE}
)
SELECT p_partkey, p_name, p_brand, s_suppkey, s_name, bal_cents
FROM j
WHERE bal_cents = (SELECT min(bal_cents) FROM j j2 WHERE j2.p_partkey = j.p_partkey)
"""


# --------------------------------------------------------------------------
# q143: TPC-H Q21 shape -- EXISTS + NOT-EXISTS against the same fact table
# --------------------------------------------------------------------------

LATE_DAYS = 60  # 'late' proxy: shipped > 60 days after the order date


def q143_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21's shape -- the hardest correlated-subquery pattern in the
    suite: count, per supplier, the late lineitems on multi-supplier
    orders where NO OTHER supplier was late (EXISTS + NOT EXISTS both
    correlated against the same fact table). The textbook form is a
    quadruple self-join of lineitem; the scalable reformulation aggregates
    FIRST: one pass computes per-order distinct-supplier and distinct-
    late-supplier counts, the qualifying orders (n_supp > 1 AND
    n_late_supp = 1) are a tiny survivor set, and the late lines join
    back against it -- two scans of the fact table, one order-keyed
    exchange each, no self-join explosion. 'Late' is shipdate > orderdate
    + LATE_DAYS (this schema has no receipt/commit dates); counting is
    per late LINE, exactly matching the oracle's literal EXISTS/NOT
    EXISTS formulation. Top-20 ties break on s_name
    (TakeOrderedAndProject)."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    lines = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr(f"INTERVAL {LATE_DAYS} DAYS")).alias("late"),
    )
    per_order = lines.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late_supp"),
    )
    target = per_order.filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)).select(
        "l_orderkey"
    )
    return (
        lines.filter(F.col("late"))
        .join(target, "l_orderkey")
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(20)
    )


ORACLE_Q143 = f"""
SELECT s_name, count(*) AS numwait
FROM supplier, lineitem l1, orders
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND l1.l_shipdate > o_orderdate + INTERVAL {LATE_DAYS} DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL {LATE_DAYS} DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 20
"""


# --------------------------------------------------------------------------
# q148: TPC-H Q15 shape -- global argmax over an aggregated view
# --------------------------------------------------------------------------

Q15_FROM, Q15_TO = "1996-01-01", "1996-04-01"  # one quarter of ship dates


def q148_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15's shape: aggregate a quarter's revenue per supplier, find
    the maximum, and return the supplier(s) achieving it -- the
    view + scalar-subquery-equality pattern. Revenue accumulates exact
    integer 1e-4-dollar units, so the max-equality is an INTEGER compare:
    ties are real ties, not float accidents, and the result set is
    cross-engine identical by construction. Plan: one supplier-keyed
    aggregate; the 1-row max broadcasts back over the tiny aggregate
    (never the fact table); supplier names join onto the survivor set."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q15_FROM).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q15_TO).cast("timestamp"))
    )
    rev4 = (
        F.round(F.col("l_extendedprice") * 100).cast("bigint")
        * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("bigint"))
    ).cast("decimal(30,0)")
    per_supp = li.groupBy("l_suppkey").agg(
        F.sum(rev4).cast("decimal(38,0)").alias("rev4")
    )
    top = per_supp.agg(F.max("rev4").alias("max_rev4"))
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_supp.crossJoin(F.broadcast(top))
        .filter(F.col("rev4") == F.col("max_rev4"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            mround(F.col("rev4").cast("double") / 10000.0, 2).alias("total_revenue"),
        )
    )


ORACLE_Q148 = f"""
WITH r AS (
  SELECT l_suppkey,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS HUGEINT) AS rev4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_FROM}' AND l_shipdate < TIMESTAMP '{Q15_TO}'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name,
       round(1.37e-6 + CAST(rev4 AS DOUBLE) / 10000.0, 2) AS total_revenue
FROM r JOIN supplier ON l_suppkey = s_suppkey
WHERE rev4 = (SELECT max(rev4) FROM r)
"""


# --------------------------------------------------------------------------
# q149: TPC-H Q11 shape -- share-of-total HAVING (important parts)
# --------------------------------------------------------------------------

Q11_MULT_NUM, Q11_MULT_DEN = 3, 2  # keep parts above 1.5x the average part value


def q149_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11's shape: per-group value totals filtered by a HAVING
    against a fraction of the GLOBAL total (a scalar subquery over the
    same aggregate). The threshold is self-normalizing -- value > 1.5x
    the AVERAGE part's value -- so the survivor set stays meaningful at
    every scale factor (a fixed ppm share goes empty as the part universe
    grows; Q11's own 0.0001/SF scaling makes the same point; 4 / 49 / 514
    survivors at sf0.001/0.01/0.1). The predicate runs as exact integer
    cross-multiplication (val4 * n_parts * DEN > NUM * total4): no float
    division, so boundary
    parts resolve identically cross-engine. Plan: one part-keyed
    aggregate; the 1-row global total broadcasts back over the aggregate,
    never the fact table."""
    li = load(spark, sf_dir, "lineitem")
    val4 = (
        F.round(F.col("l_extendedprice") * 100).cast("bigint")
        * F.round(F.col("l_quantity")).cast("bigint")
    ).cast("decimal(30,0)")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(val4).cast("decimal(38,0)").alias("val4")
    )
    total = per_part.agg(
        F.sum("val4").cast("decimal(38,0)").alias("total4"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.expr(f"val4 * n_parts * {Q11_MULT_DEN} > {Q11_MULT_NUM} * total4"))
        .select(
            "l_partkey",
            mround(F.col("val4").cast("double") / 100.0, 2).alias("part_value"),
            F.expr("CAST(val4 * 1000000 DIV total4 AS BIGINT)").alias("share_ppm"),
        )
    )


ORACLE_Q149 = f"""
WITH p AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * CAST(round(l_quantity) AS BIGINT)) AS HUGEINT) AS val4
  FROM lineitem GROUP BY l_partkey
),
t AS (SELECT CAST(sum(val4) AS HUGEINT) AS total4, count(*) AS n_parts FROM p)
SELECT l_partkey,
       round(1.37e-6 + CAST(val4 AS DOUBLE) / 100.0, 2) AS part_value,
       CAST(val4 * 1000000 // total4 AS BIGINT) AS share_ppm
FROM p, t
WHERE val4 * n_parts * {Q11_MULT_DEN} > {Q11_MULT_NUM} * total4
"""


QUERIES = {
    "q01_pricing_summary": q01_pricing_summary,
    "q02_revenue_by_nation": q02_revenue_by_nation,
    "q03_order_priority_semi": q03_order_priority_semi,
    "q04_customers_without_orders": q04_customers_without_orders,
    "q05_distinct_users": q05_distinct_users,
    "q06_approx_distinct_users": q06_approx_distinct_users,
    "q07_rollup_orders": q07_rollup_orders,
    "q08_cube_lineitem": q08_cube_lineitem,
    "q09_grouping_sets": q09_grouping_sets,
    "q10_top_orders_per_customer": q10_top_orders_per_customer,
    "q11_running_revenue": q11_running_revenue,
    "q12_part_topk": q12_part_topk,
    "q13_nation_set_ops": q13_nation_set_ops,
    "q96_custdist": q96_custdist,
    "q97_idle_rich_customers": q97_idle_rich_customers,
    "q111_big_orders": q111_big_orders,
    "q134_volume_shipping": q134_volume_shipping,
    "q135_market_share": q135_market_share,
    "q139_cheapest_supplier": q139_cheapest_supplier,
    "q143_waiting_suppliers": q143_waiting_suppliers,
    "q148_top_supplier": q148_top_supplier,
    "q149_important_parts": q149_important_parts,
}

ORACLES = {
    "q01_pricing_summary": ORACLE_Q01,
    "q02_revenue_by_nation": ORACLE_Q02,
    "q03_order_priority_semi": ORACLE_Q03,
    "q04_customers_without_orders": ORACLE_Q04,
    "q05_distinct_users": ORACLE_Q05,
    "q06_approx_distinct_users": ORACLE_Q06,
    "q07_rollup_orders": ORACLE_Q07,
    "q08_cube_lineitem": ORACLE_Q08,
    "q09_grouping_sets": ORACLE_Q09,
    "q10_top_orders_per_customer": ORACLE_Q10,
    "q11_running_revenue": ORACLE_Q11,
    "q12_part_topk": ORACLE_Q12,
    "q13_nation_set_ops": ORACLE_Q13,
    "q96_custdist": ORACLE_Q96,
    "q97_idle_rich_customers": ORACLE_Q97,
    "q111_big_orders": ORACLE_Q111,
    "q134_volume_shipping": ORACLE_Q134,
    "q135_market_share": ORACLE_Q135,
    "q139_cheapest_supplier": ORACLE_Q139,
    "q143_waiting_suppliers": ORACLE_Q143,
    "q148_top_supplier": ORACLE_Q148,
    "q149_important_parts": ORACLE_Q149,
}
