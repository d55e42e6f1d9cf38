"""Classic analytic join shapes, second batch (SURVEY.md §2B X55):
the remaining TPC-H query patterns expressible on this schema — Q3
(shipping priority), Q5 (local-supplier volume with the same-nation
cross-dimension predicate, X130), Q17 (correlated-average small-quantity
revenue), Q19 (disjunctive OR-of-ANDs predicate bands), Q14
(conditional-aggregate promo share), Q10 (returned-item top customers),
Q9 (profit by nation and year). Together with relational.py (Q1/Q2/Q4/
Q7/Q8/Q11/Q13/Q15/Q18/Q21/Q22 shapes) this closes every TPC-H pattern
the fixture schema can express — the remaining queries (Q12/Q16/Q20)
need columns the fixtures do not carry (l_shipmode, partsupp).

Money follows q01's exact-integer discipline (cents / 1e-4 units in
decimal(30,0)): sums are order-free under any partitioning and
overflow-safe at 100 TB group sizes; floats appear only once, in the
final rounded division. Share ratios are integer cross-multiplications
(ppm via DIV), never float division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ._rounding import mround
from ..tables import load


def _rev4() -> F.Column:
    """Revenue contribution in exact integer 1e-4-dollar units."""
    return (
        F.round(F.col("l_extendedprice") * 100).cast("bigint")
        * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("bigint"))
    ).cast("decimal(30,0)")


_REV4_SQL = (
    "CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100) AS BIGINT))"
)


# --------------------------------------------------------------------------
# q150: TPC-H Q3 shape -- shipping priority (top unshipped orders)
# --------------------------------------------------------------------------

Q3_SEGMENT = "BUILDING"
Q3_DATE = "1999-03-15"


def q150_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3's shape: revenue of the not-yet-shipped part of each
    BUILDING-segment order placed before a date -- the classic
    filter->3-way-join->aggregate->top-k pattern. Both date filters push
    to their parquet scans (orders and lineitem prune row groups before
    the join); the segment filter shrinks customer before it joins. The
    top-10 orders by the EXACT integer revenue (ties broken by the unique
    order key) run as TakeOrderedAndProject -- a per-partition heap, never
    a global sort. Scale: the only corpus-sized shuffle is
    lineitem-orders on the natural key; AQE picks the build side."""
    cutoff = F.lit(Q3_DATE).cast("timestamp")
    cust = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == Q3_SEGMENT)
        .select("c_custkey")
    )
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    agg = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_rev4()).cast("decimal(38,0)").alias("rev4"))
    )
    return (
        agg.orderBy(F.col("rev4").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc())
        .limit(10)
        .select(
            "l_orderkey",
            mround(F.col("rev4").cast("double") / 10000.0, 2).alias("revenue"),
            # date STRING, not timestamp: TIMESTAMP is outside the
            # driver-safe oracle type allowlist (tests/test_oracle_types.py)
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
    )


ORACLE_Q150 = f"""
SELECT l_orderkey,
       round(1.37e-6 + CAST(rev4 AS DOUBLE) / 10000.0, 2) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority
FROM (
  SELECT l_orderkey, o_orderdate, o_orderpriority,
         CAST(sum({_REV4_SQL}) AS HUGEINT) AS rev4
  FROM customer
  JOIN orders   ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  WHERE c_mktsegment = '{Q3_SEGMENT}'
    AND o_orderdate < TIMESTAMP '{Q3_DATE}'
    AND l_shipdate  > TIMESTAMP '{Q3_DATE}'
  GROUP BY l_orderkey, o_orderdate, o_orderpriority
)
ORDER BY rev4 DESC, o_orderdate ASC, l_orderkey ASC
LIMIT 10
"""


# --------------------------------------------------------------------------
# q151: TPC-H Q17 shape -- small-quantity revenue vs correlated average
# --------------------------------------------------------------------------

Q17_BRAND = "Brand#4"
Q17_TYPE = "MEDIUM"


def q151_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17's shape: yearly-average revenue from lineitems whose
    quantity is below 20% of the PER-PART average quantity -- the
    correlated-scalar-average pattern. The oracle keeps the textbook
    correlated subquery (DuckDB decorrelates it); Spark states the
    decorrelated plan directly: one window over l_partkey supplies each
    line's part-level (sum, count) without a second scan or a self-join.
    The threshold compares as exact integer cross-multiplication
    (5 * qty_cents * n < sum_qty_cents), so boundary lines resolve
    identically cross-engine. Scale: the filtered part set broadcasts;
    only its lineitems shuffle (once, on l_partkey)."""
    parts = F.broadcast(
        load(spark, sf_dir, "part")
        .filter((F.col("p_brand") == Q17_BRAND) & (F.col("p_type") == Q17_TYPE))
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.round(F.col("l_quantity") * 100).cast("bigint").alias("qty_c"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("ep_c"),
    )
    win = W.partitionBy("l_partkey")
    lines = (
        li.join(parts, li.l_partkey == parts.p_partkey)
        .withColumn("sum_qty_c", F.sum(F.col("qty_c").cast("decimal(30,0)")).over(win))
        .withColumn("n_lines", F.count(F.lit(1)).over(win))
    )
    small = lines.filter(
        F.col("qty_c").cast("decimal(30,0)") * 5 * F.col("n_lines") < F.col("sum_qty_c")
    )
    return small.agg(
        F.count(F.lit(1)).alias("n_small"),
        mround(
            F.coalesce(F.sum(F.col("ep_c").cast("decimal(30,0)")), F.lit(0)).cast("double")
            / 100.0
            / 7.0,
            2,
        ).alias("avg_yearly"),
    )


ORACLE_Q151 = f"""
SELECT count(*) AS n_small,
       round(1.37e-6 + CAST(coalesce(sum(CAST(round(l_extendedprice * 100) AS BIGINT)), 0)
                            AS DOUBLE) / 100.0 / 7.0, 2) AS avg_yearly
FROM lineitem l1
JOIN part ON l1.l_partkey = p_partkey
WHERE p_brand = '{Q17_BRAND}' AND p_type = '{Q17_TYPE}'
  AND CAST(round(l1.l_quantity * 100) AS BIGINT) * 5
      * (SELECT count(*) FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
      < (SELECT CAST(sum(CAST(round(l2.l_quantity * 100) AS BIGINT)) AS HUGEINT)
         FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
"""


# --------------------------------------------------------------------------
# q152: TPC-H Q19 shape -- disjunctive predicate bands (OR of ANDs)
# --------------------------------------------------------------------------

# (band, brand, max part size, min qty, max qty) -- brands differ, so the
# bands are disjoint and the CASE tag is unambiguous.
Q19_BANDS = [
    (1, "Brand#2", 15, 1, 11),
    (2, "Brand#8", 25, 10, 20),
    (3, "Brand#19", 35, 20, 30),
]


def q152_predicate_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19's shape: revenue under an OR of three AND-groups mixing
    part attributes (brand, size) with lineitem attributes (quantity).
    Catalyst splits the disjunction by side: the brand/size disjunction
    pushes to the part parquet scan, and the join keeps only the combined
    predicate -- no band is evaluated as its own join. Reported per band
    (brands are disjoint, so the CASE tag is exact). Scale: part survivors
    of three brand filters broadcast; lineitem is scanned once."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.round(F.col("l_quantity")).cast("bigint").alias("qty"),
        _rev4().alias("rev4"),
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = None
    band = None
    for b, brand, szmax, qmin, qmax in Q19_BANDS:
        c = (
            (F.col("p_brand") == brand)
            & (F.col("p_size") >= 1)
            & (F.col("p_size") <= szmax)
            & (F.col("qty") >= qmin)
            & (F.col("qty") <= qmax)
        )
        cond = c if cond is None else cond | c
        band = F.when(c, b) if band is None else band.when(c, b)
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .select(band.cast("bigint").alias("band"), "rev4")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            mround(F.sum("rev4").cast("double") / 10000.0, 2).alias("revenue"),
        )
    )


def _q19_band_sql(b, brand, szmax, qmin, qmax):
    return (
        f"(p_brand = '{brand}' AND p_size BETWEEN 1 AND {szmax}"
        f" AND CAST(round(l_quantity) AS BIGINT) BETWEEN {qmin} AND {qmax})"
    )


ORACLE_Q152 = f"""
SELECT CASE {' '.join(f"WHEN {_q19_band_sql(*band)} THEN {band[0]}" for band in Q19_BANDS)} END AS band,
       count(*) AS n_lines,
       round(1.37e-6 + CAST(sum({_REV4_SQL}) AS DOUBLE) / 10000.0, 2) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE {' OR '.join(_q19_band_sql(*band) for band in Q19_BANDS)}
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q153: TPC-H Q14 shape -- promo revenue share by month
# --------------------------------------------------------------------------

Q14_YEAR = 1998
Q14_PROMO_TYPE = "PROMO"


def q153_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14's shape: the share of each month's revenue that came from
    promo-type parts -- conditional aggregation feeding a ratio. The share
    is an integer-ppm DIV over the two exact revenue sums (no float
    division anywhere), so the boundary months agree cross-engine. One
    lineitem-part join per corpus scan; the year filter prunes the
    lineitem scan before the join."""
    li = load(spark, sf_dir, "lineitem").filter(F.year("l_shipdate") == Q14_YEAR)
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(part, li.l_partkey == part.p_partkey).select(
        F.month("l_shipdate").cast("bigint").alias("l_month"),
        _rev4().alias("rev4"),
        (F.col("p_type") == Q14_PROMO_TYPE).alias("is_promo"),
    )
    agg = j.groupBy("l_month").agg(
        F.sum(F.when(F.col("is_promo"), F.col("rev4")).otherwise(F.lit(0).cast("decimal(30,0)")))
        .cast("decimal(38,0)")
        .alias("promo4"),
        F.sum("rev4").cast("decimal(38,0)").alias("total4"),
    )
    return agg.select(
        "l_month",
        F.expr("CAST(promo4 * 1000000 DIV total4 AS BIGINT)").alias("promo_ppm"),
        mround(F.col("promo4").cast("double") / 10000.0, 2).alias("promo_revenue"),
        mround(F.col("total4").cast("double") / 10000.0, 2).alias("total_revenue"),
    )


ORACLE_Q153 = f"""
WITH m AS (
  SELECT CAST(month(l_shipdate) AS BIGINT) AS l_month,
         CAST(sum(CASE WHEN p_type = '{Q14_PROMO_TYPE}' THEN {_REV4_SQL} ELSE 0 END) AS HUGEINT) AS promo4,
         CAST(sum({_REV4_SQL}) AS HUGEINT) AS total4
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE year(l_shipdate) = {Q14_YEAR}
  GROUP BY 1
)
SELECT l_month,
       CAST(promo4 * 1000000 // total4 AS BIGINT) AS promo_ppm,
       round(1.37e-6 + CAST(promo4 AS DOUBLE) / 10000.0, 2) AS promo_revenue,
       round(1.37e-6 + CAST(total4 AS DOUBLE) / 10000.0, 2) AS total_revenue
FROM m
"""


# --------------------------------------------------------------------------
# q154: TPC-H Q10 shape -- returned-item revenue by customer
# --------------------------------------------------------------------------

Q10_FROM, Q10_TO = "1998-07-01", "1998-10-01"


def q154_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10's shape: customers who returned the most revenue in one
    quarter -- fact-fact join, wide group-by keys carried through the
    aggregate, top-20 heap on the exact integer revenue (unique customer
    key breaks ties). The quarter filter prunes the orders scan before
    its join to lineitem; nation broadcasts. c_acctbal passes through
    as the raw parquet double (a group key, bit-identical in both
    engines -- never re-derived)."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit(Q10_FROM).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(Q10_TO).cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    nation = F.broadcast(load(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    agg = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev4()).cast("decimal(38,0)").alias("rev4"))
    )
    return (
        agg.orderBy(F.col("rev4").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            mround(F.col("rev4").cast("double") / 10000.0, 2).alias("revenue"),
            "c_acctbal",
            "n_name",
        )
    )


ORACLE_Q154 = f"""
SELECT c_custkey, c_name,
       round(1.37e-6 + CAST(rev4 AS DOUBLE) / 10000.0, 2) AS revenue,
       c_acctbal, n_name
FROM (
  SELECT c_custkey, c_name, c_acctbal, n_name,
         CAST(sum({_REV4_SQL}) AS HUGEINT) AS rev4
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '{Q10_FROM}'
    AND o_orderdate <  TIMESTAMP '{Q10_TO}'
  GROUP BY c_custkey, c_name, c_acctbal, n_name
)
ORDER BY rev4 DESC, c_custkey ASC
LIMIT 20
"""


# --------------------------------------------------------------------------
# q155: TPC-H Q9 shape -- profit by supplier nation and year
# --------------------------------------------------------------------------

Q9_NAME_SUBSTR = "red"


def q155_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9's shape: profit on parts whose name contains a substring,
    grouped by the SUPPLIER's nation and ship year. The fixture schema has
    no partsupp, so cost is p_retailprice * quantity (the same
    join-and-subtract arithmetic as Q9's ps_supplycost term): profit4 =
    ep_c*(100-disc_p) - retail_c*qty_c, both exact 1e-4-dollar integers,
    summed in decimal(30,0) (negative group totals are expected and
    exact). The name filter prunes part before its join; supplier->nation
    broadcasts off the fact spine."""
    part = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").contains(Q9_NAME_SUBSTR))
        .select("p_partkey", "p_retailprice")
    )
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = F.broadcast(load(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    profit4 = (
        F.round(F.col("l_extendedprice") * 100).cast("bigint")
        * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("bigint"))
        - F.round(F.col("p_retailprice") * 100).cast("bigint")
        * F.round(F.col("l_quantity") * 100).cast("bigint")
    ).cast("decimal(30,0)")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("l_shipdate").cast("bigint").alias("o_year"))
        .agg(
            mround(F.sum(profit4).cast("double") / 10000.0, 2).alias("sum_profit"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


ORACLE_Q155 = f"""
SELECT n_name AS nation, CAST(year(l_shipdate) AS BIGINT) AS o_year,
       round(1.37e-6 + CAST(sum(
         CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))
         - CAST(round(p_retailprice * 100) AS BIGINT)
           * CAST(round(l_quantity * 100) AS BIGINT)
       ) AS DOUBLE) / 10000.0, 2) AS sum_profit,
       count(*) AS n_lines
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%{Q9_NAME_SUBSTR}%'
GROUP BY 1, 2
"""



# --------------------------------------------------------------------------
# q209: weighted median (quantity-weighted order statistic)
# --------------------------------------------------------------------------

def q209_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-WEIGHTED median unit price per brand: each price level
    counts with its shipped quantity, so the statistic answers "the
    median dollar-of-volume", which the plain row median (q15 family)
    gets wrong whenever cheap lines ship big quantities. Lower weighted
    median by the pure integer rule: the smallest price whose running
    quantity satisfies 2*cum >= total -- no interpolation, no floats
    anywhere (price as exact cents, quantity as exact integer units).

    Scale: per-(brand, price) pre-aggregation shrinks the window input
    to distinct price levels per brand; the running sum and the
    full-frame total ride one brand-keyed exchange; the argmin is a
    filter + min, never a sort-limit per group."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
        F.round("l_quantity").cast("bigint").alias("qty"),
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    levels = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "cents")
        .agg(F.sum("qty").alias("w"))
    )
    w_cum = W.partitionBy("p_brand").orderBy("cents").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    w_all = W.partitionBy("p_brand")
    ranked = levels.select(
        "p_brand", "cents",
        F.sum("w").over(w_cum).alias("cum"),
        F.sum("w").over(w_all).alias("total"),
        F.count(F.lit(1)).over(w_all).alias("n_levels"),
    )
    return (
        ranked.filter(2 * F.col("cum") >= F.col("total"))
        .groupBy("p_brand")
        .agg(
            F.min("cents").alias("wmedian_cents"),
            F.max("total").alias("total_qty"),
            F.max("n_levels").alias("n_price_levels"),
        )
    )


ORACLE_Q209 = """
WITH levels AS (
  SELECT p_brand,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS w
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2
), ranked AS (
  SELECT p_brand, cents,
         sum(w) OVER (PARTITION BY p_brand ORDER BY cents
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(w) OVER (PARTITION BY p_brand) AS total,
         count(*) OVER (PARTITION BY p_brand) AS n_levels
  FROM levels
)
SELECT p_brand,
       CAST(min(cents) AS BIGINT) AS wmedian_cents,
       CAST(max(total) AS BIGINT) AS total_qty,
       CAST(max(n_levels) AS BIGINT) AS n_price_levels
FROM ranked
WHERE 2 * cum >= total
GROUP BY p_brand
"""


# --------------------------------------------------------------------------
# q230: TPC-H Q5 shape -- local-supplier volume (same-nation join predicate)
# --------------------------------------------------------------------------

Q5_REGION = "ASIA"
Q5_DATE_LO = "1996-01-01"
Q5_DATE_HI = "1997-01-01"


def q230_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5's distinguishing shape: revenue by nation where the
    CUSTOMER and the SUPPLIER of each lineitem sit in the SAME nation
    (c_nationkey = s_nationkey) -- a cross-table equality that only
    materializes after both dimension chains join, which q02's plain
    star join never exercises. Region and order-year filters prune
    before the fact joins.

    Scale: the fact shuffles twice (orderkey, then suppkey) -- Q5's
    irreducible cost; customer and supplier join by key with AQE
    choosing build sides, nation/region broadcast, and the same-nation
    predicate applies as a post-join filter on already-joined rows (no
    extra exchange). Money is q01's exact 1e-4-unit discipline."""
    lo = F.lit(Q5_DATE_LO).cast("timestamp")
    hi = F.lit(Q5_DATE_HI).cast("timestamp")
    orders = (
        load(spark, sf_dir, "orders")
        .filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .select("o_orderkey", "o_custkey")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", _rev4().alias("rev4")
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = F.broadcast(load(spark, sf_dir, "nation"))
    region = F.broadcast(load(spark, sf_dir, "region"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(nation, F.col("s_nationkey") == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == Q5_REGION)
        .groupBy("n_name")
        .agg(
            mround(
                F.sum(F.col("rev4").cast("decimal(38,0)")).cast("double") / 10000.0,
                2,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


ORACLE_Q230 = f"""
SELECT n_name,
       round(1.37e-6 + CAST(sum(CAST({_REV4_SQL} AS HUGEINT)) AS DOUBLE)
             / 10000.0, 2) AS revenue,
       count(*) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND o_orderdate >= TIMESTAMP '{Q5_DATE_LO}'
  AND o_orderdate <  TIMESTAMP '{Q5_DATE_HI}'
  AND r_name = '{Q5_REGION}'
GROUP BY n_name
"""


QUERIES = {
    "q150_shipping_priority": q150_shipping_priority,
    "q151_small_qty_revenue": q151_small_qty_revenue,
    "q152_predicate_bands": q152_predicate_bands,
    "q153_promo_share": q153_promo_share,
    "q154_returned_items": q154_returned_items,
    "q155_nation_profit": q155_nation_profit,
    "q209_weighted_median": q209_weighted_median,
    "q230_local_supplier_volume": q230_local_supplier_volume,
}

ORACLES = {
    "q150_shipping_priority": ORACLE_Q150,
    "q151_small_qty_revenue": ORACLE_Q151,
    "q152_predicate_bands": ORACLE_Q152,
    "q153_promo_share": ORACLE_Q153,
    "q154_returned_items": ORACLE_Q154,
    "q155_nation_profit": ORACLE_Q155,
    "q209_weighted_median": ORACLE_Q209,
    "q230_local_supplier_volume": ORACLE_Q230,
}
