"""Extended operator surface: pivot, exact percentiles, window extras
(ntile/percent_rank/nth_value), conditional aggregates (count_if/bool_or/
min_by), null-handling semantics, extra string/date/map functions.

Everything JVM-side built-ins; each query's oracle maps to the DuckDB
equivalent (noting the few semantic differences: DuckDB's dayofweek origin
differs from Spark's, so day-of-week goes through ISO weekday; DuckDB has no
initcap, so it is not exercised).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ._rounding import mround
from ..tables import load


# --------------------------------------------------------------------------
# q14: pivot (orders: status x order-year -> summed price)
# --------------------------------------------------------------------------

def q14_pivot_status_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.withColumn("order_year", F.year("o_orderdate").cast("int"))
        .groupBy("order_year")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(mround(F.sum("o_totalprice"), 2))
        .select(
            "order_year",
            F.col("O").alias("sum_open"),
            F.col("F").alias("sum_filled"),
            F.col("P").alias("sum_partial"),
        )
    )


ORACLE_Q14 = """
SELECT CAST(year(o_orderdate) AS INT) AS order_year,
       round(1.37e-6 + sum(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 2) AS sum_open,
       round(1.37e-6 + sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 2) AS sum_filled,
       round(1.37e-6 + sum(o_totalprice) FILTER (WHERE o_orderstatus = 'P'), 2) AS sum_partial
FROM orders
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q15: exact percentiles (linear interpolation) per group
# --------------------------------------------------------------------------

def q15_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    return (
        customer.groupBy("c_mktsegment")
        .agg(
            F.round(F.expr("percentile(c_acctbal, 0.25)"), 6).alias("p25"),
            F.round(F.expr("percentile(c_acctbal, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(c_acctbal, 0.9)"), 6).alias("p90"),
            F.count(F.lit(1)).alias("n"),
        )
    )


ORACLE_Q15 = """
SELECT c_mktsegment,
       round(quantile_cont(c_acctbal, 0.25), 6) AS p25,
       round(quantile_cont(c_acctbal, 0.5), 6)  AS p50,
       round(quantile_cont(c_acctbal, 0.9), 6)  AS p90,
       count(*)                                 AS n
FROM customer
GROUP BY c_mktsegment
"""


def q15b_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based quantiles audit -- oracle-backed since round 6.

    The 100 TB path is percentile_approx alone (single pass, mergeable
    KLL-style state, no per-group sort); q15 is the exact tier. To make
    the sketch oracle-checkable the output is (a) exact discrete order
    statistics bracketing each target rank, which DuckDB reproduces with
    quantile_disc, and (b) booleans asserting the sketch value lands
    between its brackets. percentile_approx with accuracy=1000 guarantees
    rank error <= n/1000, so brackets at p +/- 0.002 hold with 2x margin;
    the sketch is deterministic for a fixed input, so the booleans are
    stable values both engines can state (oracle asserts TRUE) and any
    sketch drift breaks the hash match. Money columns are exact data
    values (quantile_disc picks members, never interpolates), cast to
    double for the comparator."""
    li = load(spark, sf_dir, "lineitem")
    pcts = F.percentile_approx("l_extendedprice", [0.5, 0.95], 1000)
    agg = li.groupBy("l_returnflag").agg(
        F.element_at(pcts, 1).alias("_a50"),
        F.element_at(pcts, 2).alias("_a95"),
        F.expr(
            "percentile_disc(0.498) WITHIN GROUP (ORDER BY l_extendedprice)"
        ).alias("p50_lo"),
        F.expr(
            "percentile_disc(0.502) WITHIN GROUP (ORDER BY l_extendedprice)"
        ).alias("p50_hi"),
        F.expr(
            "percentile_disc(0.948) WITHIN GROUP (ORDER BY l_extendedprice)"
        ).alias("p95_lo"),
        F.expr(
            "percentile_disc(0.952) WITHIN GROUP (ORDER BY l_extendedprice)"
        ).alias("p95_hi"),
        F.count(F.lit(1)).alias("n"),
    )
    return agg.select(
        "l_returnflag",
        F.col("p50_lo").cast("double").alias("p50_lo"),
        F.col("p50_hi").cast("double").alias("p50_hi"),
        F.col("p95_lo").cast("double").alias("p95_lo"),
        F.col("p95_hi").cast("double").alias("p95_hi"),
        ((F.col("_a50") >= F.col("p50_lo")) & (F.col("_a50") <= F.col("p50_hi"))).alias("p50_in_bounds"),
        ((F.col("_a95") >= F.col("p95_lo")) & (F.col("_a95") <= F.col("p95_hi"))).alias("p95_in_bounds"),
        "n",
    )


ORACLE_Q15B = """
SELECT l_returnflag,
       CAST(quantile_disc(l_extendedprice, 0.498) AS DOUBLE) AS p50_lo,
       CAST(quantile_disc(l_extendedprice, 0.502) AS DOUBLE) AS p50_hi,
       CAST(quantile_disc(l_extendedprice, 0.948) AS DOUBLE) AS p95_lo,
       CAST(quantile_disc(l_extendedprice, 0.952) AS DOUBLE) AS p95_hi,
       TRUE                                                  AS p50_in_bounds,
       TRUE                                                  AS p95_in_bounds,
       count(*)                                              AS n
FROM lineitem
GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# q16: window extras -- ntile, percent_rank, dense_rank, nth_value, lead
# --------------------------------------------------------------------------

def q16_window_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderstatus").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    wf = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.dense_rank().over(w).cast("int").alias("drank"),
        mround(F.first_value(F.col("o_totalprice")).over(wf), 2).alias("top_price"),
        mround(F.nth_value(F.col("o_totalprice"), 2).over(wf), 2).alias("second_price"),
        mround(F.lead("o_totalprice", 1).over(w), 2).alias("next_price"),
    )


ORACLE_Q16 = """
SELECT o_orderkey, o_orderstatus,
       CAST(ntile(4) OVER w AS INT)                           AS quartile,
       round(percent_rank() OVER w, 6)                        AS pct_rank,
       CAST(dense_rank() OVER w AS INT)                       AS drank,
       round(1.37e-6 + first_value(o_totalprice) OVER wf, 2)  AS top_price,
       round(1.37e-6 + nth_value(o_totalprice, 2) OVER wf, 2) AS second_price,
       round(1.37e-6 + lead(o_totalprice, 1) OVER w, 2)       AS next_price
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey),
       wf AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


# --------------------------------------------------------------------------
# q27: RANGE-frame window -- trailing 30-day revenue per customer
# --------------------------------------------------------------------------

def q27_range_frame_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based window frame (RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
    over integer order-day): the frame is defined by the ordering VALUE, not
    row position, so same-day orders share a frame and gaps in the calendar
    shrink it -- semantics a rowsBetween frame cannot express. One shuffle
    on o_custkey; the frame scan is a per-partition sorted sliding window."""
    orders = load(spark, sf_dir, "orders")
    day = F.unix_date(F.to_date("o_orderdate"))
    w = (
        W.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-30, W.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        day.cast("int").alias("order_day"),
        mround(F.sum("o_totalprice").over(w), 2).alias("rev_30d"),
        F.count(F.lit(1)).over(w).alias("n_orders_30d"),
    )


ORACLE_Q27 = """
SELECT o_orderkey, o_custkey,
       CAST(day AS INT)                                AS order_day,
       round(1.37e-6 + sum(o_totalprice) OVER w, 2)    AS rev_30d,
       count(*) OVER w                                 AS n_orders_30d
FROM (SELECT *, CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS day FROM orders)
WINDOW w AS (PARTITION BY o_custkey ORDER BY day
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
"""


# --------------------------------------------------------------------------
# q17: conditional aggregates -- count_if / bool_or / min_by / max_by
# --------------------------------------------------------------------------

def q17_conditional_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
        F.bool_or(F.col("o_orderstatus") == "O").alias("any_open"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        # tiebreak inside the ordering value: prices are 2dp-quantized, so
        # +key*1e-10 never reorders distinct prices but makes ties deterministic
        F.min_by("o_orderkey", F.col("o_totalprice") - F.col("o_orderkey") * 1e-10).alias("cheapest_key"),
        F.max_by("o_orderkey", F.col("o_totalprice") + F.col("o_orderkey") * 1e-10).alias("priciest_key"),
        mround(F.sum(F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice")).otherwise(0.0)), 2)
        .alias("filled_revenue"),
    )


ORACLE_Q17 = """
SELECT o_orderpriority,
       CAST(count_if(o_totalprice > 200000) AS BIGINT)        AS n_big,
       bool_or(o_orderstatus = 'O')                           AS any_open,
       bool_and(o_totalprice > 0)                             AS all_positive,
       min_by(o_orderkey, o_totalprice - o_orderkey * 1e-10)  AS cheapest_key,
       max_by(o_orderkey, o_totalprice + o_orderkey * 1e-10)  AS priciest_key,
       round(1.37e-6 + sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END), 2)
                                                              AS filled_revenue
FROM orders
GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# q18: null-handling semantics over an outer join
# --------------------------------------------------------------------------

def q18_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    big = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_big"), mround(F.max("o_totalprice"), 2).alias("max_big"))
    )
    j = customer.join(big, customer.c_custkey == big.o_custkey, "left")
    return j.select(
        "c_custkey",
        F.coalesce("n_big", F.lit(0)).alias("n_big_orders"),
        F.coalesce("max_big", F.lit(-1.0)).alias("max_big_price"),
        F.col("n_big").isNull().alias("never_big"),
        F.nullif(F.coalesce("n_big", F.lit(0)), F.lit(0)).alias("n_or_null"),
        F.col("n_big").eqNullSafe(F.lit(1)).alias("exactly_one_big"),
    )


ORACLE_Q18 = """
WITH big AS (
  SELECT o_custkey, count(*) AS n_big, round(1.37e-6 + max(o_totalprice), 2) AS max_big
  FROM orders WHERE o_totalprice > 400000 GROUP BY o_custkey
)
SELECT c_custkey,
       coalesce(n_big, 0)                   AS n_big_orders,
       coalesce(max_big, -1.0)              AS max_big_price,
       n_big IS NULL                        AS never_big,
       nullif(coalesce(n_big, 0), 0)        AS n_or_null,
       n_big IS NOT DISTINCT FROM 1         AS exactly_one_big
FROM customer LEFT JOIN big ON c_custkey = o_custkey
"""


# --------------------------------------------------------------------------
# q19: string function extras
# --------------------------------------------------------------------------

def q19_string_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.translate("p_brand", "#", "-").alias("brand_dash"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("key_padded"),
        F.reverse("p_type").alias("type_rev"),
        F.repeat(F.lit("*"), (F.col("p_size") % 5).cast("int")).alias("stars"),
        F.levenshtein("p_brand", F.lit("Brand#1")).cast("int").alias("lev_to_b1"),
        F.split_part("p_type", F.lit(" "), F.lit(1)).alias("type_head"),
        F.left("p_name", F.lit(5)).alias("name5"),
        F.position(F.lit("a"), F.col("p_name")).cast("int").alias("first_a"),
    )


ORACLE_Q19 = """
SELECT p_partkey,
       translate(p_brand, '#', '-')                   AS brand_dash,
       lpad(CAST(p_partkey AS VARCHAR), 8, '0')       AS key_padded,
       reverse(p_type)                                AS type_rev,
       repeat('*', CAST(p_size % 5 AS INT))           AS stars,
       CAST(levenshtein(p_brand, 'Brand#1') AS INT)   AS lev_to_b1,
       split_part(p_type, ' ', 1)                     AS type_head,
       left(p_name, 5)                                AS name5,
       CAST(strpos(p_name, 'a') AS INT)               AS first_a
FROM part
"""


# --------------------------------------------------------------------------
# q24: map functions over parsed JSON props
# --------------------------------------------------------------------------

def q24_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """map<string,STRING>, not map<string,int>: the string map stringifies
    every scalar value and NULLs only on non-objects -- exactly DuckDB's
    json_keys semantics -- where a typed int map silently NULLs the whole
    map on one mistyped value (json_keys would still list its keys: a
    guaranteed n_keys divergence on hostile props). k_val then casts the
    string, matching the oracle's truncating TRY_CAST."""
    events = load(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    return events.select(
        "event_id",
        F.size(F.map_keys(m)).cast("int").alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
        F.element_at(m, "k").cast("int").alias("k_val"),
        F.map_contains_key(m, "missing").alias("has_missing"),
    )


ORACLE_Q24 = """
WITH p AS (
  SELECT event_id,
         CASE WHEN json_valid(props) AND json_type(props) = 'OBJECT'
              THEN json_keys(props) END AS ks,
         CASE WHEN json_valid(props) AND json_type(props) = 'OBJECT'
              THEN CAST(trunc(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE)) AS INT) END AS k_val,
         CASE WHEN json_valid(props) AND json_type(props) = 'OBJECT'
              THEN json_extract(props, '$.missing') IS NOT NULL END AS has_missing
  FROM events
)
SELECT event_id,
       CAST(len(ks) AS INT)                AS n_keys,
       array_to_string(list_sort(ks), ',') AS keys_sorted,
       k_val,
       has_missing
FROM p
"""


# --------------------------------------------------------------------------
# q25: date/time extras
# --------------------------------------------------------------------------

def q25_date_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.weekday(d).cast("int").alias("wday"),            # Monday = 0
        F.weekofyear(d).cast("int").alias("iso_week"),
        F.dayofyear(d).cast("int").alias("doy"),
        F.quarter(d).cast("int").alias("qtr"),
        F.last_day(d).cast("string").alias("month_end"),
        F.add_months(d, 3).cast("string").alias("plus3m"),
        F.datediff(F.lit("2002-01-01").cast("date"), d).cast("int").alias("days_to_2002"),
        F.date_trunc("week", d).cast("date").cast("string").alias("week_start"),
    )


ORACLE_Q25 = """
SELECT o_orderkey,
       CAST(isodow(o_orderdate) - 1 AS INT)                              AS wday,
       CAST(weekofyear(o_orderdate) AS INT)                              AS iso_week,
       CAST(dayofyear(o_orderdate) AS INT)                               AS doy,
       CAST(quarter(o_orderdate) AS INT)                                 AS qtr,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR)              AS month_end,
       CAST(CAST(o_orderdate + INTERVAL '3 months' AS DATE) AS VARCHAR)  AS plus3m,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS days_to_2002,
       CAST(CAST(date_trunc('week', o_orderdate) AS DATE) AS VARCHAR)    AS week_start
FROM orders
"""


# --------------------------------------------------------------------------
# q26: correlated scalar subquery (Catalyst decorrelates to a join)
# --------------------------------------------------------------------------

def q26_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers above their nation's average balance. Written as a
    correlated scalar subquery; Catalyst decorrelates it into an aggregate +
    join, so the executed plan shuffles once on nationkey, not once per row."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("cs_customer")
    # The above-average test runs in exact integers (cents * n > sum_cents
    # <=> bal > avg): a raw double avg() sums in partition order, so a
    # balance within an ulp of its nation's mean could flip membership
    # across engines. Still a correlated scalar subquery -- Catalyst
    # decorrelates the aggregates into one nationkey join either way.
    return spark.sql("""
        WITH c AS (SELECT c_custkey, c_nationkey, c_acctbal,
                          CAST(round(c_acctbal * 100) AS BIGINT) AS cents
                   FROM cs_customer)
        SELECT c_custkey, c_nationkey,
               round(1.37e-6 + c_acctbal, 2) AS acctbal
        FROM c outer_c
        WHERE cents * (SELECT count(*) FROM c WHERE c_nationkey = outer_c.c_nationkey)
              > (SELECT sum(cents) FROM c WHERE c_nationkey = outer_c.c_nationkey)
    """)


ORACLE_Q26 = """
WITH c AS (SELECT c_custkey, c_nationkey, c_acctbal,
                  CAST(round(c_acctbal * 100) AS BIGINT) AS cents
           FROM customer)
SELECT c_custkey, c_nationkey,
       round(1.37e-6 + c_acctbal, 2) AS acctbal
FROM c outer_c
WHERE cents * (SELECT count(*) FROM c WHERE c_nationkey = outer_c.c_nationkey)
      > (SELECT sum(cents) FROM c WHERE c_nationkey = outer_c.c_nationkey)
"""


# --------------------------------------------------------------------------
# q28: unpivot (melt) -- inverse of q14's pivot
# --------------------------------------------------------------------------

def q28_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = q14_pivot_status_year(spark, sf_dir)
    return wide.unpivot(
        ids=["order_year"],
        values=["sum_open", "sum_filled", "sum_partial"],
        variableColumnName="status_col",
        valueColumnName="sum_price",
    )


ORACLE_Q28 = f"""
WITH wide AS ({ORACLE_Q14})
SELECT order_year, 'sum_open' AS status_col, sum_open AS sum_price FROM wide
UNION ALL
SELECT order_year, 'sum_filled', sum_filled FROM wide
UNION ALL
SELECT order_year, 'sum_partial', sum_partial FROM wide
"""


# --------------------------------------------------------------------------
# q52: grouped applyInPandas (per-group z-score normalization)
# --------------------------------------------------------------------------

def q52_zscore_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-mktsegment z-score via grouped-map pandas UDF -- the X15 surface
    for per-group vectorized transforms (each group arrives as one pandas
    DataFrame over Arrow). Rows-only: pandas' two-pass std differs from SQL
    stddev at the last ulp by design."""
    import pandas as pd

    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment", "c_acctbal")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        s = pdf["c_acctbal"].std(ddof=1)
        m = pdf["c_acctbal"].mean()
        pdf = pdf.assign(z=0.0 if not s or s != s else (pdf["c_acctbal"] - m) / s)
        return pdf

    return (
        cust.groupBy("c_mktsegment")
        .applyInPandas(zscore, schema="c_custkey long, c_mktsegment string, c_acctbal double, z double")
        .select("c_custkey", "c_mktsegment", F.round("z", 4).alias("z"))
    )


# --------------------------------------------------------------------------
# q52b: the SAME grouped-map pandas path, exactly verified
# --------------------------------------------------------------------------

def q52b_zscore_groups_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q52's grouped applyInPandas z-score with the arithmetic restructured
    for exact cross-engine verification: balances become integer cents, the
    group moments (n, sum, sum-of-squares) accumulate as exact Python ints
    inside the UDF, and z = (n*x - sx) / sqrt(D * n / (n-1)) runs its ONE
    double sequence in the same order as the oracle SQL -- where
    D = n*sxx - sx^2 is computed exactly (Python bignum / DuckDB HUGEINT:
    at corpus scale it exceeds int64) and converted to double once,
    correctly rounded by both runtimes. Pandas' own two-pass .std() differs
    from SQL stddev at the last ulp BY DESIGN (q52 stays rows-only to
    document that); this twin shows the grouped-Python surface can still be
    value-hash exact when the operator is built on sufficient statistics."""
    import math

    import pandas as pd

    cust = load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("cents"),
    )

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        cents = pdf["cents"]
        n = int(len(cents))
        sx = int(cents.sum())
        sxx = int((cents * cents).sum())
        d = n * sxx - sx * sx  # exact bignum
        if n < 2 or d == 0:
            z = pd.Series(0.0, index=pdf.index)
        else:
            denom = math.sqrt(float(d) * n / (n - 1))
            z = (n * cents - sx) / denom
        return pdf.assign(z=z)

    return (
        cust.groupBy("c_mktsegment")
        .applyInPandas(zscore, schema="c_custkey long, c_mktsegment string, cents long, z double")
        .select("c_custkey", "c_mktsegment", F.round("z", 4).alias("z"))
    )


ORACLE_Q52B = """
WITH c AS (
  SELECT c_custkey, c_mktsegment, CAST(round(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer
),
m AS (
  SELECT c_mktsegment,
         count(*) AS n,
         sum(cents) AS sx,
         sum(cents * cents) AS sxx,
         CAST(count(*) AS HUGEINT) * sum(CAST(cents AS HUGEINT) * cents)
           - CAST(sum(cents) AS HUGEINT) * sum(cents) AS d
  FROM c
  GROUP BY c_mktsegment
)
SELECT c_custkey, c.c_mktsegment,
       CASE WHEN n < 2 OR d = 0 THEN 0.0
            ELSE round((n * cents - sx) / sqrt(CAST(d AS DOUBLE) * n / (n - 1)), 4)
       END AS z
FROM c JOIN m USING (c_mktsegment)
"""


# --------------------------------------------------------------------------
# q114: mapInArrow -- the zero-copy RecordBatch interchange surface
# --------------------------------------------------------------------------

def q114_arrow_batch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`mapInArrow` completes the Python-interchange matrix (pandas_udf /
    mapInPandas / applyInPandas / UDTF / applyInPandasWithState are all
    exercised elsewhere): batches arrive as pyarrow RecordBatches with NO
    pandas materialization -- the path a native-Arrow library (polars,
    DataFusion bindings, tokenizers) plugs into. Token counts come from
    pyarrow's vectorized split kernel; the fingerprint reuses the shared
    md5-60 convention computed per row. Integer outputs -> exact oracle."""
    import hashlib

    import pyarrow as pa
    import pyarrow.compute as pc

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")

    from .text import WS  # the ONE explicit whitespace class (see text.py)

    def stats(batches):
        for batch in batches:
            texts = batch.column("text")
            # vectorized kernels: whitespace-run split -> per-row token count
            # (split of a leading/trailing/multiple-space run yields empty
            # strings, exactly like Spark's split -- drop them per row).
            # WS is the shared explicit class, and the trim is ASCII-space
            # only (utf8_trim_whitespace is Unicode-aware, DuckDB's trim is
            # not -- a NBSP at a document edge would diverge).
            tokens = pc.split_pattern_regex(texts, WS)
            # NULL text -> NULL outputs (None, not 0): the oracle's
            # regexp/md5 of NULL yields NULL, and the type-strict canon
            # distinguishes int 0 from NULL.
            n_tok = [
                sum(1 for t in row if t != "") if row is not None else None
                for row in tokens.to_pylist()
            ]
            norm = pc.utf8_trim(
                pc.replace_substring_regex(pc.utf8_lower(texts), WS, " "), " "
            )
            fp = [
                int(hashlib.md5(s.encode()).hexdigest()[:15], 16) if s is not None else None
                for s in norm.to_pylist()
            ]
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pa.array(n_tok, pa.int64()),
                    pc.binary_length(texts).cast(pa.int64()),
                    pa.array(fp, pa.int64()),
                ],
                names=["doc_id", "ws_tokens", "n_bytes", "fingerprint"],
            )

    return docs.mapInArrow(
        stats, schema="doc_id long, ws_tokens long, n_bytes long, fingerprint long"
    )


ORACLE_Q114 = f"""
SELECT doc_id,
       CAST(len(list_filter(regexp_split_to_array(text, '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '')) AS BIGINT) AS ws_tokens,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       {{FP}} AS fingerprint
FROM documents
""".replace("{FP}", "(('0x' || substr(md5(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))), 1, 15))::BIGINT)")


# --------------------------------------------------------------------------
# q67: vectorized scalar pandas UDF (Arrow batches, numpy inside)
# --------------------------------------------------------------------------

def q67_pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The @pandas_udf scalar surface: embedding stats computed by numpy
    over Arrow batches (one Python call per ~10k rows, not per row). The
    outputs are INTEGERS (positive-component count, 1-based argmax of |x|
    with first-wins ties), so despite the Python path the DuckDB oracle is
    exact -- integer results cannot drift the way re-accumulated floats can."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # no type hints: this module defers annotation evaluation (PEP 563),
    # which breaks pandas_udf's hint inference; the explicit returnType
    # form selects the scalar Arrow UDF directly
    def _n_positive(col):
        return pd.Series([int((np.asarray(v) > 0).sum()) for v in col])

    def _argmax_abs(col):
        return pd.Series([int(np.argmax(np.abs(np.asarray(v)))) + 1 for v in col]).astype("int32")

    n_positive = pandas_udf(_n_positive, "long")
    argmax_abs = pandas_udf(_argmax_abs, "int")

    emb = load(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        n_positive("embedding").alias("n_pos"),
        argmax_abs("embedding").alias("peak_dim"),
    )


ORACLE_Q67 = """
SELECT vec_id,
       CAST(len(list_filter(embedding, x -> x > 0 AND NOT isnan(x))) AS BIGINT)  AS n_pos,  -- SQL NaN > 0 is TRUE; numpy's is False
       CAST(list_position(list_transform(embedding, x -> abs(x)),
                          list_max(list_transform(embedding, x -> abs(x)))) AS INT) AS peak_dim
FROM embeddings
"""


# --------------------------------------------------------------------------
# q241: ITERATOR-form scalar pandas UDF (SCALAR_ITER) -- per-partition init
# --------------------------------------------------------------------------

ITER_LUT_N = 64  # lookup-table size built once per partition by the UDF


def q241_iter_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The iterator-of-Series pandas UDF (SCALAR_ITER) -- the transport
    variant whose reason to exist is per-partition one-time
    initialization: expensive state (a model, a tokenizer, here a
    deterministic 64-entry lookup table) is built ONCE before the
    batch loop instead of per batch, then every Arrow batch streams
    through it. The arithmetic is all-integer (Knuth multiplicative
    hash bucket -> closed-form table weight), so the DuckDB oracle
    restates the lookup as the same closed form and the Python
    transport is value-hash verified like the rest of the q67/q181
    interchange matrix.

    Scale: one Python worker pass, Arrow-batched; init cost amortizes
    over the partition -- the difference between SCALAR and
    SCALAR_ITER at 100 TB is paying model-load once per task instead
    of once per ~10k-row batch."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    def _weights(it):
        # built once per partition -- the point of the iterator form
        lut = np.array(
            [(i * i * 31 + 7) % 1000 for i in range(ITER_LUT_N)], dtype="int64"
        )
        for s in it:
            b = (s.astype("int64") * 2654435761) % ITER_LUT_N
            yield pd.Series(np.take(lut, b.to_numpy()))

    weights = pandas_udf(_weights, "long", PandasUDFType.SCALAR_ITER)
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select("source", weights("n_chars").alias("w"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("w").alias("sum_weight"))
    )


ORACLE_Q241 = f"""
SELECT source, count(*) AS n_docs,
       CAST(sum((((n_chars * 2654435761) % {ITER_LUT_N})
                 * ((n_chars * 2654435761) % {ITER_LUT_N}) * 31 + 7) % 1000)
            AS BIGINT) AS sum_weight
FROM documents
GROUP BY source
"""


# --------------------------------------------------------------------------
# q176: GROUPED-AGGREGATE pandas UDF -- in groupBy().agg AND as a window fn
# --------------------------------------------------------------------------

def q176_grouped_agg_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The grouped-aggregate pandas UDF surface, both places Spark accepts
    it: inside ``groupBy().agg`` (AggregateInPandas) and OVER an unbounded
    window (WindowInPandas -- a distinct execution path where the UDF
    result is joined back to every row of the partition). The statistic is
    one builtins cannot express: the LOW MEDIAN (the sorted element at
    index (n-1)//2 -- an actual data element, no interpolation, so it is
    cross-engine exact where percentile_approx/quantile_cont are not) of
    the milli-quantized first embedding component, plus the median
    absolute deviation around it. The window application computes each
    row's partition median so rows strictly above it can be counted --
    robust-statistics gating, the shape a quality pipeline uses to clip
    outliers per group. floor(x*1000) quantizes: floor has no tie
    semantics to pin, unlike round."""
    import numpy as np
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    def _lowmed(col):
        a = np.asarray(col, dtype=np.int64)
        k = (len(a) - 1) // 2
        return int(np.partition(a, k)[k])

    # explicit GROUPED_AGG: this module defers annotations (PEP 563), so
    # hint-based inference would silently produce a SCALAR UDF -- which the
    # window form then rejects (q67's constraint, aggregate edition)
    gagg = lambda fn: pandas_udf(fn, "long", PandasUDFType.GROUPED_AGG)  # noqa: E731
    lowmed = gagg(_lowmed)
    mad = gagg(lambda col: _lowmed(np.abs(np.asarray(col, dtype=np.int64) - _lowmed(col))))
    # Spark refuses to mix grouped-agg pandas UDFs with JVM aggregates in
    # one agg (INVALID_PANDAS_UDF_PLACEMENT), so the count and the
    # above-median tally are pandas aggregates too
    pcount = gagg(lambda col: int(len(col)))
    psum = gagg(lambda col: int(np.asarray(col, dtype=np.int64).sum()))

    # cast to double BEFORE the multiply: float32 * 1000 rounds in float32
    # (Spark promotes the literal to float), while DuckDB's arithmetic
    # promotes to double -- quantize in double on both sides
    v = load(spark, sf_dir, "embeddings").select(
        "label",
        F.floor(F.element_at("embedding", 1).cast("double") * 1000).alias("v"),
    )
    w = W.partitionBy("label").rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    per_row = v.withColumn("med", lowmed("v").over(w)).withColumn(
        "above", (F.col("v") > F.col("med")).cast("bigint")
    )
    return per_row.groupBy("label").agg(
        pcount("v").alias("n_vecs"),
        lowmed("v").alias("med_milli"),
        mad("v").alias("mad_milli"),
        psum("above").alias("n_above_med"),
    )


ORACLE_Q176 = """
WITH v AS (
  SELECT label, CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000) AS BIGINT) AS v
  FROM embeddings
),
r AS (
  SELECT label, v, row_number() OVER (PARTITION BY label ORDER BY v) AS rn,
         count(*) OVER (PARTITION BY label) AS n
  FROM v
),
med AS (SELECT label, v AS med FROM r WHERE rn = (n + 1) // 2),
d AS (SELECT v.label, v.v, abs(v.v - m.med) AS ad, m.med FROM v JOIN med m USING (label)),
r2 AS (
  SELECT label, ad, row_number() OVER (PARTITION BY label ORDER BY ad) AS rn,
         count(*) OVER (PARTITION BY label) AS n
  FROM d
),
mads AS (SELECT label, ad AS mad FROM r2 WHERE rn = (n + 1) // 2)
SELECT d.label,
       count(*) AS n_vecs,
       min(d.med) AS med_milli,
       min(mads.mad) AS mad_milli,
       CAST(sum(CASE WHEN d.v > d.med THEN 1 ELSE 0 END) AS BIGINT) AS n_above_med
FROM d JOIN mads USING (label)
GROUP BY d.label
"""


# --------------------------------------------------------------------------
# q181: Arrow-OPTIMIZED Python UDF (useArrow=True) -- the row UDF done right
# --------------------------------------------------------------------------

def q181_arrow_python_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``udf(..., useArrow=True)``: row-at-a-time Python semantics over
    Arrow-serialized batches (ArrowEvalPython) -- the migration path for
    legacy per-row UDFs that cannot be vectorized, ~an order cheaper than
    pickled BatchEvalPython on the wire. Kept OUT of every hot path (the
    plan audit bans Python stages by default); this query exists to pin
    the mode's correctness: per-document md5-60 fingerprint, byte length,
    and an 'a'-occurrence count -- each reproducible in DuckDB (the count
    via length-difference, no regex), so even the per-row Python path is
    value-hash verified."""
    import hashlib

    from pyspark.sql.functions import udf

    fp60 = udf(
        lambda t: int(hashlib.md5(t.encode()).hexdigest()[:15], 16) if t is not None else None,
        "long",
        useArrow=True,
    )
    count_a = udf(
        lambda t: t.count("a") if t is not None else None, "long", useArrow=True
    )
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        fp60("text").alias("fp60"),
        F.octet_length("text").alias("n_bytes"),
        count_a("text").alias("n_a"),
    )


ORACLE_Q181 = """
SELECT doc_id,
       (('0x' || substr(md5(text), 1, 15))::BIGINT) AS fp60,
       CAST(octet_length(encode(text)) AS BIGINT)   AS n_bytes,
       CAST(length(text) - length(replace(text, 'a', '')) AS BIGINT) AS n_a
FROM documents
"""


# --------------------------------------------------------------------------
# q183: bitmap aggregates -- EXACT distinct counting that composes by OR
# --------------------------------------------------------------------------

def q183_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's bitmap aggregate family (bitmap_bucket_number /
    bitmap_bit_position / bitmap_construct_agg / bitmap_or_agg /
    bitmap_count): EXACT distinct counting whose partial state is a
    bitmap per 32k-id bucket -- unlike count(DISTINCT), the partials
    compose by OR, so per-shard artifacts merge without re-reading rows
    (the q168 composition story, for cardinalities). Keys are the raw
    user_ids, not hashes: a hash collision would silently undercount,
    id bits cannot. Two claims are hash-verified: per-type distinct
    users summed over bucket bitmaps equals count(DISTINCT), and OR-ing
    the per-type bucket bitmaps and THEN counting equals the global
    distinct -- the merge is lossless."""
    events = load(spark, sf_dir, "events").select("event_type", "user_id")
    per_bucket = events.groupBy(
        "event_type", F.expr("bitmap_bucket_number(user_id)").alias("bkt")
    ).agg(F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias("bm"))
    per_type = per_bucket.groupBy("event_type").agg(
        F.sum(F.expr("bitmap_count(bm)")).alias("n_users")
    )
    merged = (
        per_bucket.groupBy("bkt")
        .agg(F.expr("bitmap_count(bitmap_or_agg(bm))").alias("cnt"))
        .agg(
            F.lit("__all__").alias("event_type"),
            F.sum("cnt").alias("n_users"),
        )
    )
    return per_type.unionByName(merged)


ORACLE_Q183 = """
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type
UNION ALL
SELECT '__all__' AS event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
"""


# --------------------------------------------------------------------------
# q184: listagg WITHIN GROUP -- ordered string aggregation
# --------------------------------------------------------------------------

def q184_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's ANSI listagg: order-sensitive string aggregation, the one
    aggregate whose RESULT depends on a declared ordering (everything
    else in the registry is order-free by design). Per nation: the top-3
    customers by account balance (rank tie-broken by custkey so the set
    is unique), then listagg'd WITHIN GROUP (ORDER BY name) -- the inner
    ordering picks the rows, the aggregation ordering fixes the string,
    so the concatenation is deterministic on both engines (DuckDB:
    string_agg(... ORDER BY ...))."""
    cust = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    top = cust.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 3)
    top.createOrReplaceTempView("q184_top")
    return spark.sql("""
        SELECT c_nationkey,
               listagg(c_name, '|') WITHIN GROUP (ORDER BY c_name) AS top_names,
               CAST(count(*) AS BIGINT) AS n
        FROM q184_top GROUP BY c_nationkey
    """)


ORACLE_Q184 = """
WITH top AS (
  SELECT c_nationkey, c_name,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey) AS rk
  FROM customer
)
SELECT c_nationkey,
       string_agg(c_name, '|' ORDER BY c_name) AS top_names,
       CAST(count(*) AS BIGINT) AS n
FROM top WHERE rk <= 3
GROUP BY c_nationkey
"""


# --------------------------------------------------------------------------
# q69: correlation / OLS regression via exact sufficient statistics
# --------------------------------------------------------------------------

def q69_regression_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """corr / OLS slope / intercept / R^2 of extendedprice on quantity per
    returnflag, computed from EXACT integer moments: quantity and cents are
    losslessly integer, so n, Sx, Sy, Sxx, Syy, Sxy are summed as decimals
    (no double accumulation at all) and the statistics derive from those six
    numbers in one final double expression.

    Why not F.corr/F.regr_slope: their double co-moments accumulate in
    partition order, so results drift run-to-run on a cluster --
    irreproducible statistics at 100 TB. The sufficient-statistics form is a
    single map-side-combinable pass, bit-identical on every run and engine
    (pytest cross-checks it against the builtins to 1e-9). The same trick is
    the distributed-friendly shape: one narrow agg, constant state per group."""
    li = load(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_quantity")).cast("bigint").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("y"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731 -- exact sums (int64 would overflow on Syy)
    m = base.groupBy("flag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(dec(F.col("x"))).cast("double").alias("sx"),
        F.sum(dec(F.col("y"))).cast("double").alias("sy"),
        F.sum(dec(F.col("x") * F.col("x"))).cast("double").alias("sxx"),
        F.sum(dec(F.col("y") * F.col("y"))).cast("double").alias("syy"),
        F.sum(dec(F.col("x") * F.col("y"))).cast("double").alias("sxy"),
    )
    n = F.col("n_rows").cast("double")
    sx, sy = F.col("sx"), F.col("sy")
    cov = n * F.col("sxy") - sx * sy
    vx = n * F.col("sxx") - sx * sx
    vy = n * F.col("syy") - sy * sy
    r6 = lambda c: F.round(F.lit(1.37e-6) + c, 6)  # noqa: E731 -- mround, matches oracle eps
    return m.select(
        "flag",
        "n_rows",
        r6(cov / vx).alias("slope"),
        r6((sy - (cov / vx) * sx) / n).alias("intercept"),
        r6(cov / F.sqrt(vx * vy)).alias("corr_xy"),
        r6((cov * cov) / (vx * vy)).alias("r2"),
    )


ORACLE_Q69 = """
WITH b AS (
  SELECT l_returnflag AS flag,
         CAST(round(l_quantity) AS BIGINT)            AS x,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS y
  FROM lineitem
), m AS (
  SELECT flag,
         count(*)                 AS n_rows,
         CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(x) AS DOUBLE)   AS sx,
         CAST(sum(y) AS DOUBLE)   AS sy,
         CAST(sum(x*x) AS DOUBLE) AS sxx,
         CAST(sum(y*y) AS DOUBLE) AS syy,
         CAST(sum(x*y) AS DOUBLE) AS sxy
  FROM b GROUP BY flag
)
SELECT flag, n_rows,
       round(1.37e-6 + (n*sxy - sx*sy) / (n*sxx - sx*sx), 6)                                    AS slope,
       round(1.37e-6 + (sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n, 6)                  AS intercept,
       round(1.37e-6 + (n*sxy - sx*sy) / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy)), 6)            AS corr_xy,
       round(1.37e-6 + ((n*sxy - sx*sy) * (n*sxy - sx*sy)) / ((n*sxx - sx*sx) * (n*syy - sy*sy)), 6) AS r2
FROM m
"""


# --------------------------------------------------------------------------
# q77: VARIANT semi-structured type (parse_json -> variant_get)
# --------------------------------------------------------------------------

def q77_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark 4 VARIANT path for semi-structured data: parse once into
    the binary-encoded variant type, then typed variant_get extraction --
    at scale this replaces per-access JSON string re-parsing (the variant
    encoding is parsed once per row, fields are O(1) lookups, and shredded
    parquet writes can push extraction into the scan). Integer payloads
    keep the oracle exact; the average is derived from exact integer sums
    with identical arithmetic in both engines."""
    events = load(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'int')")
    base = events.select("event_type", k.alias("k"))
    return base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").cast("bigint").alias("sum_k"),
        (F.sum("k").cast("double") / F.count(F.lit(1))).alias("avg_k"),
    )


ORACLE_Q77 = """
SELECT event_type,
       count(*)                                         AS n,
       CAST(sum(k) AS BIGINT)                           AS sum_k,
       CAST(sum(k) AS DOUBLE) / count(*)                AS avg_k
FROM (SELECT event_type, CAST(json_extract(props, '$.k') AS INT) AS k FROM events)
GROUP BY event_type
"""


# --------------------------------------------------------------------------
# q78: Python UDTF (table function) -- fixed-width document chunking
# --------------------------------------------------------------------------

CHUNK_CHARS = 200


def q78_udtf_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF via LATERAL: split each document into fixed 200-char
    chunks -- the context-window packing step of an LLM data pipeline,
    expressed as a table function so one input row fans out to N output
    rows inside the plan (no collect, no explode-precompute). Outputs are
    integer offsets/lengths, so even this Python path is oracle-exact.
    The UDTF runs per-partition in a single Python worker pass; at 100 TB
    the fan-out stays bounded by document length and the stage remains
    embarrassingly parallel."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, n_chars int")
    class Chunker:
        def eval(self, text: str):
            if text is None:
                return
            n = len(text)
            idx = 0
            for start in range(0, n, CHUNK_CHARS):
                yield idx, min(CHUNK_CHARS, n - start)
                idx += 1

    spark.udtf.register("q78_chunker", Chunker)
    load(spark, sf_dir, "documents").createOrReplaceTempView("q78_documents")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.n_chars
        FROM q78_documents d, LATERAL q78_chunker(d.text) c
        """
    )


ORACLE_Q78 = f"""
SELECT doc_id,
       CAST(i AS INT)                                          AS chunk_idx,
       CAST(least({CHUNK_CHARS}, length(text) - i * {CHUNK_CHARS}) AS INT) AS n_chars
FROM documents,
     LATERAL (SELECT unnest(range(0, CAST(ceil(length(text) / {CHUNK_CHARS}.0) AS INT))) AS i)
"""


# --------------------------------------------------------------------------
# q138: cogrouped applyInPandas -- the two-table Python interchange surface
# --------------------------------------------------------------------------

COGROUP_BUCKETS = 256  # cogroup key cardinality; raise ∝ data on a cluster


def q138_cogroup_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`groupBy().cogroup().applyInPandas` completes the Python-interchange
    matrix (scalar pandas_udf / mapInPandas / applyInPandas / UDTF /
    applyInPandasWithState / mapInArrow are each exercised elsewhere): both
    tables are shuffled on the SAME key and each key-group arrives as a
    PAIR of pandas frames -- the reconciliation/merge-audit shape (ledger
    vs journal, header vs detail) that a plain join expresses awkwardly.

    The cogroup key is a HASH BUCKET of the order key, not the order key
    itself: keying per order spends a pandas frame construction on every
    2-line group (measured 54 s at sf0.1 for ~150k orders -- per-group
    overhead, not compute), while ~COGROUP_BUCKETS buckets amortize the
    Python boundary over thousands of rows and the kernel does a
    VECTORIZED pandas merge inside each bucket -- the distributed-pandas-
    merge shape this operator exists to demonstrate (1.8 s at sf0.1, 30x).
    Bucket count is the scale knob; both sides hash-agree on the bucket by
    construction.

    Per order: the header's o_totalprice in exact integer cents vs the sum
    of its lineitems' extendedprice cents and the line count (missing
    detail => 0s, matching the oracle's LEFT JOIN + coalesce; detail rows
    without a header drop out of the merge). Each bucket emits per-status
    integer partials; the outer aggregate sums them -- order-free, so the
    Python step's output is verified value-hash-exact. Cents are int64
    inside the kernel -- banker's-vs-half-up rounding cannot diverge
    because 2dp-quantized inputs never land a product on an exact .5."""
    import pandas as pd

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.pmod("o_orderkey", F.lit(COGROUP_BUCKETS)).alias("bkt"),
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_extendedprice",
        F.pmod("l_orderkey", F.lit(COGROUP_BUCKETS)).alias("bkt"),
    )

    def reconcile(key, odf: pd.DataFrame, ldf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "o_orderstatus": pd.Series(dtype="object"),
                "n_orders": pd.Series(dtype="int64"),
                "n_lines": pd.Series(dtype="int64"),
                "total_cents": pd.Series(dtype="int64"),
                "lines_cents": pd.Series(dtype="int64"),
            }
        )
        if odf.empty:  # detail without header: excluded, like the oracle
            return empty
        oc = pd.DataFrame(
            {
                "o_orderkey": odf["o_orderkey"],
                "o_orderstatus": odf["o_orderstatus"],
                "total_cents": (odf["o_totalprice"] * 100).round().astype("int64"),
            }
        )
        if len(ldf):
            lag = (
                ldf.assign(c=(ldf["l_extendedprice"] * 100).round().astype("int64"))
                .groupby("l_orderkey", sort=False)["c"]
                .agg(n_lines="size", lines_cents="sum")
                .reset_index()
            )
            m = oc.merge(lag, left_on="o_orderkey", right_on="l_orderkey", how="left")
            m["n_lines"] = m["n_lines"].fillna(0).astype("int64")
            m["lines_cents"] = m["lines_cents"].fillna(0).astype("int64")
        else:
            m = oc.assign(n_lines=0, lines_cents=0)
        return (
            m.groupby("o_orderstatus", sort=False)
            .agg(
                n_orders=("o_orderkey", "size"),
                n_lines=("n_lines", "sum"),
                total_cents=("total_cents", "sum"),
                lines_cents=("lines_cents", "sum"),
            )
            .reset_index()
        )

    per_bucket = (
        orders.groupBy("bkt")
        .cogroup(li.groupBy("bkt"))
        .applyInPandas(
            reconcile,
            schema="o_orderstatus string, n_orders long, n_lines long, total_cents long, lines_cents long",
        )
    )
    return per_bucket.groupBy("o_orderstatus").agg(
        F.sum("n_orders").alias("n_orders"),
        F.sum("n_lines").alias("n_lines"),
        F.sum("total_cents").alias("total_cents"),
        F.sum("lines_cents").alias("lines_cents"),
    )


ORACLE_Q138 = """
WITH l AS (
  SELECT l_orderkey,
         count(*) AS n_lines,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS lines_c
  FROM lineitem GROUP BY 1
)
SELECT o_orderstatus,
       count(*) AS n_orders,
       CAST(sum(coalesce(n_lines, 0)) AS BIGINT) AS n_lines,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
       CAST(sum(coalesce(lines_c, 0)) AS BIGINT) AS lines_cents
FROM orders LEFT JOIN l ON o_orderkey = l_orderkey
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q147: SQL-defined functions (scalar UDF + table function) -- pure-SQL reuse
# --------------------------------------------------------------------------

SQLF_CHUNK = 100  # words per chunk


def q147_sql_udf_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL-DEFINED functions -- the reuse surface that needs no
    Python at all: a scalar SQL UDF (`CREATE TEMPORARY FUNCTION ...
    RETURN expr`, here the shared-whitespace word count) and a SQL TABLE
    function (`RETURNS TABLE ... RETURN SELECT`, here the fixed-width
    chunk expansion) compose via a correlated LATERAL join into q78's
    chunk-manifest semantics with zero UDTF machinery. Catalyst INLINES
    both definitions, so the plan is identical to hand-written SQL --
    the abstraction is free (no Python boundary, no black-box function
    call); the DuckDB oracle states the same arithmetic inline, which is
    exactly what the inliner produces. All integer outputs."""
    from .text import WS

    load(spark, sf_dir, "documents").createOrReplaceTempView("q147_docs")
    ws = WS.replace("\\", "\\\\")
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY FUNCTION q147_wc(t STRING) RETURNS BIGINT "
        f"RETURN size(filter(split(t, '{ws}'), x -> x <> ''))"
    )
    spark.sql(
        f"""CREATE OR REPLACE TEMPORARY FUNCTION q147_chunk_ix(n BIGINT)
RETURNS TABLE(ci BIGINT, chunk_words BIGINT)
RETURN SELECT i AS ci, least(i * {SQLF_CHUNK}, n) - (i - 1) * {SQLF_CHUNK} AS chunk_words
FROM (SELECT explode(CASE WHEN n >= 1
                          THEN sequence(1L, (n + {SQLF_CHUNK - 1}) DIV {SQLF_CHUNK})
                          ELSE array() END) AS i)"""
    )
    # the scalar UDF resolves in a subquery, not as the TVF argument --
    # nesting a SQL UDF call inside a SQL table function's argument is
    # rejected (UNSUPPORTED_SQL_UDF_USAGE)
    return spark.sql(
        """SELECT d.doc_id, c.ci AS chunk_ix, c.chunk_words
FROM (SELECT doc_id, q147_wc(text) AS n FROM q147_docs) d,
     LATERAL q147_chunk_ix(d.n) c"""
    )


def _oracle_q147() -> str:
    from .text import LOWER_WORDS_SQL  # noqa: F401 (documents the shared class)

    wc = "len(list_filter(regexp_split_to_array(text, '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> ''))"
    return f"""
WITH d AS (SELECT doc_id, CAST({wc} AS BIGINT) AS n FROM documents)
SELECT doc_id, CAST(i AS BIGINT) AS chunk_ix,
       CAST(least(i * {SQLF_CHUNK}, n) - (i - 1) * {SQLF_CHUNK} AS BIGINT) AS chunk_words
FROM d, LATERAL (SELECT unnest(range(1, CAST((n + {SQLF_CHUNK - 1}) // {SQLF_CHUNK} AS BIGINT) + 1)) AS i)
WHERE n >= 1
"""


ORACLE_Q147 = _oracle_q147()


# --------------------------------------------------------------------------
# q171: POLYMORPHIC Python UDTF -- output schema computed by analyze()
# --------------------------------------------------------------------------

POLY_N = 3


def q171_polymorphic_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's polymorphic UDTF: the table function's OUTPUT SCHEMA is
    computed at plan time by a static ``analyze()`` from the literal
    arguments (here: n-gram width -> columns w1..wN), completing the
    Python-function surface next to q78's static-schema UDTF. The kernel
    tokenizes with the shared explicit whitespace class compiled in Python
    (str.split() would split on ALL Unicode whitespace -- broader than the
    cross-engine contract). Counts are integers, so the LATERAL expansion
    is hash-exact against the oracle's list-slice 3-grams."""
    import re

    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructField, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    from .text import WS

    ws_re = re.compile(WS)

    class PolyNGrams:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            return AnalyzeResult(
                StructType(
                    [StructField(f"w{i + 1}", StringType()) for i in range(n.value)]
                )
            )

        def eval(self, text, n):
            if text is None:
                return
            ws = [w for w in ws_re.split(text) if w]
            for i in range(len(ws) - n + 1):
                yield tuple(ws[i : i + n])

    spark.udtf.register("poly_ngrams", udtf(PolyNGrams))
    load(spark, sf_dir, "documents").createOrReplaceTempView("q171_docs")
    gram = " || ' ' || ".join(f"w{i + 1}" for i in range(POLY_N))
    return spark.sql(f"""
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_grams,
               CAST(count(DISTINCT {gram}) AS BIGINT) AS n_distinct_grams
        FROM q171_docs, LATERAL poly_ngrams(lower(text), {POLY_N}) t
        GROUP BY source
    """)


def _oracle_q171() -> str:
    from .text import LOWER_WORDS_SQL

    gram = " || ' ' || ".join(f"ws[i + {i}]" for i in range(POLY_N))
    return f"""
WITH w AS (SELECT source, {LOWER_WORDS_SQL} AS ws FROM documents),
pe AS (
  SELECT source, ws,
         unnest(generate_series(1, greatest(len(ws) - {POLY_N - 1}, 0))) AS i
  FROM w
),
g AS (SELECT source, {gram} AS gram FROM pe)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(count(DISTINCT gram) AS BIGINT) AS n_distinct_grams
FROM g GROUP BY source
"""



# --------------------------------------------------------------------------
# q211: ANSI-safe try_* arithmetic (the sanctioned error-to-NULL surface)
# --------------------------------------------------------------------------

TRY_MUL_FACTOR = 10 ** 15  # overflows int64 exactly when cents > 9223


def q211_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 runs ANSI mode by default, where overflow / divide-by-zero
    / bad casts THROW; try_divide, try_multiply, and try_cast are the
    sanctioned per-expression escapes that degrade to NULL instead of
    killing a 100 TB job at the one poisoned row. Exercised on planted
    hazards both engines can predict exactly: a modulo divisor that hits
    zero on every 5th key, a multiplier that overflows int64 exactly
    when cents > 9223 (cents * 1e15 vs the 9.22e18 ceiling), and a
    non-numeric cast victim on every 7th key. The quotient aggregate
    uses the truncating integer DIV of the SAME rows try_divide admits,
    so every output is an exact integer; the oracle reproduces each
    NULL set with explicit CASE guards.

    Scale: pure scalar expressions in whole-stage codegen over one scan;
    the 1-row aggregate is map-side combined."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    hazards = o.select(
        "cents",
        (F.col("o_orderkey") % 5).alias("div5"),
        F.expr(f"try_multiply(cents, CAST({TRY_MUL_FACTOR} AS BIGINT))").alias("mul"),
        F.expr("try_divide(cents, o_orderkey % 5)").alias("q_dbl"),
        F.expr(
            "try_cast(CASE WHEN o_orderkey % 7 = 0 THEN 'oops' "
            "ELSE CAST(cents AS STRING) END AS BIGINT)"
        ).alias("cast_back"),
    )
    return hazards.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("q_dbl").isNull(), 1).otherwise(0)).alias("n_div_null"),
        F.sum(
            F.when(F.col("div5") != 0, F.expr("cents DIV div5")).otherwise(0)
        ).cast("bigint").alias("sum_safe_quot"),
        F.sum(F.when(F.col("mul").isNull(), 1).otherwise(0)).alias("n_mul_overflow"),
        F.sum(F.when(F.col("cast_back").isNull(), 1).otherwise(0)).alias("n_cast_null"),
        F.sum("cast_back").cast("bigint").alias("sum_cast_back"),
    )


ORACLE_Q211 = """
WITH o AS (
  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
)
SELECT count(*) AS n_rows,
       CAST(sum(CASE WHEN o_orderkey % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_div_null,
       CAST(sum(CASE WHEN o_orderkey % 5 <> 0 THEN cents // (o_orderkey % 5)
                     ELSE 0 END) AS BIGINT) AS sum_safe_quot,
       CAST(sum(CASE WHEN cents > 9223 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_mul_overflow,
       CAST(sum(CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_cast_null,
       CAST(sum(CASE WHEN o_orderkey % 7 <> 0 THEN cents END) AS BIGINT)
         AS sum_cast_back
FROM o
"""



# --------------------------------------------------------------------------
# q216/q217: Spark 4 SQL front-end surfaces -- parameter markers + scripting
# --------------------------------------------------------------------------

PARAM_MIN_PRICE = 150_000.0   # named-parameter predicate bound
SCRIPT_TARGET_N = 100         # scripting loop: first 2^k leaving < N orders


def q216_parameterized_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL with named markers + the IDENTIFIER() clause --
    the injection-safe way to template both VALUES (:min_price) and
    OBJECT NAMES (:tbl) in Spark 4: markers bind as typed literals, and
    IDENTIFIER promotes a string parameter to a catalog reference
    without string-concatenating SQL. The query itself is a priority
    rollup over the parameter-bounded orders; the oracle inlines the
    same constants, so the binding path is hash-verified.

    Scale: binding happens at parse time -- the bound literal
    participates in constant folding and parquet filter pushdown
    exactly like an inlined one."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("q216_orders_v")
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS sum_cents
        FROM IDENTIFIER(:tbl)
        WHERE o_totalprice >= :min_price
        GROUP BY o_orderpriority
        """,
        args={"tbl": "q216_orders_v", "min_price": PARAM_MIN_PRICE},
    )


ORACLE_Q216 = f"""
SELECT o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM orders
WHERE o_totalprice >= {PARAM_MIN_PRICE}
GROUP BY o_orderpriority
"""


def q217_sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL scripting (BEGIN/DECLARE/WHILE/END): procedural
    control flow in pure SQL -- here an iterative doubling search for
    the smallest power-of-two cent threshold that fewer than 100 orders
    exceed. Each loop iteration is a full distributed aggregate; the
    script is the driver-side control plane (the sanctioned shape for
    convergence loops -- q68's connected components does the same from
    Python). The oracle computes the same fixpoint set-at-a-time from a
    k-grid, so the scripted loop's answer is hash-verified against a
    closed form.

    Scale: iterations are O(log(max price)) and each is an ordinary
    pushdown-friendly scan; state (k, n) lives in script variables, not
    in data."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("q217_orders_v")
    return spark.sql(f"""
    BEGIN
      DECLARE k INT DEFAULT 1;
      DECLARE n BIGINT DEFAULT 0;
      SET n = (
        SELECT count(*) FROM q217_orders_v
        WHERE CAST(round(o_totalprice * 100) AS BIGINT) >= 2);
      WHILE n >= {SCRIPT_TARGET_N} DO
        SET k = k + 1;
        SET n = (
          SELECT count(*) FROM q217_orders_v
          WHERE CAST(round(o_totalprice * 100) AS BIGINT)
                >= CAST(pow(2, k) AS BIGINT));
      END WHILE;
      SELECT k, CAST(pow(2, k) AS BIGINT) AS threshold_cents, n AS n_above;
    END
    """)


ORACLE_Q217 = f"""
WITH grid AS (
  SELECT k, CAST(pow(2, k) AS BIGINT) AS thr
  FROM (SELECT unnest(range(1, 40)) AS k)
), counts AS (
  SELECT k, thr,
         (SELECT count(*) FROM orders
          WHERE CAST(round(o_totalprice * 100) AS BIGINT) >= thr) AS n
  FROM grid
)
SELECT CAST(min(k) AS INT) AS k,
       CAST(arg_min(thr, k) AS BIGINT) AS threshold_cents,
       CAST(arg_min(n, k) AS BIGINT) AS n_above
FROM counts
WHERE n < {SCRIPT_TARGET_N}
"""


QUERIES = {
    "q14_pivot_status_year": q14_pivot_status_year,
    "q26_correlated_subquery": q26_correlated_subquery,
    "q28_unpivot": q28_unpivot,
    "q52_zscore_groups": q52_zscore_groups,
    "q52b_zscore_groups_checked": q52b_zscore_groups_checked,
    "q114_arrow_batch_stats": q114_arrow_batch_stats,
    "q15_percentiles": q15_percentiles,
    "q15b_approx_percentiles": q15b_approx_percentiles,
    "q16_window_extras": q16_window_extras,
    "q27_range_frame_window": q27_range_frame_window,
    "q17_conditional_aggs": q17_conditional_aggs,
    "q18_null_handling": q18_null_handling,
    "q19_string_extras": q19_string_extras,
    "q24_map_functions": q24_map_functions,
    "q25_date_extras": q25_date_extras,
    "q67_pandas_udf_scalar": q67_pandas_udf_scalar,
    "q69_regression_stats": q69_regression_stats,
    "q77_variant_json": q77_variant_json,
    "q78_udtf_chunk": q78_udtf_chunk,
    "q138_cogroup_reconcile": q138_cogroup_reconcile,
    "q147_sql_udf_chunks": q147_sql_udf_chunks,
    "q171_polymorphic_udtf": q171_polymorphic_udtf,
    "q176_grouped_agg_udf": q176_grouped_agg_udf,
    "q181_arrow_python_udf": q181_arrow_python_udf,
    "q241_iter_pandas_udf": q241_iter_pandas_udf,
    "q183_bitmap_distinct": q183_bitmap_distinct,
    "q184_listagg": q184_listagg,
    "q211_try_arithmetic": q211_try_arithmetic,
    "q216_parameterized_sql": q216_parameterized_sql,
    "q217_sql_scripting": q217_sql_scripting,
}

ORACLES = {
    "q52b_zscore_groups_checked": ORACLE_Q52B,
    "q114_arrow_batch_stats": ORACLE_Q114,
    "q14_pivot_status_year": ORACLE_Q14,
    "q26_correlated_subquery": ORACLE_Q26,
    "q28_unpivot": ORACLE_Q28,
    # q52: rows-only (pandas two-pass std != SQL stddev at the last ulp)
    "q15_percentiles": ORACLE_Q15,
    "q15b_approx_percentiles": ORACLE_Q15B,
    "q16_window_extras": ORACLE_Q16,
    "q27_range_frame_window": ORACLE_Q27,
    "q17_conditional_aggs": ORACLE_Q17,
    "q18_null_handling": ORACLE_Q18,
    "q19_string_extras": ORACLE_Q19,
    "q24_map_functions": ORACLE_Q24,
    "q25_date_extras": ORACLE_Q25,
    "q67_pandas_udf_scalar": ORACLE_Q67,
    "q69_regression_stats": ORACLE_Q69,
    "q77_variant_json": ORACLE_Q77,
    "q78_udtf_chunk": ORACLE_Q78,
    "q138_cogroup_reconcile": ORACLE_Q138,
    "q147_sql_udf_chunks": ORACLE_Q147,
    "q171_polymorphic_udtf": _oracle_q171(),
    "q176_grouped_agg_udf": ORACLE_Q176,
    "q181_arrow_python_udf": ORACLE_Q181,
    "q241_iter_pandas_udf": ORACLE_Q241,
    "q183_bitmap_distinct": ORACLE_Q183,
    "q184_listagg": ORACLE_Q184,
    "q211_try_arithmetic": ORACLE_Q211,
    "q216_parameterized_sql": ORACLE_Q216,
    "q217_sql_scripting": ORACLE_Q217,
}
