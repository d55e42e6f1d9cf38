"""Salted-join correctness: row-level results identical to the plain join,
with the hot key spread across salt buckets."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from hive_ddl_extract_tool_spark.operators.skew import salted_join
from hive_ddl_extract_tool_spark.tables import load


def _sorted_rows(df):
    return sorted(map(tuple, df.collect()))


def test_salted_inner_join_matches_plain(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    plain = li.join(orders, li.l_orderkey == orders.o_orderkey)
    salted = salted_join(li, orders, "l_orderkey", "o_orderkey", n_salts=8)
    assert _sorted_rows(salted.select("l_orderkey", "l_quantity", "o_orderpriority")) == \
        _sorted_rows(plain.select("l_orderkey", "l_quantity", "o_orderpriority"))


def test_salted_left_join_matches_plain(spark, sf_dir):
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    big = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000) \
        .select("o_custkey", "o_orderkey")
    plain = cust.join(big, cust.c_custkey == big.o_custkey, "left")
    salted = salted_join(cust, big, "c_custkey", "o_custkey", n_salts=4, how="left")
    assert _sorted_rows(salted.select("c_custkey", "o_orderkey")) == \
        _sorted_rows(plain.select("c_custkey", "o_orderkey"))


def test_salted_join_rejects_unsupported_how(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    with pytest.raises(ValueError):
        salted_join(cust, cust, "c_custkey", "c_custkey", how="full")


def test_hot_key_spreads_across_salts(spark):
    """A degenerate all-one-key big side must occupy multiple salt buckets."""
    big = spark.range(10_000).select(F.lit(7).alias("k"), F.col("id"))
    small = spark.range(10).select(F.col("id").alias("k2"), F.lit("x").alias("v"))
    out = salted_join(big, small, "k", "k2", n_salts=8)
    assert out.count() == 10_000  # k=7 matches exactly the one small row
    from hive_ddl_extract_tool_spark.operators.skew import SALT_COL
    salts = (
        big.withColumn(
            SALT_COL,
            F.pmod(F.xxhash64(F.struct([big[c] for c in big.columns]), F.lit(42)), F.lit(8)),
        )
        .select(SALT_COL).distinct().count()
    )
    assert salts == 8
