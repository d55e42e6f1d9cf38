"""Property-based tests (hypothesis) for the pure transforms, plus a
fixed tricky-string corpus check of the cross-engine 60-bit hash -- the
foundation every dedup/fingerprint oracle stands on."""

from __future__ import annotations

import string

from hypothesis import given
from hypothesis import strategies as st

from hive_ddl_extract_tool_spark.catalog.extractor import (
    fix_create_table,
    format_partition_spec,
    relative_location,
    strip_catalog_prefix,
)

_ident = st.text(alphabet=string.ascii_lowercase + string.digits + "_", min_size=1, max_size=12)
_value = st.text(
    alphabet=string.ascii_letters + string.digits + "-_.", min_size=1, max_size=12
)


@given(st.lists(st.tuples(_ident, _value), min_size=1, max_size=4))
def test_format_partition_spec_structure(kvs):
    name = "/".join(f"{k}={v}" for k, v in kvs)
    spec = format_partition_spec(name)
    parts = spec.split(",")
    assert len(parts) == len(kvs)
    for (k, v), part in zip(kvs, parts):
        assert part == f"{k}='{v}'"


@given(_ident, _ident)
def test_fix_create_table_is_idempotent(db, table):
    line = f"CREATE TABLE `{db}.{table}`("
    fixed = fix_create_table(line)
    assert fixed == f"CREATE TABLE `{db}`.`{table}`("
    assert fix_create_table(fixed) == fixed


@given(st.text(max_size=60))
def test_fix_create_table_never_touches_non_headers(line):
    if not line.startswith("CREATE "):
        assert fix_create_table(line) == line


@given(_ident, _ident)
def test_strip_catalog_prefix_only_spark_catalog(db, table):
    assert (
        strip_catalog_prefix(f"CREATE TABLE spark_catalog.{db}.{table} (")
        == f"CREATE TABLE {db}.{table} ("
    )
    other = f"CREATE TABLE other_catalog.{db}.{table} ("
    assert strip_catalog_prefix(other) == other


@given(st.lists(_ident, min_size=1, max_size=4), st.lists(_ident, min_size=1, max_size=3))
def test_relative_location_strips_exactly_the_prefix(base_parts, rel_parts):
    table_path = "/" + "/".join(base_parts)
    rel = "/".join(f"{p}=x" for p in rel_parts)
    loc = f"{table_path}/{rel}"
    assert relative_location(loc, table_path) == rel
    assert relative_location(loc, table_path + "/") == rel


# Tricky-corpus parity for the shared md5-derived 60-bit hash: every dedup /
# fingerprint oracle depends on Spark and DuckDB agreeing on these integers.
TRICKY = [
    "", " ", "a", "the", "\n", "\t", "a b", "a  b",
    "quote'quote", 'double"double', "back\\slash", "back`tick",
    "ümlaut", "中文字符", "emoji \U0001f600", "ends with space ",
    "  leading", "null\x00byte" if False else "nullbyte",  # \x00 unsupported in SQL literals
    "very " * 50 + "long",
    "=", "k=v", "a/b", "a,b", "%", "_", "[bracket]", "(paren)",
]


def test_h60_cross_engine_parity_on_tricky_corpus():
    import duckdb

    from hive_ddl_extract_tool_spark.operators._hashing import h60_sql

    con = duckdb.connect()
    duck = [
        con.sql("SELECT " + h60_sql("?").replace("?", "$s"), params={"s": s}).fetchone()[0]
        for s in TRICKY
    ]
    from hive_ddl_extract_tool_spark.operators._hashing import h60
    from hive_ddl_extract_tool_spark.session import get_spark
    from pyspark.sql import functions as F

    sp = get_spark(app_name="tests", cpus=4, shuffle_partitions=4)
    sdf = sp.createDataFrame([(s,) for s in TRICKY], "s string").select(h60("s").alias("h"))
    spark_vals = [r["h"] for r in sdf.collect()]
    assert spark_vals == duck
