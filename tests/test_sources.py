"""Source/sink roundtrips, partition pruning, and bucketed (exchange-free)
joins -- the physical-layout half of the 100 TB story."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from hive_ddl_extract_tool_spark.plans.explain import count_shuffles, formatted_plan
from hive_ddl_extract_tool_spark.sources.io import (
    optional_format,
    read_table,
    write_bucketed,
    write_table,
)
from hive_ddl_extract_tool_spark.tables import load

DOC_SCHEMA = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_format_roundtrip(spark, sf_dir, tmp_path, fmt):
    docs = load(spark, sf_dir, "documents")
    path = str(tmp_path / f"docs_{fmt}")
    write_table(docs, path, fmt)
    back = read_table(spark, path, fmt, schema=DOC_SCHEMA if fmt in ("csv", "json") else None)
    assert back.count() == docs.count()
    a = docs.agg(F.sum("doc_id"), F.sum("n_chars")).collect()[0]
    b = back.agg(F.sum("doc_id"), F.sum("n_chars")).collect()[0]
    assert tuple(a) == tuple(b)


def test_schemaless_csv_read_is_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="explicit schema"):
        read_table(spark, str(tmp_path), "csv")


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    docs = load(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_partitioned")
    write_table(docs, path, "parquet", partition_by=["lang"])
    back = read_table(spark, path, "parquet").filter(F.col("lang") == "de")
    plan = formatted_plan(back)
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters", 1)[1][:200]
    expected = docs.filter(F.col("lang") == "de").count()
    assert back.count() == expected


def test_bucketed_join_is_exchange_free(spark, sf_dir):
    """Both sides bucketed on the join key: the join must plan with ZERO
    Exchange operators -- the write-once-shuffle-never property."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    write_bucketed(orders, "b_orders", ["o_custkey"], 8)
    write_bucketed(customer, "b_customer", ["c_custkey"], 8)
    try:
        j = (
            spark.table("b_orders")
            .join(spark.table("b_customer"),
                  F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        # one exchange allowed for the final tiny groupBy, none for the join
        plan = formatted_plan(j)
        join_section = plan.split("HashAggregate")[-1]  # below the agg: join + scans
        assert "Exchange" not in join_section, f"join section shuffles:\n{join_section}"
        # correctness unchanged vs the plain join
        plain = (
            orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(map(tuple, j.collect())) == sorted(map(tuple, plain.collect()))
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_optional_format_probe(spark):
    assert optional_format(spark, "parquet") is True
    assert optional_format(spark, "delta") is False  # jars not in this image


def test_compact_small_files(spark, sf_dir, tmp_path):
    docs = load(spark, sf_dir, "documents")
    path = str(tmp_path / "fragmented")
    docs.repartition(16).write.parquet(path)  # simulate a small-files mess
    from hive_ddl_extract_tool_spark.sources.io import compact

    before = compact(spark, path, "parquet", target_files=1)
    assert before >= 16
    import os
    data_files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(data_files) == 1
    assert spark.read.parquet(path).count() == docs.count()


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Schema evolution across parquet batches -- the normal life of a
    long-lived 100 TB dataset: a column added later must not break readers,
    and mergeSchema reconciles old and new footers (nulls for the column's
    pre-history). Spark reads one footer by default for speed; evolution
    needs the explicit merge."""
    from pyspark.sql import functions as F

    p = str(tmp_path / "evolving")
    spark.range(0, 5).select(
        F.col("id").alias("doc_id"), F.lit("v1").alias("source")
    ).write.parquet(p + "/batch=1")
    spark.range(5, 8).select(
        F.col("id").alias("doc_id"),
        F.lit("v2").alias("source"),
        (F.col("id") * 10).alias("quality"),  # column added in v2
    ).write.parquet(p + "/batch=2")

    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) == {"doc_id", "source", "quality", "batch"}
    rows = {r["doc_id"]: (r["source"], r["quality"]) for r in merged.collect()}
    assert rows[0] == ("v1", None)   # old rows: evolved column is null
    assert rows[7] == ("v2", 70)
    assert len(rows) == 8


def test_events_loader_handles_both_ts_encodings(spark, tmp_path):
    """The data generator has shipped events.ts as parquet TIMESTAMP(NANOS)
    (rounds 1-3) and TIMESTAMP(MICROS) (round 4). The loader must normalize
    BOTH to session-tz timestamps with identical values -- the micros case
    under a long-typed schema would NOT error, it silently compresses every
    timestamp 1000x (the round-4 streaming regression)."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from hive_ddl_extract_tool_spark.tables import load

    stamps = [
        dt.datetime(2024, 1, 1, 10, 0, 0),
        dt.datetime(2024, 1, 1, 10, 0, 0, 123456),
        dt.datetime(2024, 3, 5, 23, 59, 59, 999999),
    ]
    cols = {
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "user_id": pa.array([10, 11, 12], pa.int64()),
        "event_type": pa.array(["view", "click", "view"]),
        "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
        "props": pa.array(['{"k": 1}'] * 3),
    }
    for unit in ("us", "ns"):
        d = tmp_path / f"enc_{unit}"
        d.mkdir()
        table = pa.table({**cols, "ts": pa.array(stamps, pa.timestamp(unit))})
        pq.write_table(table, str(d / "events.parquet"))
        df = load(spark, str(d), "events")
        assert df.schema["ts"].dataType.typeName() == "timestamp", unit
        got = sorted(r["ts"].replace(tzinfo=None) for r in df.select("ts").collect())
        assert got == stamps, (unit, got)
