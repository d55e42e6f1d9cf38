"""Source/sink surface: parquet (default), ORC, CSV, JSON, partitioned
layouts, and bucketed tables.

Scale notes baked into the helpers:
- Partitioned writes (`partition_by`) give partition *pruning* on read --
  a filter on the partition column skips whole directories.
- Bucketed tables (`write_bucketed`) pre-shuffle once at write time; joins
  and aggregations on the bucket key then run with NO exchange (verified by
  plan assert in tests/test_sources.py). This is how a 100 TB fact table
  avoids re-shuffling for every join against it.
- CSV/JSON readers take an explicit schema -- schema inference is a full
  extra pass over the data and type-unstable; never use it in production
  paths.

Format connectors that need external jars (Delta/Iceberg/Hudi, JDBC
drivers, Kafka) are exposed behind `optional_format`, which reports
unavailability cleanly instead of failing mid-plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession

CORE_FORMATS = ("parquet", "orc", "json", "csv", "xml")  # xml is core in Spark 4


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    **options: str,
) -> None:
    if fmt not in CORE_FORMATS:
        raise ValueError(f"fmt must be one of {CORE_FORMATS}; for others use optional_format")
    writer = df.write.mode(mode).format(fmt)
    if fmt == "csv":
        writer = writer.option("header", "true")
    if fmt == "xml":
        writer = writer.option("rowTag", "row")
    for k, v in options.items():
        writer = writer.option(k, v)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: str | None = None,
    **options: str,
) -> DataFrame:
    reader: DataFrameReader = spark.read.format(fmt)
    if fmt == "csv":
        # multiLine: the writer quotes embedded newlines, but the DEFAULT
        # reader splits records on physical lines and would parse one
        # quoted row as two malformed ones. Costs per-file split
        # parallelism (a multiLine file cannot be range-split) -- the
        # correct trade for a round-trip: a sink that loses rows is worse
        # than a slower scan. Callers can override per read.
        reader = reader.option("header", "true").option("multiLine", "true")
    if fmt == "xml":
        # Spark 4's XML reader defaults ignoreSurroundingSpaces=true,
        # silently trimming text values on read-back -- a whitespace-padded
        # document (a declared-real hostile shape) would not round-trip
        reader = reader.option("rowTag", "row").option(
            "ignoreSurroundingSpaces", "false"
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json", "xml"):
        raise ValueError(f"{fmt} requires an explicit schema (inference is a full extra scan)")
    return reader.load(path)


def write_bucketed(
    df: DataFrame, table_name: str, bucket_cols: list[str], n_buckets: int = 8,
    sort_cols: list[str] | None = None, path: str | None = None,
) -> None:
    """Persist as a bucketed (optionally sorted) catalog table. Joins between
    tables bucketed the same way on the join key are exchange-free. With
    `path`, the table is external at that location (lets callers keep data
    out of the default warehouse dir)."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def compact(spark: SparkSession, path: str, fmt: str = "parquet",
            target_files: int = 1, schema: str | None = None,
            shuffle: bool = False) -> int:
    """Small-files compaction: rewrite a directory into `target_files` files.

    Streaming sinks and fine-grained partition writes accumulate thousands of
    tiny files; at 100 TB that murders scan planning (one task per file) and
    the namenode. Rewrite into a staging dir, then swap. Returns the file
    count before compaction.

    `shuffle=False` (default) rewrites via coalesce -- no exchange, each
    output streams from ~before/target input fragments -- but the output
    count is min(target, planned SCAN partitions): the scan bin-packs tiny
    files by size (maxPartitionBytes/openCostInBytes, floored at
    defaultParallelism), so a low-parallelism host can plan fewer
    partitions than target and emit fewer files. `shuffle=True` pays one
    round-robin exchange for EXACTLY target_files -- required when the
    count is part of a verified contract (q204's oracle)."""
    import os
    import shutil
    import tempfile

    df = read_table(spark, path, fmt, schema=schema)
    before = sum(
        1 for root, _, files in os.walk(path)
        for f in files if not f.startswith(("_", "."))
    )
    staging = tempfile.mkdtemp(prefix="compact_", dir=os.path.dirname(path.rstrip("/")))
    out = df.repartition(target_files) if shuffle else df.coalesce(target_files)
    out.write.mode("overwrite").format(fmt).save(staging)
    # Swap atomically-enough: move the old dir aside first so a crash between
    # the two renames leaves the data reachable (either at path.old or at
    # path), never a missing dataset path.
    old = path.rstrip("/") + ".old"
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(path, old)
    try:
        os.rename(staging, path)
    except BaseException:
        os.rename(old, path)  # restore the original on failure
        raise
    shutil.rmtree(old)
    return before


def optional_format(spark: SparkSession, fmt: str) -> bool:
    """Probe whether an external-connector format (delta, iceberg, kafka,
    jdbc driver) is on the classpath. Returns False instead of raising so
    callers can degrade gracefully in environments without the jars."""
    try:
        spark.read.format(fmt).schema("x INT").load("/nonexistent_probe_path")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        # Path errors mean the format itself resolved; classpath errors mean
        # the connector is absent.
        return "PATH_NOT_FOUND" in msg or "Path does not exist" in msg
