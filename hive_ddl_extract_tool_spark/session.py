"""SparkSession factory.

Local mode runs one JVM with N executor threads; on a real cluster the same
configs hold, with AQE doing runtime re-planning (broadcast-join demotion,
skew-join splitting, partition coalescing). Everything here is plain public
Spark configuration.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return int(env)
    return os.cpu_count() or 8


def get_spark(
    app_name: str = "hive-ddl-extract-tool-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    enable_hive: bool = False,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Defaults are sized for local[N] testing but are the same knobs that
    matter on a 1000-executor cluster:

    - AQE on (runtime join-strategy selection, skew splitting, partition
      coalescing) -- at 100 TB the static plan is always wrong somewhere.
    - shuffle.partitions ~ cores locally; at scale you'd set it to
      2-3x total executor cores and let AQE coalesce.
    - Arrow on for any pandas interchange (vectorized, batch transfer).
    - Session timezone pinned to UTC so timestamp semantics are stable
      across driver machines (and match the DuckDB oracle).
    """
    cpus = cpus or default_parallelism()
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Split size sized to the test SF (single ~10 MB parquet files):
        # the default 128 MB would scan each table in ONE task, idling the
        # other 31 cores (measured: q02 1.05s -> 0.81s). At 100 TB with
        # many-GB file sets, raise back toward 128 MB so task count stays
        # ~2-3x cores, not millions.
        .config("spark.sql.files.maxPartitionBytes", "4m")
    )
    if enable_hive:
        builder = builder.enableHiveSupport()
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
