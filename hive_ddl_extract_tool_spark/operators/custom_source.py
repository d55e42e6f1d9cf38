"""Custom connector surface (SURVEY.md §2B X69): Spark 4's Python
DataSource API — a connector written in pure Python (no JVM code), with
real partition planning, registered and driven through the normal reader
path.

The source generates a deterministic synthetic corpus: row i carries
md5-derived pseudo-features (the shared h60 convention, computed with
hashlib in the generator and re-derived by DuckDB's md5 in the oracle),
so the query over the custom source is exactly checkable even though no
input file exists. This is the load-generator / external-system-connector
shape: `partitions()` splits the id range into independent splits that
Spark schedules as parallel tasks, and `read()` streams tuples per split.

Scale: a generator source is embarrassingly parallel (raise N_PARTS);
a real external connector plugs its shard enumeration into partitions()
and its scan into read() — nothing else changes.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._hashing import h60_sql

SYNTH_N = 20_000   # generated rows
SYNTH_PARTS = 8    # independent input splits
SYNTH_SEED = "synth_v1"


def _register_source() -> type:
    """Build the DataSource class lazily (the pyspark.sql.datasource import
    lives here so module import stays cheap)."""
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class SynthDocsReader(DataSourceReader):
        def __init__(self, options):
            self.n = int(options.get("n", SYNTH_N))
            self.parts = int(options.get("parts", SYNTH_PARTS))

        def partitions(self):
            return [InputPartition(i) for i in range(self.parts)]

        def read(self, partition):
            # striped split: row ids are a pure function of (i, stride), so
            # results are invariant to the partition count
            for i in range(partition.value, self.n, self.parts):
                h = int(hashlib.md5(f"{SYNTH_SEED}:{i}".encode()).hexdigest()[:15], 16)
                yield (i, h % 500, h % 1_000_000)

    class SynthDocs(DataSource):
        @classmethod
        def name(cls):
            return "synthdocs"

        def schema(self):
            return "doc_id BIGINT, n_tokens BIGINT, quality_ppm BIGINT"

        def reader(self, schema):
            return SynthDocsReader(self.options)

    return SynthDocs


def q169_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over the custom Python data source: per n_tokens-centile
    band, row count, token sum, and mean quality in integer ppm. The
    oracle regenerates the identical rows from DuckDB's range() + md5 —
    the connector's output is hash-verified end to end."""
    spark.dataSource.register(_register_source())
    src = (
        spark.read.format("synthdocs")
        .option("n", str(SYNTH_N))
        .option("parts", str(SYNTH_PARTS))
        .load()
    )
    # integer division for the band: a double cast would diverge (DuckDB
    # ROUNDS double->int casts, Spark truncates)
    return src.groupBy(F.expr("n_tokens DIV 50").alias("band")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
        F.expr("CAST(sum(quality_ppm) DIV count(1) AS BIGINT)").alias("mean_quality_ppm"),
    )


ORACLE_Q169 = f"""
WITH g AS (
  SELECT CAST(range AS BIGINT) AS doc_id,
         {h60_sql(f"'{SYNTH_SEED}:' || CAST(range AS VARCHAR)")} % 500 AS n_tokens,
         {h60_sql(f"'{SYNTH_SEED}:' || CAST(range AS VARCHAR)")} % 1000000 AS quality_ppm
  FROM range({SYNTH_N})
)
SELECT CAST(n_tokens // 50 AS BIGINT) AS band,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       CAST(sum(quality_ppm) // count(*) AS BIGINT) AS mean_quality_ppm
FROM g GROUP BY 1
"""


QUERIES = {"q169_python_datasource": q169_python_datasource}
ORACLES = {"q169_python_datasource": ORACLE_Q169}
