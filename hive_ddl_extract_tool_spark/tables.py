"""Loaders for the synthetic TPC-H-ish tables (TESTDATA.md / FIXTURES.md).

One parquet file per table under ``{sf_dir}/{name}.parquet``. Loading goes
through ``spark.read.parquet`` so Catalyst gets predicate pushdown, column
pruning and (on a partitioned layout) partition pruning for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to always broadcast in joins. At 100 TB the
# fact tables (lineitem/orders/events/documents/embeddings) grow with SF but
# these stay tiny (TPC-H region=5, nation=25 rows at every SF).
BROADCAST_TABLES = frozenset({"region", "nation", "supplier"})


def _ensure_session_defaults(spark: SparkSession) -> None:
    """Pin the runtime confs correctness depends on, regardless of who built
    the session (the external driver uses its own). UTC keeps timestamp
    parsing/formatting aligned with the DuckDB oracle (naive-UTC semantics).
    ANSI mode is pinned OFF: Spark 4 defaults it on, where x/0 ABORTS the
    job while DuckDB returns NULL -- a whitespace-only document in a future
    data drop would crash every ratio query instead of producing the
    oracle's NULL row. (The flagged queries also guard their denominators
    explicitly; the pin is defense-in-depth for any unguarded division.)
    Both are plain runtime confs, safe to set mid-session."""
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    if spark.conf.get("spark.sql.ansi.enabled") != "false":
        spark.conf.set("spark.sql.ansi.enabled", "false")


# (app_id, path, mtime_ns, size) -> StructType. Every schema-less
# spark.read.parquet() runs a footer-inference JOB before the query proper
# (visible as the "parquet at" jobs in the event log, ~40-80 ms each on
# local[32]); a bench/driver sweep re-loads the same 10 immutable fixture
# files hundreds of times, so r15 caches the inferred schema per session and
# passes it explicitly -- later loads skip the inference job entirely
# (measured r16: 41 -> 2 "parquet at" jobs per headline sweep). App-scoped
# on purpose: a new session re-infers from the files. The file's
# (mtime_ns, size) is part of the key (r16, ADVICE): replacing a fixture
# mid-session re-infers instead of serving the dead file's schema, at the
# cost of one os.stat per load; entries from other app ids are evicted on
# insert, mirroring operators/_cache.py, so long processes that restart
# sessions do not accumulate stale schemas.
_SCHEMAS: dict[tuple[str, str, int, int], object] = {}


def _schema_key(spark: SparkSession, path: str) -> tuple[str, str, int, int]:
    import os

    try:
        st = os.stat(path)
        mtime_ns, size = st.st_mtime_ns, st.st_size
    except OSError:
        # directory-style parquet or exotic path: fall back to path-only
        # keying (the r15 behavior) rather than failing the load
        mtime_ns, size = -1, -1
    return (spark.sparkContext.applicationId, path, mtime_ns, size)


def _infer_schema_driver_side(path: str):
    """Parquet schema via a DRIVER-SIDE footer read (pyarrow) converted
    with Spark's own Arrow mapping -- no Spark job at all, where a
    schema-less spark.read.parquet runs one. Verified bit-equal to Spark's
    inference for every fixture table at every SF (r15: 30/30 schemas,
    incl. timestamp_ntz and array<double>). Returns None on any surprise
    so the caller falls back to a normal inference read.

    Scope guard (r16, ADVICE): this path only ever serves tables.load(),
    i.e. the 10 immutable fixture tables above -- the verified allowlist.
    events, the one table that HAS shipped multiple encodings (and where
    the arrow mapping would silently diverge under nanosAsLong), is pinned
    to driver_side_infer=False at both call sites. A future fixture with a
    new encoding re-enters this function only via a changed file, which
    the (mtime, size) cache key surfaces as a fresh inference -- still
    through the same arrow mapping, so any NEW divergent encoding must be
    added to the exempt list exactly as events was."""
    try:
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        return from_arrow_schema(pq.read_schema(path), prefer_timestamp_ntz=True)
    except Exception:
        return None


def _read_parquet_cached_schema(
    spark: SparkSession, path: str, driver_side_infer: bool = True
) -> DataFrame:
    key = _schema_key(spark, path)
    schema = _SCHEMAS.get(key)
    if schema is None:
        for k in [k for k in _SCHEMAS if k[0] != key[0]]:
            del _SCHEMAS[k]
    if schema is None and driver_side_infer:
        schema = _infer_schema_driver_side(path)
        if schema is not None:
            _SCHEMAS[key] = schema
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMAS[key] = df.schema
        return df
    return spark.read.schema(schema).parquet(path)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    _ensure_session_defaults(spark)
    if name == "events":
        return _load_events(spark, sf_dir)
    return _read_parquet_cached_schema(spark, f"{sf_dir}/{name}.parquet")


def events_ts_type(spark: SparkSession, sf_dir: str):
    """Resolved type of events.ts under the nanosAsLong legacy conf -- a
    driver-side footer read, no data scan. The SINGLE authority both the
    batch loader and the streaming source (streaming/windows.py::
    _events_stream) consult, so the two paths cannot drift if a third
    encoding ever ships."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # driver_side_infer=False: a TIMESTAMP(NANOS) drop must resolve through
    # Spark's reader under the legacy conf (-> LongType); the pyarrow
    # mapping has no notion of nanosAsLong and would report TimestampNTZ.
    return _read_parquet_cached_schema(
        spark, f"{sf_dir}/events.parquet", driver_side_infer=False
    ).schema["ts"].dataType


def normalize_events_ts(df: DataFrame, ts_type) -> DataFrame:
    """Plan-side normalization of events.ts to session-tz TimestampType for
    either encoding the generator has shipped: TIMESTAMP(NANOS) (surfaces
    as long under the legacy conf; convert in-plan -- lossless, the
    generator emits microsecond-aligned values) or TIMESTAMP(MICROS)
    (surfaces as timestamp_ntz; cast). Shared by batch and streaming."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    if isinstance(ts_type, LongType):  # nanos surfaced as long
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts has shipped in two parquet encodings (see events_ts_type /
    normalize_events_ts); probe once and normalize in the plan."""
    ts_type = events_ts_type(spark, sf_dir)
    df = _read_parquet_cached_schema(
        spark, f"{sf_dir}/events.parquet", driver_side_infer=False
    )
    return normalize_events_ts(df, ts_type)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the spark.sql surface)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
