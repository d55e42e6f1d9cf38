"""Event-time windowing (SURVEY.md §2B X14): tumbling, sliding, session
windows over the events table, plus a true Structured Streaming path with
watermarking.

q60-q62 run the window assignment in batch mode (same `F.window` /
`F.session_window` expressions Structured Streaming uses). q63 is a real
`readStream` -> watermark -> windowed agg -> memory sink, driven to
completion; in complete output mode its result equals the batch aggregation,
so even the streaming path gets an exact DuckDB oracle.

Spark aligns windows to the epoch; DuckDB's `time_bucket` origin
(2000-01-01) is 5-minute aligned to the epoch, so bucket starts agree for
the divisors used here. Window bounds are emitted as formatted strings to
keep the cross-engine hash deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators._rounding import mround
from ..operators.advanced import ORACLE_Q88, SESSION_GAP_US
from ..tables import load

TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"
TS_US_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
TS_US_DUCK = "%Y-%m-%d %H:%M:%S.%f"
SESSION_GAP = "30 minutes"


# --------------------------------------------------------------------------
# q60: tumbling window (5 minutes)
# --------------------------------------------------------------------------

def q60_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), mround(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format("w.start", TS_FMT_SPARK).alias("win_start"),
            F.date_format("w.end", TS_FMT_SPARK).alias("win_end"),
            "n_events",
            "sum_value",
        )
    )


ORACLE_Q60 = f"""
SELECT strftime(tb, '{TS_FMT_DUCK}')                         AS win_start,
       strftime(tb + INTERVAL '5 minutes', '{TS_FMT_DUCK}')  AS win_end,
       count(*)                                              AS n_events,
       round(1.37e-6 + sum(value), 2)                        AS sum_value
FROM (SELECT time_bucket(INTERVAL '5 minutes', ts) AS tb, value FROM events)
GROUP BY tb
"""


# --------------------------------------------------------------------------
# q61: sliding window (10 minutes, slide 2) -- each event lands in 5 windows
# --------------------------------------------------------------------------

def q61_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "10 minutes", "2 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), mround(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format("w.start", TS_FMT_SPARK).alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


ORACLE_Q61 = f"""
SELECT strftime(win_start, '{TS_FMT_DUCK}') AS win_start,
       event_type,
       count(*)                             AS n_events,
       round(1.37e-6 + sum(value), 2)       AS sum_value
FROM (
  SELECT time_bucket(INTERVAL '2 minutes', ts) - k * INTERVAL '2 minutes' AS win_start,
         event_type, value
  FROM events, (SELECT unnest(range(5)) AS k)
)
GROUP BY win_start, event_type
"""


# --------------------------------------------------------------------------
# q62: session window (30-minute gap) per user
# --------------------------------------------------------------------------

def q62_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`F.session_window` merges events whose windows overlap (next.ts -
    prev.ts strictly < gap). The oracle reproduces that with lag + a running
    session counter -- the classic batch sessionization."""
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy(F.session_window("ts", SESSION_GAP).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), mround(F.sum("value"), 2).alias("sum_value"))
        .select(
            "user_id",
            F.date_format("w.start", TS_US_SPARK).alias("win_start"),
            F.date_format("w.end", TS_US_SPARK).alias("win_end"),
            "n_events",
            "sum_value",
        )
    )


ORACLE_Q62 = f"""
WITH m AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) < INTERVAL '{SESSION_GAP}'
              THEN 0 ELSE 1 END AS brk
  FROM events
),
s AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
  FROM m
)
SELECT user_id,
       strftime(min(ts), '{TS_US_DUCK}')                                  AS win_start,
       strftime(max(ts) + INTERVAL '{SESSION_GAP}', '{TS_US_DUCK}')       AS win_end,
       count(*)                                                           AS n_events,
       round(1.37e-6 + sum(value), 2)                                     AS sum_value
FROM s
GROUP BY user_id, sess
"""


# --------------------------------------------------------------------------
# q63: true Structured Streaming -- readStream + watermark + tumbling agg
# --------------------------------------------------------------------------

def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming read of events.parquet robust to both ts encodings the data
    generator has shipped: TIMESTAMP(NANOS) (surfaces as long under the
    legacy nanosAsLong conf; convert in-plan) and TIMESTAMP(MICROS)
    (surfaces as timestamp_ntz; cast to session-tz timestamp). The file
    source requires an explicit schema, so probe the batch reader's resolved
    schema once -- a driver-side footer read, no data scan -- and declare
    the matching stream schema. Declaring the wrong type would NOT error:
    the vectorized reader hands back the raw INT64 micros, silently
    compressing every timestamp 1000x downstream."""
    from ..tables import _ensure_session_defaults

    _ensure_session_defaults(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ts_type = spark.read.parquet(f"{sf_dir}/events.parquet").schema["ts"].dataType
    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", ts_type),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ])
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")  # file source needs a dir
        .parquet(sf_dir)
    )
    if isinstance(ts_type, T.LongType):  # nanos surfaced as long
        return stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream.withColumn("ts", F.col("ts").cast("timestamp"))


def q63_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source streaming over the same events parquet: watermark + 5-min
    tumbling window per event_type, memory sink. Complete output mode emits
    every window once the source drains, so the result equals the batch
    aggregation and the DuckDB oracle stays exact."""
    name = "q63_stream_result"
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), mround(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format("w.start", TS_FMT_SPARK).alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


ORACLE_Q63 = f"""
SELECT strftime(tb, '{TS_FMT_DUCK}')   AS win_start,
       event_type,
       count(*)                        AS n_events,
       round(1.37e-6 + sum(value), 2)  AS sum_value
FROM (SELECT time_bucket(INTERVAL '5 minutes', ts) AS tb, event_type, value FROM events)
GROUP BY tb, event_type
"""


# --------------------------------------------------------------------------
# q64: streaming dedup (dropDuplicatesWithinWatermark) with an exact oracle
# --------------------------------------------------------------------------

def q64_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup on (user_id, event_type, minute): readStream ->
    watermark -> dropDuplicatesWithinWatermark -> append memory sink, then a
    tiny batch rollup of the sink. The file source delivers the single
    events parquet in ONE micro-batch, so every duplicate key is still in
    state when its later rows arrive and the streamed result equals a batch
    DISTINCT -- which is what the DuckDB oracle computes. At scale the
    watermark bounds the dedup state to the late-data horizon instead of
    the whole corpus (the reason this operator exists)."""
    name = "q64_dedup_result"
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    stream = _events_stream(spark, sf_dir)
    deduped = (
        stream.withColumn("minute", F.date_trunc("minute", "ts"))
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["user_id", "event_type", "minute"])
        .select("user_id", "event_type", "minute")
    )
    q = deduped.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.table(name)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_unique_user_minutes"))
    )


ORACLE_Q64 = """
SELECT event_type, count(*) AS n_unique_user_minutes
FROM (SELECT DISTINCT user_id, event_type, date_trunc('minute', ts) AS minute FROM events)
GROUP BY event_type
"""


# --------------------------------------------------------------------------
# q70: stream-static enrichment join (stream events x customer dim)
# --------------------------------------------------------------------------

def q70_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join -- the enrichment shape every event pipeline runs:
    a readStream over events joined to the static customer dimension
    (broadcast: the dim is re-read per micro-batch and never holds join
    state, unlike stream-stream), then a 15-minute tumbling rollup per
    market segment. Complete output mode over the drained source equals the
    batch join+agg, so the DuckDB oracle is exact."""
    from ..tables import load as load_table

    name = "q70_enrich_result"
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.join(F.broadcast(cust), "user_id")
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "15 minutes").alias("w"), "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_events"), mround(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format("w.start", TS_FMT_SPARK).alias("win_start"),
            F.col("c_mktsegment").alias("segment"),
            "n_events",
            "sum_value",
        )
    )
    q = agg.writeStream.outputMode("complete").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


ORACLE_Q70 = f"""
SELECT strftime(time_bucket(INTERVAL '15 minutes', e.ts), '{TS_FMT_DUCK}') AS win_start,
       c.c_mktsegment                  AS segment,
       count(*)                        AS n_events,
       round(1.37e-6 + sum(e.value), 2) AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
"""


def q98_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-EVENT session ids via the custom stateful operator
    (applyInPandasWithState, streaming/stateful.py) -- the capability
    session_window lacks: it emits per-session AGGREGATES, while feature
    pipelines need each event's session id to join against. The state store
    carries (last event time, session ordinal) per user; draining the
    replayed log with availableNow semantics makes the result equal the
    batch window scan, so q88's SQL is an EXACT oracle for a stateful
    streaming query."""
    from .stateful import sessionize_stream

    name = "q98_stream_result"
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    stream = _events_stream(spark, sf_dir).select(
        "event_id", "user_id", F.unix_micros("ts").alias("tus")
    )
    sess = sessionize_stream(stream, SESSION_GAP_US)
    q = sess.writeStream.outputMode("update").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def q107_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join -- the hardest streaming operator in the
    survey surface: 'view' events matched to same-user 'click' events in the
    following 10 minutes, BOTH sides unbounded streams. Each side carries a
    watermark so the engine evicts join state older than the interval plus
    the late horizon -- the property that lets this run forever at 100 TB/day
    (an unwatermarked stream-stream join retains every row forever). Inner
    matches are emitted in the processing micro-batch, so draining the
    replayed log equals the batch inequality join and the DuckDB oracle is
    exact. Batch twin of the same shape: q55's bucketized range join."""
    name = "q107_ssj_result"
    for q in spark.streams.active:
        if q.name == name:
            q.stop()

    def side(kind: str, prefix: str) -> DataFrame:
        return (
            _events_stream(spark, sf_dir)
            .filter(F.col("event_type") == kind)
            .withWatermark("ts", "10 minutes")
            .select(
                F.col("ts").alias(f"{prefix}_ts"),
                F.col("user_id").alias(f"{prefix}_user"),
                F.col("value").alias(f"{prefix}_val"),
            )
        )

    joined = (
        side("view", "v")
        .join(
            side("click", "c"),
            F.expr("v_user = c_user AND c_ts >= v_ts AND c_ts <= v_ts + interval 10 minutes"),
        )
        .select(
            F.col("v_user").alias("user_id"),
            F.date_format("v_ts", TS_US_SPARK).alias("view_ts"),
            F.date_format("c_ts", TS_US_SPARK).alias("click_ts"),
            F.col("c_val").alias("click_value"),
        )
    )
    q = joined.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


ORACLE_Q107 = f"""
SELECT v.user_id,
       strftime(v.ts, '{TS_US_DUCK}') AS view_ts,
       strftime(c.ts, '{TS_US_DUCK}') AS click_ts,
       c.value AS click_value
FROM (SELECT * FROM events WHERE event_type = 'view') v
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON v.user_id = c.user_id
 AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 10 MINUTE
"""


QUERIES = {
    "q60_tumbling_window": q60_tumbling_window,
    "q61_sliding_window": q61_sliding_window,
    "q62_session_window": q62_session_window,
    "q63_stream_tumbling": q63_stream_tumbling,
    "q64_stream_dedup": q64_stream_dedup,
    "q70_stream_static_join": q70_stream_static_join,
    "q98_stream_sessionize": q98_stream_sessionize,
    "q107_stream_interval_join": q107_stream_interval_join,
}

ORACLES = {
    "q60_tumbling_window": ORACLE_Q60,
    "q61_sliding_window": ORACLE_Q61,
    "q62_session_window": ORACLE_Q62,
    "q63_stream_tumbling": ORACLE_Q63,
    "q64_stream_dedup": ORACLE_Q64,
    "q70_stream_static_join": ORACLE_Q70,
    "q98_stream_sessionize": ORACLE_Q88,
    "q107_stream_interval_join": ORACLE_Q107,
}
