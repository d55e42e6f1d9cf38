"""Scalar-function surface (X9) and nested/array data (X13).

String / date / math / conditional functions on orders; JSON extraction on
events.props; higher-order array functions on embeddings.embedding. All
JVM-side built-ins (whole-stage codegen) -- no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._rounding import mround
from .text import WS  # the ONE explicit whitespace class (see text.py)
from ..tables import load


# --------------------------------------------------------------------------
# X9: string / date / math / case gauntlet
# --------------------------------------------------------------------------

def q20_scalar_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.upper(F.substring("o_orderpriority", 1, 3)).alias("prio3"),
        F.concat_ws("-", "o_orderstatus", F.year("o_orderdate").cast("string")).alias("status_year"),
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("trunc_month"),
        mround(F.col("o_totalprice") * 1.1, 2).alias("price_bump"),
        (F.col("o_orderkey") % 7).cast("bigint").alias("key_mod"),
        mround(F.sqrt("o_totalprice"), 4).alias("price_sqrt"),
        mround(F.abs(F.col("o_totalprice") - 250000.0), 2).alias("price_dist"),
        F.when(F.col("o_totalprice") > 300000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("size_class"),
        F.length("o_orderpriority").cast("int").alias("prio_len"),
        F.regexp_replace("o_orderpriority", "[0-9]-", "").alias("prio_word"),
    )


ORACLE_Q20 = """
SELECT o_orderkey,
       upper(substr(o_orderpriority, 1, 3))                               AS prio3,
       concat_ws('-', o_orderstatus, CAST(year(o_orderdate) AS VARCHAR))  AS status_year,
       CAST(year(o_orderdate) AS INT)                                     AS order_year,
       CAST(month(o_orderdate) AS INT)                                    AS order_month,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d')             AS trunc_month,
       round(1.37e-6 + o_totalprice * 1.1, 2)                                       AS price_bump,
       CAST(o_orderkey % 7 AS BIGINT)                                     AS key_mod,
       round(1.37e-6 + sqrt(o_totalprice), 4)                                       AS price_sqrt,
       round(1.37e-6 + abs(o_totalprice - 250000.0), 2)                             AS price_dist,
       CASE WHEN o_totalprice > 300000 THEN 'big'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'small' END                                              AS size_class,
       CAST(length(o_orderpriority) AS INT)                               AS prio_len,
       regexp_replace(o_orderpriority, '[0-9]-', '')                      AS prio_word
FROM orders
"""


# --------------------------------------------------------------------------
# X9 + X13: JSON extraction on events.props
# --------------------------------------------------------------------------

def q21_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object on the raw string + aggregate over the extracted key.
    At scale: extraction is codegen'd; prefer from_json into a struct once,
    then prune -- both shown (from_json feeds k2)."""
    events = load(spark, sf_dir, "events")
    parsed = events.select(
        "event_type",
        "value",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
        F.from_json("props", "k INT").getField("k").alias("k2"),
    )
    return (
        parsed.withColumn("k_bucket", (F.col("k") % 10).cast("int"))
        .groupBy("event_type", "k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            mround(F.sum("value"), 2).alias("sum_value"),
            F.max("k2").cast("int").alias("max_k"),
        )
    )


# Guards mirror Spark's lenient JSON semantics exactly: json_valid gates
# every extraction (DuckDB's json functions THROW on malformed input where
# Spark returns NULL); trunc(TRY_CAST(.. AS DOUBLE)) reproduces Spark's
# string->int cast (truncating, '1.5' -> 1, 'abc' -> NULL) where DuckDB's
# direct string cast rounds or aborts; the typed k2 path requires an
# integer-typed JSON number, matching from_json's strict BIGINT field.
ORACLE_Q21 = """
WITH p AS (
  SELECT event_type, value,
         CASE WHEN json_valid(props)
              THEN CAST(trunc(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE)) AS INT) END AS k,
         CASE WHEN json_valid(props) AND json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
              THEN TRY_CAST(json_extract_string(props, '$.k') AS INT) END AS k2
  FROM events
)
SELECT event_type,
       CAST(k % 10 AS INT)             AS k_bucket,
       count(*)                        AS n,
       round(1.37e-6 + sum(value), 2)  AS sum_value,
       CAST(max(k2) AS INT)            AS max_k
FROM p
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# q110: malformed-record quarantine (ingest hygiene)
# --------------------------------------------------------------------------

def q110_malformed_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse-or-quarantine over a mixed feed -- the first operator every
    real ingest runs: records that parse flow on, records that do not are
    COUNTED (and at scale, routed to a quarantine sink), never silently
    dropped. The feed is synthesized deterministically from documents:
    every third doc_id carries a valid JSON envelope, the rest raw prose
    that cannot parse. `from_json` in PERMISSIVE mode yields a struct of
    NULL fields for malformed input (not a NULL struct), so validity is
    the required `id` field being present after the parse; the oracle
    mirrors it by TRY_CASTing to JSON (NULL on malformed -- a bare ::JSON
    cast THROWS) and extracting the same field. Per-source accounting plus
    a checksum over the parsed payloads proves the parse executed."""
    docs = load(spark, sf_dir, "documents")
    payload = F.when(
        F.col("doc_id") % 3 == 0,
        F.format_string('{"id": %d, "len": %d}', F.col("doc_id"), F.col("n_chars")),
    ).otherwise(F.col("text"))
    parsed = F.from_json(payload, "id BIGINT, len BIGINT")
    base = docs.select("source", parsed.alias("p"))
    valid = F.col("p.id").isNotNull()
    return base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(valid.cast("bigint")).alias("n_valid"),
        F.sum((~valid).cast("bigint")).alias("n_quarantined"),
        F.sum(F.when(valid, F.col("p.len")).otherwise(F.lit(0))).alias("sum_parsed_len"),
    )


ORACLE_Q110 = """
WITH feed AS (
  SELECT source,
         CASE WHEN doc_id % 3 = 0
              THEN format('{{"id": {}, "len": {}}}', doc_id, n_chars)
              ELSE text END AS payload
  FROM documents
),
v AS (
  -- ok mirrors from_json's TYPED parse: valid JSON whose $.id is an
  -- integer-typed number (a string "7" or a float 1.5 is NOT a BIGINT to
  -- Spark's parser); nested CASE keeps json_type off malformed input,
  -- and the len term TRY-casts so hostile payloads cannot abort the
  -- oracle of the query whose purpose is surviving malformed input.
  SELECT source, payload,
         coalesce(CASE WHEN json_valid(payload)
                       THEN json_type(payload, '$.id') IN ('BIGINT', 'UBIGINT') END,
                  FALSE) AS ok
  FROM feed
)
SELECT source,
       count(*)                                                      AS n_rows,
       CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT)           AS n_valid,
       CAST(sum(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT)           AS n_quarantined,
       CAST(sum(CASE WHEN ok THEN
             (CASE WHEN json_type(payload, '$.len') IN ('BIGINT', 'UBIGINT')
                   THEN TRY_CAST(json_extract_string(payload, '$.len') AS BIGINT) END)
             ELSE 0 END) AS BIGINT) AS sum_parsed_len
FROM v
GROUP BY source
"""


# --------------------------------------------------------------------------
# X13: higher-order array functions on embeddings
# --------------------------------------------------------------------------

def q22_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size / element_at / transform / aggregate / array_max over
    array<float>. Elements are cast to double before arithmetic so both
    engines accumulate in double (matching the oracle bit-for-bit after
    rounding)."""
    emb = load(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    # The fold runs over the NULL-FILTERED array: Spark's aggregate turns
    # acc + NULL into NULL while DuckDB's list_sum skips NULLs -- filtering
    # inside the fold only (positional ops like element_at keep the raw
    # array) gives both engines skip semantics. The empty-array case is the
    # oracle's coalesce(.., 0.0) (list_sum([]) is NULL, the 0.0 seed is not).
    sumsq = F.aggregate(
        F.filter(dbl, lambda x: x.isNotNull()), F.lit(0.0), lambda acc, x: acc + x * x
    )
    return emb.select(
        "vec_id",
        "label",
        F.size("embedding").cast("int").alias("dim"),
        F.round(F.element_at(dbl, 1), 6).alias("first_val"),
        F.round(sumsq, 6).alias("sum_sq"),
        F.round(F.sqrt(sumsq), 6).alias("l2_norm"),
        F.round(F.array_max(dbl), 6).alias("max_val"),
        F.size(F.filter(dbl, lambda x: x > 0)).cast("int").alias("n_positive"),
    )


ORACLE_Q22 = """
SELECT vec_id, label,
       CAST(len(embedding) AS INT)                                                     AS dim,
       round(CAST(embedding[1] AS DOUBLE), 6)                                          AS first_val,
       round(coalesce(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 0.0), 6) AS sum_sq,
       round(sqrt(coalesce(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 0.0)), 6) AS l2_norm,
       round(list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6)           AS max_val,
       CAST(len(list_filter(list_transform(embedding, x -> CAST(x AS DOUBLE)), x -> x > 0)) AS INT) AS n_positive
FROM embeddings
"""


# --------------------------------------------------------------------------
# X13: explode / nested shredding (Dremel-style repeated field)
# --------------------------------------------------------------------------

def q23_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shred documents.text into a repeated field (split -> explode) and
    aggregate token frequencies -- the flatten/agg path every Dremel-model
    engine needs. Shuffle key is the token (high cardinality, well spread)."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.col("text"), WS)).alias("token"))
        .filter(F.length("token") > 0)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token"))
        .limit(25)
    )


ORACLE_Q23 = """
SELECT token, count(*) AS freq
FROM (SELECT unnest(regexp_split_to_array(text, '[ \\t\\n\\x0B\\f\\r]+')) AS token FROM documents)
WHERE length(token) > 0
GROUP BY token
ORDER BY freq DESC, token
LIMIT 25
"""


QUERIES = {
    "q20_scalar_gauntlet": q20_scalar_gauntlet,
    "q21_json_extract": q21_json_extract,
    "q110_malformed_quarantine": q110_malformed_quarantine,
    "q22_array_functions": q22_array_functions,
    "q23_explode_tokens": q23_explode_tokens,
}

ORACLES = {
    "q20_scalar_gauntlet": ORACLE_Q20,
    "q21_json_extract": ORACLE_Q21,
    "q110_malformed_quarantine": ORACLE_Q110,
    "q22_array_functions": ORACLE_Q22,
    "q23_explode_tokens": ORACLE_Q23,
}
