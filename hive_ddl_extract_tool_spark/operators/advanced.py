"""Paper-linked advanced operators (PAPERS.md):

- q54 skyline: Pareto-optimal set, after "Integration of Skyline Queries into
  Spark SQL" (EDBT 2023). Distributed two-phase plan: each partition computes
  its local skyline (Arrow-batched, sort + running-max, O(n log n)), then the
  tiny candidate union is refined with a dominance anti-join. A global
  skyline point survives in its partition's local skyline, so the phase-1
  prune is lossless; the shuffle carries only local-skyline candidates.

- q53 pure-SQL ML inference: logistic scorer fused into scalar expressions,
  after "Machine Learning Inference Pipeline Execution Using Pure SQL Based
  on Operator Fusion" (ICDE 2025). The whole model (standardize -> dot ->
  sigmoid -> threshold) runs inside whole-stage codegen; no UDF, no
  inference service round-trip.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load

DIM = 64


# --------------------------------------------------------------------------
# q53: SQL-fused logistic inference over the embedding column
# --------------------------------------------------------------------------

def _weight(i: int) -> float:
    """Deterministic pseudo-weight in [-0.5, 0.5) from the shared md5 hash
    (same value is a literal in the Spark plan and the oracle SQL)."""
    h = int(hashlib.md5(f"w_{i}".encode()).hexdigest()[:15], 16)
    return (h % 1000) / 1000.0 - 0.5


WEIGHTS = [_weight(i) for i in range(1, DIM + 1)]
BIAS = 0.1


def q53_sql_ml_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    w = F.array(*[F.lit(v) for v in WEIGHTS])
    z = F.aggregate(
        F.zip_with("embedding", w, lambda x, wi: x.cast("double") * wi),
        F.lit(float(BIAS)),
        lambda acc, x: acc + x,
    )
    score = 1.0 / (1.0 + F.exp(-z))
    return emb.select(
        "vec_id",
        "label",
        F.round(score, 4).alias("score"),
        (score >= 0.5).alias("predicted"),
    )


_WEIGHTS_SQL = "[" + ", ".join(repr(v) for v in WEIGHTS) + "]"

ORACLE_Q53 = f"""
WITH scored AS (
  SELECT vec_id, label,
         1.0 / (1.0 + exp(-(
           list_sum(list_transform(range(1, {DIM} + 1),
                    i -> CAST(embedding[i] AS DOUBLE) * ({_WEIGHTS_SQL})[i]))
           + {BIAS}))) AS s
  FROM embeddings
)
SELECT vec_id, label, round(s, 4) AS score, s >= 0.5 AS predicted
FROM scored
"""


# --------------------------------------------------------------------------
# q54: distributed skyline (minimize retailprice, maximize size)
# --------------------------------------------------------------------------

def _local_skyline(batches):
    """Per-batch 2-D Pareto front: sort by (price asc, size desc); a row is
    locally undominated iff its size strictly exceeds every cheaper row's."""
    for pdf in batches:
        if pdf.empty:
            yield pdf
            continue
        pdf = pdf.sort_values(["p_retailprice", "p_size"], ascending=[True, False])
        best = -1
        keep = []
        prev_price = None
        for price, size in zip(pdf["p_retailprice"], pdf["p_size"]):
            # strictly-cheaper rows set the bar; equal-price rows tie-survive
            if prev_price is None or price > prev_price:
                bar = best
            keep.append(size > bar)
            best = max(best, size)
            prev_price = price
        yield pdf[pd.Series(keep, index=pdf.index)]


def q54_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").select("p_partkey", "p_retailprice", "p_size")
    candidates = part.mapInPandas(
        _local_skyline, schema="p_partkey long, p_retailprice double, p_size int"
    )
    a, b = candidates.alias("a"), candidates.alias("b")
    dominated = (
        (F.col("b.p_retailprice") <= F.col("a.p_retailprice"))
        & (F.col("b.p_size") >= F.col("a.p_size"))
        & (
            (F.col("b.p_retailprice") < F.col("a.p_retailprice"))
            | (F.col("b.p_size") > F.col("a.p_size"))
        )
    )
    return (
        a.join(b, dominated, "left_anti")
        .select("p_partkey", F.round("p_retailprice", 2).alias("retailprice"), F.col("p_size").cast("int").alias("size"))
    )


ORACLE_Q54 = """
SELECT p_partkey, round(p_retailprice, 2) AS retailprice, CAST(p_size AS INT) AS size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
)
"""


QUERIES = {
    "q53_sql_ml_inference": q53_sql_ml_inference,
    "q54_skyline": q54_skyline,
}

ORACLES = {
    "q53_sql_ml_inference": ORACLE_Q53,
    "q54_skyline": ORACLE_Q54,
}
