"""Multimodal column plumbing (SURVEY.md §2B / north-star extension).

Images/audio/video are opaque ``binary`` columns with typed metadata. The
container has no decode libraries (PIL/ffmpeg), so the decode step is a
clearly-marked deterministic STUB -- but the Spark-side plumbing is real:
binary payload construction, metadata projection in JVM-side functions
(q50, oracle-checked), and an Arrow-batched ``mapInPandas`` feature-extract
pipeline with an explicit output schema (q51, rows-only), which is exactly
the shape a real decoder plugs into (swap `_fake_decode` for PIL/torchvision
and nothing else changes).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._hashing import h60, h60_sql
from ..tables import load


# --------------------------------------------------------------------------
# q50: binary payload + typed metadata, all JVM-side (oracle-checked)
# --------------------------------------------------------------------------

def q50_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text stands in for a media payload: encode to bytes, project
    typed metadata. `fake_width`/`fake_height` are the deterministic stand-in
    for decoded image dims (hash-derived, NOT real decode)."""
    docs = load(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
        F.ascii("text").cast("int").alias("head_byte"),
        (h60("text") % 640).alias("fake_width"),
        (h60("text") % 480).alias("fake_height"),
        F.substring("source", 4, 10).alias("source_idx"),
    )


ORACLE_Q50 = f"""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(ascii(text) AS INT)                   AS head_byte,
       {h60_sql('text')} % 640                    AS fake_width,
       {h60_sql('text')} % 480                    AS fake_height,
       substr(source, 4, 10)                      AS source_idx
FROM documents
"""


# --------------------------------------------------------------------------
# q51: Arrow-batched decode/feature-extract pipeline (rows-only)
# --------------------------------------------------------------------------

def _fake_decode(payload: bytes) -> dict:
    """STUB for a real media decoder (PIL.Image.open / torchaudio.load).

    The container ships no media libraries, so this computes deterministic
    fake features from the raw bytes. A real deployment replaces only this
    function; the mapInPandas batching, schema, and partitioning are the
    production shape.
    """
    if not payload:
        return {"byte_sum": 0, "n_bytes": 0, "brightness": 0.0}
    head = payload[:64]
    s = sum(head)
    return {"byte_sum": int(s), "n_bytes": len(payload), "brightness": s / (len(head) * 255.0)}


def q51_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payloads flow through mapInPandas as Arrow batches; the stub
    decoder runs per row inside the batch (a real one would vectorize).
    Rows-only check (the decode internals are not SQL-expressible)."""
    docs = load(spark, sf_dir, "documents")
    with_payload = docs.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))

    def extract(batches):
        for pdf in batches:
            feats = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "byte_sum": [f["byte_sum"] for f in feats],
                "n_bytes": [f["n_bytes"] for f in feats],
                "brightness": [f["brightness"] for f in feats],
            })

    return with_payload.mapInPandas(
        extract, schema="doc_id long, byte_sum long, n_bytes long, brightness double"
    )


QUERIES = {
    "q50_binary_metadata": q50_binary_metadata,
    "q51_decode_features": q51_decode_features,
}

ORACLES = {
    "q50_binary_metadata": ORACLE_Q50,
    # q51: rows-only (decode stub internals not SQL-expressible)
}
