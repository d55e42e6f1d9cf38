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


RESIZE_TARGET = 16  # thumbnail size in bytes (stands in for target pixel dims)


def _fake_resize(payload: bytes) -> bytes:
    """STUB for a real resize (PIL thumbnail / ffmpeg scale): uniform
    subsampling of the byte stream down to RESIZE_TARGET bytes -- the
    byte-level analogue of nearest-neighbor downsampling, deterministic so
    the pipeline's output is stable. A real implementation decodes, resizes,
    re-encodes; only this function changes."""
    if not payload:
        return b""
    step = max(1, len(payload) // RESIZE_TARGET)
    return payload[::step][:RESIZE_TARGET]


def q51_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payloads flow through mapInPandas as Arrow batches: decode ->
    feature-extract -> resize, the full media-preprocessing shape. The stub
    stages run per row inside the batch (real ones would vectorize); the
    thumbnail comes back as a binary column ready for a downstream model.
    Rows-only check (the decode internals are not SQL-expressible)."""
    docs = load(spark, sf_dir, "documents")
    with_payload = docs.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))

    def extract(batches):
        for pdf in batches:
            feats = [_fake_decode(p) for p in pdf["payload"]]
            thumbs = [_fake_resize(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "byte_sum": [f["byte_sum"] for f in feats],
                "n_bytes": [f["n_bytes"] for f in feats],
                "brightness": [f["brightness"] for f in feats],
                "thumb": thumbs,
                "thumb_bytes": [len(t) for t in thumbs],
            })

    return with_payload.mapInPandas(
        extract,
        schema="doc_id long, byte_sum long, n_bytes long, brightness double, "
               "thumb binary, thumb_bytes long",
    )


# --------------------------------------------------------------------------
# q51b: the SAME Arrow decode pipeline, reduced to oracle-checkable columns
# --------------------------------------------------------------------------

def q51b_decode_features_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q51's mapInPandas decode/resize pipeline with its outputs reduced to
    exactly-checkable columns -- byte_sum and n_bytes are integers,
    brightness is a ratio of integers (identical doubles cross-engine),
    and the resized thumbnail is fingerprinted via the shared 60-bit md5
    over its hex encoding. The DuckDB oracle recomputes every value from
    the hex of the payload with pure SQL list arithmetic, so the PYTHON
    batch path itself is value-hash verified (q67's integer-exact pandas
    discipline, extended to a binary pipeline)."""
    import hashlib

    docs = load(spark, sf_dir, "documents")
    with_payload = docs.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))

    def extract(batches):
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                # NULL text -> encode() -> None payload: bytes(None) raises
                # TypeError and kills the task; treat like the empty payload
                # (the q51 stub's own `if not payload` rule)
                p = bytes(p) if p is not None else b""
                feats = _fake_decode(p)
                thumb = _fake_resize(p)
                thumb_hex = thumb.hex()
                th = int(hashlib.md5(thumb_hex.encode()).hexdigest()[:15], 16)
                rows.append((doc_id, feats["byte_sum"], feats["n_bytes"],
                             feats["brightness"], th))
            yield pd.DataFrame(
                rows, columns=["doc_id", "byte_sum", "n_bytes", "brightness", "thumb_hash"]
            )

    out = with_payload.mapInPandas(
        extract,
        schema="doc_id long, byte_sum long, n_bytes long, brightness double, thumb_hash long",
    )
    return out.select(
        "doc_id", "byte_sum", "n_bytes", F.round("brightness", 6).alias("brightness"), "thumb_hash"
    )


ORACLE_Q51B = f"""
WITH hexed AS (
  -- coalesce(text, ''): the Python side treats a NULL payload like the
  -- empty one (the stub's `if not payload` rule)
  SELECT doc_id, lower(hex(encode(coalesce(text, '')))) AS hx,
         CAST(length(lower(hex(encode(coalesce(text, ''))))) / 2 AS BIGINT) AS n_bytes
  FROM documents
),
feat AS (
  -- coalesce to 0: DuckDB's list_sum over the EMPTY head is NULL where
  -- the Python stub returns byte_sum 0 for an empty payload
  SELECT doc_id, n_bytes,
         CAST(coalesce(list_sum(list_transform(range(0, least(n_bytes, 64)),
              i -> ('0x' || substr(hx, 2 * i + 1, 2))::BIGINT)), 0) AS BIGINT) AS byte_sum,
         least(n_bytes, 64) AS head_len,
         greatest(n_bytes // {RESIZE_TARGET}, 1) AS step
  FROM hexed
),
thumb AS (
  -- coalesce to '': array_to_string of the empty frame list is NULL in
  -- DuckDB where the Python resize of an empty payload returns b''
  SELECT f.doc_id, f.n_bytes, f.byte_sum, f.head_len,
         coalesce(array_to_string(list_transform(
           list_slice(list_transform(range(0, CAST(ceil(CAST(f.n_bytes AS DOUBLE) / f.step) AS BIGINT)),
                      k -> k * f.step), 1, {RESIZE_TARGET}),
           i -> substr(h.hx, 2 * i + 1, 2)), ''), '') AS thumb_hex
  FROM feat f JOIN hexed h USING (doc_id)
)
SELECT doc_id, byte_sum, n_bytes,
       -- head_len = 0 guard: the stub defines an empty payload's
       -- brightness as 0.0 where 0/0 is NULL in DuckDB
       CASE WHEN head_len = 0 THEN 0.0
            ELSE round(CAST(byte_sum AS DOUBLE) / (head_len * 255.0), 6) END AS brightness,
       {h60_sql('thumb_hex')} AS thumb_hash
FROM thumb
"""


# --------------------------------------------------------------------------
# q65: frame sampling over binary payloads (oracle-checked, all JVM-side)
# --------------------------------------------------------------------------

FRAME_BYTES = 64     # bytes per "frame" of the fake video payload
FRAME_STRIDE = 4     # sample every 4th frame
MAX_FRAMES = 5       # cap sampled frames per document


def q65_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling: treat the binary payload as a sequence of
    fixed-size frames, keep every STRIDE-th frame up to MAX_FRAMES, emit one
    row per sampled frame with its byte length and content hash. All
    byte-level work happens on the hex encoding of the payload (2 chars per
    byte), which both engines slice identically -- so unlike the decode stub
    (q51) this sampling pipeline is exactly oracle-checked. The explode
    multiplies rows by <= MAX_FRAMES (bounded fan-out); a real frame decoder
    slots in behind the sampled (doc_id, frame_idx, bytes) rows."""
    docs = load(spark, sf_dir, "documents")
    hexed = docs.select(
        "doc_id", F.lower(F.hex(F.encode(F.col("text"), "UTF-8"))).alias("hx")
    )
    n_frames = F.ceil(F.length("hx") / (2 * FRAME_BYTES))
    # strided 3-arg sequence (the shape the oracle's range(0, .., STRIDE)
    # already uses) -- generating 17 indices and filtering the modulo away
    # was pure waste
    idxs = F.filter(
        F.sequence(
            F.lit(0), F.lit((MAX_FRAMES - 1) * FRAME_STRIDE), F.lit(FRAME_STRIDE)
        ),
        lambda i: i < n_frames,
    )
    frames = hexed.select(
        "doc_id", "hx", F.explode(idxs).alias("frame_idx")
    ).select(
        "doc_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.substring(
            "hx", F.col("frame_idx") * (2 * FRAME_BYTES) + 1, F.lit(2 * FRAME_BYTES)
        ).alias("frame_hex"),
    )
    return frames.select(
        "doc_id",
        "frame_idx",
        (F.length("frame_hex") / 2).cast("int").alias("frame_bytes"),
        h60("frame_hex").alias("frame_hash"),
    )


ORACLE_Q65 = f"""
WITH hexed AS (
  SELECT doc_id, lower(hex(encode(text))) AS hx,
         CAST(ceil(length(lower(hex(encode(text)))) / {2 * FRAME_BYTES}.0) AS BIGINT) AS n_frames
  FROM documents
),
frames AS (
  SELECT doc_id,
         CAST(i AS INT) AS frame_idx,
         substr(hx, i * {2 * FRAME_BYTES} + 1, {2 * FRAME_BYTES}) AS frame_hex
  FROM hexed, (SELECT unnest(range(0, {(MAX_FRAMES - 1) * FRAME_STRIDE + 1}, {FRAME_STRIDE})) AS i)
  WHERE i < n_frames
)
SELECT doc_id, frame_idx,
       CAST(length(frame_hex) / 2 AS INT) AS frame_bytes,
       {h60_sql('frame_hex')}             AS frame_hash
FROM frames
"""


# --------------------------------------------------------------------------
# q109: overlapping audio-style windowing (oracle-checked, all JVM-side)
# --------------------------------------------------------------------------

CHUNK_BYTES = 48     # bytes per analysis window ("samples" of the fake audio)
CHUNK_HOP = 32       # hop < window -> adjacent chunks overlap by 16 bytes
MAX_CHUNKS = 6       # cap windows per document


def q109_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-preprocessing windowing: fixed-length OVERLAPPING chunks
    (hop < window, the STFT/speech-segmentation shape -- distinct from
    q65's strided disjoint frames). Byte-level slicing on the hex encoding,
    so the chunk boundaries and content hashes are exactly oracle-checked;
    a real feature stage (fbank/wav2vec) slots in behind the emitted
    (doc_id, chunk_idx, start_byte, bytes) rows. Bounded fan-out
    (<= MAX_CHUNKS rows per doc); the last partial window is kept iff it
    has at least one byte, exactly as a streaming framer would emit it."""
    docs = load(spark, sf_dir, "documents")
    hexed = docs.select(
        "doc_id", F.lower(F.hex(F.encode(F.col("text"), "UTF-8"))).alias("hx")
    )
    n_bytes = F.length("hx") / 2
    idxs = F.filter(
        F.sequence(F.lit(0), F.lit(MAX_CHUNKS - 1)),
        lambda i: i * CHUNK_HOP < n_bytes,
    )
    chunks = hexed.select("doc_id", "hx", F.explode(idxs).alias("chunk_idx")).select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        (F.col("chunk_idx") * CHUNK_HOP).cast("bigint").alias("start_byte"),
        F.substring(
            "hx", F.col("chunk_idx") * (2 * CHUNK_HOP) + 1, F.lit(2 * CHUNK_BYTES)
        ).alias("chunk_hex"),
    )
    return chunks.select(
        "doc_id",
        "chunk_idx",
        "start_byte",
        (F.length("chunk_hex") / 2).cast("int").alias("chunk_bytes"),
        h60("chunk_hex").alias("chunk_hash"),
    )


ORACLE_Q109 = f"""
WITH hexed AS (
  SELECT doc_id, lower(hex(encode(text))) AS hx,
         length(lower(hex(encode(text)))) / 2 AS n_bytes
  FROM documents
),
chunks AS (
  SELECT doc_id,
         CAST(i AS INT) AS chunk_idx,
         CAST(i * {CHUNK_HOP} AS BIGINT) AS start_byte,
         substr(hx, i * {2 * CHUNK_HOP} + 1, {2 * CHUNK_BYTES}) AS chunk_hex
  FROM hexed, (SELECT unnest(range(0, {MAX_CHUNKS})) AS i)
  WHERE i * {CHUNK_HOP} < n_bytes
)
SELECT doc_id, chunk_idx, start_byte,
       CAST(length(chunk_hex) / 2 AS INT) AS chunk_bytes,
       {h60_sql('chunk_hex')}             AS chunk_hash
FROM chunks
"""


QUERIES = {
    "q50_binary_metadata": q50_binary_metadata,
    "q51_decode_features": q51_decode_features,
    "q51b_decode_features_checked": q51b_decode_features_checked,
    "q65_frame_sample": q65_frame_sample,
    "q109_audio_chunks": q109_audio_chunks,
}

ORACLES = {
    "q50_binary_metadata": ORACLE_Q50,
    "q65_frame_sample": ORACLE_Q65,
    "q51b_decode_features_checked": ORACLE_Q51B,
    "q109_audio_chunks": ORACLE_Q109,
    # q51: rows-only (decode stub internals not SQL-expressible)
}
