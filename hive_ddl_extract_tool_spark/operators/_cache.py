"""Tiny per-session persist cache for intermediate DataFrames shared by
several registered queries (e.g. the distinct (doc_id, shingle-hash) set
used by q41/q42/q43, or the SimHash signatures used by q44/q45).

Why it exists: a self-join of an uncached plan scans its source twice, and
pipelines like MinHash-LSH reuse the shingle set in two subtrees Catalyst
does not CSE across. Persisting the shared subtree means ONE parquet scan
of documents feeds signature build, banding, and the Jaccard verify --
at 100 TB that is the difference between reading the corpus once and
reading it three times.

Entries are keyed by (Spark application id, logical key); inserting under a
new application id evicts everything from dead sessions, and the cache is
bounded (small fixed set of logical keys), so long-lived sessions do not
accumulate state.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel

_CACHE: dict[tuple[str, str], DataFrame] = {}


def cached_df(spark: SparkSession, key: str, builder: Callable[[], DataFrame]) -> DataFrame:
    """Return a persisted DataFrame for `key`, building it on first use.

    The persist is MEMORY_AND_DISK: at test SF it lives in memory; on a real
    cluster oversized partitions spill instead of OOMing.
    """
    app_id = spark.sparkContext.applicationId
    full_key = (app_id, key)
    hit = _CACHE.get(full_key)
    if hit is not None:
        return hit
    # Drop entries from previous (stopped) sessions; their RDD handles are dead.
    for k in [k for k in _CACHE if k[0] != app_id]:
        _CACHE.pop(k, None)
    df = builder().persist(StorageLevel.MEMORY_AND_DISK)
    _CACHE[full_key] = df
    return df


def clear_cache() -> None:
    """Unpersist and forget everything (test isolation hook)."""
    for df in _CACHE.values():
        try:
            df.unpersist()
        except Exception:
            pass
    _CACHE.clear()
