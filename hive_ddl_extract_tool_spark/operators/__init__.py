"""Query-operator surface (SURVEY.md §2B).

Each module exposes two dicts keyed by query name:

- ``QUERIES``: name -> Callable[(SparkSession, sf_dir str), DataFrame]
- ``ORACLES``: name -> equivalent DuckDB ANSI-SQL string (omitted for
  rows-only operators: approx aggregates, streaming-mode, UDF internals)

``all_queries()`` / ``all_oracles()`` merge every module for
``__spark_entry__.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from . import advanced, dedup, functions_suite, functions_suite2, multimodal, relational, similarity, text
    from ..streaming import windows

    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in (relational, functions_suite, functions_suite2, dedup, similarity, text, multimodal, advanced, windows):
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(mod.QUERIES)
    return merged


def all_oracles() -> dict[str, str]:
    from . import advanced, dedup, functions_suite, functions_suite2, multimodal, relational, similarity, text
    from ..streaming import windows

    merged: dict[str, str] = {}
    for mod in (relational, functions_suite, functions_suite2, dedup, similarity, text, multimodal, advanced, windows):
        merged.update(mod.ORACLES)
    return merged
