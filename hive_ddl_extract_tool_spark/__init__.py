"""PySpark-native analytics engine with the capabilities of
jamthoma/hive-ddl-extract-tool, plus a full relational + LLM-data-pipeline
operator surface (SURVEY.md §2).

Layout:
    session.py    -- SparkSession factory tuned for local[N] and cluster use
    tables.py     -- loaders / temp-view registration for the synthetic tables
    operators/    -- relational, dedup, similarity, text, multimodal operators
    catalog/      -- the reference's own capability: Hive DDL extraction
    streaming/    -- Structured Streaming window operators
    plans/        -- plan-inspection helpers (pushdown / broadcast assertions)
"""

__version__ = "0.1.0"
