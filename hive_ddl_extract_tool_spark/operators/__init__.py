"""Query-operator surface (SURVEY.md §2B).

Each module exposes two dicts keyed by query name:

- ``QUERIES``: name -> Callable[(SparkSession, sf_dir str), DataFrame]
- ``ORACLES``: name -> equivalent DuckDB ANSI-SQL string (omitted for
  rows-only operators: approx aggregates, streaming-mode, UDF internals)

``all_queries()`` / ``all_oracles()`` merge every module for
``__spark_entry__.py``.

Ordering matters: the external driver sweeps ``queries()`` in dict order
under a wall-clock budget, and entries past the cutoff get NO correctness
row at all (round 1: the sweep stopped exactly at q60, leaving q61-q63
unverified despite passing locally). So the merged dict is emitted as:

1. an explicit priority prefix -- queries that most need a fresh driver
   verdict this round (previously-truncated streaming windows, newly added
   operators);
2. every remaining oracle-backed query in module order (these carry the
   hard correctness signal);
3. rows-only queries last (the driver only records that they ran, so they
   lose the least if the budget truncates the tail).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# ROTATION RULE (mechanical, apply every round): the driver sweeps ~50
# queries per round in this dict's order, so the priority prefix is rebuilt
# each round from CORRECTNESS_r{N}.json history as:
#
#   1. queries with NO driver row ever (brand-new this round, or past the
#      cutoff every prior round) -- they need their FIRST row;
#   2. queries whose behavior changed this round (oracle upgraded, plan
#      rewritten) -- the old green row no longer adjudicates them;
#   3. every remaining green query ordered by STALEST latest-green round
#      first (r2-era before r3-era before r4-era ...);
#   4. queries green in the immediately-previous round rotate to the back
#      (freshest evidence, fall through to module order below);
#   5. rows-only queries last (the driver only records that they ran).
#
# Next round's prefix is therefore predictable from this round's
# CORRECTNESS file: drop everything it turned green to the back, promote
# whatever it still never reached.
#
# Round 9 instance: (1) empty -- every query has a driver row; (2) behavior
# changed: q197's oracle widened in round 9 (the piv CTE's HUGEINT sums no
# longer truncate to BIGINT -- its r6 green row adjudicated the narrower
# formulation); (3) stalest greens: the 17 r3-era queries (age 5 after the
# r8 sweep; they would exceed MAX_AGE at r9 close), with q43/q49 -- the
# declared quadratic audits -- last within their class so an early
# wall-clock truncation drops them preferentially while still keeping them
# inside the 45-query gate budget; then the full r4-era block (33 queries,
# age 4) to buy round 10's headroom. Everything green in r8 (the r2-era
# rotation plus q190/q49c/q133/q221/q248) and the r5/r6/r7 blocks falls
# through to module order. tools/freshness.py gates this staging: every
# oracle-backed query that would exceed age 5 after the r9 sweep must sit
# inside the ~45-query budget prefix.
_PRIORITY = [
    # (2) behavior changed: q197's piv CTE widened to HUGEINT in round 9
    "q197_ab_welch",
    # (3) stalest greens: latest green row is round 3 (age 5)
    "q56_salted_join",
    "q58_bucketed_join",
    "q66_ivf_ann",
    "q66b_ivf_trained",
    "q68_dup_clusters",
    "q81_bm25_topk",
    "q82_collocations",
    "q86_decontamination",
    "q87_embed_dim_stats",
    "q89_value_histogram",
    "q93_dim_correlations",
    "q94_source_overlap",
    "q96_custdist",
    "q97_idle_rich_customers",
    "q99_label_purity",
    # declared quadratic audits stay last within the age-5 class
    "q43_ngram_jaccard",
    "q49_cosine_neardup",
    # (3 cont.) latest green row is round 4 (age 4) -- next round's stale set
    "q01_pricing_summary",
    "q02_revenue_by_nation",
    "q03_order_priority_semi",
    "q04_customers_without_orders",
    "q05_distinct_users",
    "q07_rollup_orders",
    "q08_cube_lineitem",
    "q09_grouping_sets",
    "q10_top_orders_per_customer",
    "q11_running_revenue",
    "q12_part_topk",
    "q13_nation_set_ops",
    "q14_pivot_status_year",
    "q20_scalar_gauntlet",
    "q21_json_extract",
    "q51b_decode_features_checked",
    "q52b_zscore_groups_checked",
    "q60_tumbling_window",
    "q61_sliding_window",
    "q62_session_window",
    "q63_stream_tumbling",
    "q64_stream_dedup",
    "q70_stream_static_join",
    "q103_semdedup",
    "q107_stream_interval_join",
    "q108_scd2_merge",
    "q109_audio_chunks",
    "q111_big_orders",
    "q113_zipf_fit",
    "q114_arrow_batch_stats",
    "q117_pca_power_iteration",
    "q118_decayed_engagement",
    "q119_edit_distance_verify",
]


def _modules():
    from . import advanced, behavior, curation, custom_source, dedup, functions_suite, functions_suite2, layout, multimodal, physical, profiling, relational, relational2, retrieval, selection, similarity, text, tokenizer, vectors
    from ..streaming import windows

    return (relational, relational2, functions_suite, functions_suite2, dedup, similarity, vectors, text, tokenizer, retrieval, curation, selection, multimodal, advanced, behavior, physical, layout, profiling, custom_source, windows)


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(mod.QUERIES)

    oracles = all_oracles()
    ordered: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in _PRIORITY:
        if name in merged:
            ordered[name] = merged[name]
    for name, fn in merged.items():
        if name not in ordered and name in oracles:
            ordered[name] = fn
    for name, fn in merged.items():
        if name not in ordered:
            ordered[name] = fn
    return ordered


def all_oracles() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in _modules():
        merged.update(mod.ORACLES)
    return merged
