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
# Round 14 instance: (1) empty -- every query has a driver row; (2) empty --
# registry kept flat per the r13 verdict; (3) stalest green FIRST: the full
# remaining r9-era block (45 queries, age 4 -- they would exceed MAX_AGE at
# r15 close; q103/q107/q117/q66/q114 already rode r13's slack slots),
# ordered by MEASURED sf0.01 sweep cost ascending (tools/drive_driver.py
# per-query timings, this round's 247/247 FAILS: 0 opening drive) with the
# streaming-harness tier last -- its finite-replay micro-batches are the
# cohort's cost outliers, so a wall-clock truncation drops replay shapes
# before any cheap relational refresh. The 5 remaining slots (the 50-cap
# minus 45) are filled with the heaviest r10-era entries by the same
# measured timings (q140/q106/q130/q138/q131) to shave r15's otherwise-
# 50-query need -- they are age 3, so losing them to truncation breaches
# nothing. Staged prefix measured before commit (tools/measure_prefix.py,
# the r11 discipline): see BASELINE.md §Round-14. Total staged: exactly
# 50 -- the MEASURED driver budget, pinned by tests/test_freshness.py
# since r10. Everything green in r13 (the r8-era rotation) and the
# r10/r11/r12 blocks falls through to module order.
_PRIORITY = [
    # (3) stalest green: latest green row is round 9 (age 4) -- refresh all
    # 45 now so nothing exceeds MAX_AGE at r15 close. Measured-cheap shapes
    # first.
    "q12_part_topk",
    "q68_dup_clusters",
    "q52b_zscore_groups_checked",
    "q66b_ivf_trained",
    "q51b_decode_features_checked",
    "q97_idle_rich_customers",
    "q89_value_histogram",
    "q04_customers_without_orders",
    "q08_cube_lineitem",
    "q13_nation_set_ops",
    "q96_custdist",
    "q14_pivot_status_year",
    "q43_ngram_jaccard",
    "q86_decontamination",
    "q56_salted_join",
    "q07_rollup_orders",
    "q11_running_revenue",
    "q20_scalar_gauntlet",
    "q94_source_overlap",
    "q109_audio_chunks",
    "q108_scd2_merge",
    "q03_order_priority_semi",
    "q05_distinct_users",
    "q09_grouping_sets",
    "q10_top_orders_per_customer",
    "q113_zipf_fit",
    "q81_bm25_topk",
    "q82_collocations",
    "q118_decayed_engagement",
    "q197_ab_welch",
    "q21_json_extract",
    "q58_bucketed_join",
    "q111_big_orders",
    "q02_revenue_by_nation",
    "q01_pricing_summary",
    "q87_embed_dim_stats",
    "q93_dim_correlations",
    "q99_label_purity",
    "q49_cosine_neardup",
    # (3 cont.) the streaming-harness tier: cost outliers of the cohort,
    # staged last so truncation drops replay shapes, not cheap refreshes.
    "q60_tumbling_window",
    "q62_session_window",
    "q61_sliding_window",
    "q63_stream_tumbling",
    "q64_stream_dedup",
    "q70_stream_static_join",
    # (3 cont.) heaviest r10-era greens (age 3) promoted into the 5 slack
    # slots to shave r15's otherwise-50-query refresh need down to 45.
    "q140_stream_outer_join",
    "q106_minhash_estimator_error",
    "q130_canonical_election",
    "q138_cogroup_reconcile",
    "q131_stream_dedup_gate",
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
