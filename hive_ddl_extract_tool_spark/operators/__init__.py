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
# Round 11 instance: (1) empty -- every query has a driver row; (2) empty --
# registry kept flat per the r10 verdict; (3) stalest green FIRST: the full
# r6-era block (47 queries, age 4 -- they would exceed MAX_AGE at r12 close),
# ordered cheap relational/aggregate/UDF shapes first, then dedup/vector/
# tokenizer/behavior mids, then physical/layout/profiling, with the
# sink/streaming tier (q169/q194/q170/q175/q178/q180/q182 -- the slowest
# sf0.01 entries) last so an early wall-clock truncation drops queries that
# sit at exactly age 5 (== MAX_AGE) at r11 close and can therefore still
# lead r12's prefix without breaching the gate. The 3 remaining slots (the
# 50-cap minus 47) are filled with the heaviest r7-era entries
# (q201/q202/q203) to shave r12's 48-query need down to 45 == the freshness
# gate's conservative budget. Total staged: exactly 50 -- the MEASURED
# driver budget, pinned by tests/test_freshness.py since r10. Everything
# green in r10 (the r5-era rotation) and the r8/r9 blocks falls through to
# module order.
_PRIORITY = [
    # (3) stalest green: latest green row is round 6 (age 4) -- refresh all
    # 47 now so nothing exceeds MAX_AGE at r12 close. Cheap aggregate/UDF
    # shapes first, sink/streaming last.
    "q06_approx_distinct_users",
    "q15b_approx_percentiles",
    "q153_promo_share",
    "q154_returned_items",
    "q155_nation_profit",
    "q171_polymorphic_udtf",
    "q176_grouped_agg_udf",
    "q181_arrow_python_udf",
    "q183_bitmap_distinct",
    "q184_listagg",
    "q166_deletion_manifest",
    "q167_cluster_split",
    "q188_crossdoc_spans",
    "q191_dupgraph_triangles",
    "q193_containment_dedup",
    "q158_pq_distortion",
    "q159_hard_negatives",
    "q160_truncation_recall",
    "q163_ann_rank_quality",
    "q192_entropy_rate",
    "q156_bpe_merge_rounds",
    "q161_char_coverage",
    "q162_negative_sampling_table",
    "q164_source_ablation",
    "q187_weighted_sample",
    "q196_cdc_apply",
    "q186_concurrent_sessions",
    "q189_rolling_active_users",
    "q195_position_attribution",
    "q198_ewma",
    "q199_conversion_paths",
    "q200_time_weighted_avg",
    "q165_format_roundtrip",
    "q179_schema_evolution_merge",
    "q172_zorder_layout",
    "q173_bloom_prune_audit",
    "q174_equidepth_histogram",
    "q177_join_cardinality_audit",
    "q157_dataset_profile",
    "q168_incremental_stats_merge",
    "q169_python_datasource",
    "q194_python_datasink",
    "q170_stream_file_sink",
    "q175_stream_upsert_sink",
    "q178_state_store_reader",
    "q180_stream_update_mode",
    "q182_stream_session_window",
    # (3 cont.) heaviest r7-era greens (age 3) promoted into the 3 slack
    # slots to smooth r12's otherwise-48-query refresh need down to 45.
    "q201_hll_shard_merge",
    "q202_prefix_filter_join",
    "q203_mad_outliers",
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
