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
# Round 8 instance: (1) empty -- every query has a driver row; (2) behavior
# changed: q190's round-7 hash-keyed oracle still has no driver row (the
# r7 sweep's budget stopped one query short of it), and q49c was redesigned
# this round (hash-sampled anchor truth replaces the full N^2 tier), so its
# r3 green row no longer adjudicates it; (3) stalest greens: the r2-era
# block (21 queries, shared loaders/_cache/hashing have changed under them
# for 5 rounds), then r3-era (q43/q49, the declared quadratic audits, stay
# last within their class so the budget truncates them preferentially),
# then r4-era. Everything green in r7 (q48, q185, q201-q248) plus the
# r5/r6 blocks falls through to module order. tools/freshness.py gates
# this staging: every oracle-backed query that would exceed age 5 after
# the r8 sweep must sit inside the ~50-query budget prefix.
_PRIORITY = [
    # (2) behavior changed: q190's r7 oracle never driver-adjudicated;
    # q49c redesigned in round 8; q133's split semantics fixed in round 8
    # (val no longer counted as test -- its r5 green row adjudicated the
    # old 2-way collapse)
    "q190_good_turing",
    "q49c_lsh_recall",
    "q133_semantic_decontam",
    # (2 cont.) round-8 exactness upgrades shift the last fixed-point digit
    # class: q221 per-term-quantized chi2, q248 exact-integer-division
    # moments -- their r7 green rows adjudicated the old double formulations
    "q221_benford_audit",
    "q248_anova_sources",
    # (3) stalest greens: latest green row is round 2
    "q22_array_functions",
    "q23_explode_tokens",
    "q26_correlated_subquery",
    "q27_range_frame_window",
    "q35_tfidf_topterms",
    "q36_hash_split",
    "q49b_cosine_neardup_lsh",
    "q59_asof_join",
    "q65_frame_sample",
    "q67_pandas_udf_scalar",
    "q69_regression_stats",
    "q71_repetition_metrics",
    "q72_embed_quantize",
    "q73_stratified_sample",
    "q74_funnel",
    "q75_cohort_retention",
    "q76_heavy_hitters",
    "q77_variant_json",
    "q78_udtf_chunk",
    "q79_resample_ffill",
    "q80_rolling_anomaly",
    # (3 cont.) latest green row is round 3
    "q15_percentiles",
    "q16_window_extras",
    "q17_conditional_aggs",
    "q18_null_handling",
    "q19_string_extras",
    "q24_map_functions",
    "q25_date_extras",
    "q28_unpivot",
    "q30_text_stats",
    "q31_token_count",
    "q32_langid",
    "q33_fingerprint",
    "q34_quality_score",
    "q40_exact_dedup",
    "q41_minhash_signatures",
    "q42_minhash_lsh_dedup",
    "q44_simhash",
    "q45_simhash_neardup",
    "q46_cosine_topk",
    "q47_ann_lsh",
    "q50_binary_metadata",
    "q53_sql_ml_inference",
    "q54_skyline",
    "q55_range_join",
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
    "q43_ngram_jaccard",
    "q49_cosine_neardup",
    # (3 cont.) latest green row is round 4
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
