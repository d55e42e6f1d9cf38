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
# Round 13 instance: (1) empty -- every query has a driver row; (2) empty --
# registry kept flat per the r12 verdict; (3) stalest green FIRST: the full
# remaining r8-era block (45 queries, age 4 -- they would exceed MAX_AGE at
# r14 close; q49c/q133/q54/q55/q35 already rode r12's slack slots), ordered
# by MEASURED sf0.01 sweep cost ascending (tools/drive_driver.py per-query
# timings, this round's 247/247 FAILS: 0 log) so a wall-clock truncation
# drops the fewest must-refresh entries. The LSH/dedup tier (q40/q41/q42/
# q44/q45/q49b) is in this cohort; its staged pipelines are shared via
# cached_df, so whichever of them runs first pays the staging cost once.
# The 5 remaining slots (the 50-cap minus 45) are filled with the heaviest
# r9-era entries (q103/q107/q117/q66/q114 by the same measured timings) to
# shave r14's otherwise-50-query need -- they are age 3, so losing them to
# truncation breaches nothing. Staged prefix measured before commit
# (tools/measure_prefix.py, the r11 discipline): see BASELINE.md
# §Round-13. Total staged: exactly 50 -- the MEASURED driver budget,
# pinned by tests/test_freshness.py since r10. Everything green in r12
# (the r7-era rotation) and the r9/r10/r11 blocks falls through to module
# order.
_PRIORITY = [
    # (3) stalest green: latest green row is round 8 (age 4) -- refresh all
    # 45 now so nothing exceeds MAX_AGE at r14 close. Measured-cheap shapes
    # first.
    "q42_minhash_lsh_dedup",
    "q31_token_count",
    "q33_fingerprint",
    "q50_binary_metadata",
    "q22_array_functions",
    "q40_exact_dedup",
    "q30_text_stats",
    "q36_hash_split",
    "q73_stratified_sample",
    "q53_sql_ml_inference",
    "q23_explode_tokens",
    "q26_correlated_subquery",
    "q28_unpivot",
    "q15_percentiles",
    "q27_range_frame_window",
    "q19_string_extras",
    "q25_date_extras",
    "q67_pandas_udf_scalar",
    "q78_udtf_chunk",
    "q72_embed_quantize",
    "q32_langid",
    "q76_heavy_hitters",
    "q65_frame_sample",
    "q59_asof_join",
    "q248_anova_sources",
    "q17_conditional_aggs",
    "q24_map_functions",
    "q47_ann_lsh",
    "q34_quality_score",
    "q74_funnel",
    "q75_cohort_retention",
    "q18_null_handling",
    "q69_regression_stats",
    "q77_variant_json",
    "q41_minhash_signatures",
    "q44_simhash",
    "q49b_cosine_neardup_lsh",
    "q80_rolling_anomaly",
    "q16_window_extras",
    "q45_simhash_neardup",
    "q46_cosine_topk",
    "q71_repetition_metrics",
    "q79_resample_ffill",
    "q190_good_turing",
    "q221_benford_audit",
    # (3 cont.) heaviest r9-era greens (age 3) promoted into the 5 slack
    # slots to shave r14's otherwise-50-query refresh need down to 45.
    "q103_semdedup",
    "q107_stream_interval_join",
    "q117_pca_power_iteration",
    "q66_ivf_ann",
    "q114_arrow_batch_stats",
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
