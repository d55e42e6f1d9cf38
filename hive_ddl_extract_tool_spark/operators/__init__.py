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
# Round 12 instance: (1) empty -- every query has a driver row; (2) empty --
# registry kept flat per the r11 verdict; (3) stalest green FIRST: the full
# remaining r7-era block (45 queries, age 4 -- they would exceed MAX_AGE at
# r13 close; q201/q202/q203 already rode r11's slack slots), ordered by
# MEASURED sf0.01 sweep cost ascending (tools/drive_driver.py per-query
# timings, this round's log) so a wall-clock truncation drops the fewest
# must-refresh entries, with the expensive streaming/scripting tier
# (q220/q238/q243/q217) at the back of the 45. The 5 remaining slots (the
# 50-cap minus 45) are filled with the heaviest r8-era entries
# (q49c/q133/q54/q55/q35 by the same measured timings) to shave r13's
# otherwise-50-query need -- they are age 3, so losing them to truncation
# breaches nothing. Staged prefix measured before commit
# (tools/measure_prefix.py, the r11 discipline): see BASELINE.md
# §Round-12. Total staged: exactly 50 -- the MEASURED driver budget,
# pinned by tests/test_freshness.py since r10. Everything green in r11
# (the r6-era rotation) and the r8/r9/r10 blocks falls through to module
# order.
_PRIORITY = [
    # (3) stalest green: latest green row is round 7 (age 4) -- refresh all
    # 45 now so nothing exceeds MAX_AGE at r13 close. Measured-cheap shapes
    # first, streaming/scripting tier last.
    "q216_parameterized_sql",
    "q241_iter_pandas_udf",
    "q185_pii_scan",
    "q235_decile_calibration",
    "q210_golden_record",
    "q207_activity_streaks",
    "q236_sequence_match",
    "q239_sampling_audit",
    "q211_try_arithmetic",
    "q222_blocking_audit",
    "q48_cosine_topk_pandas",
    "q228_lr_apportionment",
    "q224_seasonal_index",
    "q242_weekly_quantiles",
    "q244_activity_trend",
    "q234_vocab_growth",
    "q206_rolling_p95",
    "q219_cusum_drift",
    "q233_k_anonymity",
    "q237_keyspace_gaps",
    "q230_local_supplier_volume",
    "q214_classifier_gains",
    "q208_association_rules",
    "q209_weighted_median",
    "q225_cms_estimator_audit",
    "q229_fellegi_sunter",
    "q205_partition_pruned_scan",
    "q226_merkle_reconcile",
    "q223_referential_integrity",
    "q213_phrase_search",
    "q240_winsorize_audit",
    "q215_fifo_matching",
    "q204_compaction_roundtrip",
    "q227_fd_audit",
    "q218_sorted_neighborhood",
    "q245_tfidf_simjoin",
    "q212_stream_pit_enrich",
    "q231_kcore_peel",
    "q246_prf_expansion",
    "q232_cramers_v",
    "q220_incremental_equivalence",
    "q247_coverage_select",
    "q238_stream_cms",
    "q243_mmr_rerank",
    "q217_sql_scripting",
    # (3 cont.) heaviest r8-era greens (age 3) promoted into the 5 slack
    # slots to shave r13's otherwise-50-query refresh need down to 45.
    "q49c_lsh_recall",
    "q133_semantic_decontam",
    "q54_skyline",
    "q55_range_join",
    "q35_tfidf_topterms",
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
