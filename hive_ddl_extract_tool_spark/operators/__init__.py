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
# Round 15 instance: (1) empty -- every query has a driver row; (2) empty --
# registry kept flat per the r14 verdict; (3) stalest green FIRST: the full
# remaining r10-era block (45 queries, age 4 -- they would exceed MAX_AGE at
# r16 close; q140/q106/q130/q138/q131 already rode r14's slack slots),
# ordered by MEASURED sf0.01 sweep cost ascending (tools/drive_driver.py
# per-query timings from the r14 closing 247/247 FAILS: 0 drive -- operator
# code unchanged since) with the streaming-harness tier last -- its
# finite-replay micro-batches are the cohort's cost outliers, so a
# wall-clock truncation drops replay shapes before any cheap relational
# refresh. The 5 remaining slots (the 50-cap minus 45) are filled with the
# heaviest r11-era entries by the same measured timings
# (q169/q158/q180/q182/q202) to shave r16's otherwise-50-query refresh
# need down to 45 -- they are age 3, so losing them to truncation breaches
# nothing. Staged prefix measured before commit (tools/measure_prefix.py,
# the r11 discipline): see BASELINE.md §Round-15. Total staged: exactly
# 50 -- the MEASURED driver budget, pinned by tests/test_freshness.py
# since r10. Everything green in r14 (the r9-era rotation) and the
# r11/r12/r13 blocks falls through to module order.
_PRIORITY = [
    # (3) stalest green: latest green row is round 10 (age 4) -- refresh all
    # 45 now so nothing exceeds MAX_AGE at r16 close. Measured-cheap shapes
    # first.
    "q119_edit_distance_verify",
    "q142_gate_agreement",
    "q148_top_supplier",
    "q149_important_parts",
    "q147_sql_udf_chunks",
    "q83_dedup_purge",
    "q85_inverted_index",
    "q105_length_buckets",
    "q110_malformed_quarantine",
    "q90_sequence_packing",
    "q88_sessionize",
    "q127_event_transitions",
    "q139_cheapest_supplier",
    "q150_shipping_priority",
    "q151_small_qty_revenue",
    "q152_predicate_bands",
    "q128_incremental_dedup",
    "q144_dup_ngram_chars",
    "q91_vocab_coverage",
    "q101_source_mixing",
    "q136_interarrival_histogram",
    "q116_skew_report",
    "q124_dupgraph_pagerank",
    "q137_hybrid_dedup_audit",
    "q95_curation_report",
    "q112_training_manifest",
    "q125_source_divergence",
    "q126_dsir_resample",
    "q129_point_in_time_join",
    "q143_waiting_suppliers",
    "q123_quality_classifier",
    "q120_window_dedup",
    "q122_dsir_weights",
    "q132_doremi_mixture",
    "q134_volume_shipping",
    "q135_market_share",
    "q104_ngram_decontam",
    "q141_khop_neighborhood",
    "q121_rrf_fusion",
    "q92_bigram_lm_score",
    "q146_source_embedding_drift",
    "q145_decontam_dashboard",
    "q102_token_budget_select",
    "q100_gopher_rules",
    # (3 cont.) the streaming-harness tier: the cohort's cost outlier,
    # staged last so truncation drops the replay shape, not cheap refreshes.
    "q98_stream_sessionize",
    # (3 cont.) heaviest r11-era greens (age 3) promoted into the 5 slack
    # slots to shave r16's otherwise-50-query refresh need down to 45.
    "q169_python_datasource",
    "q158_pq_distortion",
    "q180_stream_update_mode",
    "q182_stream_session_window",
    "q202_prefix_filter_join",
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

    # A typo in the rotation must fail fast, not silently demote a
    # must-refresh query to module order (the freshness gate would only
    # catch that indirectly, a round later, when the age math trips).
    unknown = set(_PRIORITY) - merged.keys()
    if unknown:
        raise ValueError(f"_PRIORITY names not in registry: {sorted(unknown)}")

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
