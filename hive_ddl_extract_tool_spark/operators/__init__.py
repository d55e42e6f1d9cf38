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
# Round 10 instance: (1) empty -- every query has a driver row; (2) empty --
# no behavior changes this round (registry kept flat per the r9 verdict);
# (3) stalest green FIRST: q119_edit_distance_verify (latest green r4, the
# one query the r9 sweep's 50-query budget missed at staged position 52),
# then the full r5-era block (49 queries, age 4 -- they would exceed MAX_AGE
# at r11 close), relational shapes first and the slower streaming trio
# (q98/q131/q140) last so an early wall-clock truncation drops the queries
# that can still wait one more round. Total staged: exactly 50 -- the
# MEASURED driver budget (r9 staged 52 and lost the tail; never again) --
# with the single must-refresh query at slot 1, never behind a younger
# block. Everything green in r9 (the r3/r4-era rotation) and the r6/r7/r8
# blocks falls through to module order. tools/freshness.py gates this
# staging with its conservative 45-query budget: the 5 tail entries left
# outside that budget are r5 greens that sit at exactly age 5 (== MAX_AGE)
# at r10 close, so the gate stays green even on a 45-query truncation, and
# they lead r11's prefix if the sweep does truncate.
_PRIORITY = [
    # (3) stalest green: latest green row is round 4 (age 5) -- missed the
    # r9 sweep by two slots; MUST refresh this round, hence slot 1
    "q119_edit_distance_verify",
    # (3 cont.) latest green row is round 5 (age 4) -- refresh all 49 now so
    # nothing exceeds MAX_AGE at r11 close. Relational/selection shapes
    # first (cheap, high-signal), streaming last.
    "q134_volume_shipping",
    "q135_market_share",
    "q139_cheapest_supplier",
    "q143_waiting_suppliers",
    "q148_top_supplier",
    "q149_important_parts",
    "q150_shipping_priority",
    "q151_small_qty_revenue",
    "q152_predicate_bands",
    "q110_malformed_quarantine",
    "q138_cogroup_reconcile",
    "q147_sql_udf_chunks",
    "q83_dedup_purge",
    "q106_minhash_estimator_error",
    "q120_window_dedup",
    "q124_dupgraph_pagerank",
    "q128_incremental_dedup",
    "q130_canonical_election",
    "q137_hybrid_dedup_audit",
    "q141_khop_neighborhood",
    "q146_source_embedding_drift",
    "q144_dup_ngram_chars",
    "q90_sequence_packing",
    "q91_vocab_coverage",
    "q85_inverted_index",
    "q92_bigram_lm_score",
    "q121_rrf_fusion",
    "q95_curation_report",
    "q112_training_manifest",
    "q145_decontam_dashboard",
    "q100_gopher_rules",
    "q101_source_mixing",
    "q102_token_budget_select",
    "q104_ngram_decontam",
    "q105_length_buckets",
    "q122_dsir_weights",
    "q123_quality_classifier",
    "q125_source_divergence",
    "q126_dsir_resample",
    "q132_doremi_mixture",
    "q142_gate_agreement",
    "q88_sessionize",
    "q127_event_transitions",
    "q129_point_in_time_join",
    "q136_interarrival_histogram",
    "q116_skew_report",
    "q98_stream_sessionize",
    "q131_stream_dedup_gate",
    "q140_stream_outer_join",
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
