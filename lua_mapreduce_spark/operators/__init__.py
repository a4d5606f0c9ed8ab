"""Operator registry.

``QUERIES``: name -> (spark, sf_dir) -> DataFrame — every implemented
operator from SURVEY.md §2 / §2.4, one entry each.
``ORACLES``: name -> ANSI SQL for DuckDB over the same parquet tables.
Queries without an oracle entry are non-SQL-expressible (driver records a
rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lua_mapreduce_spark.operators import (
    analytics,
    analytics2,
    curation,
    dedup,
    events,
    hygiene,
    mapreduce_layer,
    multimodal,
    pipeline,
    pq,
    relational,
    relational2,
    relational3,
    relational4,
    scale_ops,
    scale_ops2,
    similarity,
    streaming_ops,
    text,
    windows,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

_MODULES = [
    relational,
    relational2,
    relational3,
    relational4,
    windows,
    text,
    events,
    dedup,
    similarity,
    multimodal,
    mapreduce_layer,
    streaming_ops,
    pipeline,
    curation,
    scale_ops,
    scale_ops2,
    hygiene,
    analytics,
    analytics2,
    pq,
]

# The grading driver hard-verifies the FIRST 50 registry entries in
# insertion order; the rest get repo-local parity checks only.
#
# PERMANENT RULE: `mr_wordcount` and `text_wordcount` stay in EVERY
# window — word count is the reference's one golden workload
# (example/word-count-taskfile.lua:73-159), the non-negotiable
# reference-fidelity signal each round.
#
# Rotation rule: pins first, then every query ADDED or CHANGED this round,
# then the stalest once-verified queries. Full per-round yield history
# lives in SURVEY.md §2.6 (rotation log).
#
# Round-7 window: the two pins; the four early-r7-changed queries
# (dedup_embedding_cosine — now LSH-gated, new banded oracle;
# dedup_embedding_lsh — shared-pipeline refactor;
# streaming_time_travel_snapshot — exact-commit-count guard;
# sim_pq_adc_topk — codebook cache re-keyed); the THIRTY-ONE queries that
# yielded slots in r5/r6 and are still once-verified (the full
# twice-verified sweep, VERDICT r6 item 1); the ELEVEN r7-new queries
# (scale_ops2 + analytics2 + events waves); and the graph pair whose
# shared edge build changed in r7 (per-order fan-out cap). One late-r7
# plan-only change (dedup_jaccard_prefix_join df-window rewrite,
# result-identical at both SFs) found no free slot — r8 owes it a
# re-confirmation (SURVEY §2.6 rotation log). Exactly 50; the
# import-time check keeps it honest.
_DRIVER_WINDOW = [
    "mr_wordcount",
    "text_wordcount",
    # changed in r7
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    "streaming_time_travel_snapshot",
    "sim_pq_adc_topk",
    # the 31 stale once-verified queries (twice-verified sweep)
    "curation_shuffle_shards",
    "window_range_frame",
    "sample_deterministic_hash",
    "scalar_conditional_funcs",
    "scalar_array_map_funcs",
    "scalar_higher_order_funcs",
    "scalar_map_higher_order",
    "scalar_date_arithmetic",
    "scalar_functions_showcase",
    "scalar_math_funcs",
    "scalar_regex_funcs",
    "scalar_string_advanced",
    "scalar_timestamp_diff",
    "setop_union_intersect_except",
    "sort_topk_orders",
    "subquery_above_nation_avg",
    "unpivot_rates",
    "window_distribution_funcs",
    "upsert_snapshot_merge",
    "text_term_frequency",
    "text_fingerprint",
    "text_rolling_fingerprint",
    "text_doc_stats",
    "text_token_count_bpe",
    "text_langid",
    "text_quality_score",
    "text_repetition_filter",
    "multimodal_resize_thumbnail",
    "curation_pack_sequences",
    "curation_sample_mixture",
    "agg_heavy_hitters_sketch",
    # r7-new queries (scale_ops2 wave), then the graph pair (r7-changed:
    # capped co-purchase edge build), then provisional r6 re-checks that
    # further r7-new queries displace
    "agg_bitmap_intersect",
    "range_join_binned",
    "agg_vector_centroids",
    "curation_length_buckets",
    "graph_label_propagation",
    "events_market_basket",
    "text_count_of_counts",
    "text_postings_delta",
    "diag_key_skew_profile",
    "events_seasonal_decompose",
    "events_path_analysis",
    "graph_kcore_peel",
    "graph_triangle_count",
]

if len(_DRIVER_WINDOW) != 50:  # not `assert`: must survive `python -O`
    raise RuntimeError(f"driver window must be exactly 50, got {len(_DRIVER_WINDOW)}")

_ALL: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

for _mod in _MODULES:
    for _name, _fn in _mod.QUERIES.items():
        if _name in _ALL:
            raise RuntimeError(f"duplicate query name: {_name}")
        _ALL[_name] = _fn
    ORACLES.update(_mod.ORACLES)

QUERIES: dict[str, QueryFn] = {}
for _name in _DRIVER_WINDOW:
    QUERIES[_name] = _ALL.pop(_name)  # KeyError = window names a missing query
QUERIES.update(_ALL)
