#!/usr/bin/env python
"""Regenerate PLANS.md: executed physical plans of representative queries
at sf0.01. Run: python tools/gen_plans.py"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")

QUERIES = [
    "pricing_summary",
    "pattern_mining",
    "volume_zscore",
    "user_sessions",
    "dedup_minhash_lsh",
    "embedding_near_dup_lsh",
    "asof_signup_before_error",
    "part_value_share",
    "brand_priciest_part",
    "grouping_sets_volume",
    "decontaminate_report",
    "cheapest_supplier_per_part",
    "single_failed_supplier_orders",
    "pack_sequences",
    "domain_mix_sample",
    "dedup_paragraphs",
    "c4_line_stats",
    "ann_pq",
    "doc_length_quartiles",
    "duplicate_spans",
    "merge_events_upsert",
    "contamination_overlap",
    "dedup_keep_table",
    "weighted_sample_docs",
    "shard_assignment",
    "pii_scan",
    "dedup_substrings",
    "quality_feature_matrix",
    "leakage_safe_split",
    "snapshot_diff",
    "perplexity_buckets",
    "embedding_pca",
    "embedding_int8_report",
    "funnel_stages",
    "robust_anomaly_stats",
    "dataset_card",
    "scd2_user_state",
    "events_in_windows_bucketed",
    "sample_k_per_source",
    "profile_events",
    "vocab_growth_report",
    "heavy_hitter_words",
    "temperature_mix_plan",
    "jpeg_pixel_stats",
    "mp4_frame_index",
    "subword_token_counts",
    # round-4 second continuation session
    "bm25_search",
    "hybrid_search_rrf",
    "chunk_documents",
    "fuzzy_customer_pairs",
    "image_dhash",
    "hourly_resample_ffill",
    "zorder_bucket_stats",
    "rolling_median_value",
    "activity_islands",
    "mean_shift_scores",
    "dsir_weights",
    "kn_trigram_logprob",
    "rag_chunk_search",
    "join_overlap_theta",
    # round 5
    "curate_corpus",
    "curation_funnel",
    "repetition_scores",
    "perplexity_buckets_exact",
    "json_shred_profile",
    "count_window_stream_twin",
    "decayed_volume_stream_twin",
    "ann_hnsw",
    "ann_ivf_hnsw",
    "matview_refresh_twin",
    "windowed_volume_stream_twin",
    "session_volume_stream_twin",
    "drift_report",
    "constraint_report",
    "audio_dominant_tone",
    "image_histogram_stats",
    "kn_trigram_pruned",
    # round 6 (batch-shaped entries; the stream twins and
    # drift_window_twin serve from capture/view reads, so their final
    # frames carry no plan worth pinning here)
    "cm_user_counts",
    "session_gap_sweep",
    "dsir_gumbel_sample",
    "skew_report",
    "tokenizer_fertility",
    "bloom_point_lookup",
    "cohort_retention",
    "event_transitions",
    "volume_trend",
    "cusum_changepoints",
    "ohlc_bars",
    "token_pmi",
    "funnel_conversion",
    "rolling_distinct_users",
    # r7 registrations (stream twins excluded — capture reads; gif runs
    # a payload lane whose plan pin lives in tests/test_plans.py)
    "maxsim_search",
    "maxsim_search_routed",
    "seasonal_volume_decompose",
    "mad_anomaly",
    "resample_daily_volume",
    "dup_shingle_profile",
    "dictionary_match_counts",
    "textrank_keywords",
    "token_communities",
    "vocab_divergence",
    "zipf_fit",
    "compression_quality",
    "hll_rolling_distinct",
    # r8 additions
    "dedup_containment",
    "html_text_extract",
    "url_parse",
    "url_domain_report",
    "normalize_text",
    "curate_web_corpus",
    "bloom_semi_join",
    "holt_winters_daily",
    "association_rules",
    "kwic_snippets",
    "readability_scores",
    "token_entropy",
    "word_triangles",
    "bucketed_join_twin",
    "mmr_rerank",
    # r9 session builds
    "purchase_attribution",
    "novelty_scores",
    "equidepth_bins",
    "dhash_near_dup_report",
    "event_path_trigrams",
    "ewma_control_chart",
    "hard_negative_mining",
    "word_kcore",
    "record_linkage_fs",
    # r10 registrations (ewma_volume_stream_twin excluded — eager
    # stream-at-build family, its state contract is pinned in
    # tests/test_ewma_stream.py)
    "rm3_expanded_search",
    "forecast_backtest_report",
    "lsh_quality_report",
    "rfm_segments",
    "profile_diff_report",
    # r11 registrations (manifest_timetravel_twin excluded — commits at
    # fn() build time, the txlog-twin family; its version isolation is
    # pinned in tests/test_manifest_diff.py)
    "char_window_dup_profile",
    "shard_manifest_diff",
    "proximity_rerank",
    "retrieval_eval_report",
    "jaccard_threshold_sweep",
    "benford_deviation_report",
    # r12 registrations (bm25_incremental_twin excluded — commits txlog
    # tables at fn() build time, the txlog-twin family; its plan
    # discipline is pinned in tests/test_bm25_incremental.py)
    "doremi_domain_weights",
    "shared_affix_profile",
    "lcp_neighbor_profile",
    "rho1_token_selection",
    "source_coverage_report",
    "merkle_integrity_diff",
    # r13 registrations: ALL seven are excluded by the standing family
    # rules — bm25_delete_twin / bm25_compaction_twin /
    # lsh_incremental_twin / char_window_incremental_twin /
    # merkle_tree_update commit txlog tables at fn() build time (the
    # txlog-twin family), and greedy_coverage_order / doremi_iterated
    # are driver multiplicative/greedy loops whose returned frame is a
    # LocalTableScan (their distributed build plans are pinned by their
    # rehearsal tests and scaling exponents instead). Note
    # lcp_neighbor_profile (r12 entry above) now renders its RANGE-mode
    # plan after the r13 skew fix.
]

HEADER = """# PLANS — executed physical plans of representative queries

Regenerated by `python tools/gen_plans.py` (formatted_plan at sf0.01).
What to look for: `PushedFilters` on every scan, narrow `ReadSchema`,
`BroadcastHashJoin` for dim/agg sides, partial+final `HashAggregate`
pairs, no `CartesianProduct` anywhere.
"""


def main() -> None:
    from logstream_processing_service_spark.catalog import all_specs
    from logstream_processing_service_spark.plans.inspect import formatted_plan
    from logstream_processing_service_spark.session import get_spark

    spark = get_spark(app_name="gen-plans")
    spark.sparkContext.setLogLevel("ERROR")
    specs = {s.name: s for s in all_specs()}
    parts = [HEADER]
    for name in QUERIES:
        df = specs[name].fn(spark, SF_DIR)
        parts.append(f"\n## {name}\n\n```\n{formatted_plan(df).rstrip()}\n```\n")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(out, "w") as f:
        f.write("".join(parts))
    print(f"wrote {out} ({len(QUERIES)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
