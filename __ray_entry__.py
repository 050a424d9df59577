"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship extraction pipeline on the t1 synthetic
corpus; ``queries()`` exposes every implemented operator/pipeline from
SURVEY.md §2 plus the training-data-pipeline additions; ``oracle_sql()``
gives the DuckDB-equivalent SQL for every SQL-expressible query (identical
column names; float outputs as fixed-point integers via the shared
``floor(x*10^k + 0.5)`` formula so value hashes match bit-for-bit).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any


# --------------------------------------------------------------------------
# Corpus tiers: the extraction pipeline runs on the FIXTURES.md synthetic
# interleaved corpus (the BASELINE.json input_hint shape), synthesized
# deterministically per scale tier and cached under /tmp. Definitions are
# shared with the oracle catalog via tableextraction_ray.corpus_tiers.
# --------------------------------------------------------------------------

from tableextraction_ray.corpus_tiers import (  # noqa: E402
    CANARIES as _CANARIES,
    ORACLE_CORPUS_DIR as _ORACLE_CORPUS_DIR,
    SF_TO_TIER as _SF_TO_TIER,
    corpus_for as _corpus_for,
)

#: Fixed BM25 query set (terms from the synthetic documents vocabulary);
#: the oracle's VALUES list mirrors these exactly — keep in sync.
BM25_QUERIES = ["hash join merge", "window stream batch", "filter sort key"]


def entry() -> Any:
    """Flagship pipeline on the t1 corpus (driver checks rows >= 0)."""
    from tableextraction_ray.pipelines.extract import build_extraction_pipeline
    from tableextraction_ray.stages import explode_result_spans

    corpus = _corpus_for("/root/testdata/sf0.001")
    result = build_extraction_pipeline(corpus)
    return result.map_batches(explode_result_spans, batch_format="pyarrow")


def _read(sf_dir: str, table: str, columns: list[str] | None = None):
    import ray.data

    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), columns=columns
    )


def _events_half(sf_dir: str, before: bool):
    """(user_id, ts) events strictly before / at-or-after the fixed
    mid-corpus cutoff 2024-01-16 — the deterministic old/new split the
    incremental-session query replays (events span 2024-01-01..30 at
    every sf). Vectorized per-block Arrow filter; no shuffle."""
    import datetime

    import pyarrow as pa
    import pyarrow.compute as pc

    cut = pa.scalar(
        datetime.datetime(2024, 1, 16), type=pa.timestamp("us")
    )

    def keep(batch: pa.Table) -> pa.Table:
        mask = (
            pc.less(batch["ts"], cut)
            if before
            else pc.greater_equal(batch["ts"], cut)
        )
        return batch.filter(mask)

    return _read(sf_dir, "events", ["user_id", "ts"]).map_batches(
        keep, batch_format="pyarrow"
    )


def _parquet_count(sf_dir: str, table: str) -> int:
    """Row count from parquet footer metadata — zero data bytes read."""
    import pyarrow.dataset as pads

    return pads.dataset(os.path.join(sf_dir, f"{table}.parquet")).count_rows()


def _read_embeddings_head_labeled(sf_dir: str, m: int):
    """Row-filtered (vec_id, embedding, label) head read — the
    hard-negative query set with labels, predicate pushed down."""
    import pyarrow.compute as pc
    import ray.data

    return ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding", "label"],
        filter=(pc.field("vec_id") < m),
    )


def _read_embeddings_head(sf_dir: str, m: int):
    """Row-filtered embeddings read (vec_id < m pushed into the parquet
    scan) for fetching tiny query/centroid sets without a full table pass."""
    import pyarrow.compute as pc
    import ray.data

    return ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filter=(pc.field("vec_id") < m),
    )


# Query names added in round 4 — kept for the rotation bookkeeping below.

# The five extraction gates are PINNED at the head of the driver's
# ~50-query correctness window every round (round-4 verdict #1): the
# flagship pipeline must always appear in the independent record.
_EXTRACT_GATES: tuple[str, ...] = (
    "extract_spans", "extract_serialized", "extract_filtered",
    "extract_verify", "extract_verify_dualdpi",
)

# Queries with a green driver-side CORRECTNESS row (r01-r04 union:
# hash-match, or rows-recorded for the no_oracle contracts). queries()
# rotates everything NOT in this set to the front of the window so the
# independent record catches up ~45 names per round; append each round's
# newly green names here after the driver publishes CORRECTNESS_r{N}.json.
# (dehyphenate's r04 row was rows-only; it now has an oracle and is left
# out so its first hash-green row lands this round.)
_DRIVER_CHECKED: frozenset[str] = frozenset({
    "audio_features", "bm25_topk", "boilerplate_lines",
    "canonical_docs", "cdc_merge", "char_budget_prefix", "char_entropy",
    "chunk_documents", "cms_heavy_hitters",
    "containment_pairs", "conversion_funnel", "curate_corpus",
    "curate_semantic", "decayed_user_score", "decontaminate",
    "dedup_clusters", "dedup_exact", "dedup_incremental",
    "dedup_incremental_fuzzy", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "dedup_savings", "dedup_simhash",
    "dedup_simhash_pairs", "dedup_spans", "digitize_plots",
    "distinct_sources", "dsir_weights", "embedding_covariance",
    "embedding_near_dup", "embedding_near_dup_lsh", "epoch_shuffle",
    "events_hourly", "events_hourly_percentiles",
    "events_hourly_quantiles_sketch", "events_hourly_users",
    "events_hourly_users_hll", "events_profile",
    "events_profile_approx", "events_sliding_window",
    "extract_main_content", "fingerprint", "gopher_filter",
    "hybrid_rrf", "interleave_render", "knn_cosine", "knn_ivf",
    "knn_pq", "knn_pq_rerank", "label_centroid_stats",
    "label_exemplars", "lang_id", "lang_stats", "lm_perplexity",
    "mad_outliers", "media_captions", "media_content_dedup",
    "media_dims", "media_stats", "media_thumb_dims", "media_thumbnails",
    "median_value_by_type", "mg_heavy_tokens", "minhash_jaccard_est",
    "mixture_sample", "normalize_text", "order_cube",
    "order_priority_count", "orders_by_segment", "orders_for_segment",
    "outlier_events", "pack_sequences", "pack_token_blocks",
    "partition_checksums", "pmi_collocations", "pricing_summary",
    "props_key_stats", "purchase_asof_join",
    "purchase_click_attribution", "quality_histogram",
    "quality_ntile_by_source", "quality_percentile", "quality_score",
    "rare_bigram_rate", "redact_text", "repetition_stats",
    "retention_cohorts", "revenue_by_nation", "robust_scale_events",
    "semantic_dedup", "session_path_topk", "sessionize",
    "setjoin_jaccard", "source_cap", "source_quality_report",
    "source_top_tokens", "source_vocab_overlap",
    "span_kind_transitions", "span_stats", "split_assign",
    "stratified_sample", "strip_html", "tfidf_top_terms", "token_freq",
    "token_regex_stats", "token_stats", "tokenize_ids",
    "tokenizer_fertility", "top_docs_by_chars", "truncation_dups",
    "value_psi", "video_frames", "weighted_jaccard_pairs",
    "weighted_sample", "winnow_fingerprints", "winnow_overlap",
})

_R4_QUERIES: list[str] = [
    "cdc_merge",
    "median_value_by_type",
    "order_cube",
    "partition_checksums",
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
    "events_profile_approx",
    "span_stats",
    "media_captions",
    "interleave_render",
    "media_content_dedup",
    "retention_cohorts",
    "hybrid_rrf",
    "lm_perplexity",
    "span_integrity",
    "interleave_pack",
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
    "typo_token_pairs",
    "value_quantiles_selection",
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
    "range_partition_plan",
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
]


def queries() -> dict[str, Callable[[str], Any]]:
    from tableextraction_ray.functions import (
        curate,
        sketch,
        dedup,
        interleaved,
        multimodal,
        plots,
        relational,
        retrieval,
        selection,
        similarity,
        textstats,
    )
    from tableextraction_ray.pipelines.extract import build_extraction_pipeline
    from tableextraction_ray.stages import explode_result_spans

    def extract_spans(sf_dir: str):
        corpus = _corpus_for(sf_dir)
        return build_extraction_pipeline(corpus).map_batches(
            explode_result_spans, batch_format="pyarrow"
        )

    def media(sf_dir: str):
        from tableextraction_ray.sources import read_media

        return read_media(_corpus_for(sf_dir))

    def _spans(sf_dir: str):
        from tableextraction_ray.sources import read_documents

        return read_documents(_corpus_for(sf_dir))

    def _typo_docs(sf_dir: str):
        """Deterministic typo injection so typo_token_pairs is
        non-vacuous on the 31-token synthetic vocabulary (mirrored in
        the oracle CTE): docs with doc_id % 7 == 0 get a copy of their
        FIRST token with its first character replaced by 'x' prepended
        to the text — a single-substitution neighbor of a real vocab
        token."""
        import re

        import pyarrow as pa

        tok_re = re.compile(r"[^ \t\n\r\v\f]+")

        def mangle(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_pylist()
            texts = batch["text"].to_pylist()
            out = []
            for did, text in zip(ids, texts):
                m = tok_re.search(text or "")
                if did % 7 == 0 and m and len(m.group(0)) > 1:
                    out.append("x" + m.group(0)[1:] + " " + text)
                else:
                    out.append(text)
            return pa.Table.from_pydict(
                {
                    "doc_id": batch["doc_id"],
                    "text": pa.array(out, type=pa.string()),
                }
            )

        return docs(sf_dir, ["doc_id", "text"]).map_batches(
            mangle, batch_format="pyarrow"
        )

    def _corrupt_spans(sf_dir: str):
        """Deterministic span corruption so span_integrity's violation
        columns are non-vacuous (mirrored in the oracle CTE): docs with
        numeric suffix i%6==0 get their LAST span's offset overwritten
        with the FIRST span's offset (duplicate offset); docs i%4==0
        with >2 spans then lose their 0-based index-2 span (offset gap)."""
        import pyarrow as pa

        from tableextraction_ray.sources.corpus import _span_type

        def corrupt(batch: pa.Table) -> pa.Table:
            out = []
            for did, sp in zip(
                batch["doc_id"].to_pylist(), batch["spans"].to_pylist()
            ):
                i = int(did.rsplit("-", 1)[1])
                sp = [dict(s) for s in sp]
                if i % 6 == 0 and len(sp) >= 2:
                    sp[-1]["offset"] = sp[0]["offset"]
                if i % 4 == 0 and len(sp) > 2:
                    sp = sp[:2] + sp[3:]
                out.append(sp)
            return pa.Table.from_pydict(
                {
                    "doc_id": batch["doc_id"],
                    "spans": pa.array(out, type=_span_type()),
                }
            )

        return _spans(sf_dir).map_batches(corrupt, batch_format="pyarrow")

    def _mangled_spans(sf_dir: str):
        """Deterministic ref mangling so media_orphan_audit's violation
        rows are non-vacuous (mirrored in the oracle CTE): docs with
        numeric suffix i%5==0 get their lowest-offset media span's ref
        suffixed '#stale' — a dangling ref; any store file whose every
        referencing span was mangled becomes an orphan."""
        import pyarrow as pa

        from tableextraction_ray.sources.corpus import _span_type

        def mangle(batch: pa.Table) -> pa.Table:
            out = []
            for did, sp in zip(
                batch["doc_id"].to_pylist(), batch["spans"].to_pylist()
            ):
                i = int(did.rsplit("-", 1)[1])
                sp = [dict(s) for s in sp]
                if i % 5 == 0:
                    media_idx = [
                        j for j, s in enumerate(sp) if s["kind"] == "media"
                    ]
                    if media_idx:
                        j = min(media_idx, key=lambda j: sp[j]["offset"])
                        sp[j]["media_ref"] = sp[j]["media_ref"] + "#stale"
                out.append(sp)
            return pa.Table.from_pydict(
                {
                    "doc_id": batch["doc_id"],
                    "spans": pa.array(out, type=_span_type()),
                }
            )

        return _spans(sf_dir).map_batches(mangle, batch_format="pyarrow")

    def _boiler_spans(sf_dir: str):
        """Deterministic span-level boilerplate injection (the corpus's
        spans are unique, so the cross-doc span-dedup demo needs shared
        spans; mirrored in the oracle CTE): docs i%5==0 get a shared nav
        span appended, i%3==0 a shared copyright span, and docs 1/7/13 a
        'Rare note' span that stays BELOW the drop threshold (kept)."""
        import pyarrow as pa

        from tableextraction_ray.sources.corpus import _span_type

        def inject(batch: pa.Table) -> pa.Table:
            out = []
            for did, sp in zip(
                batch["doc_id"].to_pylist(), batch["spans"].to_pylist()
            ):
                i = int(did.rsplit("-", 1)[1])
                sp = list(sp)
                n = len(sp)
                extra = []
                if i % 5 == 0:
                    extra.append("Home | About | Contact")
                if i % 3 == 0:
                    extra.append("Copyright 2026 Example Corp")
                if i in (1, 7, 13):
                    extra.append("Rare note")
                for j, t in enumerate(extra):
                    sp.append(
                        {
                            "kind": "text",
                            "text": t,
                            "media_ref": "",
                            "offset": n + j,
                        }
                    )
                out.append(sp)
            return pa.Table.from_pydict(
                {
                    "doc_id": batch["doc_id"],
                    "spans": pa.array(out, type=_span_type()),
                }
            )

        return _spans(sf_dir).map_batches(inject, batch_format="pyarrow")

    def docs(sf_dir, cols):
        import ray.data

        return ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=cols
        )

    def _html_docs(sf_dir):
        """Wrap each doc in a deterministic page skeleton (nav + article
        paragraph + footer) so the DOM-heuristic extractor has real link
        boilerplate to classify (mirrored in the oracle CTE)."""
        import pyarrow as pa

        def wrap(batch: pa.Table) -> pa.Table:
            out = [
                '<div class="nav"><a href="/">Home</a> '
                '<a href="/about">About us</a></div><p>' + t + "</p>"
                '<div class="footer"><a href="/tos">Terms of Service</a> '
                '<a href="/priv">Privacy</a></div>'
                for t in batch["text"].to_pylist()
            ]
            return pa.Table.from_pydict(
                {"doc_id": batch["doc_id"], "text": pa.array(out, type=pa.string())}
            )

        return docs(sf_dir, ["doc_id", "text"]).map_batches(
            wrap, batch_format="pyarrow"
        )

    def _boiler_docs(sf_dir):
        """The synthetic corpus has fully unique text, so the cross-doc
        line-dedup demo injects deterministic boilerplate: every 5th doc
        gets a shared nav header, every 3rd a shared copyright footer
        (mirrored in the oracle CTE)."""
        import pyarrow as pa

        def inject(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_pylist()
            texts = batch["text"].to_pylist()
            out = []
            for i, t in zip(ids, texts):
                if i % 5 == 0:
                    t = "Home | About | Contact\n" + t
                if i % 3 == 0:
                    t = t + "\nCopyright 2026 Example Corp"
                out.append(t)
            return pa.Table.from_pydict(
                {"doc_id": batch["doc_id"], "text": pa.array(out, type=pa.string())}
            )

        return docs(sf_dir, ["doc_id", "text"]).map_batches(
            inject, batch_format="pyarrow"
        )

    def _parity_docs(sf_dir, parity):
        import pyarrow as pa

        def keep(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.filter(
                pc.equal(pc.bit_wise_and(batch["doc_id"], 1), parity)
            )

        return docs(sf_dir, ["doc_id", "text"]).map_batches(
            keep, batch_format="pyarrow"
        )

    def _v2_docs(sf_dir):
        """Deterministic 'next snapshot' of the documents table for the
        corpus_diff demo (mirrored in the oracle's v2 CTE): docs with
        doc_id % 11 == 3 are dropped (-> 'removed'), doc_id % 7 == 0 get
        ' [rev2]' appended (-> 'changed'), and docs with doc_id % 13 == 1
        reappear as brand-new ids (+1e9, ' (new)' suffix -> 'added')."""
        import pyarrow as pa

        def evolve(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_pylist()
            txt = batch["text"].to_pylist()
            out_id, out_tx = [], []
            for i, t in zip(ids, txt):
                if i % 11 != 3:
                    out_id.append(i)
                    out_tx.append(t + " [rev2]" if i % 7 == 0 else t)
                if i % 13 == 1:
                    out_id.append(i + 1_000_000_000)
                    out_tx.append(t + " (new)")
            return pa.Table.from_pydict(
                {
                    "doc_id": pa.array(out_id, type=pa.int64()),
                    "text": pa.array(out_tx, type=pa.string()),
                }
            )

        return docs(sf_dir, ["doc_id", "text"]).map_batches(
            evolve, batch_format="pyarrow"
        )

    def extract_serialized(sf_dir: str):
        from tableextraction_ray.pipelines.extract import build_serialization_pipeline

        return build_serialization_pipeline(_corpus_for(sf_dir))

    def extract_filtered(sf_dir: str):
        from tableextraction_ray.pipelines.extract import ExtractConfig

        corpus = _corpus_for(sf_dir)
        return build_extraction_pipeline(
            corpus, config=ExtractConfig(classify_filter=True)
        ).map_batches(explode_result_spans, batch_format="pyarrow")

    def extract_verify(sf_dir: str):
        # Mismatching docs ONLY: the expected row count is 0, so the
        # driver's rows-only check is itself the golden-equality assertion.
        from tableextraction_ray.pipelines.verify import verify_against_golden

        return verify_against_golden(_corpus_for(sf_dir), mismatches_only=True)

    def extract_verify_dualdpi(sf_dir: str):
        # Two-DPI production flow (reference extractor.py:24-33): detect on
        # the cheap raster, OCR the sharp one. Fixed small tier (the dual-
        # DPI corpus stores k^2 x the pixels); rows=0 IS the golden gate.
        from tableextraction_ray.datagen import generate_corpus
        from tableextraction_ray.pipelines.verify import verify_against_golden

        corpus = generate_corpus("/tmp/graft_corpus/t1hi", tier="t1hi")
        return verify_against_golden(corpus, mismatches_only=True)

    q = {
        # -- flagship extraction (non-SQL: image pipeline; rows-only check) --
        "extract_spans": extract_spans,
        "extract_serialized": extract_serialized,
        "extract_filtered": extract_filtered,
        "extract_verify": extract_verify,
        "extract_verify_dualdpi": extract_verify_dualdpi,
        # -- deduplication --
        "winnow_fingerprints": lambda sf: dedup.winnow_fingerprints(
            docs(sf, ["doc_id", "text"])
        ),
        "winnow_overlap": lambda sf: dedup.winnow_overlap(
            docs(sf, ["doc_id", "text"])
        ),
        "dedup_exact": lambda sf: dedup.exact_dedup(docs(sf, ["doc_id", "text"])),
        # incremental: odd doc_ids are the "new" crawl batch, even the
        # existing corpus (parity split keeps the demo scale-independent)
        "dedup_incremental": lambda sf: dedup.dedup_incremental(
            _parity_docs(sf, 1), _parity_docs(sf, 0)
        ),
        "dedup_incremental_fuzzy": lambda sf: dedup.dedup_incremental_fuzzy(
            _parity_docs(sf, 1), _parity_docs(sf, 0)
        ),
        "dedup_minhash_lsh": lambda sf: dedup.minhash_candidates(
            docs(sf, ["doc_id", "text"])
        ),
        "minhash_jaccard_est": lambda sf: dedup.minhash_jaccard_est(
            docs(sf, ["doc_id", "text"])
        ),
        "dedup_ngram_jaccard": lambda sf: dedup.ngram_jaccard(
            docs(sf, ["doc_id", "text"])
        ),
        "dedup_simhash": lambda sf: textstats.simhash64(docs(sf, ["doc_id", "text"])),
        "dedup_simhash_pairs": lambda sf: dedup.simhash_near_dup(
            docs(sf, ["doc_id", "text"])
        ),
        "decontaminate": lambda sf: dedup.decontaminate(docs(sf, ["doc_id", "text"])),
        "dedup_spans": lambda sf: dedup.dedup_spans(docs(sf, ["doc_id", "text"])),
        "boilerplate_lines": lambda sf: dedup.boilerplate_lines(
            _boiler_docs(sf)
        ),
        "dedup_clusters": lambda sf: dedup.dedup_clusters(docs(sf, ["doc_id", "text"])),
        "split_assign": lambda sf: textstats.split_assign(docs(sf, ["doc_id"])),
        "strip_html": lambda sf: textstats.strip_html(
            docs(sf, ["doc_id", "text"])
        ),
        "extract_main_content": lambda sf: textstats.extract_main_content(
            _html_docs(sf)
        ),
        "normalize_text": lambda sf: textstats.normalize_text(docs(sf, ["doc_id", "text"])),
        "token_freq": lambda sf: textstats.token_freq(docs(sf, ["doc_id", "text"])),
        "typo_token_pairs": lambda sf: textstats.typo_token_pairs(
            _typo_docs(sf)
        ),
        "tokenize_ids": lambda sf: textstats.tokenize_ids(
            docs(sf, ["doc_id", "text"])
        ),
        "pack_token_blocks": lambda sf: textstats.pack_token_blocks(
            docs(sf, ["doc_id", "text"])
        ),
        "pmi_collocations": lambda sf: textstats.pmi_collocations(
            docs(sf, ["doc_id", "text"]), min_count=3
        ),
        "weighted_sample": lambda sf: textstats.weighted_sample(
            docs(sf, ["doc_id", "n_chars"]), k=100
        ),
        "source_top_tokens": lambda sf: textstats.source_top_tokens(
            docs(sf, ["source", "text"])
        ),
        "source_vocab_overlap": lambda sf: textstats.source_vocab_overlap(
            docs(sf, ["source", "text"])
        ),
        "redact_text": lambda sf: textstats.redact_text(docs(sf, ["doc_id", "text"])),
        "rare_bigram_rate": lambda sf: textstats.rare_bigram_rate(
            docs(sf, ["doc_id", "text"])
        ),
        "dsir_weights": lambda sf: selection.dsir_weights(
            docs(sf, ["doc_id", "text", "source"])
        ),
        "lm_perplexity": lambda sf: selection.lm_perplexity(
            docs(sf, ["doc_id", "text"])
        ),
        "props_key_stats": lambda sf: relational.props_key_stats(
            _read(sf, "events", ["event_type", "props"])
        ),
        "events_hourly_users": lambda sf: sketch.hourly_users(
            _read(sf, "events", ["user_id", "ts"])
        ),
        "events_hourly_users_hll": lambda sf: sketch.hourly_users_hll(
            _read(sf, "events", ["user_id", "ts"])
        ),
        "hll_audience_overlap": lambda sf: sketch.hll_audience_overlap(
            _read(sf, "events", ["event_type", "user_id"])
        ),
        "audience_overlap_exact": lambda sf: sketch.audience_overlap_exact(
            _read(sf, "events", ["event_type", "user_id"])
        ),
        "kmv_users_by_type": lambda sf: sketch.kmv_users_by_type(
            _read(sf, "events", ["event_type", "user_id"])
        ),
        "kmv_audience_overlap": lambda sf: sketch.kmv_audience_overlap(
            _read(sf, "events", ["event_type", "user_id"])
        ),
        "order_priority_count": lambda sf: relational.order_priority_count(
            _read(sf, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]),
            _read(sf, "lineitem", ["l_orderkey", "l_shipdate"]),
        ),
        "containment_pairs": lambda sf: dedup.containment_pairs(
            docs(sf, ["doc_id", "text"])
        ),
        "weighted_jaccard_pairs": lambda sf: dedup.weighted_jaccard_pairs(
            docs(sf, ["doc_id", "text"])
        ),
        "truncation_dups": lambda sf: dedup.truncation_dups(
            docs(sf, ["doc_id", "text"])
        ),
        "mad_outliers": lambda sf: sketch.mad_outliers(
            _read(sf, "events", ["event_id", "value"])
        ),
        "decayed_user_score": lambda sf: relational.decayed_user_score(
            _read(sf, "events", ["ts", "user_id", "value"])
        ),
        "span_kind_transitions": lambda sf: (
            interleaved.span_kind_transitions(_spans(sf))
        ),
        "session_path_topk": lambda sf: relational.session_path_topk(
            _read(sf, "events", ["user_id", "ts", "event_id", "event_type"])
        ),
        "robust_scale_events": lambda sf: relational.robust_scale_events(
            _read(sf, "events", ["event_id", "value"])
        ),
        "value_psi": lambda sf: relational.value_psi(
            _read(sf, "events", ["ts", "value"])
        ),
        "mg_heavy_tokens": lambda sf: sketch.mg_heavy_tokens(
            docs(sf, ["text"])
        ),
        "setjoin_jaccard": lambda sf: dedup.setjoin_jaccard(
            docs(sf, ["doc_id", "text"])
        ),
        "tokenizer_fertility": lambda sf: textstats.tokenizer_fertility(
            docs(sf, ["lang", "text"])
        ),
        "quality_ntile_by_source": lambda sf: (
            textstats.quality_ntile_by_source(
                docs(sf, ["doc_id", "text", "source"])
            )
        ),
        "value_quantiles_selection": lambda sf: (
            sketch.value_quantiles_selection(_read(sf, "events", ["value"]))
        ),
        "range_partition_plan": lambda sf: (
            sketch.range_partition_plan(_read(sf, "events", ["value"]))
        ),
        "events_hourly_percentiles": lambda sf: sketch.hourly_value_percentiles(
            _read(sf, "events", ["ts", "value"])
        ),
        "cms_heavy_hitters": lambda sf: sketch.cms_heavy_hitters(
            docs(sf, ["text"])
        ),
        "events_hourly_quantiles_sketch": lambda sf:
            sketch.hourly_value_quantiles_sketch(
                _read(sf, "events", ["ts", "value"])
            ),
        "curate_corpus": lambda sf: curate.curate_corpus(docs(sf, ["doc_id", "text"])),
        "dedup_savings": lambda sf: curate.dedup_savings(
            docs(sf, ["doc_id", "text", "n_chars"])
        ),
        "quality_histogram": lambda sf: textstats.quality_histogram(
            docs(sf, ["doc_id", "text", "source"])
        ),
        "canonical_docs": lambda sf: curate.canonical_docs(docs(sf, ["doc_id", "text"])),
        "curate_semantic": lambda sf: curate.curate_semantic(
            docs(sf, ["doc_id", "text"]),
            _read(sf, "embeddings", ["vec_id", "embedding"]),
            head_ds=_read_embeddings_head(sf, 16),
        ),
        "stratified_sample": lambda sf: textstats.stratified_sample(
            docs(sf, ["doc_id", "source"])
        ),
        "mixture_sample": lambda sf: textstats.mixture_sample(
            docs(sf, ["doc_id", "source"])
        ),
        # -- similarity search --
        # head_ds: the tiny query/centroid set comes from a
        # predicate-pushed-down read (vec_id < m row filter at the parquet
        # scan) instead of an extra full pass over the embeddings.
        "knn_cosine": lambda sf: similarity.knn_bruteforce(
            _read(sf, "embeddings", ["vec_id", "embedding"]),
            head_ds=_read_embeddings_head(sf, 8),
        ),
        "embedding_covariance": lambda sf: similarity.embedding_covariance(
            _read(sf, "embeddings", ["embedding"])
        ),
        "label_exemplars": lambda sf: similarity.label_exemplars(
            _read(sf, "embeddings", ["vec_id", "embedding", "label"])
        ),
        "knn_ivf": lambda sf: similarity.ivf_knn(
            _read(sf, "embeddings", ["vec_id", "embedding"]),
            head_ds=_read_embeddings_head(sf, 16),
        ),
        "knn_pq": lambda sf: similarity.pq_topk(
            _read(sf, "embeddings", ["vec_id", "embedding"]),
            head_ds=_read_embeddings_head(sf, 16),
        ),
        "pq_index_incremental": lambda sf: similarity.pq_index_incremental(
            _read(sf, "embeddings", ["vec_id", "embedding"]),
            head_ds=_read_embeddings_head(sf, 32),
        ),
        "knn_pq_rerank": lambda sf: similarity.pq_topk_rerank(
            _read(sf, "embeddings", ["vec_id", "embedding"]),
            head_ds=_read_embeddings_head(sf, 16),
        ),
        "label_centroid_stats": lambda sf: similarity.label_centroid_stats(
            _read(sf, "embeddings", ["vec_id", "embedding", "label"])
        ),
        "semantic_dedup": lambda sf: similarity.semantic_dedup(
            _read(sf, "embeddings", ["vec_id", "embedding"]),
            head_ds=_read_embeddings_head(sf, 16),
        ),
        "embedding_near_dup": lambda sf: similarity.near_dup_pairs(
            _read(sf, "embeddings", ["vec_id", "embedding"])
        ),
        "embedding_near_dup_lsh": lambda sf: similarity.lsh_near_dup(
            _read(sf, "embeddings", ["vec_id", "embedding"])
        ),
        "near_dup_triangles": lambda sf: similarity.near_dup_triangles(
            _read(sf, "embeddings", ["vec_id", "embedding"])
        ),
        # rows-only: PCA eigendecomposition is not SQL-expressible; the
        # numpy-replay exactness test lives in tests/test_round4b_ops.py.
        "pca_recon_error": lambda sf: similarity.pca_recon_error(
            _read(sf, "embeddings", ["vec_id", "embedding", "label"])
        ),
        # -- text analysis --
        "fingerprint": lambda sf: textstats.fingerprint(docs(sf, ["doc_id", "text"])),
        "token_stats": lambda sf: textstats.token_stats(docs(sf, ["doc_id", "text"])),
        "repetition_stats": lambda sf: textstats.repetition_stats(
            docs(sf, ["doc_id", "text"])
        ),
        "char_budget_prefix": lambda sf: textstats.char_budget_prefix(
            docs(sf, ["doc_id", "n_chars"])
        ),
        "epoch_shuffle": lambda sf: textstats.epoch_shuffle(docs(sf, ["doc_id"])),
        "pack_sequences": lambda sf: textstats.pack_sequences(
            docs(sf, ["doc_id", "n_chars"])
        ),
        "source_quality_report": lambda sf: textstats.source_quality_report(
            docs(sf, ["doc_id", "source", "text"])
        ),
        "lang_stats": lambda sf: textstats.lang_stats(
            docs(sf, ["doc_id", "lang", "n_chars"])
        ),
        "lang_id": lambda sf: textstats.lang_id(docs(sf, ["doc_id", "text"])),
        "dehyphenate": lambda sf: textstats.dehyphenate(docs(sf, ["doc_id", "text"])),
        "classify_docs": lambda sf: textstats.classify_docs(
            docs(sf, ["doc_id", "text"])
        ),
        "quality_score": lambda sf: textstats.quality_score(
            docs(sf, ["doc_id", "text"])
        ),
        "gopher_filter": lambda sf: textstats.gopher_filter(
            docs(sf, ["doc_id", "text"])
        ),
        "char_entropy": lambda sf: textstats.char_entropy(
            docs(sf, ["doc_id", "text"])
        ),
        "token_regex_stats": lambda sf: textstats.token_regex_stats(
            docs(sf, ["doc_id", "text"])
        ),
        "quality_percentile": lambda sf: textstats.quality_percentile(
            docs(sf, ["doc_id", "text", "source"])
        ),
        "source_cap": lambda sf: textstats.source_cap(
            docs(sf, ["doc_id", "text", "source"]), cap=8
        ),
        # n_docs from the parquet footer (zero data bytes) — same pattern
        # as orders_by_segment's dim_count guard probe.
        "tfidf_top_terms": lambda sf: textstats.tfidf_top_terms(
            docs(sf, ["doc_id", "text"]),
            n_docs=_parquet_count(sf, "documents"),
        ),
        "chunk_documents": lambda sf: textstats.chunk_documents(
            docs(sf, ["doc_id", "text"])
        ),
        "bm25_topk": lambda sf: retrieval.bm25_topk(
            docs(sf, ["doc_id", "text"]),
            queries=BM25_QUERIES,
            n_docs=_parquet_count(sf, "documents"),
        ),
        "hybrid_rrf": lambda sf: retrieval.hybrid_rrf(
            docs(sf, ["doc_id", "text"]),
            _read(sf, "embeddings", ["vec_id", "embedding"]),
            queries=BM25_QUERIES,
            n_docs=_parquet_count(sf, "documents"),
            head_ds=_read_embeddings_head(sf, len(BM25_QUERIES)),
        ),
        # -- multimodal (binary media columns; rows-only checks) --
        "digitize_plots": lambda sf: plots.digitize_plots(_read(sf, "embeddings", ["vec_id", "embedding"])),
        "media_dims": lambda sf: multimodal.media_dims(media(sf)),
        "media_thumb_dims": lambda sf: multimodal.media_thumb_dims(media(sf)),
        "media_content_dedup": lambda sf: multimodal.media_content_dedup(media(sf)),
        "media_stats": lambda sf: multimodal.media_stats(media(sf)),
        # -- interleaved-span structure (the input_hint table itself) --
        "span_stats": lambda sf: interleaved.span_stats(_spans(sf)),
        "media_captions": lambda sf: interleaved.media_captions(_spans(sf)),
        "interleave_render": lambda sf: interleaved.render_interleaved(_spans(sf)),
        "span_integrity": lambda sf: interleaved.span_integrity(
            _corrupt_spans(sf)
        ),
        "interleave_pack": lambda sf: interleaved.interleave_pack(_spans(sf)),
        "span_boilerplate": lambda sf: interleaved.span_boilerplate(
            _boiler_spans(sf)
        ),
        "curate_captions": lambda sf: interleaved.curate_captions(
            _spans(sf), media(sf)
        ),
        "media_thumbnails": lambda sf: multimodal.media_thumbnails(media(sf)),
        "audio_features": lambda sf: multimodal.audio_features(media(sf)),
        "video_frames": lambda sf: multimodal.video_frames(media(sf)),
        # -- relational / streaming demos (column-pruned reads) --
        "retention_cohorts": lambda sf: relational.retention_cohorts(
            _read(sf, "events", ["ts", "user_id"])
        ),
        "pricing_summary": lambda sf: relational.pricing_summary(
            _read(sf, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity",
                                   "l_extendedprice", "l_discount"])
        ),
        # dim_count from the parquet footer (zero data bytes) so the
        # broadcast-vs-shuffle guard adds no scan over the dimension.
        "orders_by_segment": lambda sf: relational.orders_by_segment(
            _read(sf, "orders", ["o_custkey", "o_totalprice"]),
            _read(sf, "customer", ["c_custkey", "c_mktsegment"]),
            dim_count=_parquet_count(sf, "customer"),
        ),
        "orders_for_segment": lambda sf: relational.orders_for_segment(
            _read(sf, "orders", ["o_custkey", "o_totalprice", "o_orderdate"]),
            _read(sf, "customer", ["c_custkey", "c_mktsegment"]),
        ),
        "events_hourly": lambda sf: relational.events_hourly(
            _read(sf, "events", ["event_type", "ts", "value"])
        ),
        "outlier_events": lambda sf: relational.outlier_events(
            _read(sf, "events", ["event_id", "event_type", "ts", "value"])
        ),
        "conversion_funnel": lambda sf: relational.conversion_funnel(
            _read(sf, "events", ["user_id", "event_type", "ts"])
        ),
        "events_profile": lambda sf: relational.table_profile(
            _read(sf, "events", ["event_id", "ts", "user_id", "event_type", "value"]),
            spec={
                "event_id": "int",
                "ts": "ts_us",
                "user_id": "int",
                "event_type": "str",
                "value": "cents",
            },
        ),
        # approx_-prefixed kinds route the id-like columns' distinct count
        # through a fixed-size HLL fold (one 4 KB register row per block)
        # instead of shuffling the full key domain — the scale profile for
        # columns whose cardinality ~ the table itself.
        "events_profile_approx": lambda sf: relational.table_profile(
            _read(sf, "events", ["event_id", "user_id", "event_type", "value"]),
            spec={
                "event_id": "approx_int",
                "user_id": "approx_int",
                "event_type": "str",
                "value": "cents",
            },
        ),
        "sessionize": lambda sf: relational.sessionize(
            _read(sf, "events", ["user_id", "ts"])
        ),
        "events_sliding_window": lambda sf: relational.events_sliding_window(
            _read(sf, "events", ["event_type", "ts", "value"])
        ),
        "purchase_asof_join": lambda sf: relational.purchase_asof_join(
            _read(sf, "events", ["event_id", "ts", "user_id", "event_type"])
        ),
        # range join: 24 h attribution window (dense enough at sf0.01)
        "purchase_click_attribution": lambda sf: relational.purchase_click_attribution(
            _read(sf, "events", ["event_id", "ts", "user_id", "event_type"]),
            window_us=86_400_000_000,
        ),
        "revenue_by_nation": lambda sf: relational.revenue_by_nation(
            _read(sf, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]),
            _read(sf, "orders", ["o_orderkey", "o_custkey"]),
            _read(sf, "customer", ["c_custkey", "c_nationkey"]),
            _read(sf, "supplier", ["s_suppkey", "s_nationkey"]),
            _read(sf, "nation", ["n_nationkey", "n_name", "n_regionkey"]),
            _read(sf, "region", ["r_regionkey", "r_name"]),
            order_count=_parquet_count(sf, "orders"),
            customer_count=_parquet_count(sf, "customer"),
            supplier_count=_parquet_count(sf, "supplier"),
        ),
        "distinct_sources": lambda sf: relational.distinct_sources(
            docs(sf, ["source"])
        ),
        "top_docs_by_chars": lambda sf: relational.top_docs_by_chars(
            docs(sf, ["doc_id", "n_chars"])
        ),
        # -- output planning / snapshot ops (round 4) --
        "shard_plan": lambda sf: textstats.shard_plan(
            docs(sf, ["doc_id", "n_chars"])
        ),
        "corpus_diff": lambda sf: curate.corpus_diff(
            docs(sf, ["doc_id", "text"]), _v2_docs(sf)
        ),
        "key_skew_report": lambda sf: relational.key_skew_report(
            _read(sf, "events", ["user_id"])
        ),
        "canary_scan": lambda sf: textstats.canary_scan(
            docs(sf, ["doc_id", "text"]), canaries=list(_CANARIES)
        ),
        "vocab_oov_rate": lambda sf: textstats.vocab_oov_rate(
            docs(sf, ["doc_id", "text", "source"])
        ),
        "custdist": lambda sf: relational.custdist(
            _read(sf, "orders", ["o_custkey"]),
            _parquet_count(sf, "customer"),
        ),
        "top_customer_per_nation": lambda sf: (
            relational.top_customer_per_nation(
                _read(sf, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])
            )
        ),
        "kneser_ney_bigram": lambda sf: textstats.kneser_ney_bigram(
            docs(sf, ["doc_id", "text"])
        ),
        "caption_token_audit": lambda sf: (
            interleaved.caption_token_audit(_spans(sf))
        ),
        "media_span_context": lambda sf: (
            interleaved.media_span_context(_spans(sf))
        ),
        "stratified_split": lambda sf: selection.stratified_split(
            docs(sf, ["doc_id", "source", "n_chars"])
        ),
        "hill_tail_index": lambda sf: sketch.hill_tail_index(
            _read(sf, "events", ["value"])
        ),
        "matryoshka_error": lambda sf: similarity.matryoshka_error(
            _read(sf, "embeddings", ["vec_id", "embedding"])
        ),
        "dup_ngram_coverage": lambda sf: dedup.dup_ngram_coverage(
            docs(sf, ["doc_id", "text"])
        ),
        "code_detect": lambda sf: textstats.code_detect(
            docs(sf, ["doc_id", "text"])
        ),
        "hard_negatives": lambda sf: similarity.hard_negatives(
            _read(sf, "embeddings", ["vec_id", "embedding", "label"]),
            head_ds=_read_embeddings_head_labeled(sf, 8),
        ),
        "event_last_order": lambda sf: relational.event_last_order(
            _read(sf, "events", ["event_id", "ts", "user_id"]),
            _read(sf, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]),
        ),
        "latest_event_compaction": lambda sf: (
            relational.latest_event_compaction(
                _read(
                    sf,
                    "events",
                    ["event_id", "ts", "user_id", "event_type", "value"],
                )
            )
        ),
        "cdc_merge": lambda sf: relational.cdc_merge(
            _read(
                sf,
                "events",
                ["event_id", "ts", "user_id", "event_type", "value"],
            )
        ),
        "median_value_by_type": lambda sf: relational.median_value_by_type(
            _read(sf, "events", ["event_type", "value"])
        ),
        "order_cube": lambda sf: relational.order_cube(
            _read(
                sf,
                "orders",
                ["o_orderdate", "o_orderpriority", "o_totalprice"],
            )
        ),
        "partition_checksums": lambda sf: curate.partition_checksums(
            docs(sf, ["doc_id", "text"])
        ),
        "fk_integrity": lambda sf: relational.fk_integrity_report(
            [
                (
                    "orders.o_custkey->customer.c_custkey",
                    _read(sf, "orders", ["o_custkey"]),
                    "o_custkey",
                    _read(sf, "customer", ["c_custkey"]),
                    "c_custkey",
                ),
                (
                    "lineitem.l_orderkey->orders.o_orderkey",
                    _read(sf, "lineitem", ["l_orderkey"]),
                    "l_orderkey",
                    _read(sf, "orders", ["o_orderkey"]),
                    "o_orderkey",
                ),
            ]
        ),
        "pii_scrub": lambda sf: textstats.pii_scrub(
            _read(sf, "events", ["event_id", "props"]),
            id_col="event_id",
            text_col="props",
        ),
        "source_divergence": lambda sf: textstats.source_divergence(
            docs(sf, ["doc_id", "text", "source"])
        ),
        "length_outliers": lambda sf: textstats.length_outliers_mad(
            docs(sf, ["doc_id", "source", "n_chars"])
        ),
        "inverted_index": lambda sf: retrieval.inverted_index(
            docs(sf, ["doc_id", "text"])
        ),
        "pagerank": lambda sf: relational.pagerank_bipartite(
            _read(sf, "lineitem", ["l_partkey", "l_suppkey"])
        ),
        "basket_pairs": lambda sf: relational.basket_pairs(
            _read(sf, "lineitem", ["l_orderkey", "l_partkey"])
        ),
        # z=1 keeps the hash-checked result non-degenerate at sf0.001
        # (z=2+ flags nothing there; to_pandas drops columns on 0 rows)
        "hourly_anomalies": lambda sf: relational.hourly_anomalies(
            _read(sf, "events", ["event_type", "ts"]), z=1
        ),
        "rolling_active_users": lambda sf: relational.rolling_active_users(
            _read(sf, "events", ["user_id", "ts"])
        ),
        "late_shipment_orders": lambda sf: relational.late_shipment_orders(
            _read(sf, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]),
            _read(sf, "lineitem", ["l_orderkey", "l_shipdate"]),
        ),
        "event_transitions": lambda sf: relational.event_transitions(
            _read(sf, "events", ["user_id", "event_type", "ts", "event_id"])
        ),
        "knn_label_purity": lambda sf: similarity.knn_label_purity(
            _read(sf, "embeddings", ["vec_id", "embedding"]),
            head_ds=_read_embeddings_head(sf, 8),
            labels_path=os.path.join(sf, "embeddings.parquet"),
        ),
        "events_user_overlap": lambda sf: relational.events_user_overlap(
            _read(sf, "events", ["user_id", "event_type"])
        ),
        "monthly_revenue_running": lambda sf: (
            relational.monthly_revenue_running(
                _read(sf, "orders", ["o_orderdate", "o_totalprice"])
            )
        ),
        "cheapest_supplier_per_part": lambda sf: (
            relational.cheapest_supplier_per_part(
                _read(
                    sf,
                    "lineitem",
                    [
                        "l_partkey",
                        "l_suppkey",
                        "l_quantity",
                        "l_extendedprice",
                    ],
                )
            )
        ),
        "vocab_coverage_curve": lambda sf: textstats.vocab_coverage_curve(
            docs(sf, ["doc_id", "text"])
        ),
        "returned_item_revenue": lambda sf: relational.returned_item_revenue(
            _read(
                sf,
                "lineitem",
                ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
            ),
            _read(sf, "orders", ["o_orderkey", "o_custkey"]),
            _read(sf, "customer", ["c_custkey", "c_name", "c_nationkey"]),
            _read(sf, "nation", ["n_nationkey", "n_name"]),
            order_count=_parquet_count(sf, "orders"),
            customer_count=_parquet_count(sf, "customer"),
        ),
        "promo_revenue": lambda sf: relational.promo_revenue(
            _read(sf, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"]),
            _read(sf, "part", ["p_partkey", "p_type"]),
            part_count=_parquet_count(sf, "part"),
        ),
        "large_order_customers": lambda sf: relational.large_order_customers(
            _read(sf, "lineitem", ["l_orderkey", "l_quantity"]),
            _read(sf, "orders", ["o_orderkey", "o_custkey", "o_totalprice"]),
            _read(sf, "customer", ["c_custkey", "c_name"]),
        ),
        "revenue_rollup": lambda sf: relational.revenue_rollup(
            _read(sf, "orders", ["o_custkey", "o_orderdate", "o_totalprice"]),
            _read(sf, "customer", ["c_custkey", "c_nationkey"]),
            _read(sf, "nation", ["n_nationkey", "n_name"]),
            customer_count=_parquet_count(sf, "customer"),
        ),
        "event_type_hour_pivot": lambda sf: relational.event_type_hour_pivot(
            _read(sf, "events", ["ts", "event_type"])
        ),
        "brand_size_outliers": lambda sf: relational.brand_size_outliers(
            _read(sf, "part", ["p_partkey", "p_brand", "p_size"])
        ),
        "churned_customers": lambda sf: relational.churned_customers(
            _read(sf, "orders", ["o_custkey", "o_orderdate"]),
            _read(sf, "customer", ["c_custkey", "c_nationkey", "c_acctbal"]),
            _read(sf, "nation", ["n_nationkey", "n_name"]),
        ),
        "moving_avg_daily_revenue": lambda sf: (
            relational.moving_avg_daily_revenue(
                _read(sf, "orders", ["o_orderdate", "o_totalprice"])
            )
        ),
        "sentence_stats": lambda sf: textstats.sentence_stats(
            docs(sf, ["doc_id", "text", "source"])
        ),
        "interleave_shape_hist": lambda sf: (
            interleaved.interleave_shape_hist(_spans(sf))
        ),
        "events_value_stddev": lambda sf: relational.events_value_stddev(
            _read(sf, "events", ["event_type", "value"])
        ),
        "top_customers_concat": lambda sf: relational.top_customers_concat(
            _read(
                sf,
                "customer",
                ["c_custkey", "c_name", "c_nationkey", "c_acctbal"],
            ),
            _read(sf, "nation", ["n_nationkey", "n_name"]),
        ),
        "doc_length_deciles": lambda sf: relational.doc_length_deciles(
            _read(sf, "documents", ["doc_id", "n_chars"])
        ),
        "media_ref_fanout": lambda sf: (
            interleaved.media_ref_fanout(_spans(sf))
        ),
        "mmr_select": lambda sf: similarity.mmr_select(
            _read(sf, "embeddings", ["vec_id", "embedding"]),
            head_ds=_read_embeddings_head(sf, 1),
        ),
        "lexical_diversity": lambda sf: textstats.lexical_diversity(
            docs(sf, ["doc_id", "text", "source"])
        ),
        "user_gap_stats": lambda sf: relational.user_gap_stats(
            _read(sf, "events", ["user_id", "ts", "event_id"])
        ),
        "span_length_profile": lambda sf: (
            interleaved.span_length_profile(_spans(sf))
        ),
        "near_dup_degree_hist": lambda sf: similarity.near_dup_degree_hist(
            _read(sf, "embeddings", ["vec_id", "embedding"]),
            row_count=_parquet_count(sf, "embeddings"),
        ),
        "orders_monthly_yoy": lambda sf: relational.orders_monthly_yoy(
            _read(sf, "orders", ["o_orderdate", "o_totalprice"])
        ),
        "source_dup_rate": lambda sf: dedup.source_dup_rate(
            docs(sf, ["doc_id", "text", "source"])
        ),
        "brand_supplier_counts": lambda sf: relational.brand_supplier_counts(
            _read(sf, "lineitem", ["l_partkey", "l_suppkey"]),
            _read(sf, "part", ["p_partkey", "p_brand"]),
            part_count=_parquet_count(sf, "part"),
        ),
        "minmax_scale_events": lambda sf: relational.minmax_scale_events(
            _read(sf, "events", ["event_id", "value"])
        ),
        "dup_cluster_size_hist": lambda sf: dedup.dup_cluster_size_hist(
            docs(sf, ["doc_id", "text"])
        ),
        "salted_user_counts": lambda sf: relational.salted_user_counts(
            _read(sf, "events", ["user_id", "event_id", "value"])
        ),
        "longest_docs_per_source": lambda sf: (
            textstats.longest_docs_per_source(
                docs(sf, ["doc_id", "source", "n_chars"])
            )
        ),
        "forecast_revenue": lambda sf: relational.forecast_revenue(
            _read(
                sf,
                "lineitem",
                ["l_shipdate", "l_quantity", "l_discount", "l_extendedprice"],
            )
        ),
        "priority_line_share": lambda sf: relational.priority_line_share(
            _read(sf, "lineitem", ["l_orderkey", "l_shipdate"]),
            _read(
                sf, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]
            ),
        ),
        "bracket_revenue": lambda sf: relational.bracket_revenue(
            _read(
                sf,
                "lineitem",
                ["l_partkey", "l_quantity", "l_discount", "l_extendedprice"],
            ),
            _read(sf, "part", ["p_partkey", "p_brand", "p_size"]),
            part_count=_parquet_count(sf, "part"),
        ),
        "shipping_priority": lambda sf: relational.shipping_priority(
            _read(
                sf,
                "lineitem",
                ["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"],
            ),
            _read(
                sf,
                "orders",
                ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
            ),
            _read(sf, "customer", ["c_custkey", "c_mktsegment"]),
            customer_count=_parquet_count(sf, "customer"),
            order_count=_parquet_count(sf, "orders"),
        ),
        "top_supplier": lambda sf: relational.top_supplier(
            _read(
                sf,
                "lineitem",
                ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
            ),
            _read(sf, "supplier", ["s_suppkey", "s_name"]),
        ),
        "small_qty_revenue": lambda sf: relational.small_qty_revenue(
            _read(
                sf, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"]
            ),
            _read(sf, "part", ["p_partkey", "p_brand"]),
            part_count=_parquet_count(sf, "part"),
        ),
        "anomaly_incidents": lambda sf: relational.anomaly_incidents(
            _read(sf, "events", ["ts", "event_type"])
        ),
        "linenumber_integrity": lambda sf: relational.linenumber_integrity(
            _read(sf, "lineitem", ["l_orderkey", "l_linenumber"])
        ),
        "dup_cluster_source_mix": lambda sf: dedup.dup_cluster_source_mix(
            docs(sf, ["doc_id", "text", "source"])
        ),
        "quantile_sketch_error": lambda sf: sketch.quantile_sketch_error(
            _read(sf, "events", ["ts", "value"])
        ),
        "cms_error_report": lambda sf: sketch.cms_error_report(
            docs(sf, ["text"])
        ),
        "winnow_density_check": lambda sf: dedup.winnow_density_check(
            docs(sf, ["doc_id", "text"])
        ),
        "media_dhash_pairs": lambda sf: multimodal.media_dhash_pairs(
            media(sf)
        ),
        "important_parts": lambda sf: relational.important_parts(
            _read(
                sf,
                "lineitem",
                ["l_suppkey", "l_partkey", "l_extendedprice", "l_discount"],
            ),
            _read(sf, "supplier", ["s_suppkey", "s_nationkey"]),
            supplier_count=_parquet_count(sf, "supplier"),
        ),
        "promo_part_suppliers": lambda sf: relational.promo_part_suppliers(
            _read(
                sf,
                "lineitem",
                ["l_partkey", "l_suppkey", "l_shipdate", "l_quantity"],
            ),
            _read(sf, "part", ["p_partkey", "p_name"]),
            _read(sf, "supplier", ["s_suppkey", "s_name"]),
            part_count=_parquet_count(sf, "part"),
            supplier_count=_parquet_count(sf, "supplier"),
        ),
        "simhash_nearest": lambda sf: dedup.simhash_nearest(
            docs(sf, ["doc_id", "text"])
        ),
        "mixture_token_plan": lambda sf: selection.mixture_token_plan(
            docs(sf, ["source", "text"])
        ),
        "pq_recall_report": lambda sf: similarity.pq_recall_report(
            _read(sf, "embeddings", ["vec_id", "embedding"]),
            head_ds=_read_embeddings_head(sf, 8),
            pq_head_ds=_read_embeddings_head(sf, 16),
        ),
        "sessionize_gap_sweep": lambda sf: relational.sessionize_gap_sweep(
            _read(sf, "events", ["user_id", "ts"])
        ),
        "dedup_candidates_recall": lambda sf: dedup.dedup_candidates_recall(
            docs(sf, ["doc_id", "text"])
        ),
        "hll_error_report": lambda sf: sketch.hll_error_report(
            _read(sf, "events", ["ts", "user_id"])
        ),
        "stream_inversions": lambda sf: relational.stream_inversions(
            _read(sf, "events", ["user_id", "event_id", "ts"])
        ),
        "customer_rfm": lambda sf: relational.customer_rfm(
            _read(sf, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])
        ),
        "embedding_norm_outliers": lambda sf: (
            similarity.embedding_norm_outliers(
                _read(sf, "embeddings", ["vec_id", "embedding"])
            )
        ),
        "media_payload_size_hist": lambda sf: (
            multimodal.media_payload_size_hist(media(sf))
        ),
        "compression_ratio": lambda sf: textstats.compression_ratio(
            docs(sf, ["doc_id", "text"])
        ),
        "canonicalize_media_refs": lambda sf: (
            interleaved.canonicalize_media_refs(_spans(sf), media(sf))
        ),
        "lsh_band_sweep": lambda sf: dedup.lsh_band_sweep(
            docs(sf, ["doc_id", "text"])
        ),
        "source_token_gini": lambda sf: textstats.source_token_gini(
            docs(sf, ["source", "text"])
        ),
        "source_token_entropy": lambda sf: textstats.source_token_entropy(
            docs(sf, ["source", "text"])
        ),
        "zipf_fit": lambda sf: textstats.zipf_fit(
            docs(sf, ["source", "text"])
        ),
        "window_dedup": lambda sf: dedup.window_dedup(
            docs(sf, ["doc_id", "text"])
        ),
        "peak_concurrency": lambda sf: relational.peak_concurrency(
            _read(sf, "events", ["event_type", "ts"])
        ),
        # incremental == batch invariant: prior sessions come from the
        # pre-cutoff half, the post-cutoff half is the "new" batch, and
        # the oracle is plain sessionize SQL over the WHOLE table.
        "sessionize_incremental": lambda sf: relational.sessionize_incremental(
            relational.sessionize(_events_half(sf, before=True)),
            _events_half(sf, before=False),
        ),
        "sq8_quantize_error": lambda sf: similarity.sq8_quantize_error(
            _read(sf, "embeddings", ["embedding"])
        ),
        "ks_value_drift": lambda sf: relational.ks_statistic(
            _read(sf, "events", ["event_type", "value"])
        ),
        "chi2_type_hour": lambda sf: relational.chi2_independence(
            _read(sf, "events", ["event_type", "ts"])
        ),
        "cumulative_users": lambda sf: relational.cumulative_distinct_users(
            _read(sf, "events", ["user_id", "ts"])
        ),
        "time_to_conversion": lambda sf: relational.time_to_conversion(
            _read(sf, "events", ["user_id", "event_type", "ts"])
        ),
        "mutual_nn_pairs": lambda sf: similarity.mutual_nn_pairs(
            _read(sf, "embeddings", ["vec_id", "embedding"]),
            row_count=_parquet_count(sf, "embeddings"),
        ),
        "bpe_merge_step": lambda sf: textstats.bpe_merge_step(
            docs(sf, ["doc_id", "text"])
        ),
        "zorder_keys": lambda sf: relational.zorder_keys(
            _read(sf, "events", ["value", "ts"])
        ),
        "span_media_locality": lambda sf: interleaved.span_media_locality(
            _spans(sf)
        ),
        "late_event_lateness": lambda sf: relational.late_event_lateness(
            _read(sf, "events", ["event_id", "ts"])
        ),
        "f2_selfjoin_size": lambda sf: sketch.f2_selfjoin_size(
            _read(sf, "lineitem", ["l_partkey"])
        ),
        "benford_audit": lambda sf: relational.benford_audit(
            _read(sf, "events", ["value"])
        ),
        "trimmed_mean_by_type": lambda sf: relational.trimmed_mean_by_type(
            _read(sf, "events", ["event_type", "value"])
        ),
        "dup_graph_assortativity": lambda sf: similarity.dup_graph_assortativity(
            _read(sf, "embeddings", ["vec_id", "embedding"]),
            row_count=_parquet_count(sf, "embeddings"),
        ),
        "lang_id_confusion": lambda sf: textstats.lang_id_confusion(
            docs(sf, ["doc_id", "lang", "text"])
        ),
        "wsample_noreplace": lambda sf: selection.wsample_noreplace(
            docs(sf, ["doc_id", "n_chars"])
        ),
        "corpus_datasheet": lambda sf: textstats.corpus_datasheet(
            docs(sf, ["doc_id", "text", "source", "lang"])
        ),
        "daily_revenue_autocorr": lambda sf: relational.daily_revenue_autocorr(
            _read(sf, "orders", ["o_orderdate", "o_totalprice"])
        ),
        "span_run_lengths": lambda sf: interleaved.span_run_lengths(
            _spans(sf)
        ),
        "orders_backlog_series": lambda sf: relational.orders_backlog_series(
            _read(sf, "orders", ["o_orderkey", "o_orderdate"]),
            _read(sf, "lineitem", ["l_orderkey", "l_shipdate"]),
        ),
        "transition_entropy": lambda sf: relational.transition_entropy(
            _read(sf, "events", ["user_id", "event_id", "event_type", "ts"])
        ),
        "bloom_fpr_report": lambda sf: relational.bloom_fpr_report(
            _read(sf, "customer", ["c_custkey", "c_mktsegment"])
        ),
        "packing_efficiency": lambda sf: textstats.packing_efficiency_report(
            docs(sf, ["doc_id", "n_chars"])
        ),
        "weighted_median_price": lambda sf: sketch.weighted_median_price(
            _read(sf, "lineitem", ["l_extendedprice", "l_quantity"])
        ),
        "user_value_mobility": lambda sf: relational.user_value_mobility(
            _read(sf, "events", ["user_id", "ts", "value"])
        ),
        "readability_scores": lambda sf: textstats.readability_scores(
            docs(sf, ["doc_id", "text"])
        ),
        "quality_blend_rank": lambda sf: textstats.quality_blend_rank(
            docs(sf, ["doc_id", "text", "source"])
        ),
        "part_skyline": lambda sf: relational.part_skyline(
            _read(sf, "part", ["p_partkey", "p_size", "p_retailprice"])
        ),
        "event_type_burstiness": lambda sf: relational.event_type_burstiness(
            _read(sf, "events", ["ts", "event_type"])
        ),
        "value_trend_slope": lambda sf: relational.value_trend_slope(
            _read(sf, "events", ["ts", "event_type", "value"])
        ),
        "knn_recall_report": lambda sf: similarity.knn_recall_report(
            _read(sf, "embeddings", ["vec_id", "embedding"]),
            head_ds=_read_embeddings_head(sf, 8),
            ivf_head_ds=_read_embeddings_head(sf, 16),
        ),
        "cross_source_dup_matrix": lambda sf: dedup.cross_source_dup_matrix(
            docs(sf, ["source", "text"])
        ),
        "quality_length_grid": lambda sf: textstats.quality_length_grid(
            docs(sf, ["doc_id", "text"])
        ),
        "revenue_concentration": lambda sf: relational.revenue_concentration(
            _read(sf, "orders", ["o_custkey", "o_totalprice"])
        ),
        "media_orphan_audit": lambda sf: interleaved.media_orphan_audit(
            _mangled_spans(sf), media(sf).select_columns(["media_ref"])
        ),
        "bigram_novelty": lambda sf: textstats.bigram_novelty(
            docs(sf, ["doc_id", "text"])
        ),
        "embedding_drift": lambda sf: similarity.embedding_drift(
            _read(sf, "embeddings", ["vec_id", "embedding", "label"])
        ),
        "user_type_gini": lambda sf: relational.user_type_gini(
            _read(sf, "events", ["user_id", "event_type"])
        ),
        "ship_lag_by_priority": lambda sf: relational.ship_lag_by_priority(
            _read(sf, "lineitem", ["l_orderkey", "l_shipdate"]),
            _read(
                sf, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]
            ),
            order_count=_parquet_count(sf, "orders"),
        ),
        "nation_market_share": lambda sf: relational.nation_market_share(
            _read(
                sf,
                "lineitem",
                ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
            ),
            _read(sf, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]),
            _read(sf, "customer", ["c_custkey", "c_nationkey"]),
            _read(sf, "supplier", ["s_suppkey", "s_nationkey"]),
            _read(sf, "nation", ["n_nationkey", "n_regionkey"]),
            order_count=_parquet_count(sf, "orders"),
            customer_count=_parquet_count(sf, "customer"),
            supplier_count=_parquet_count(sf, "supplier"),
        ),
        "product_type_profit": lambda sf: relational.product_type_profit(
            _read(
                sf,
                "lineitem",
                [
                    "l_orderkey",
                    "l_partkey",
                    "l_suppkey",
                    "l_quantity",
                    "l_extendedprice",
                    "l_discount",
                ],
            ),
            _read(sf, "orders", ["o_orderkey", "o_orderdate"]),
            _read(sf, "part", ["p_partkey", "p_name", "p_retailprice"]),
            _read(sf, "supplier", ["s_suppkey", "s_nationkey"]),
            _read(sf, "nation", ["n_nationkey", "n_name"]),
            order_count=_parquet_count(sf, "orders"),
            part_count=_parquet_count(sf, "part"),
            supplier_count=_parquet_count(sf, "supplier"),
        ),
        "nation_trade_volume": lambda sf: relational.nation_trade_volume(
            _read(
                sf,
                "lineitem",
                [
                    "l_orderkey",
                    "l_suppkey",
                    "l_shipdate",
                    "l_extendedprice",
                    "l_discount",
                ],
            ),
            _read(sf, "orders", ["o_orderkey", "o_custkey"]),
            _read(sf, "customer", ["c_custkey", "c_nationkey"]),
            _read(sf, "supplier", ["s_suppkey", "s_nationkey"]),
            _read(sf, "nation", ["n_nationkey", "n_name"]),
            order_count=_parquet_count(sf, "orders"),
            customer_count=_parquet_count(sf, "customer"),
            supplier_count=_parquet_count(sf, "supplier"),
        ),
        "late_supplier_blame": lambda sf: relational.late_supplier_blame(
            _read(sf, "lineitem", ["l_orderkey", "l_suppkey", "l_shipdate"]),
            _read(
                sf, "orders", ["o_orderkey", "o_orderstatus", "o_orderdate"]
            ),
            _read(sf, "supplier", ["s_suppkey", "s_name"]),
        ),
        "dormant_rich_customers": lambda sf: (
            relational.dormant_rich_customers(
                _read(sf, "customer", ["c_custkey", "c_nationkey", "c_acctbal"]),
                _read(sf, "orders", ["o_custkey", "o_orderdate"]),
            )
        ),
        "span_coalesce": lambda sf: interleaved.span_coalesce(_spans(sf)),
        "media_position_hist": lambda sf: (
            interleaved.media_position_hist(_spans(sf))
        ),
        "hash_sample_k": lambda sf: selection.hash_sample_k(
            docs(sf, ["doc_id"])
        ),
        "per_source_sample_k": lambda sf: selection.per_source_sample_k(
            docs(sf, ["doc_id", "source"])
        ),
        "length_token_corr": lambda sf: selection.length_token_corr(
            docs(sf, ["doc_id", "text"])
        ),
        "negative_pairs": lambda sf: selection.negative_pairs(
            docs(sf, ["doc_id"])
        ),
    }
    # Driver correctness sampling takes the FIRST ~50 entries in iteration
    # order. Round-5 rotation (round-4 verdict #1/#2), data-driven: the
    # five extraction gates are pinned at positions 1-5 permanently, then
    # dehyphenate (first round with an oracle), then every query WITHOUT a
    # green driver row in registry order — new queries land here
    # automatically — then the already-checked remainder. ~45 first-time
    # rows per round; in-repo parity (tests/test_entry_parity.py +
    # scripts/parity_sweep.py) covers the full registry regardless.
    # Queries whose oracle landed in round 5 (rows-only -> hash-green
    # upgrades) are pinned right after the gates so their FIRST hash row
    # is driver-recorded this round regardless of registry position.
    upgraded = ["dehyphenate", "classify_docs", "mmr_select"]
    front = list(_EXTRACT_GATES) + upgraded + [
        k
        for k in q
        if k not in _DRIVER_CHECKED
        and k not in _EXTRACT_GATES
        and k not in upgraded
    ]
    seen = set(front)
    return {k: q[k] for k in front if k in q} | {
        k: v for k, v in q.items() if k not in seen
    }



# --------------------------------------------------------------------------
# DuckDB oracles live in tableextraction_ray.oracles (round-4 verdict #8:
# the entry file is the thin driver-contract surface; the SQL catalog is a
# library module). Re-exported here for the driver.
# --------------------------------------------------------------------------

from tableextraction_ray.oracles import oracle_sql  # noqa: E402,F401
