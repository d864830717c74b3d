"""Query registry shared by __spark_entry__.py (correctness gate) and
bench.py (performance gate).

Each QueryDef binds a name to:
- fn(spark, sf_dir) -> DataFrame     — the Spark-first implementation
- sql: str | None                    — DuckDB oracle (None → rows-only)
- bench: bool                        — include in the sf0.1 benchmark

Determinism contract (hash-compare survives engine differences):
- every computed double is round()'ed in BOTH implementations,
- every top-k has a total tie-break order,
- hashing is md5-derived, never JVM/seeded.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: Optional[str]
    bench: bool = False


REGISTRY: Dict[str, QueryDef] = {}


# Gate-level total-order sorts (round-5 determinism sweep). The driver
# gate hash-compares full-precision values, so any difference in row
# arrival order between the Spark plan and the DuckDB oracle must not
# be able to flip the hash. The library operators in ops/ stay
# sort-free — a global ORDER BY over an operator's full output is
# exactly the plan you must NOT ship at 100 TB — so the sorts are
# applied HERE, at the gate boundary, to BOTH implementations:
# register() wraps the Spark query in .orderBy(*keys) and the oracle
# SQL in `SELECT * FROM (...) ORDER BY ... NULLS FIRST` (Spark's
# default sort is asc-nulls-first; DuckDB's default is nulls-LAST, so
# the SQL side pins NULLS FIRST). Keys list EVERY output column, so
# the order is total even where the leading key is not unique; ties
# beyond that are bit-identical rows, which hash the same in any
# order. Queries absent from this table already end in a totally
# tie-broken ORDER BY (+ LIMIT) inside the query body (audited by
# scripts/audit_determinism.py).
GATE_SORT: Dict[str, list] = {
    "q1_pricing_summary": ["l_returnflag", "l_linestatus"],
    "q6_forecast_revenue": ["revenue"],
    "q14_promo_revenue": ["promo_revenue"],
    "w_top_orders_per_customer": ["o_custkey", "rk", "o_orderkey"],
    "w_monthly_running_revenue": ["o_orderpriority", "month"],
    "ev_sessionize": ["user_id"],
    "ev_hourly_rollup": ["hour", "event_type"],
    "ev_props_json": ["event_type"],
    "q4_priority_semijoin": ["o_orderpriority"],
    "q16_supplier_cnt": ["p_brand"],
    "q22_global_sales_opportunity": ["c_nationkey"],
    "q12_priority_lines": ["l_returnflag"],
    "q13_customer_distribution": ["c_count"],
    "q17_small_quantity_revenue": ["p_brand"],
    "q19_disjunctive_revenue": ["p_brand"],
    "q7_volume_shipping": ["supp_nation", "cust_nation", "l_year"],
    "q15_top_supplier": ["s_suppkey"],
    "q2_top_customer_per_nation": ["c_nationkey"],
    "q8_market_share": ["o_year"],
    "q9_product_profit": ["nation", "o_year"],
    "q11_important_parts": ["part_value", "l_partkey"],
    "q20_outsized_promo_suppliers": ["s_suppkey"],
    "doc_exact_dup_stats": ["n_docs"],
    "doc_ngram_jaccard_pairs": ["a_id", "b_id"],
    "doc_minhash_lsh_pairs": ["a_id", "b_id"],
    "doc_fuzzy_edit_pairs": ["a_id", "b_id"],
    "doc_mad_outliers": ["doc_id"],
    "doc_fuzzy_er_clusters": ["component"],
    "doc_simhash_pairs": ["a_id", "b_id"],
    "doc_winnow_overlap_pairs": ["a_id", "b_id"],
    "doc_text_stats": ["lang"],
    "doc_lang_id": ["lang", "pred"],
    "doc_redact_pii": ["doc_id"],
    "doc_boilerplate_removal": ["doc_id"],
    "doc_chunk_dedup_first": ["doc_id"],
    "doc_adaptive_length_filter": ["lang"],
    "doc_ccnet_buckets": ["lang", "bucket"],
    "doc_split_leakage": ["n_train_grams"],
    "doc_stratified_sample": ["doc_id"],
    "doc_tfidf_terms": ["term"],
    "doc_bm25_scores": ["doc_id"],
    "doc_domain_cap": ["doc_id"],
    "doc_salted_stats_join": ["doc_id"],
    "doc_incremental_ingest": ["doc_id"],
    "doc_incremental_neardup": ["doc_id"],
    "doc_pagerank_neardup": ["doc_id"],
    "mm_decode_features": ["doc_id"],
    "mm_frame_sample": ["doc_id", "frame_idx"],
    "mm_image_decode_real": ["doc_id"],
    "mm_jpeg_decode_real": ["doc_id"],
    "mm_gif_decode_real": ["doc_id"],
    "mm_mjpeg_frames_real": ["doc_id", "frame_idx"],
    "mm_g711_decode_real": ["doc_id"],
    "mm_adpcm_decode_real": ["doc_id"],
    "mm_image_thumb_real": ["doc_id"],
    "mm_audio_decode_real": ["doc_id"],
    "mm_video_frames_real": ["doc_id", "frame_idx"],
    "emb_cosine_topk": ["query_id", "rank", "vec_id"],
    "emb_norm_stats": ["label"],
    "emb_ann_lsh_topk": ["query_id", "rank", "vec_id"],
    "emb_cosine_neardup_pairs": ["a_id", "b_id"],
    "emb_cosine_neardup_lsh": ["a_id", "b_id"],
    "emb_ann_indexed_topk": ["query_id", "rank", "vec_id"],
    "emb_ann_ivf_topk": ["query_id", "rank", "vec_id"],
    "doc_bpe_token_stats": ["source"],
    "doc_neardup_components": ["doc_id"],
    "doc_dedup_keep_best": ["component", "kept_doc"],
    "doc_curate_corpus": ["source"],
    "mm_resize_thumbs": ["doc_id"],
    "doc_hash_split_counts": ["source", "split"],
    "emb_quantize_i8_error": ["label"],
    "doc_priority_sample": ["source"],
    "doc_repetition_stats": ["doc_id"],
    "doc_decontaminate": ["doc_id"],
    "doc_countmin_token_counts": ["token"],
    "ev_hll_distinct": ["event_type"],
    "ev_value_histogram_quantiles": ["event_type"],
    "doc_bloom_decontaminate": ["doc_id"],
    "doc_mixture_quota": ["group"],
    "doc_epoch_shuffle": ["doc_id"],
    "doc_bpe_merges": ["step"],
    "doc_bpe_subword_counts": ["doc_id"],
    "doc_pack_sequences": ["seq_id"],
    "doc_dup_spans": ["doc_id"],
    "doc_strip_dup_spans": ["doc_id"],
    "doc_mixture_weights": ["group"],
    "doc_token_entropy": ["doc_id"],
    "doc_dsir_weights": ["doc_id"],
    "doc_quality_logreg": ["doc_id"],
    "doc_chunk_windows": ["doc_id", "chunk_idx"],
    "emb_kmeans_clusters": ["vec_id"],
    "emb_semdedup": ["vec_id"],
    "emb_pq_codes": ["vec_id"],
    "emb_pq_adc_topk": ["query_id", "rank", "vec_id"],
    "emb_pq_adc_bcast_topk": ["query_id", "rank", "vec_id"],
    "emb_ivf_pq_topk": ["query_id", "rank", "vec_id"],
    "emb_source_centroid_drift": ["source"],
    "ev_asof_click_attribution": ["view_id"],
    "ev_asof_global_locf": ["event_id"],
    "ev_range_error_context": ["event_id"],
    "ev_kmv_distinct": ["event_type"],
    "ev_rollup_day_type": ["day", "event_type"],
    "ev_cube_type_day": ["day", "event_type"],
    "ev_interarrival_stats": ["event_type"],
    "ev_retention_cohorts": ["cohort_day", "week_k"],
    "ord_totalprice_percentiles": ["o_orderpriority"],
    "ord_topk_per_status": ["o_orderstatus", "rank", "o_orderkey"],
    "ev_funnel_view_click_purchase": ["n_view"],
    "ev_gapfill_daily_locf": ["key", "day"],
    "doc_unigram_nll": ["doc_id"],
    "doc_stupid_backoff_nll": ["doc_id"],
    "doc_cdc_dedup_stats": ["doc_id"],
    "emb_hard_negatives": ["query_id", "rank"],
    "doc_neardup_decontaminate": ["doc_id"],
    "doc_substring_search": ["pattern", "doc_id"],
    "doc_corpus_report": ["lang", "source"],
    "ev_gapfill_daily_interp": ["key", "day"],
    "ev_ohlc_daily": ["key", "day"],
    "ev_time_weighted_avg": ["key"],
    "delta_scan_prune": ["l_orderkey", "l_linenumber"],
    "delta_time_travel": ["o_orderkey"],
    "delta_changes_feed": ["version"],
    "delta_history": ["version"],
    "delta_merge_upsert": ["c_custkey"],
    "delta_delete": ["o_orderkey"],
    "delta_zorder_prune": ["l_orderkey", "l_partkey", "l_suppkey"],
    "delta_hilbert_prune": ["l_orderkey", "l_partkey", "l_suppkey"],
    "delta_bloom_prune": ["l_orderkey", "l_partkey", "l_linenumber"],
    "delta_column_mapping": ["s_suppkey"],
    "delta_generated_partition": ["o_orderkey"],
    "delta_identity": ["pos"],
    "delta_update": ["s_suppkey"],
    "delta_convert": ["r_regionkey"],
    "delta_schema_evolution": ["s_suppkey"],
    "delta_check_constraint": ["c_custkey"],
    "delta_restore": ["o_orderkey"],
    "delta_cdf_row_level": ["s_suppkey", "commit_version", "change_type"],
    "delta_join_prune": ["l_returnflag"],
    "delta_manifest_read": ["l_orderkey", "l_linenumber"],
    "delta_clone_cow": ["o_orderkey"],
    "delta_dv_delete": ["o_orderkey"],
    "delta_cdf_incremental_agg": ["o_orderstatus"],
    "delta_metadata_aggregates": ["n_rows"],
    "delta_replace_where": ["o_orderstatus"],
    "delta_reorg_purge": ["o_orderkey"],
    "delta_show_partitions": ["o_orderstatus"],
}


def _wrap_sorted(fn, cols):
    def sorted_fn(spark, sf_dir):
        df = fn(spark, sf_dir)
        # Total order over the SAME column list (keys + tie-breaks)
        # the oracle wrapper sorts by — one source, so the two engines
        # can never disagree on tie priority. All asc, nulls first —
        # Spark's default, pinned as NULLS FIRST on the SQL side. A
        # column the list doesn't know about means GATE_COLUMNS is
        # stale: fail loudly here, because silently appending it to
        # only the Spark sort reintroduces the cross-engine tie-order
        # divergence this wrapper exists to eliminate.
        extra = [c for c in df.columns if c not in cols]
        if extra:
            raise ValueError(
                f"GATE_COLUMNS stale for {sorted_fn.__name__}: query "
                f"emits {extra} not in gate sort list {cols} — "
                f"regenerate via scripts/audit_determinism.py --sync")
        return df.orderBy(*cols)
    sorted_fn.__name__ = getattr(fn, "__name__", "query")
    sorted_fn.__doc__ = fn.__doc__
    sorted_fn.__wrapped__ = fn
    return sorted_fn


# Output columns per query (from scripts/audit_determinism.py), used to
# extend the oracle's ORDER BY with the same tie-break columns the
# Spark wrapper appends. Maintained by the audit script; a missing
# entry just means the oracle sorts by the GATE_SORT keys alone.
GATE_COLUMNS: Dict[str, list] = {
    "q1_pricing_summary": ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price", "sum_disc_price", "sum_charge", "avg_qty", "avg_price", "avg_disc", "count_order"],
    "q6_forecast_revenue": ["revenue"],
    "q14_promo_revenue": ["promo_revenue"],
    "w_top_orders_per_customer": ["o_custkey", "o_orderkey", "totalprice", "rk"],
    "w_monthly_running_revenue": ["o_orderpriority", "month", "month_rev", "running_rev"],
    "ev_sessionize": ["user_id", "n_events", "n_sessions"],
    "ev_hourly_rollup": ["hour", "event_type", "n_events", "n_users", "sum_value"],
    "ev_props_json": ["event_type", "avg_k", "max_k", "n"],
    "q4_priority_semijoin": ["o_orderpriority", "order_count"],
    "q16_supplier_cnt": ["p_brand", "supplier_cnt", "line_cnt"],
    "q22_global_sales_opportunity": ["c_nationkey", "numcust", "totacctbal"],
    "q12_priority_lines": ["l_returnflag", "high_line_count", "low_line_count"],
    "q13_customer_distribution": ["c_count", "custdist"],
    "q17_small_quantity_revenue": ["p_brand", "revenue", "n_lines"],
    "q19_disjunctive_revenue": ["p_brand", "revenue"],
    "q7_volume_shipping": ["supp_nation", "cust_nation", "l_year", "revenue"],
    "q15_top_supplier": ["s_suppkey", "s_name", "total_revenue"],
    "q2_top_customer_per_nation": ["c_nationkey", "top_customer", "top_acctbal"],
    "q8_market_share": ["o_year", "nation_volume", "total_volume", "mkt_share"],
    "q9_product_profit": ["nation", "o_year", "sum_profit_e4"],
    "q11_important_parts": ["l_partkey", "part_value"],
    "q20_outsized_promo_suppliers": ["s_suppkey", "s_name", "n_big_parts"],
    "doc_exact_dup_stats": ["n_docs", "n_unique", "n_exact_dups"],
    "doc_ngram_jaccard_pairs": ["a_id", "b_id", "jaccard"],
    "doc_minhash_lsh_pairs": ["a_id", "b_id", "jaccard"],
    "doc_fuzzy_edit_pairs": ["a_id", "b_id", "dist"],
    "doc_mad_outliers": ["doc_id", "source", "n_chars", "group_median", "group_mad", "is_outlier"],
    "doc_fuzzy_er_clusters": ["component", "canonical_doc", "canonical_chars", "n_members"],
    "doc_simhash_pairs": ["a_id", "b_id", "hamming"],
    "doc_winnow_overlap_pairs": ["a_id", "b_id", "shared", "overlap"],
    "doc_text_stats": ["lang", "n_docs", "avg_tokens", "avg_stopword_ratio", "avg_punct_ratio"],
    "doc_lang_id": ["lang", "pred", "n"],
    "doc_redact_pii": ["doc_id", "h"],
    "doc_boilerplate_removal": ["doc_id", "h"],
    "doc_chunk_dedup_first": ["doc_id", "h"],
    "doc_adaptive_length_filter": ["lang", "n_docs", "n_kept", "th"],
    "doc_ccnet_buckets": ["lang", "bucket", "n_docs", "avg_nll"],
    "doc_split_leakage": ["n_train_grams", "n_test_grams", "n_shared", "leak_frac"],
    "doc_stratified_sample": ["doc_id", "lang"],
    "doc_tfidf_terms": ["term", "df", "total_tf", "total_tfidf"],
    "doc_bm25_scores": ["doc_id", "score"],
    "doc_domain_cap": ["doc_id", "source", "n_chars"],
    "doc_salted_stats_join": ["doc_id", "source", "n_docs", "avg_chars"],
    "doc_incremental_ingest": ["doc_id", "source"],
    "doc_incremental_neardup": ["doc_id", "source"],
    "doc_pagerank_neardup": ["doc_id", "pr"],
    "mm_decode_features": ["doc_id", "kind", "n_bytes", "width", "height", "n_frames"],
    "mm_frame_sample": ["doc_id", "frame_idx", "frame_off"],
    "mm_image_decode_real": ["doc_id", "fmt", "width", "height",
                             "channels", "pix_sum", "pix_xsum"],
    "mm_jpeg_decode_real": ["doc_id", "fmt", "width", "height",
                            "channels", "pix_sum", "pix_xsum"],
    "mm_gif_decode_real": ["doc_id", "fmt", "width", "height",
                           "channels", "pix_sum", "pix_xsum"],
    "mm_image_thumb_real": ["doc_id", "tw", "th", "thumb_sum",
                            "thumb_xsum"],
    "mm_audio_decode_real": ["doc_id", "sample_rate", "channels",
                             "n_samples", "amp_sum", "amp_sq_sum",
                             "amp_xsum"],
    "mm_g711_decode_real": ["doc_id", "sample_rate", "channels",
                            "n_samples", "amp_sum", "amp_sq_sum",
                            "amp_xsum"],
    "mm_adpcm_decode_real": ["doc_id", "sample_rate", "channels",
                            "n_samples", "amp_sum", "amp_sq_sum",
                            "amp_xsum"],
    "mm_video_frames_real": ["doc_id", "frame_idx", "width", "height",
                             "pix_sum", "pix_xsum"],
    "mm_mjpeg_frames_real": ["doc_id", "frame_idx", "width", "height",
                             "pix_sum", "pix_xsum"],
    "emb_cosine_topk": ["query_id", "vec_id", "sim", "rank"],
    "emb_norm_stats": ["label", "n_vectors", "avg_norm", "min_norm", "max_norm"],
    "emb_ann_lsh_topk": ["query_id", "vec_id", "sim", "rank"],
    "emb_cosine_neardup_pairs": ["a_id", "b_id", "sim"],
    "emb_cosine_neardup_lsh": ["a_id", "b_id", "sim"],
    "emb_ann_indexed_topk": ["query_id", "vec_id", "sim", "rank"],
    "emb_ann_ivf_topk": ["query_id", "vec_id", "sim", "rank"],
    "doc_bpe_token_stats": ["source", "n_docs", "n_tokens", "n_distinct", "avg_tokens_per_doc"],
    "doc_neardup_components": ["doc_id", "component"],
    "doc_dedup_keep_best": ["component", "kept_doc", "kept_toks", "n_members"],
    "doc_curate_corpus": ["source", "n_input", "n_exact_kept", "n_neardup_kept", "n_final"],
    "mm_resize_thumbs": ["doc_id", "width", "height", "thumb_md5"],
    "doc_hash_split_counts": ["source", "split", "n"],
    "emb_quantize_i8_error": ["label", "n_vectors", "max_norm_err", "avg_norm_err"],
    "doc_priority_sample": ["source", "n_sampled", "sampled_weight"],
    "doc_repetition_stats": ["doc_id", "n_tok", "top2_frac", "dup2_frac", "top3_frac", "dup3_frac", "keep"],
    "doc_decontaminate": ["doc_id", "n_shared_ngrams", "n_eval_docs"],
    "doc_pack_sequences": ["seq_id", "n_docs", "n_tokens_started", "n_crossing"],
    "doc_dup_spans": ["doc_id", "n_tok", "n_dup_grams", "covered_tokens", "dup_frac"],
    "doc_strip_dup_spans": ["doc_id", "h"],
    "doc_mixture_weights": ["group", "n_docs", "weight", "expected_docs"],
    "doc_token_entropy": ["doc_id", "n_tok", "entropy"],
    "doc_chunk_windows": ["doc_id", "chunk_idx", "chunk_text", "n_tokens"],
    "emb_kmeans_clusters": ["vec_id", "cluster", "dist"],
    "emb_semdedup": ["vec_id", "cluster", "dropped"],
    "emb_pq_codes": ["vec_id", "code_0", "code_1", "code_2", "code_3", "err"],
    "emb_pq_adc_topk": ["query_id", "vec_id", "adist", "rank"],
    "emb_pq_adc_bcast_topk": ["query_id", "vec_id", "adist", "rank"],
    "emb_ivf_pq_topk": ["query_id", "vec_id", "adist", "rank"],
    "emb_source_centroid_drift": ["source", "n_vectors", "avg_sim", "min_sim"],
    "doc_countmin_token_counts": ["token", "exact_n", "cm_est"],
    "ev_hll_distinct": ["event_type", "n_exact", "hll_est",
                        "n_zero_regs"],
    "doc_bloom_decontaminate": ["doc_id", "n_grams", "n_bloom_hits"],
    "doc_mixture_quota": ["group", "n_docs", "quota"],
    "doc_epoch_shuffle": ["doc_id", "pos"],
    "doc_bpe_merges": ["step", "left", "right", "pair_freq"],
    "doc_bpe_subword_counts": ["doc_id", "n_words", "n_subwords"],
    "ev_value_histogram_quantiles": ["event_type", "n_values", "p50_est",
                                     "p90_est", "p99_est"],
    "delta_cdf_incremental_agg": ["o_orderstatus", "n_orders",
                                  "sum_total"],
    "delta_metadata_aggregates": ["n_rows", "min_o_orderkey",
                                  "max_o_orderkey", "min_price",
                                  "max_price"],
    "delta_replace_where": ["o_orderstatus", "n_orders", "sum_keys"],
    "ev_asof_click_attribution": ["view_id", "user_id", "click_id", "gap_us"],
    "ev_asof_global_locf": ["event_id", "gap_us", "pv"],
    "ev_range_error_context": ["event_id", "user_id", "n_following", "sum_value"],
    "ev_kmv_distinct": ["event_type", "n_exact", "kmv_est"],
    "ev_rollup_day_type": ["day", "event_type", "n_events", "sum_value"],
    "ev_cube_type_day": ["day", "event_type", "n_events", "sum_value"],
    "ev_interarrival_stats": ["event_type", "n_gaps", "min_gap_us", "max_gap_us", "mean_gap_us"],
    "ev_retention_cohorts": ["cohort_day", "week_k", "n_users"],
    "ord_totalprice_percentiles": ["o_orderpriority", "p50", "p95"],
    "ord_topk_per_status": ["o_orderstatus", "o_orderkey", "totalprice", "rank"],
    "ev_funnel_view_click_purchase": ["n_view", "n_view_click", "n_full_funnel", "mean_convert_us"],
    "ev_gapfill_daily_locf": ["key", "day", "value", "filled"],
    "doc_unigram_nll": ["doc_id", "n_tok", "nll"],
    "doc_stupid_backoff_nll": ["doc_id", "n_tok", "sb_nll",
                               "n_backoff"],
    "doc_cdc_dedup_stats": ["doc_id", "n_chunks", "dup_chunks",
                            "n_tok", "dup_tok", "dup_token_ratio"],
    "emb_hard_negatives": ["query_id", "vec_id", "neg_group", "sim",
                           "rank"],
    "doc_neardup_decontaminate": ["doc_id", "n_eval_matches",
                                  "max_jaccard"],
    "doc_substring_search": ["pattern", "doc_id", "n_occurrences"],
    "doc_corpus_report": ["lang", "source", "n_docs", "n_tokens",
                          "avg_len", "min_len", "max_len",
                          "n_exact_dups", "n_types", "ttr"],
    "doc_dsir_weights": ["doc_id", "n_feat", "logw"],
    "doc_quality_logreg": ["doc_id", "score", "pred"],
    "ev_gapfill_daily_interp": ["key", "day", "value", "filled"],
    "ev_ohlc_daily": ["key", "day", "open", "high", "low", "close", "n"],
    "ev_time_weighted_avg": ["key", "twa", "span_us", "n"],
    "delta_scan_prune": ["l_discount", "l_extendedprice", "l_linenumber", "l_linestatus", "l_orderkey", "l_partkey", "l_quantity", "l_returnflag", "l_shipdate", "l_suppkey", "l_tax"],
    "delta_time_travel": ["o_orderkey", "o_custkey", "o_orderstatus", "totalprice", "o_orderdate", "o_orderpriority"],
    "delta_changes_feed": ["version", "n_rows"],
    "delta_history": ["version", "operation"],
    "delta_merge_upsert": ["c_custkey", "acctbal"],
    "delta_delete": ["o_orderkey", "totalprice"],
    "delta_zorder_prune": ["l_orderkey", "l_partkey", "l_suppkey", "extendedprice"],
    "delta_hilbert_prune": ["l_orderkey", "l_partkey", "l_suppkey", "extendedprice"],
    "delta_bloom_prune": ["l_orderkey", "l_partkey", "l_linenumber", "extendedprice"],
    "delta_column_mapping": ["s_suppkey", "s_name", "balance"],
    "delta_generated_partition": ["o_orderkey", "o_custkey", "o_year", "totalprice"],
    "delta_identity": ["pos", "uid"],
    "delta_update": ["s_suppkey", "s_name", "acctbal"],
    "delta_convert": ["r_regionkey", "n"],
    "delta_schema_evolution": ["s_suppkey", "s_name", "acctbal"],
    "delta_check_constraint": ["c_custkey", "acctbal"],
    "delta_restore": ["o_orderkey", "o_custkey", "totalprice"],
    "delta_cdf_row_level": ["s_suppkey", "acctbal", "change_type", "commit_version"],
    "delta_join_prune": ["l_returnflag", "n", "sum_price"],
    "delta_manifest_read": ["l_discount", "l_extendedprice", "l_linenumber", "l_linestatus", "l_orderkey", "l_partkey", "l_quantity", "l_returnflag", "l_shipdate", "l_suppkey", "l_tax"],
    "delta_clone_cow": ["o_orderkey", "o_custkey", "o_orderstatus", "totalprice", "o_orderdate"],
    "delta_dv_delete": ["o_orderkey", "o_custkey", "o_orderstatus", "totalprice", "o_orderdate"],
    "delta_reorg_purge": ["o_orderkey", "o_custkey", "o_orderstatus", "totalprice", "o_orderdate"],
    "delta_show_partitions": ["o_orderstatus"],
}


def register(name: str, sql: Optional[str], bench: bool = False):
    def deco(fn):
        keys = GATE_SORT.get(name)
        if keys:
            # ONE ordered column list feeds BOTH sides (finding from
            # the r5 self-review: deriving Spark's tie-breaks from
            # df.columns while the oracle used GATE_COLUMNS left two
            # unsynchronized orders).
            cols = list(keys) + [
                c for c in GATE_COLUMNS.get(name, []) if c not in keys]
            gate_fn = _wrap_sorted(fn, cols)
            gate_sql = sql
            if sql is not None:
                order = ", ".join(f'"{k}" NULLS FIRST' for k in cols)
                gate_sql = (f"SELECT * FROM (\n{sql}\n) __q "
                            f"ORDER BY {order}")
            REGISTRY[name] = QueryDef(name, gate_fn, gate_sql, bench)
        else:
            REGISTRY[name] = QueryDef(name, fn, sql, bench)
        return fn
    return deco


# The driver's correctness gate samples the FIRST 50 names from
# queries(); with 135 registered queries, insertion order alone would
# leave most operators riding on stale driver evidence forever. Rounds
# 3-7 rotated the sample by hand-maintained frozensets — which needed
# editing every round and would eventually mis-rotate. The ordering is
# now computed from the evidence itself: the CORRECTNESS_r*.json files
# checked in at the repo root ARE the record of which query was driver-
# verified in which round, so sort oldest-evidence-first:
#   0. never driver-recorded (new operators) — most urgent,
#   1. latest record is RED (a fix needs re-recording),
#   2. everything else, stalest latest-green round first,
# ties broken by registry insertion order. Every registry query is
# still verified every round by tests/harness.py over the full set;
# this only chooses which 50 rows land in the driver's record.

def _load_evidence(root=None) -> Dict[str, tuple]:
    """name -> (latest_round, latest_row_green) from CORRECTNESS_r*.json."""
    import glob
    import json
    import os
    import re
    if root is None:
        root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
    evidence: Dict[str, tuple] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                rec = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(rec, dict):
            continue
        for name, row in rec.items():
            green = (isinstance(row, dict)
                     and row.get("rows_match") is True
                     and row.get("schema_match") is not False
                     and row.get("hash_match") is not False
                     and row.get("err") in (None, ""))
            prev = evidence.get(name)
            if prev is None or rnd > prev[0]:
                evidence[name] = (rnd, green)
    return evidence


def _evidence_order(names, evidence) -> list:
    """Pure ordering: unrecorded first, then latest-red, then stalest."""
    def key(n):
        ev = evidence.get(n)
        if ev is None:
            return (0, 0, names.index(n))
        rnd, green = ev
        if not green:
            return (1, rnd, names.index(n))
        return (2, rnd, names.index(n))
    return sorted(names, key=key)


def ordered_names() -> list:
    return _evidence_order(list(REGISTRY), _load_evidence())


def _epoch_divisor_to_micros(sf_dir: str) -> int:
    """Divisor turning events.ts int64 epochs into MICROseconds.

    Returns the value to feed `ts div N` (negative → multiply, see
    load()). A raw-long ts column is nanos when the parquet logical
    type says so (Spark's legacy.parquet.nanosAsLong path); a plain
    INT64 with no logical annotation could be any unit, so fall back to
    the value magnitude. Current-date epochs are ~1.7e18 ns, ~1.7e15 µs,
    ~1.7e12 ms — three orders apart each, unambiguous bands. An
    unrecognized magnitude raises instead of silently shifting every
    timestamp to ~1970."""
    import pyarrow.parquet as pq
    import pyarrow as pa
    schema = pq.read_schema(f"{sf_dir}/events.parquet")
    t = schema.field("ts").type
    if pa.types.is_timestamp(t):
        return {"ns": 1000, "us": 1, "ms": -1000}.get(t.unit, 1000)
    head = pq.ParquetFile(f"{sf_dir}/events.parquet").read_row_group(
        0, columns=["ts"]).column("ts")[0].as_py()
    if isinstance(head, int):
        mag = abs(head)
        if mag > 10**17:
            return 1000       # nanos → micros
        if mag > 10**14:
            return 1          # already micros
        if mag > 10**11:
            return -1000      # millis → micros (multiply)
        raise ValueError(
            f"events.ts int64 magnitude {head} matches no epoch unit "
            "(expected ns/us/ms for current dates)")
    return 1000


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read one testdata table; pin session timezone to UTC so
    timestamp semantics match the (timezone-naive) DuckDB oracle.

    events.ts has shipped as either parquet TIMESTAMP(MICROS) (read
    natively) or TIMESTAMP(NANOS) (Spark reads as raw long under
    legacy.parquet.nanosAsLong — truncate to micros, identical to
    DuckDB's nanos→micros truncation for positive epochs). Handle both
    so testdata regeneration can't break every events query."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    if table == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            div = _epoch_divisor_to_micros(sf_dir)
            expr = f"ts div {div}" if div > 0 else f"ts * {-div}"
            df = df.withColumn("ts", F.timestamp_micros(F.expr(expr)))
        elif isinstance(ts_type, T.TimestampNTZType):
            # normalize to TIMESTAMP (UTC session) so downstream
            # window/watermark ops behave uniformly across variants
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


# Importing the suite modules populates REGISTRY.
from . import relational   # noqa: E402,F401
from . import pipeline     # noqa: E402,F401
from . import temporal     # noqa: E402,F401
from . import delta_demo   # noqa: E402,F401
from . import streaming_demo  # noqa: E402,F401
