"""Registry of LLM-pipeline operator queries (driver contract entries)."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from . import dedup, langid, multimodal, relational, similarity, text


@dataclass
class OpSpec:
    name: str
    run: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None -> rows-only check


SPECS: list[OpSpec] = [
    OpSpec("op_dedup_exact", dedup.dedup_exact, dedup.DEDUP_EXACT_SQL),
    # chunk-level boilerplate removal: hot chunks absorbed by map-side
    # partial aggregation; survivor texts rebuilt from the distinct-chunk
    # keeper frame, never a join back to raw occurrences
    OpSpec("op_chunk_dedup", dedup.chunk_dedup, dedup.CHUNK_DEDUP_SQL),
    # streaming twin: intake-time boilerplate filter via
    # dropDuplicatesWithinWatermark on the chunk hash (one state row per
    # distinct chunk, arrival-order-independent surviving hash set)
    OpSpec(
        "op_chunk_dedup_stream",
        dedup.chunk_dedup_stream_hashes,
        dedup.CHUNK_STREAM_SQL,
    ),
    # sliding-window exact-substring dedup: marked spans union per doc
    # (the chunk op above is its non-overlapping approximation)
    OpSpec("op_span_dedup", dedup.span_dedup, dedup.SPAN_DEDUP_SQL),
    # streaming twin: first-arrival sliding-gram filter, ~k x the chunk
    # twin's state rows (RocksDB provider regime, rollup.py docstring)
    OpSpec(
        "op_span_dedup_stream",
        dedup.span_dedup_stream_hashes,
        dedup.SPAN_STREAM_SQL,
    ),
    OpSpec("op_token_count", text.token_count, text.TOKEN_COUNT_SQL),
    OpSpec("op_token_count_bpe", text.token_count_bpe, text.TOKEN_COUNT_BPE_SQL),
    OpSpec("op_quality_score", text.quality_score, text.QUALITY_SCORE_SQL),
    OpSpec("op_lang_source_stats", text.lang_source_stats, text.LANG_SOURCE_STATS_SQL),
    OpSpec("op_doc_fingerprint", text.doc_fingerprint, text.DOC_FINGERPRINT_SQL),
    OpSpec("op_corpus_clean", text.corpus_clean, text.CORPUS_CLEAN_SQL),
    OpSpec("op_token_mix", text.token_mix, text.TOKEN_MIX_SQL),
    OpSpec("op_decontaminate", text.decontaminate, text.DECONTAMINATE_SQL),
    OpSpec("op_stratified_sample", text.stratified_sample, text.STRATIFIED_SAMPLE_SQL),
    OpSpec("op_hash_split", text.hash_split, text.HASH_SPLIT_SQL),
    OpSpec("op_quality_deciles", text.quality_deciles, text.QUALITY_DECILES_SQL),
    OpSpec("op_sessionize", text.sessionize, text.SESSIONIZE_SQL),
    OpSpec("op_pii_scrub", text.pii_scrub, text.PII_SCRUB_SQL),
    OpSpec("op_repetition_ratio", text.repetition_ratio, text.REPETITION_RATIO_SQL),
    OpSpec("op_unigram_logprob", text.unigram_logprob, text.UNIGRAM_LOGPROB_SQL),
    OpSpec("op_ngram_topk", text.ngram_topk, text.NGRAM_TOPK_SQL),
    OpSpec("op_tfidf_topk", text.tfidf_topk, text.TFIDF_TOPK_SQL),
    OpSpec("op_bm25_topk", text.bm25_topk, text.BM25_TOPK_SQL),
    OpSpec("op_length_histogram", text.length_histogram, text.LENGTH_HISTOGRAM_SQL),
    OpSpec("op_domain_mix", text.domain_mix, text.DOMAIN_MIX_SQL),
    OpSpec("op_asof_join", text.asof_join, text.ASOF_JOIN_SQL),
    OpSpec("op_text_normalize", text.text_normalize, text.TEXT_NORMALIZE_SQL),
    OpSpec("op_seq_pack", text.seq_pack, text.SEQ_PACK_SQL),
    OpSpec("op_cosine_topk", similarity.cosine_topk, similarity.cosine_topk_sql()),
    OpSpec("op_ngram_jaccard", dedup.ngram_jaccard_pairs, dedup.NGRAM_JACCARD_SQL),
    OpSpec(
        "op_cross_split_contamination",
        dedup.cross_split_contamination,
        dedup.CROSS_SPLIT_CONTAMINATION_SQL,
    ),
    # Set-equality vs the exact all-pairs oracle rests on 24x2 banding
    # having recall 1.0 over the CURRENT deterministic corpus (an
    # empirical property, not a guarantee: P[miss] = (1-j^2)^24 per pair).
    # tests/test_plans.py::test_minhash_recall_on_planted_dups pins the
    # property on planted near-dups so a corpus/banding change that
    # breaks it fails loudly instead of silently losing pairs.
    OpSpec("op_minhash_candidates", dedup.minhash_lsh_candidates, dedup.MINHASH_CANDIDATES_SQL),
    # the STREAMING twin driven end-to-end (bounded replay through the
    # windowed capped banding + pair dedup, then the same exact verify),
    # value-gated against the same exact all-pairs oracle
    OpSpec("op_minhash_stream", dedup.minhash_stream_candidates, dedup.MINHASH_CANDIDATES_SQL),
    # streaming exact-dedup twin: survivor hash set (arrival-order
    # independent), driven through dropDuplicatesWithinWatermark
    OpSpec("op_dedup_stream", dedup.dedup_stream_hashes, dedup.DEDUP_STREAM_SQL),
    # VERIFIED streaming twin: candidate stream + stream-static jaccard
    # verify against the landed shingle table, value-gated (incl. the
    # jaccard value) against the batch exact all-pairs SQL
    OpSpec(
        "op_minhash_verified_stream",
        dedup.minhash_verified_stream_pairs,
        dedup.NGRAM_JACCARD_SQL,
    ),
    # degenerate-bucket drop accounting (low cap so the over-cap branch
    # is value-exercised at driver scale, not dead-zero)
    OpSpec("op_lsh_bucket_stats", dedup.lsh_bucket_stats, dedup.LSH_BUCKET_STATS_SQL),
    OpSpec("op_simhash", dedup.simhash, dedup.SIMHASH_SQL),
    OpSpec("op_dedup_clusters", dedup.dedup_clusters, dedup.DEDUP_CLUSTERS_SQL),
    OpSpec("op_dedup_reduction", dedup.dedup_reduction, dedup.DEDUP_REDUCTION_SQL),
    OpSpec("op_dedup_keep_best", dedup.dedup_keep_best, dedup.DEDUP_KEEP_BEST_SQL),
    OpSpec("op_lsh_precision", dedup.lsh_precision, dedup.LSH_PRECISION_SQL),
    OpSpec("op_source_overlap", dedup.source_overlap, dedup.SOURCE_OVERLAP_SQL),
    OpSpec("op_emb_outliers", similarity.emb_outliers, similarity.EMB_OUTLIERS_SQL),
    OpSpec("op_curation_funnel", text.curation_funnel, dedup.CURATION_FUNNEL_SQL),
    OpSpec("op_media_features", multimodal.extract_media_features, multimodal.EXTRACT_MEDIA_SQL),
    OpSpec("op_frame_sample", multimodal.frame_sample, multimodal.FRAME_SAMPLE_SQL),
    OpSpec("op_media_resize", multimodal.resize_media_query, multimodal.RESIZE_MEDIA_SQL),
    OpSpec("op_lsh_topk", similarity.lsh_bucketed_topk, similarity.LSH_TOPK_SQL),
    # the fitted-KMeans IVF is driver-checked via its recall property
    # (the quantizer is not SQL-reproducible; the raw top-k runner stays
    # the library/test surface, similarity.ivf_topk)
    OpSpec("op_ivf_topk", similarity.ivf_recall, similarity.IVF_RECALL_SQL),
    OpSpec(
        "op_ivf_topk_det",
        similarity.ivf_topk_deterministic,
        similarity.IVF_TOPK_DET_SQL,
    ),
    OpSpec("op_lang_id", langid.lang_id, langid.lang_id_sql()),
    OpSpec("op_lang_confusion", langid.lang_confusion, langid.lang_confusion_sql()),
    OpSpec("op_emb_near_dup", similarity.embedding_near_dup, similarity.embedding_near_dup_sql()),
    OpSpec(
        "op_emb_near_dup_strict",
        similarity.embedding_near_dup_strict,
        similarity.embedding_near_dup_sql(threshold=0.85),
    ),
    OpSpec("op_semantic_dedup", similarity.semantic_dedup, similarity.SEMANTIC_DEDUP_SQL),
    OpSpec("op_knn_join", similarity.knn_join, similarity.KNN_JOIN_SQL),
    OpSpec("op_pq_topk", similarity.pq_topk, similarity.PQ_TOPK_SQL),
    OpSpec("op_pq_recall", similarity.pq_recall, similarity.PQ_RECALL_SQL),
    OpSpec("op_random_projection", similarity.random_projection, similarity.RANDOM_PROJECTION_SQL),
    OpSpec("op_cluster_purity", similarity.cluster_purity, similarity.CLUSTER_PURITY_SQL),
    OpSpec("rel_pricing_summary", relational.pricing_summary, relational.PRICING_SUMMARY_SQL),
    OpSpec("rel_revenue_by_nation", relational.revenue_by_nation, relational.REVENUE_BY_NATION_SQL),
    OpSpec("rel_top_customers", relational.top_customers, relational.TOP_CUSTOMERS_SQL),
    OpSpec("rel_order_priority", relational.order_priority_counts, relational.ORDER_PRIORITY_SQL),
    OpSpec("rel_shipping_priority", relational.shipping_priority, relational.SHIPPING_PRIORITY_SQL),
    OpSpec("rel_part_supplier", relational.part_supplier_stats, relational.PART_SUPPLIER_SQL),
    OpSpec("rel_priority_shipments", relational.priority_shipments, relational.PRIORITY_SHIPMENTS_SQL),
    OpSpec("rel_promo_share", relational.promo_revenue_share, relational.PROMO_REVENUE_SHARE_SQL),
    OpSpec("rel_bracket_revenue", relational.bracket_revenue, relational.BRACKET_REVENUE_SQL),
    OpSpec("rel_forecast_revenue", relational.forecast_revenue, relational.FORECAST_REVENUE_SQL),
    OpSpec("rel_volume_shipping", relational.volume_shipping, relational.VOLUME_SHIPPING_SQL),
    OpSpec("rel_market_share", relational.market_share, relational.MARKET_SHARE_SQL),
    OpSpec("rel_returned_items", relational.returned_items, relational.RETURNED_ITEMS_SQL),
    OpSpec("rel_order_count_dist", relational.order_count_distribution, relational.ORDER_COUNT_DIST_SQL),
    OpSpec("rel_small_qty_revenue", relational.small_qty_revenue, relational.SMALL_QTY_REVENUE_SQL),
    OpSpec("rel_large_orders", relational.large_orders, relational.LARGE_ORDERS_SQL),
    OpSpec("rel_idle_customers", relational.idle_customers, relational.IDLE_CUSTOMERS_SQL),
    OpSpec("rel_top_supplier", relational.top_supplier, relational.TOP_SUPPLIER_SQL),
    OpSpec("rel_product_profit", relational.product_profit, relational.PRODUCT_PROFIT_SQL),
    OpSpec(
        "rel_supplier_part_counts",
        relational.supplier_part_counts,
        relational.SUPPLIER_PART_COUNTS_SQL,
    ),
    OpSpec(
        "rel_waiting_suppliers",
        relational.waiting_suppliers,
        relational.WAITING_SUPPLIERS_SQL,
    ),
    OpSpec(
        "rel_min_cost_supplier",
        relational.min_cost_supplier,
        relational.MIN_COST_SUPPLIER_SQL,
    ),
    OpSpec("rel_important_stock", relational.important_stock, relational.IMPORTANT_STOCK_SQL),
    OpSpec(
        "rel_excess_volume",
        relational.excess_volume_suppliers,
        relational.EXCESS_VOLUME_SUPPLIERS_SQL,
    ),
]
