"""Query registry: name -> callable(spark, sf_dir) -> DataFrame.

Single source of truth consumed by __spark_entry__.queries(), the
pytest suite, and bench.py.  Each entry has a DuckDB oracle twin in
``oracles.SQL`` (same name, same column aliases) unless it is listed
in ``NO_ORACLE`` (non-SQL-expressible ops get the driver's weaker
rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .operators import analytics, dedup, pipeline, similarity, text, voting
from .operators import inference, multimodal
from .sources import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_DEFS: dict[str, QueryFn] = {
    # --- voting-domain core (SURVEY §2 #1-13) ---
    "votes_per_candidate": lambda s, d: voting.votes_per_candidate(_t(s, d, "events")),
    "turnout_by_location": lambda s, d: voting.turnout_by_location(
        _t(s, d, "events"), _t(s, d, "customer"), _t(s, d, "nation")
    ),
    "turnout_by_region": lambda s, d: voting.turnout_by_region(
        _t(s, d, "events"), _t(s, d, "customer"), _t(s, d, "nation"), _t(s, d, "region")
    ),
    "turnout_by_segment": lambda s, d: voting.turnout_by_segment(
        _t(s, d, "events"), _t(s, d, "customer")
    ),
    "votes_per_candidate_hourly": lambda s, d: voting.votes_per_candidate_hourly(
        _t(s, d, "events")
    ),
    "one_vote_per_voter": lambda s, d: voting.one_vote_per_voter(_t(s, d, "events")),
    "votes_enriched": lambda s, d: voting.votes_enriched(
        _t(s, d, "events"), _t(s, d, "customer"), _t(s, d, "nation")
    ),
    "election_winner": lambda s, d: voting.election_winner(_t(s, d, "events")),
    "leading_candidate_per_hour": lambda s, d: voting.leading_candidate_per_hour(
        _t(s, d, "events")
    ),
    "voter_registration_stats": lambda s, d: voting.voter_registration_stats(
        _t(s, d, "customer"), _t(s, d, "nation"), _t(s, d, "region")
    ),
    "votes_value_stats": lambda s, d: voting.votes_value_stats(_t(s, d, "events")),
    "invalid_vote_rate": lambda s, d: voting.invalid_vote_rate(
        _t(s, d, "events"), _t(s, d, "customer"), _t(s, d, "nation")
    ),
    "events_json_props": lambda s, d: voting.events_json_props(_t(s, d, "events")),
    "unique_voters_per_candidate": lambda s, d: voting.unique_voters_per_candidate(
        _t(s, d, "events")
    ),
    "votes_sessionized": lambda s, d: voting.votes_sessionized(_t(s, d, "events")),
    "cumulative_daily_votes": lambda s, d: voting.cumulative_daily_votes(
        _t(s, d, "events")
    ),
    "votes_minute_rate": lambda s, d: voting.votes_minute_rate(_t(s, d, "events")),
    "voter_profile": lambda s, d: voting.voter_profile(_t(s, d, "events")),
    "vote_weight_percentiles": lambda s, d: voting.vote_weight_percentiles(
        _t(s, d, "events")
    ),
    "turnout_rollup": lambda s, d: voting.turnout_rollup(
        _t(s, d, "events"), _t(s, d, "customer"), _t(s, d, "nation"), _t(s, d, "region")
    ),
    "vote_interarrival": lambda s, d: voting.vote_interarrival(_t(s, d, "events")),
    "registered_non_voters": lambda s, d: voting.registered_non_voters(
        _t(s, d, "events"), _t(s, d, "customer"), _t(s, d, "nation")
    ),
    "party_vote_share": lambda s, d: voting.party_vote_share(_t(s, d, "events")),
    "candidate_hourly_pivot": lambda s, d: voting.candidate_hourly_pivot(
        _t(s, d, "events")
    ),
    "votes_cube": lambda s, d: voting.votes_cube(
        _t(s, d, "events"), _t(s, d, "customer"), _t(s, d, "nation")
    ),
    "voter_value_quartiles": lambda s, d: voting.voter_value_quartiles(
        _t(s, d, "events")
    ),
    "votes_asof_prior_click": lambda s, d: voting.votes_asof_prior_click(
        _t(s, d, "events")
    ),
    "lapsed_voters": lambda s, d: voting.lapsed_voters(
        _t(s, d, "events"), _t(s, d, "customer"), _t(s, d, "nation")
    ),
    "votes_in_launch_windows": lambda s, d: voting.votes_in_launch_windows(
        _t(s, d, "events")
    ),
    "votes_approx_stats": lambda s, d: voting.votes_approx_stats(_t(s, d, "events")),
    # --- general analytics (SURVEY §2 #14-20) ---
    "q1_pricing_summary": lambda s, d: analytics.q1_pricing_summary(_t(s, d, "lineitem")),
    "q3_shipping_priority": lambda s, d: analytics.q3_shipping_priority(
        _t(s, d, "customer"), _t(s, d, "orders"), _t(s, d, "lineitem")
    ),
    "q5_regional_revenue": lambda s, d: analytics.q5_regional_revenue(
        _t(s, d, "region"), _t(s, d, "nation"), _t(s, d, "customer"),
        _t(s, d, "supplier"), _t(s, d, "orders"), _t(s, d, "lineitem"),
    ),
    "top_brand_revenue": lambda s, d: analytics.top_brand_revenue(
        _t(s, d, "lineitem"), _t(s, d, "part")
    ),
    "customer_top_orders": lambda s, d: analytics.customer_top_orders(_t(s, d, "orders")),
    "order_priority_count": lambda s, d: analytics.order_priority_count(
        _t(s, d, "orders"), _t(s, d, "lineitem")
    ),
    "nation_acctbal": lambda s, d: analytics.nation_acctbal(
        _t(s, d, "customer"), _t(s, d, "nation")
    ),
    "supplier_nation_revenue": lambda s, d: analytics.supplier_nation_revenue(
        _t(s, d, "lineitem"), _t(s, d, "supplier"), _t(s, d, "nation")
    ),
    "small_quantity_revenue": lambda s, d: analytics.small_quantity_revenue(
        _t(s, d, "lineitem"), _t(s, d, "part")
    ),
    "large_volume_orders": lambda s, d: analytics.large_volume_orders(
        _t(s, d, "orders"), _t(s, d, "lineitem")
    ),
    "q7_nation_volume": lambda s, d: analytics.q7_nation_volume(
        _t(s, d, "nation"), _t(s, d, "customer"), _t(s, d, "supplier"),
        _t(s, d, "orders"), _t(s, d, "lineitem"),
    ),
    "q10_returned_items": lambda s, d: analytics.q10_returned_items(
        _t(s, d, "customer"), _t(s, d, "orders"), _t(s, d, "lineitem"),
        _t(s, d, "nation"),
    ),
    "q6_forecast_revenue": lambda s, d: analytics.q6_forecast_revenue(
        _t(s, d, "lineitem")
    ),
    "q8_market_share": lambda s, d: analytics.q8_market_share(
        _t(s, d, "region"), _t(s, d, "nation"), _t(s, d, "customer"),
        _t(s, d, "supplier"), _t(s, d, "orders"), _t(s, d, "lineitem"),
    ),
    "q12_ship_lag_priority": lambda s, d: analytics.q12_ship_lag_priority(
        _t(s, d, "orders"), _t(s, d, "lineitem")
    ),
    "q13_customer_distribution": lambda s, d: analytics.q13_customer_distribution(
        _t(s, d, "customer"), _t(s, d, "orders")
    ),
    "q14_promo_revenue": lambda s, d: analytics.q14_promo_revenue(
        _t(s, d, "lineitem"), _t(s, d, "part")
    ),
    "q15_top_supplier": lambda s, d: analytics.q15_top_supplier(
        _t(s, d, "supplier"), _t(s, d, "lineitem")
    ),
    "q16_part_supplier_counts": lambda s, d: analytics.q16_part_supplier_counts(
        _t(s, d, "supplier"), _t(s, d, "part"), _t(s, d, "lineitem")
    ),
    "q19_disjunctive_revenue": lambda s, d: analytics.q19_disjunctive_revenue(
        _t(s, d, "lineitem"), _t(s, d, "part")
    ),
    "q22_idle_rich_customers": lambda s, d: analytics.q22_idle_rich_customers(
        _t(s, d, "customer"), _t(s, d, "orders")
    ),
    "q2_min_cost_supplier": lambda s, d: analytics.q2_min_cost_supplier(
        _t(s, d, "region"), _t(s, d, "nation"), _t(s, d, "supplier"),
        _t(s, d, "part"), _t(s, d, "lineitem")
    ),
    "q11_important_stock": lambda s, d: analytics.q11_important_stock(
        _t(s, d, "region"), _t(s, d, "nation"), _t(s, d, "supplier"),
        _t(s, d, "lineitem")
    ),
    "q20_excess_suppliers": lambda s, d: analytics.q20_excess_suppliers(
        _t(s, d, "nation"), _t(s, d, "supplier"), _t(s, d, "part"),
        _t(s, d, "lineitem")
    ),
    "q21_waiting_suppliers": lambda s, d: analytics.q21_waiting_suppliers(
        _t(s, d, "nation"), _t(s, d, "supplier"), _t(s, d, "orders"),
        _t(s, d, "lineitem")
    ),
    # --- LLM-training-data pipeline (SURVEY §2 #21-32) ---
    "dedup_exact": lambda s, d: dedup.dedup_exact(_t(s, d, "documents")),
    "dedup_simhash_pairs": lambda s, d: dedup.dedup_simhash_pairs(
        _t(s, d, "documents")
    ),
    "tfidf_top_terms": lambda s, d: text.tfidf_top_terms(_t(s, d, "documents")),
    "text_c4_filters": lambda s, d: text.text_c4_filters(_t(s, d, "documents")),
    "embedding_norm_outliers": lambda s, d: similarity.embedding_norm_outliers(
        _t(s, d, "embeddings")
    ),
    "dedup_minhash_bands": lambda s, d: dedup.dedup_minhash_bands(_t(s, d, "documents")),
    "dedup_minhash_pairs": lambda s, d: dedup.dedup_minhash_pairs(_t(s, d, "documents")),
    "dedup_minhash_topk": lambda s, d: dedup.dedup_minhash_topk(_t(s, d, "documents")),
    "dedup_simhash": lambda s, d: dedup.dedup_simhash(_t(s, d, "documents")),
    "dedup_ngram_jaccard": lambda s, d: dedup.dedup_ngram_jaccard(_t(s, d, "documents")),
    "dedup_ngram_jaccard_scaled": lambda s, d: dedup.dedup_ngram_jaccard_scaled(
        _t(s, d, "documents")
    ),
    "dedup_clusters": lambda s, d: dedup.dedup_clusters(_t(s, d, "documents")),
    "dedup_keep_canonical": lambda s, d: dedup.dedup_keep_canonical(
        _t(s, d, "documents")
    ),
    "segment_dedup": lambda s, d: dedup.segment_dedup(_t(s, d, "documents")),
    "segment_minhash_dedup": lambda s, d: dedup.segment_minhash_dedup(
        _t(s, d, "documents")
    ),
    "dedup_edit_distance": lambda s, d: dedup.dedup_edit_distance(
        _t(s, d, "documents")
    ),
    "dedup_embedding_cosine": lambda s, d: dedup.dedup_embedding_cosine(
        _t(s, d, "embeddings")
    ),
    "ann_bruteforce_topk": lambda s, d: similarity.ann_bruteforce_topk(
        _t(s, d, "embeddings")
    ),
    "knn_label_purity": lambda s, d: similarity.knn_label_purity(
        _t(s, d, "embeddings")
    ),
    "ann_lsh_topk": lambda s, d: similarity.ann_lsh_topk(_t(s, d, "embeddings")),
    "ann_ivf_topk": lambda s, d: similarity.ann_ivf_topk(_t(s, d, "embeddings")),
    "embedding_kmeans_iter": lambda s, d: similarity.embedding_kmeans_iter(
        _t(s, d, "embeddings")
    ),
    "doc_embedding_stats": lambda s, d: similarity.doc_embedding_stats(
        _t(s, d, "documents"), _t(s, d, "embeddings")
    ),
    "embedding_lsh_buckets": lambda s, d: similarity.embedding_lsh_buckets(
        _t(s, d, "embeddings")
    ),
    "text_token_count": lambda s, d: text.text_token_count(_t(s, d, "documents")),
    "text_bpe_tokens": lambda s, d: text.text_bpe_tokens(_t(s, d, "documents")),
    "text_lang_id": lambda s, d: text.text_lang_id(_t(s, d, "documents")),
    "text_quality_score": lambda s, d: text.text_quality_score(_t(s, d, "documents")),
    "text_redact_pii": lambda s, d: text.text_redact_pii(_t(s, d, "documents")),
    "text_repetition_score": lambda s, d: text.text_repetition_score(
        _t(s, d, "documents")
    ),
    "doc_fingerprint": lambda s, d: text.doc_fingerprint(_t(s, d, "documents")),
    "ngram_top": lambda s, d: text.ngram_top(_t(s, d, "documents")),
    # --- corpus-construction pipeline (SURVEY §2 #39-41) ---
    "corpus_train_split": lambda s, d: pipeline.corpus_train_split(
        _t(s, d, "documents")
    ),
    "seq_pack_stats": lambda s, d: pipeline.seq_pack_stats(_t(s, d, "documents")),
    "benchmark_decontam": lambda s, d: pipeline.benchmark_decontam(
        _t(s, d, "documents")
    ),
    "multimodal_binary_stats": lambda s, d: multimodal.multimodal_binary_stats(
        _t(s, d, "documents")
    ),
    "multimodal_chunk_stats": lambda s, d: multimodal.multimodal_chunk_stats(
        _t(s, d, "documents")
    ),
    # --- round-2 pipeline additions (SURVEY §2 #42-47) ---
    "corpus_quality_keep": lambda s, d: pipeline.corpus_quality_keep(
        _t(s, d, "documents")
    ),
    "corpus_stratified_sample": lambda s, d: pipeline.corpus_stratified_sample(
        _t(s, d, "documents")
    ),
    "dedup_incremental": lambda s, d: dedup.dedup_incremental(_t(s, d, "documents")),
    "bpe_pair_counts": lambda s, d: text.bpe_pair_counts(_t(s, d, "documents")),
    "vocab_coverage": lambda s, d: text.vocab_coverage(_t(s, d, "documents")),
    "repeated_ngram_spans": lambda s, d: text.repeated_ngram_spans(
        _t(s, d, "documents")
    ),
    "repeated_span_excision": lambda s, d: text.repeated_span_excision(
        _t(s, d, "documents")
    ),
    "span_excision_stats": lambda s, d: text.span_excision_stats(
        _t(s, d, "documents")
    ),
    "token_distribution_drift": lambda s, d: text.token_distribution_drift(
        _t(s, d, "documents")
    ),
    "dedup_clusters_bigstar": lambda s, d: dedup.dedup_clusters_bigstar(
        _t(s, d, "documents")
    ),
    "unigram_logprob_score": lambda s, d: text.unigram_logprob_score(
        _t(s, d, "documents")
    ),
    "corpus_source_mix": lambda s, d: pipeline.corpus_source_mix(
        _t(s, d, "documents")
    ),
    "embedding_quantization_stats": lambda s, d: similarity.embedding_quantization_stats(
        _t(s, d, "embeddings")
    ),
    "doc_length_percentile_filter": lambda s, d: text.doc_length_percentile_filter(
        _t(s, d, "documents")
    ),
    "vote_key_skew": lambda s, d: voting.vote_key_skew(_t(s, d, "events")),
    "hot_key_join_salted": lambda s, d: voting.hot_key_join_salted(
        _t(s, d, "events"), _t(s, d, "customer")
    ),
    "semantic_dedup": lambda s, d: dedup.semantic_dedup(_t(s, d, "embeddings")),
    "ann_hard_negatives": lambda s, d: similarity.ann_hard_negatives(
        _t(s, d, "embeddings")
    ),
    "ann_ivf_hard_negatives": lambda s, d: similarity.ann_ivf_hard_negatives(
        _t(s, d, "embeddings")
    ),
    "embedding_centroid_drift": lambda s, d: similarity.embedding_centroid_drift(
        _t(s, d, "embeddings")
    ),
    "ann_recall_report": lambda s, d: similarity.ann_recall_report(
        _t(s, d, "embeddings")
    ),
    "q9_product_profit": lambda s, d: analytics.q9_product_profit(
        _t(s, d, "nation"),
        _t(s, d, "supplier"),
        _t(s, d, "part"),
        _t(s, d, "orders"),
        _t(s, d, "lineitem"),
    ),
    # --- round 4 cont.: mix temperature / tau sweep / MAD / winnowing ---
    "source_temperature_weights": lambda s, d: pipeline.source_temperature_weights(
        _t(s, d, "documents")
    ),
    "dedup_threshold_sweep": lambda s, d: dedup.dedup_threshold_sweep(
        _t(s, d, "documents")
    ),
    "doc_length_mad_outliers": lambda s, d: text.doc_length_mad_outliers(
        _t(s, d, "documents")
    ),
    "doc_winnowing_fingerprints": lambda s, d: text.doc_winnowing_fingerprints(
        _t(s, d, "documents")
    ),
    "doc_embed_inference": lambda s, d: inference.doc_embed_inference(
        _t(s, d, "documents")
    ),
    "near_dup_pagerank": lambda s, d: dedup.near_dup_pagerank(
        _t(s, d, "documents")
    ),
    # --- round 4 (cont.): curation top-K / epoch order / sequences / sliding ---
    "domain_quality_topk": lambda s, d: text.domain_quality_topk(
        _t(s, d, "documents")
    ),
    "corpus_epoch_shuffle": lambda s, d: pipeline.corpus_epoch_shuffle(
        _t(s, d, "documents")
    ),
    "event_transition_matrix": lambda s, d: voting.event_transition_matrix(
        _t(s, d, "events")
    ),
    "votes_sliding_window": lambda s, d: voting.votes_sliding_window(
        _t(s, d, "events")
    ),
    "bigram_logprob_score": lambda s, d: text.bigram_logprob_score(
        _t(s, d, "documents")
    ),
    "near_dup_triangles": lambda s, d: dedup.near_dup_triangles(
        _t(s, d, "documents")
    ),
    "text_entropy_score": lambda s, d: text.text_entropy_score(
        _t(s, d, "documents")
    ),
    "voter_stickiness": lambda s, d: voting.voter_stickiness(
        _t(s, d, "events")
    ),
    # sketch op (NO_ORACLE, tolerance-tested): registered LAST so it
    # never displaces an oracle-gated entry from the checker window
    "doc_length_percentile_filter_approx": lambda s, d: (
        text.doc_length_percentile_filter_approx(_t(s, d, "documents"))
    ),
    # --- round 3: chunking / zipf / containment / syndication / PCA / PQ ---
    "doc_chunk_windows": lambda s, d: text.doc_chunk_windows(_t(s, d, "documents")),
    "token_zipf_stats": lambda s, d: text.token_zipf_stats(_t(s, d, "documents")),
    "source_url_dedup": lambda s, d: dedup.source_url_dedup(_t(s, d, "documents")),
    "ngram_containment": lambda s, d: dedup.ngram_containment(_t(s, d, "documents")),
    "embedding_pca_stats": lambda s, d: similarity.embedding_pca_stats(
        _t(s, d, "embeddings")
    ),
    "ann_pq_topk": lambda s, d: similarity.ann_pq_topk(_t(s, d, "embeddings")),
    "minhash_jaccard_estimate": lambda s, d: dedup.minhash_jaccard_estimate(
        _t(s, d, "documents")
    ),
    "near_dup_rate_by_source": lambda s, d: dedup.near_dup_rate_by_source(
        _t(s, d, "documents")
    ),
    "cross_source_dup_matrix": lambda s, d: dedup.cross_source_dup_matrix(
        _t(s, d, "documents")
    ),
    "minhash_band_collision_stats": lambda s, d: dedup.minhash_band_collision_stats(
        _t(s, d, "documents")
    ),
    "dup_quality_report": lambda s, d: dedup.dup_quality_report(
        _t(s, d, "documents")
    ),
    "token_bucket_drift": lambda s, d: text.token_bucket_drift(
        _t(s, d, "documents")
    ),
    "corpus_span_excised": lambda s, d: text.corpus_span_excised(
        _t(s, d, "documents")
    ),
    "embedding_whitened_norms": lambda s, d: similarity.embedding_whitened_norms(
        _t(s, d, "embeddings")
    ),
    "corpus_temperature_sample": lambda s, d: pipeline.corpus_temperature_sample(
        _t(s, d, "documents")
    ),
    "ann_ivf_probe_sweep": lambda s, d: similarity.ann_ivf_probe_sweep(
        _t(s, d, "embeddings")
    ),
    "fuzzy_decontam": lambda s, d: dedup.fuzzy_decontam(
        _t(s, d, "documents")
    ),
    "normalized_dedup_gain": lambda s, d: dedup.normalized_dedup_gain(
        _t(s, d, "documents")
    ),
    # no oracle_sql: bin packing is an ordered iterative algorithm
    # outside SQL's reach (the driver records the rows-only check;
    # the python reference lives in tests/test_round6b_ops.py)
    "seq_pack_bestfit": lambda s, d: pipeline.seq_pack_bestfit(
        _t(s, d, "documents")
    ),
    "voter_retention_cohort": lambda s, d: voting.voter_retention_cohort(
        _t(s, d, "events")
    ),
    "brand_price_trend": lambda s, d: analytics.brand_price_trend(
        _t(s, d, "lineitem"), _t(s, d, "part")
    ),
    "embedding_label_cohesion": lambda s, d: similarity.embedding_label_cohesion(
        _t(s, d, "embeddings")
    ),
    "funnel_conversion": lambda s, d: voting.funnel_conversion(
        _t(s, d, "events"), _t(s, d, "customer")
    ),
    "votes_anomaly_zscore": lambda s, d: voting.votes_anomaly_zscore(
        _t(s, d, "events")
    ),
    "supplier_lead_time": lambda s, d: analytics.supplier_lead_time(
        _t(s, d, "lineitem"), _t(s, d, "orders"), _t(s, d, "supplier"), _t(s, d, "nation")
    ),
    "vote_value_histogram": lambda s, d: voting.vote_value_histogram(
        _t(s, d, "events")
    ),
    "market_basket_pairs": lambda s, d: analytics.market_basket_pairs(
        _t(s, d, "lineitem")
    ),
    "supplier_concentration": lambda s, d: analytics.supplier_concentration(
        _t(s, d, "lineitem"), _t(s, d, "part")
    ),
    "voter_party_loyalty": lambda s, d: voting.voter_party_loyalty(
        _t(s, d, "events"), _t(s, d, "customer")
    ),
    "near_dup_graph_degree": lambda s, d: dedup.near_dup_graph_degree(
        _t(s, d, "documents")
    ),
    "referential_integrity_audit": lambda s, d: analytics.referential_integrity_audit(
        _t(s, d, "events"),
        _t(s, d, "customer"),
        _t(s, d, "lineitem"),
        _t(s, d, "orders"),
        _t(s, d, "part"),
        _t(s, d, "supplier"),
    ),
    "doc_field_completeness": lambda s, d: text.doc_field_completeness(
        _t(s, d, "documents")
    ),
    "repeat_buyers_by_nation": lambda s, d: analytics.repeat_buyers_by_nation(
        _t(s, d, "orders"), _t(s, d, "customer"), _t(s, d, "nation")
    ),
    "turnout_grouping_sets": lambda s, d: voting.turnout_grouping_sets(
        _t(s, d, "events"), _t(s, d, "customer"), _t(s, d, "nation"), _t(s, d, "region")
    ),
    "customer_spend_deciles": lambda s, d: analytics.customer_spend_deciles(
        _t(s, d, "orders"), _t(s, d, "customer"), _t(s, d, "nation")
    ),
    "order_fill_rate": lambda s, d: analytics.order_fill_rate(
        _t(s, d, "orders"), _t(s, d, "lineitem")
    ),
    "token_budget_select": lambda s, d: pipeline.token_budget_select(
        _t(s, d, "documents")
    ),
    "bloom_decontam": lambda s, d: pipeline.bloom_decontam(_t(s, d, "documents")),
    "bpe_train_merges": lambda s, d: text.bpe_train_merges(_t(s, d, "documents")),
    "bpe_train_merges_batched": lambda s, d: text.bpe_train_merges_batched(
        _t(s, d, "documents")
    ),
    "bpe_fertility_stats_batched": lambda s, d: text.bpe_fertility_stats_batched(
        _t(s, d, "documents")
    ),
    "dedup_soft_weights": lambda s, d: dedup.dedup_soft_weights(
        _t(s, d, "documents")
    ),
    "contam_span_report": lambda s, d: pipeline.contam_span_report(
        _t(s, d, "documents")
    ),
    "bpe_fertility_stats": lambda s, d: text.bpe_fertility_stats(
        _t(s, d, "documents")
    ),
    "curation_waterfall": lambda s, d: pipeline.curation_waterfall(
        _t(s, d, "documents")
    ),
    "ivf_cell_balance": lambda s, d: similarity.ivf_cell_balance(
        _t(s, d, "embeddings")
    ),
    "dedup_sorted_neighborhood": lambda s, d: dedup.dedup_sorted_neighborhood(
        _t(s, d, "documents")
    ),
    "dedup_substring_spans": lambda s, d: dedup.dedup_substring_spans(
        _t(s, d, "documents")
    ),
    "dsir_importance_score": lambda s, d: text.dsir_importance_score(
        _t(s, d, "documents")
    ),
    "corpus_dsir_sample": lambda s, d: pipeline.corpus_dsir_sample(
        _t(s, d, "documents")
    ),
    "token_heavy_hitters_cms": lambda s, d: text.token_heavy_hitters_cms(
        _t(s, d, "documents")
    ),
    "ann_pq_rerank_topk": lambda s, d: similarity.ann_pq_rerank_topk(
        _t(s, d, "embeddings")
    ),
    "source_capped_selection": lambda s, d: pipeline.source_capped_selection(
        _t(s, d, "documents")
    ),
    "quality_classifier_train": lambda s, d: text.quality_classifier_train(
        _t(s, d, "documents")
    ),
    "quality_classifier_score": lambda s, d: text.quality_classifier_score(
        _t(s, d, "documents")
    ),
    "embedding_prototype_score": lambda s, d: similarity.embedding_prototype_score(
        _t(s, d, "embeddings")
    ),
    "ivf_retrain_report": lambda s, d: similarity.ivf_retrain_report(
        _t(s, d, "embeddings")
    ),
}

# Registry ORDER matters operationally: external checkers iterate in
# insertion order and may cap how many entries they verify per run
# (the driver checks ~50).  Round-13 (optimization round) rotation:
# the first 50 entries are the queries whose plan or UDF internals
# changed in r13 -- the dual-quantizer/recall-arm fuses, the
# single-join label-propagation rounds, the QC count-fold, the
# SQL-string wide-aggregate builds (plan-identical, but re-earned
# anyway), the digest-cache verify joins and every graph consumer
# riding them, and the Arrow fold-twin guard consumers -- plus the
# ten STALEST rows (last driver green r11), so no query's driver
# green ages past two rounds.  Previous rotation note (r12):
# the first 50 entries are exactly the queries whose PLAN changed in
# r12 -- the LM head/tail splits, the occupancy-cap short-circuit +
# two-plane windowed pairing, the 60-bit digest verify joins and
# vectorized MinHash signature (the whole minhash/near-dup family),
# the md5 one-conv digit folds (simhash + mod-bucket consumers), the
# Arrow fold-twin pair cosines (embedding dedup + ANN top-k family),
# the Lloyd column-aggregate shape (retrain/drift), the QC packed
# features, the DSIR in-plan model, the market-basket map-side pair
# explode, and the min-label init fold -- so the driver window
# re-earns every changed plan this round.  The remainder keeps the
# r11-rotation relative order (stalest driver greens first).
_PRIORITY: list[str] = [
    "ivf_retrain_report", "ann_recall_report", "dedup_clusters",
    "dedup_keep_canonical", "quality_classifier_train",
    "quality_classifier_score", "embedding_pca_stats",
    "embedding_whitened_norms", "embedding_label_cohesion",
    "embedding_kmeans_iter", "embedding_centroid_drift", "token_bucket_drift",
    "dsir_importance_score", "corpus_dsir_sample", "dedup_minhash_pairs",
    "dedup_minhash_bands", "dedup_minhash_topk", "dedup_incremental",
    "dedup_threshold_sweep", "fuzzy_decontam", "minhash_jaccard_estimate",
    "segment_minhash_dedup", "near_dup_pagerank", "near_dup_triangles",
    "near_dup_graph_degree", "near_dup_rate_by_source",
    "cross_source_dup_matrix", "dup_quality_report", "normalized_dedup_gain",
    "dedup_clusters_bigstar", "dedup_embedding_cosine", "semantic_dedup",
    "ann_bruteforce_topk", "ann_ivf_topk", "ann_lsh_topk",
    "ann_hard_negatives", "ann_ivf_hard_negatives", "knn_label_purity",
    "ann_ivf_probe_sweep", "ann_pq_rerank_topk", "bloom_decontam",
    "bpe_fertility_stats", "bpe_train_merges", "contam_span_report",
    "customer_spend_deciles", "dedup_substring_spans", "funnel_conversion",
    "lapsed_voters", "leading_candidate_per_hour", "ngram_containment",
    "unigram_logprob_score", "bigram_logprob_score", "market_basket_pairs",
    "minhash_band_collision_stats", "dedup_simhash", "dedup_simhash_pairs",
    "dedup_sorted_neighborhood", "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_scaled", "token_heavy_hitters_cms",
    "corpus_temperature_sample", "ivf_cell_balance", "dedup_soft_weights",
    "doc_embed_inference", "doc_length_mad_outliers",
    "doc_winnowing_fingerprints", "domain_quality_topk",
    "embedding_prototype_score", "event_transition_matrix",
    "hot_key_join_salted", "q10_returned_items", "q12_ship_lag_priority",
    "q13_customer_distribution", "q14_promo_revenue", "q15_top_supplier",
    "q16_part_supplier_counts", "q19_disjunctive_revenue",
    "q1_pricing_summary", "q3_shipping_priority", "q5_regional_revenue",
    "q6_forecast_revenue", "q7_nation_volume", "q8_market_share",
    "q9_product_profit", "segment_dedup", "source_capped_selection",
    "source_temperature_weights", "text_entropy_score", "token_budget_select",
    "top_brand_revenue", "votes_sessionized", "bpe_pair_counts",
    "benchmark_decontam", "corpus_quality_keep", "corpus_source_mix",
    "curation_waterfall", "customer_top_orders", "one_vote_per_voter",
    "order_fill_rate", "party_vote_share", "referential_integrity_audit",
    "repeat_buyers_by_nation", "source_url_dedup", "supplier_concentration",
    "supplier_lead_time", "token_zipf_stats", "turnout_by_location",
    "turnout_by_region", "turnout_by_segment", "turnout_grouping_sets",
    "turnout_rollup", "vote_interarrival", "vote_value_histogram",
    "vote_weight_percentiles", "voter_party_loyalty", "voter_profile",
    "voter_retention_cohort", "votes_asof_prior_click", "votes_cube",
    "votes_enriched", "votes_in_launch_windows", "votes_minute_rate",
    "votes_per_candidate", "votes_per_candidate_hourly",
    "corpus_epoch_shuffle", "seq_pack_bestfit", "ann_pq_topk",
    "brand_price_trend", "candidate_hourly_pivot", "corpus_stratified_sample",
    "corpus_train_split", "cumulative_daily_votes", "doc_chunk_windows",
    "doc_field_completeness", "doc_length_percentile_filter_approx",
    "election_winner", "multimodal_binary_stats", "multimodal_chunk_stats",
    "q11_important_stock", "q20_excess_suppliers", "q21_waiting_suppliers",
    "q22_idle_rich_customers", "q2_min_cost_supplier",
    "repeated_span_excision", "seq_pack_stats", "span_excision_stats",
    "text_quality_score", "token_distribution_drift", "vote_key_skew",
    "voter_value_quartiles", "votes_approx_stats",
    "bpe_fertility_stats_batched", "bpe_train_merges_batched",
    "corpus_span_excised", "dedup_edit_distance", "dedup_exact",
    "doc_embedding_stats", "doc_fingerprint", "doc_length_percentile_filter",
    "embedding_lsh_buckets", "embedding_norm_outliers",
    "embedding_quantization_stats", "events_json_props", "invalid_vote_rate",
    "large_volume_orders", "nation_acctbal", "ngram_top",
    "order_priority_count", "registered_non_voters", "repeated_ngram_spans",
    "small_quantity_revenue", "supplier_nation_revenue", "text_bpe_tokens",
    "text_c4_filters", "text_lang_id", "text_redact_pii",
    "text_repetition_score", "text_token_count", "tfidf_top_terms",
    "unique_voters_per_candidate", "vocab_coverage",
    "voter_registration_stats", "voter_stickiness", "votes_anomaly_zscore",
    "votes_sliding_window", "votes_value_stats",
]


# A misspelled priority entry must raise, not silently rotate a query
# out of the external verification window (an 'if name in _DEFS'
# filter would hide the typo from the length assert below).
_unknown_priority = set(_PRIORITY) - set(_DEFS)
assert not _unknown_priority, f"_PRIORITY names not in _DEFS: {sorted(_unknown_priority)}"
# A duplicate entry would silently shrink the verification window by
# one slot (the registry comprehension dedups, first occurrence wins).
assert len(_PRIORITY) == len(set(_PRIORITY)), "duplicate names in _PRIORITY"

QUERY_REGISTRY: dict[str, QueryFn] = {
    **{name: _DEFS[name] for name in _PRIORITY},
    **{name: fn for name, fn in _DEFS.items() if name not in set(_PRIORITY)},
}
assert len(QUERY_REGISTRY) == len(_DEFS)

# Queries intentionally without a SQL oracle (the driver records the
# weaker rows-only check for these; streaming ops live in pytest).
# votes_approx_stats: HLL++ / approximate-percentile sketch internals
# are engine-specific -- no cross-engine bit parity exists by design.
# Its pytest asserts <5% error against the exact answers instead.
# seq_pack_bestfit: bin packing is an ordered iterative algorithm
# outside SQL's reach; its pytest replays FFD/next-fit in python and
# pins the packing invariants.
NO_ORACLE: set[str] = {
    "votes_approx_stats",
    "doc_length_percentile_filter_approx",
    "seq_pack_bestfit",
}
