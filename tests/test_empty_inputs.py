"""Empty-input robustness: every operator must return an empty (or
degenerate-but-correct) result on zero rows, never throw.  An empty
partition is routine at 100 TB -- a date with no events, a bucket
with no docs -- and a single task exception kills the whole stage.
"""

from __future__ import annotations

import pytest

from de_realtime_voting_spark.operators import (
    analytics,
    dedup,
    inference,
    multimodal,
    pipeline,
    similarity,
    text,
    voting,
)
from de_realtime_voting_spark.sources import load_table


def _empty(spark, sf_dir, name):
    return load_table(spark, sf_dir, name).limit(0)


CASES = {
    "votes_per_candidate": lambda s, d: voting.votes_per_candidate(_empty(s, d, "events")),
    "turnout_by_location": lambda s, d: voting.turnout_by_location(
        _empty(s, d, "events"), _empty(s, d, "customer"), _empty(s, d, "nation")
    ),
    "one_vote_per_voter": lambda s, d: voting.one_vote_per_voter(_empty(s, d, "events")),
    "votes_sessionized": lambda s, d: voting.votes_sessionized(_empty(s, d, "events")),
    "vote_interarrival": lambda s, d: voting.vote_interarrival(_empty(s, d, "events")),
    "voter_value_quartiles": lambda s, d: voting.voter_value_quartiles(
        _empty(s, d, "events")
    ),
    "candidate_hourly_pivot": lambda s, d: voting.candidate_hourly_pivot(
        _empty(s, d, "events")
    ),
    "q1_pricing_summary": lambda s, d: analytics.q1_pricing_summary(
        _empty(s, d, "lineitem")
    ),
    "dedup_exact": lambda s, d: dedup.dedup_exact(_empty(s, d, "documents")),
    "dedup_minhash_pairs": lambda s, d: dedup.dedup_minhash_pairs(
        _empty(s, d, "documents")
    ),
    "dedup_ngram_jaccard": lambda s, d: dedup.dedup_ngram_jaccard(
        _empty(s, d, "documents")
    ),
    "dedup_substring_spans": lambda s, d: dedup.dedup_substring_spans(
        _empty(s, d, "documents")
    ),
    "segment_minhash_dedup": lambda s, d: dedup.segment_minhash_dedup(
        _empty(s, d, "documents")
    ),
    "dsir_importance_score": lambda s, d: text.dsir_importance_score(
        _empty(s, d, "documents")
    ),
    "corpus_dsir_sample": lambda s, d: pipeline.corpus_dsir_sample(
        _empty(s, d, "documents")
    ),
    "dedup_clusters": lambda s, d: dedup.dedup_clusters(_empty(s, d, "documents")),
    "dedup_simhash": lambda s, d: dedup.dedup_simhash(_empty(s, d, "documents")),
    "ann_bruteforce_topk": lambda s, d: similarity.ann_bruteforce_topk(
        _empty(s, d, "embeddings")
    ),
    "ann_lsh_topk": lambda s, d: similarity.ann_lsh_topk(_empty(s, d, "embeddings")),
    "ann_ivf_topk": lambda s, d: similarity.ann_ivf_topk(_empty(s, d, "embeddings")),
    "text_token_count": lambda s, d: text.text_token_count(_empty(s, d, "documents")),
    "text_quality_score": lambda s, d: text.text_quality_score(
        _empty(s, d, "documents")
    ),
    "ngram_top": lambda s, d: text.ngram_top(_empty(s, d, "documents")),
    "doc_fingerprint": lambda s, d: text.doc_fingerprint(_empty(s, d, "documents")),
    "multimodal_chunk_stats": lambda s, d: multimodal.multimodal_chunk_stats(
        _empty(s, d, "documents")
    ),
    "multimodal_binary_stats": lambda s, d: multimodal.multimodal_binary_stats(
        _empty(s, d, "documents")
    ),
    "text_repetition_score": lambda s, d: text.text_repetition_score(
        _empty(s, d, "documents")
    ),
    "corpus_train_split": lambda s, d: pipeline.corpus_train_split(
        _empty(s, d, "documents")
    ),
    "seq_pack_stats": lambda s, d: pipeline.seq_pack_stats(_empty(s, d, "documents")),
    "benchmark_decontam": lambda s, d: pipeline.benchmark_decontam(
        _empty(s, d, "documents")
    ),
    "corpus_quality_keep": lambda s, d: pipeline.corpus_quality_keep(
        _empty(s, d, "documents")
    ),
    "corpus_stratified_sample": lambda s, d: pipeline.corpus_stratified_sample(
        _empty(s, d, "documents")
    ),
    "dedup_incremental": lambda s, d: dedup.dedup_incremental(
        _empty(s, d, "documents")
    ),
    "bpe_pair_counts": lambda s, d: text.bpe_pair_counts(_empty(s, d, "documents")),
    "vocab_coverage": lambda s, d: text.vocab_coverage(_empty(s, d, "documents")),
    "repeated_span_excision": lambda s, d: text.repeated_span_excision(
        _empty(s, d, "documents")
    ),
    "span_excision_stats": lambda s, d: text.span_excision_stats(
        _empty(s, d, "documents")
    ),
    "knn_label_purity": lambda s, d: similarity.knn_label_purity(
        _empty(s, d, "embeddings")
    ),
    "token_distribution_drift": lambda s, d: text.token_distribution_drift(
        _empty(s, d, "documents")
    ),
    "token_bucket_drift": lambda s, d: text.token_bucket_drift(
        _empty(s, d, "documents")
    ),
    "corpus_span_excised": lambda s, d: text.corpus_span_excised(
        _empty(s, d, "documents")
    ),
    "embedding_whitened_norms": lambda s, d: similarity.embedding_whitened_norms(
        _empty(s, d, "embeddings")
    ),
    "corpus_temperature_sample": lambda s, d: pipeline.corpus_temperature_sample(
        _empty(s, d, "documents")
    ),
    "ann_ivf_probe_sweep": lambda s, d: similarity.ann_ivf_probe_sweep(
        _empty(s, d, "embeddings")
    ),
    "seq_pack_bestfit": lambda s, d: pipeline.seq_pack_bestfit(
        _empty(s, d, "documents")
    ),
    "fuzzy_decontam": lambda s, d: dedup.fuzzy_decontam(
        _empty(s, d, "documents")
    ),
    "normalized_dedup_gain": lambda s, d: dedup.normalized_dedup_gain(
        _empty(s, d, "documents")
    ),
    "cross_source_dup_matrix": lambda s, d: dedup.cross_source_dup_matrix(
        _empty(s, d, "documents")
    ),
    "minhash_band_collision_stats": lambda s, d: dedup.minhash_band_collision_stats(
        _empty(s, d, "documents")
    ),
    "dup_quality_report": lambda s, d: dedup.dup_quality_report(
        _empty(s, d, "documents")
    ),
    "repeated_ngram_spans": lambda s, d: text.repeated_ngram_spans(
        _empty(s, d, "documents")
    ),
    "unigram_logprob_score": lambda s, d: text.unigram_logprob_score(
        _empty(s, d, "documents")
    ),
    "corpus_source_mix": lambda s, d: pipeline.corpus_source_mix(
        _empty(s, d, "documents")
    ),
    "embedding_quantization_stats": lambda s, d: similarity.embedding_quantization_stats(
        _empty(s, d, "embeddings")
    ),
    "doc_length_percentile_filter": lambda s, d: text.doc_length_percentile_filter(
        _empty(s, d, "documents")
    ),
    "doc_length_percentile_filter_approx": lambda s, d: (
        text.doc_length_percentile_filter_approx(_empty(s, d, "documents"))
    ),
    "vote_key_skew": lambda s, d: voting.vote_key_skew(_empty(s, d, "events")),
    # round 3 additions
    "doc_chunk_windows": lambda s, d: text.doc_chunk_windows(_empty(s, d, "documents")),
    "token_zipf_stats": lambda s, d: text.token_zipf_stats(_empty(s, d, "documents")),
    "source_url_dedup": lambda s, d: dedup.source_url_dedup(_empty(s, d, "documents")),
    "ngram_containment": lambda s, d: dedup.ngram_containment(
        _empty(s, d, "documents")
    ),
    "minhash_jaccard_estimate": lambda s, d: dedup.minhash_jaccard_estimate(
        _empty(s, d, "documents")
    ),
    "near_dup_rate_by_source": lambda s, d: dedup.near_dup_rate_by_source(
        _empty(s, d, "documents")
    ),
    "embedding_pca_stats": lambda s, d: similarity.embedding_pca_stats(
        _empty(s, d, "embeddings")
    ),
    "ann_pq_topk": lambda s, d: similarity.ann_pq_topk(_empty(s, d, "embeddings")),
    "embedding_label_cohesion": lambda s, d: similarity.embedding_label_cohesion(
        _empty(s, d, "embeddings")
    ),
    "voter_retention_cohort": lambda s, d: voting.voter_retention_cohort(
        _empty(s, d, "events")
    ),
    "funnel_conversion": lambda s, d: voting.funnel_conversion(
        _empty(s, d, "events"), _empty(s, d, "customer")
    ),
    "votes_anomaly_zscore": lambda s, d: voting.votes_anomaly_zscore(
        _empty(s, d, "events")
    ),
    "brand_price_trend": lambda s, d: analytics.brand_price_trend(
        _empty(s, d, "lineitem"), _empty(s, d, "part")
    ),
    "supplier_lead_time": lambda s, d: analytics.supplier_lead_time(
        _empty(s, d, "lineitem"),
        _empty(s, d, "orders"),
        _empty(s, d, "supplier"),
        _empty(s, d, "nation"),
    ),
    "vote_value_histogram": lambda s, d: voting.vote_value_histogram(
        _empty(s, d, "events")
    ),
    "market_basket_pairs": lambda s, d: analytics.market_basket_pairs(
        _empty(s, d, "lineitem")
    ),
    "supplier_concentration": lambda s, d: analytics.supplier_concentration(
        _empty(s, d, "lineitem"), _empty(s, d, "part")
    ),
    "voter_party_loyalty": lambda s, d: voting.voter_party_loyalty(
        _empty(s, d, "events"), _empty(s, d, "customer")
    ),
    "near_dup_graph_degree": lambda s, d: dedup.near_dup_graph_degree(
        _empty(s, d, "documents")
    ),
    "repeat_buyers_by_nation": lambda s, d: analytics.repeat_buyers_by_nation(
        _empty(s, d, "orders"), _empty(s, d, "customer"), _empty(s, d, "nation")
    ),
    "turnout_grouping_sets": lambda s, d: voting.turnout_grouping_sets(
        _empty(s, d, "events"),
        _empty(s, d, "customer"),
        _empty(s, d, "nation"),
        _empty(s, d, "region"),
    ),
    "customer_spend_deciles": lambda s, d: analytics.customer_spend_deciles(
        _empty(s, d, "orders"), _empty(s, d, "customer"), _empty(s, d, "nation")
    ),
    # round 4 additions
    "hot_key_join_salted": lambda s, d: voting.hot_key_join_salted(
        _empty(s, d, "events"), _empty(s, d, "customer")
    ),
    "semantic_dedup": lambda s, d: dedup.semantic_dedup(_empty(s, d, "embeddings")),
    "ann_recall_report": lambda s, d: similarity.ann_recall_report(
        _empty(s, d, "embeddings")
    ),
    "q9_product_profit": lambda s, d: analytics.q9_product_profit(
        _empty(s, d, "nation"),
        _empty(s, d, "supplier"),
        _empty(s, d, "part"),
        _empty(s, d, "orders"),
        _empty(s, d, "lineitem"),
    ),
    "source_temperature_weights": lambda s, d: pipeline.source_temperature_weights(
        _empty(s, d, "documents")
    ),
    "dedup_threshold_sweep": lambda s, d: dedup.dedup_threshold_sweep(
        _empty(s, d, "documents")
    ),
    "doc_length_mad_outliers": lambda s, d: text.doc_length_mad_outliers(
        _empty(s, d, "documents")
    ),
    "doc_winnowing_fingerprints": lambda s, d: text.doc_winnowing_fingerprints(
        _empty(s, d, "documents")
    ),
    "doc_embed_inference": lambda s, d: inference.doc_embed_inference(
        _empty(s, d, "documents")
    ),
    "near_dup_pagerank": lambda s, d: dedup.near_dup_pagerank(
        _empty(s, d, "documents")
    ),
    "domain_quality_topk": lambda s, d: text.domain_quality_topk(
        _empty(s, d, "documents")
    ),
    "corpus_epoch_shuffle": lambda s, d: pipeline.corpus_epoch_shuffle(
        _empty(s, d, "documents")
    ),
    "bigram_logprob_score": lambda s, d: text.bigram_logprob_score(
        _empty(s, d, "documents")
    ),
    "text_entropy_score": lambda s, d: text.text_entropy_score(
        _empty(s, d, "documents")
    ),
    "event_transition_matrix": lambda s, d: voting.event_transition_matrix(
        _empty(s, d, "events")
    ),
    "votes_sliding_window": lambda s, d: voting.votes_sliding_window(
        _empty(s, d, "events")
    ),
    "voter_stickiness": lambda s, d: voting.voter_stickiness(
        _empty(s, d, "events")
    ),
    "token_budget_select": lambda s, d: pipeline.token_budget_select(
        _empty(s, d, "documents")
    ),
    "bloom_decontam": lambda s, d: pipeline.bloom_decontam(
        _empty(s, d, "documents")
    ),
    "bpe_train_merges": lambda s, d: text.bpe_train_merges(
        _empty(s, d, "documents")
    ),
    "dedup_soft_weights": lambda s, d: dedup.dedup_soft_weights(
        _empty(s, d, "documents")
    ),
    "contam_span_report": lambda s, d: pipeline.contam_span_report(
        _empty(s, d, "documents")
    ),
    "bpe_fertility_stats": lambda s, d: text.bpe_fertility_stats(
        _empty(s, d, "documents")
    ),
    "ivf_cell_balance": lambda s, d: similarity.ivf_cell_balance(
        _empty(s, d, "embeddings")
    ),
    "dedup_sorted_neighborhood": lambda s, d: dedup.dedup_sorted_neighborhood(
        _empty(s, d, "documents")
    ),
    "token_heavy_hitters_cms": lambda s, d: text.token_heavy_hitters_cms(
        _empty(s, d, "documents")
    ),
    "ann_pq_rerank_topk": lambda s, d: similarity.ann_pq_rerank_topk(
        _empty(s, d, "embeddings")
    ),
    "source_capped_selection": lambda s, d: pipeline.source_capped_selection(
        _empty(s, d, "documents")
    ),
}

# Report-shaped ops whose contract on empty input is a DEGENERATE
# (all-zero) report, not zero rows: one row per FK edge / per profiled
# column, with n_rows = 0.  Asserted separately below.
DEGENERATE_CASES = {
    "referential_integrity_audit": (
        lambda s, d: analytics.referential_integrity_audit(
            _empty(s, d, "events"),
            _empty(s, d, "customer"),
            _empty(s, d, "lineitem"),
            _empty(s, d, "orders"),
            _empty(s, d, "part"),
            _empty(s, d, "supplier"),
        ),
        5,
    ),
    "doc_field_completeness": (
        lambda s, d: text.doc_field_completeness(_empty(s, d, "documents")),
        3,
    ),
}


@pytest.mark.parametrize("name", sorted(DEGENERATE_CASES))
def test_empty_input_yields_zero_report(name, spark, sf_dir):
    fn, n_expected = DEGENERATE_CASES[name]
    rows = fn(spark, sf_dir).collect()
    assert len(rows) == n_expected
    assert all(r["n_rows"] == 0 for r in rows)


@pytest.mark.parametrize("name", sorted(CASES))
def test_empty_input_yields_empty_result(name, spark, sf_dir):
    out = CASES[name](spark, sf_dir)
    assert out.count() == 0
    assert len(out.schema.fields) > 0  # schema survives


def test_near_dup_triangles_empty_input_zero_summary(spark, sf_dir):
    """Summary-shaped: a zero-doc corpus still yields the one census
    row (zero vertices/edges/triangles, cc 0.0), never an exception."""
    [row] = dedup.near_dup_triangles(_empty(spark, sf_dir, "documents")).collect()
    assert row["n_vertices"] == 0
    assert row["n_edges"] == 0
    assert row["n_triangles"] == 0
    assert row["global_clustering"] == 0.0
