"""Round-6 operator tests: the scale-safe ngram-Jaccard route.

dedup_ngram_jaccard_scaled ships the corpus-scale routing the r5
probe mandated (banded-LSH candidates + per-pair trigram verify);
these tests pin its semantics against the exhaustive block-based op
and against a hand-built corpus with a known near-dup pair.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from de_realtime_voting_spark.operators import dedup
from de_realtime_voting_spark.sources.tables import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_scaled_pairs_are_subset_of_exhaustive(spark, sf_dir):
    """Every pair the LSH-candidated route emits must also be found
    by the exhaustive (lang, len_bucket)-blocked op when the pair
    shares a block -- the scaled op never *invents* similarity; its
    jaccard values must agree exactly where both emit the pair."""
    docs = _docs(spark, sf_dir)
    scaled = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.dedup_ngram_jaccard_scaled(docs).collect()
    }
    exhaustive = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.dedup_ngram_jaccard(docs).collect()
    }
    assert scaled, "sf0.001 corpus has dup classes; scaled route must find some"
    for pair, jac in scaled.items():
        if pair in exhaustive:  # same block -> exhaustive sees it too
            assert exhaustive[pair] == jac


def test_scaled_finds_cross_bucket_pair_exhaustive_misses(spark):
    """The scaled route is NOT strictly weaker: a near-dup pair whose
    lengths straddle a len_bucket boundary escapes the exhaustive
    block join but still shares MinHash bands -> the scaled op
    catches it."""
    base = "the quick brown fox jumps over the lazy dog again and again " * 20
    rows = [
        ("d1", base, "en"),
        # ~60 chars longer: crosses the 100-char len bucket boundary
        # while staying a trigram near-dup
        ("d2", base + "the quick brown fox jumps over the lazy dog again and end", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string, lang string")
    scaled = dedup.dedup_ngram_jaccard_scaled(docs).collect()
    exhaustive = dedup.dedup_ngram_jaccard(docs).collect()
    assert [(r.doc_a, r.doc_b) for r in scaled] == [("d1", "d2")]
    assert exhaustive == []  # different len_bucket -> block join misses


def test_scaled_respects_lang_block(spark):
    """Identical text, different lang labels -> no pair (near-dups
    share language, mirroring the exhaustive op's block key)."""
    text = "alpha beta gamma delta epsilon zeta eta theta " * 10
    docs = spark.createDataFrame(
        [("a", text, "en"), ("b", text, "de")],
        "doc_id string, text string, lang string",
    )
    assert dedup.dedup_ngram_jaccard_scaled(docs).collect() == []


def test_scaled_threshold_filters(spark):
    """Docs sharing bands but with trigram jaccard below the
    threshold are candidates that FAIL verification."""
    a = "one two three four five six seven eight nine ten " * 5
    # same word shingles at the start (shares bands is not guaranteed,
    # so build a genuinely near-identical doc, then a far one
    b = a + "totally different suffix content making trigram overlap drop substantially " * 30
    docs = spark.createDataFrame(
        [("a", a, "en"), ("b", b, "en")],
        "doc_id string, text string, lang string",
    )
    out = dedup.dedup_ngram_jaccard_scaled(docs).collect()
    from de_realtime_voting_spark.constants import NGRAM_JACCARD_THRESHOLD

    for r in out:
        assert r.jaccard >= NGRAM_JACCARD_THRESHOLD
