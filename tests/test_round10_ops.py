"""Round-10 surface: the from-published-model batch quality scorer
and the loader-ready curate.py stages (--pack / --epoch-shuffle).

Oracle parity for registry ops is covered by test_queries_oracle.py;
these tests pin what the oracle cannot see -- that the exported
production paths reproduce the registry ops' outputs exactly (or at
the documented rounding grain) from published artifacts.
"""

from __future__ import annotations

from de_realtime_voting_spark.sources import load_table


def test_score_from_model_matches_registry_op(spark, sf_dir):
    """score_from_model(docs, *quality_model(docs)) must agree with
    quality_classifier_score(docs) doc-for-doc: same doc set, same
    (lang, source), quality_prob within the rounding grain (<= 2e-6
    -- the batch op sums w_b * x_b per bucket, the from-model fold
    sums w[bucket(tok)] per token; algebraically identical,
    float-reassociated)."""
    from de_realtime_voting_spark.operators.text import (
        quality_classifier_score,
        score_from_model,
    )
    from de_realtime_voting_spark.streaming import quality_model

    docs = load_table(spark, sf_dir, "documents")
    want = {
        r.doc_id: (r.lang, r.source, r.quality_prob)
        for r in quality_classifier_score(docs).collect()
    }
    assert want
    spark.catalog.clearCache()
    w, bias = quality_model(docs)
    spark.catalog.clearCache()
    got = {
        r.doc_id: (r.lang, r.source, r.quality_prob)
        for r in score_from_model(docs, w, bias).collect()
    }
    assert set(got) == set(want)
    for doc_id, (lang, source, prob) in want.items():
        g = got[doc_id]
        assert g[0] == lang and g[1] == source
        assert abs(g[2] - prob) <= 2e-6, (doc_id, g[2], prob)
    spark.catalog.clearCache()


def test_score_from_model_is_shuffle_free(spark, sf_dir):
    """The production batch scorer must run at scan rate: no Exchange
    anywhere in its physical plan (the model rides as an in-plan
    literal, the margin folds map-side)."""
    from de_realtime_voting_spark.constants import QC_BUCKETS
    from de_realtime_voting_spark.operators.text import score_from_model

    docs = load_table(spark, sf_dir, "documents")
    plan = (
        score_from_model(docs, [0.001 * i for i in range(QC_BUCKETS)], -0.5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
