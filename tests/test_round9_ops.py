"""Round-9 operators: IVF re-train lifecycle + streaming drift twin.

Oracle parity is covered by test_queries_oracle.py's registry sweep;
these tests pin the invariants the oracle cannot see (cross-op
consistency, gate arithmetic, replay semantics).
"""

from __future__ import annotations

from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

from de_realtime_voting_spark.constants import (
    ANN_QUERY_IDS,
    IVF_K,
    IVF_RETRAIN_ITERS,
)
from de_realtime_voting_spark.queries import QUERY_REGISTRY


def _half_up(x: float, n: int) -> float:
    return float(Decimal(repr(x)).quantize(Decimal(1).scaleb(-n), ROUND_HALF_UP))


def test_ivf_retrain_report_invariants(spark, sf_dir):
    rows = QUERY_REGISTRY["ivf_retrain_report"](spark, sf_dir).collect()
    by = defaultdict(list)
    for r in rows:
        by[r.component].append(r)
    assert set(by) == {
        "iter_move",
        "centroid_move",
        "recall_trained",
        "recall_retrained",
        "gate",
    }
    # one centroid_move row per cell of the frozen artifact
    assert len(by["centroid_move"]) == IVF_K
    assert sorted(r.cell for r in by["centroid_move"]) == sorted(
        cid for cid, _ in __import__(
            "de_realtime_voting_spark.ivf_model", fromlist=["IVF_TRAINED_CENTROIDS"]
        ).IVF_TRAINED_CENTROIDS
    )
    for r in by["centroid_move"]:
        assert r.n >= 0
        assert r.value <= 1.0 + 1e-9
    # the iteration trail is the fixed Lloyd budget, in order
    assert sorted(r.cell for r in by["iter_move"]) == list(
        range(1, IVF_RETRAIN_ITERS + 1)
    )
    for r in by["iter_move"]:
        assert 0 < r.n <= IVF_K  # some cells are non-empty at every SF
        assert r.value <= 1.0 + 1e-9
    # recall arms cover the same query set with recalls in [0, 1]
    qs_t = sorted(r.cell for r in by["recall_trained"])
    qs_r = sorted(r.cell for r in by["recall_retrained"])
    assert qs_t == qs_r
    assert set(qs_t) <= set(ANN_QUERY_IDS)
    for arm in ("recall_trained", "recall_retrained"):
        for r in by[arm]:
            assert 0.0 <= r.value <= 1.0
            assert r.n >= 0
    (g,) = by["gate"]
    assert g.cell == -1
    assert g.n == (1 if g.value >= 0 else 0)


def test_ivf_retrain_trained_arm_matches_recall_report(spark, sf_dir):
    """The report's 'recall_trained' rows ARE ann_recall_report's ivf
    arm (same truth set, same frozen quantizer) -- and its gate delta
    recomputes from the two arms' exact hit ratios."""
    retrain = QUERY_REGISTRY["ivf_retrain_report"](spark, sf_dir).collect()
    scoreboard = {
        r.query_id: r
        for r in QUERY_REGISTRY["ann_recall_report"](spark, sf_dir).collect()
        if r.method == "ivf"
    }
    trained = {r.cell: r for r in retrain if r.component == "recall_trained"}
    retrained = {r.cell: r for r in retrain if r.component == "recall_retrained"}
    assert set(trained) == set(scoreboard)
    for qid, row in trained.items():
        assert row.n == scoreboard[qid].n_hit, qid
        assert row.value == scoreboard[qid].recall, qid
    ks = {qid: scoreboard[qid].k for qid in scoreboard}
    mean_t = sum(trained[q].n / ks[q] for q in sorted(ks)) / len(ks)
    mean_r = sum(retrained[q].n / ks[q] for q in sorted(ks)) / len(ks)
    (gate,) = [r for r in retrain if r.component == "gate"]
    assert abs(gate.value - _half_up(mean_r - mean_t, 6)) < 1e-9


def test_bloom_probe_expr_matches_numpy(spark):
    """bloom_probe_expr (the Catalyst corpus-path probe) and
    bloom_probe (the numpy reference / stream path) must agree
    bit-for-bit on the same image -- including around the auto-size
    boundary -- and the build must never produce false negatives."""
    import numpy as np
    from pyspark.sql import functions as F

    from de_realtime_voting_spark.constants import BLOOM_M_BITS
    from de_realtime_voting_spark.operators.pipeline import (
        bloom_bits,
        bloom_probe,
        bloom_probe_expr,
        bloom_words_scalar,
    )

    rng = np.random.default_rng(7)
    for n_keys in (1000, BLOOM_M_BITS // 16 + 5000):  # below / above resize
        keys = rng.integers(-(2**63), 2**63 - 1, size=n_keys, dtype=np.int64)
        probes = np.concatenate(
            [keys[:500], rng.integers(-(2**63), 2**63 - 1, 2000, dtype=np.int64)]
        )
        bits = bloom_bits(keys)
        if n_keys > BLOOM_M_BITS // 16:
            assert bits.size * 8 > BLOOM_M_BITS  # the resize engaged
        want = bloom_probe(bits, probes)
        assert bool(bloom_probe(bits, keys).all())  # zero false negatives
        wcol, m = bloom_words_scalar(spark, bits)
        assert m == bits.size * 8
        got = (
            spark.createDataFrame(
                [(int(i), int(h)) for i, h in enumerate(probes)], "i long, h long"
            )
            .select("i", bloom_probe_expr(wcol, m, F.col("h")).alias("hit"))
            .toPandas()
            .sort_values("i")["hit"]
            .to_numpy()
        )
        assert (got == want).all()
