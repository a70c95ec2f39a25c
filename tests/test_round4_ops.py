"""Behavioral contracts for the round-4 continuation ops: winnowing's
substring-match guarantee, temperature-mix invariants, MAD robustness,
and threshold-sweep consistency with the pair verifier.  (Cross-engine
value parity is covered registry-wide by test_queries_oracle.)"""

from __future__ import annotations

import pytest

from de_realtime_voting_spark.constants import (
    JACCARD_THRESHOLD,
    THRESHOLD_SWEEP_BINS,
    WINNOW_K,
    WINNOW_W,
)
from de_realtime_voting_spark.operators import dedup, pipeline, text
from de_realtime_voting_spark.queries import QUERY_REGISTRY


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, (t, lang, src) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_winnowing_shared_substring_guarantee(spark):
    """Schleimer et al. guarantee: two docs sharing a substring of
    length >= W + K - 1 chars MUST share a fingerprint; an unrelated
    doc must not."""
    shared = "zqxjkvwpbyfgm"  # 13 chars >= WINNOW_W + WINNOW_K - 1 = 8
    docs = _docs(
        spark,
        [
            ("aaaa " + shared + " bbbb", "en", "sA"),
            ("cccc " + shared + " dddd", "en", "sB"),
            ("totally unrelated content here", "en", "sC"),
        ],
    )
    out = {
        r["source"]: r for r in text.doc_winnowing_fingerprints(docs).collect()
    }
    assert out["sA"]["docs_with_shared_fp"] == 1
    assert out["sB"]["docs_with_shared_fp"] == 1
    assert out["sC"]["docs_with_shared_fp"] == 0
    # density sanity: every doc long enough yields >= 1 fingerprint
    assert all(r["total_fp"] >= 1 for r in out.values())


def test_winnowing_short_doc_yields_no_fingerprints(spark):
    """A doc with fewer than K+W-1 chars has no full window: zero
    fingerprints, but the doc still appears in the report."""
    docs = _docs(spark, [("ab", "en", "sX")])
    [row] = text.doc_winnowing_fingerprints(docs).collect()
    assert row["n_docs"] == 1
    assert row["total_fp"] == 0
    assert row["docs_with_shared_fp"] == 0


def test_temperature_weights_invariants(spark, sf_dir):
    rows = QUERY_REGISTRY["source_temperature_weights"](spark, sf_dir).collect()
    assert rows
    # probabilities form a distribution (rounded per-row to 1e-6)
    assert abs(sum(r["temp_prob"] for r in rows) - 1.0) < 1e-4
    # alpha < 1 smooths the mix: boost strictly decreases with share
    by_share = sorted(rows, key=lambda r: r["token_share"])
    boosts = [r["mix_boost"] for r in by_share]
    assert boosts == sorted(boosts, reverse=True)
    # head domains are downweighted, tail domains upweighted
    assert by_share[0]["mix_boost"] > 1.0
    assert by_share[-1]["mix_boost"] < 1.0


def test_mad_outliers_robust_to_single_megadoc(spark):
    """One mega-doc cannot shift the median: with 9 identical lengths
    and one huge one, exactly the huge doc is flagged (a mean/stddev
    z-score would have its cutoff dragged by the same outlier)."""
    rows = [("x" * 10, "en", "s")] * 9 + [("x" * 1000, "en", "s")]
    docs = _docs(spark, [(t, lang, f"{src}{i}") for i, (t, lang, src) in enumerate(rows)])
    [row] = text.doc_length_mad_outliers(docs).collect()
    assert row["median_chars"] == 10.0
    assert row["mad_chars"] == 0.0
    assert row["n_outliers"] == 1


def test_mad_outliers_uniform_lengths_flag_nothing(spark):
    docs = _docs(spark, [("y" * 50, "de", f"s{i}") for i in range(8)])
    [row] = text.doc_length_mad_outliers(docs).collect()
    assert row["n_outliers"] == 0
    assert row["outlier_rate"] == 0.0


def test_threshold_sweep_consistent_with_pair_verifier(spark, sf_dir):
    """The sweep's cumulative count at tau = JACCARD_THRESHOLD must
    equal the pair count dedup_minhash_pairs reports -- same candidate
    set, same exact-Jaccard arithmetic, just histogrammed.  Exact
    because tau*BINS is an integer bin boundary (0.8 * 20 = 16)."""
    from de_realtime_voting_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    sweep = dedup.dedup_threshold_sweep(docs).collect()
    n_pairs_verified = dedup.dedup_minhash_pairs(docs).count()
    cut_bin = round(JACCARD_THRESHOLD * THRESHOLD_SWEEP_BINS)
    at_tau = [r for r in sweep if r["bin"] >= cut_bin]
    # cum is descending-cumulative, so the smallest bin >= cut carries
    # the full count of pairs at tau -- the max over qualifying rows
    cum = max((r["cum_pairs_at_tau"] for r in at_tau), default=0)
    assert cum == n_pairs_verified
    # histogram total equals candidate-pair total (no pair dropped)
    total = sum(r["n_pairs"] for r in sweep)
    assert max(r["cum_pairs_at_tau"] for r in sweep) == total


def test_embed_inference_python_path_pinned_to_catalyst_twin(spark, sf_dir):
    """The mapInPandas inference pass must be bit-identical to the
    Catalyst twin (conv(md5) per dim) -- the same pin discipline as
    the Arrow IVF cell assigner.  If the stand-in model's arithmetic
    drifts from the declared contract, this catches it before the
    oracle does."""
    from de_realtime_voting_spark.operators import inference
    from de_realtime_voting_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = sorted(
        map(tuple, inference._audit_projection(inference.embed_docs(docs)).collect())
    )
    b = sorted(
        map(
            tuple,
            inference._audit_projection(inference._embed_catalyst(docs)).collect(),
        )
    )
    assert a == b and len(a) > 0


def test_embed_inference_deterministic_and_bounded(spark):
    """Same doc_id -> same vector on every run/partition layout, and
    every component sits in [-0.5, 0.5) by construction."""
    from de_realtime_voting_spark.operators import inference

    docs = spark.createDataFrame(
        [(7, "t", "en", "s", 1), (7, "t", "en", "s", 1), (11, "u", "de", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = inference.embed_docs(docs).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["doc_id"], []).append(tuple(r["embedding"]))
        assert all(-0.5 <= x < 0.5 for x in r["embedding"])
    assert len(by_id[7]) == 2 and by_id[7][0] == by_id[7][1]


def test_winnowing_matches_python_reference(spark):
    """Full-algorithm pin: the report must equal a from-scratch python
    winnowing (rightmost-minimal md5-prefix per window, distinct
    selected hashes, cross-doc sharing) over adversarial inputs --
    repeated chars (max ties), periodic strings, shared substrings,
    short docs."""
    import hashlib

    texts = [
        "aaaaaaaaaaaaaaaa",          # every gram identical: tie storm
        "abababababababab",          # period-2
        "abcabcabcabcabc",           # period-3
        "the quick brown fox jumps", # normal text
        "quick brown fox",           # shared substring with above
        "zz",                        # too short: no grams
        "exact",                     # exactly K chars: one gram, no window
        "exactly8",                  # K+W-1 chars: exactly one window
    ]
    rows = [(i, t, "en", f"s{i}", len(t)) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )

    def py_fingerprints(t):
        K, W = WINNOW_K, WINNOW_W
        hs = [
            int(hashlib.md5(t[p : p + K].encode()).hexdigest()[:8], 16)
            for p in range(len(t) - K + 1)
        ]
        sel = set()
        for i in range(len(hs) - W + 1):
            win = [(hs[i + d], -(i + d)) for d in range(W)]
            sel.add(min(win)[0])
        return sel

    fps = {i: py_fingerprints(t) for i, t in enumerate(texts)}
    from collections import Counter

    owners = Counter(h for s in fps.values() for h in set(s))
    shared = {h for s in fps.values() for h in s if owners[h] > 1}
    got = {
        r["source"]: r for r in text.doc_winnowing_fingerprints(docs).collect()
    }
    assert len(got) == len(texts)
    for i in range(len(texts)):
        r = got[f"s{i}"]
        assert r["total_fp"] == len(fps[i]), texts[i]
        assert r["docs_with_shared_fp"] == int(bool(fps[i] & shared)), texts[i]


def test_pagerank_matches_python_reference(spark, sf_dir):
    """Damped PageRank over the verified near-dup graph must equal a
    from-scratch python implementation with the same fold semantics
    (sorted contribution sums, 3 iterations, d = 0.85)."""
    from de_realtime_voting_spark.constants import (
        PAGERANK_DAMPING,
        PAGERANK_ITERS,
    )
    from de_realtime_voting_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in dedup.dedup_minhash_pairs(docs).collect()
    ]
    assert pairs
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    n = len(adj)
    pr = {v: 1.0 / n for v in adj}
    for _ in range(PAGERANK_ITERS):
        contribs: dict[int, list[float]] = {v: [] for v in adj}
        for v, nbrs in adj.items():
            c = pr[v] / len(nbrs)
            for u in nbrs:
                contribs[u].append(c)
        nxt = {}
        for v in adj:
            s = 0.0
            for c in sorted(contribs[v]):
                s = s + c
            nxt[v] = (1.0 - PAGERANK_DAMPING) / n + PAGERANK_DAMPING * s
        pr = nxt
    got = {
        r["doc_id"]: (r["degree"], r["pagerank"])
        for r in QUERY_REGISTRY["near_dup_pagerank"](spark, sf_dir).collect()
    }
    assert set(got) == set(adj)
    for v in adj:
        assert got[v][0] == len(adj[v])
        # the op rounds to 6 decimals; compare at that granularity
        assert abs(got[v][1] - pr[v]) < 5.1e-7, v
    # probability mass is conserved (undirected graph, no dangling)
    assert abs(sum(p for _d, p in got.values()) - 1.0) < 1e-4
