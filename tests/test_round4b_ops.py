"""Behavioral contracts for the round-4 continuation ops (session 2):
per-domain top-K selection, seeded epoch shuffle determinism, Markov
transition accounting, and sliding-window double-count geometry.
(Cross-engine value parity is covered registry-wide by
test_queries_oracle.)"""

from __future__ import annotations

import datetime as dt

from de_realtime_voting_spark.constants import EPOCH_PREVIEW_N, QUALITY_TOPK
from de_realtime_voting_spark.operators import pipeline, text, voting


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, (t, lang, src) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m), u, et, 1.0, "{}")
            for i, (m, u, et) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_domain_quality_topk_caps_and_orders(spark):
    """Each source yields at most QUALITY_TOPK rows with contiguous
    ranks, ordered by descending quality with doc_id tie-break."""
    rows = [(f"word {'common the and of to ' * (i + 1)}", "en", "sA") for i in range(8)]
    rows += [("tiny", "en", "sB")]
    out = text.domain_quality_topk(_docs(spark, rows)).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    assert len(by_src["sA"]) == QUALITY_TOPK
    assert len(by_src["sB"]) == 1
    for rs in by_src.values():
        rs.sort(key=lambda r: r["quality_rank"])
        assert [r["quality_rank"] for r in rs] == list(range(1, len(rs) + 1))
        for a, b in zip(rs, rs[1:]):
            assert (a["quality"], -a["doc_id"]) >= (b["quality"], -b["doc_id"])


def test_domain_quality_topk_tiebreak_is_doc_id(spark):
    """Identical texts have identical scores: rank order must follow
    doc_id ascending (deterministic survivor choice)."""
    rows = [("the same text again and again", "en", "sT")] * 3
    out = sorted(
        text.domain_quality_topk(_docs(spark, rows)).collect(),
        key=lambda r: r["quality_rank"],
    )
    assert [r["doc_id"] for r in out] == [0, 1, 2]


def test_epoch_shuffle_is_deterministic_permutation_prefix(spark):
    docs = _docs(spark, [(f"text {i}", "en", "s") for i in range(30)])
    a = pipeline.corpus_epoch_shuffle(docs).collect()
    b = pipeline.corpus_epoch_shuffle(docs).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    n = min(EPOCH_PREVIEW_N, 30)
    assert sorted(r["epoch_pos"] for r in a) == list(range(1, n + 1))
    assert len({r["doc_id"] for r in a}) == n
    # a seeded md5 order is (overwhelmingly) not the insertion order
    assert [r["doc_id"] for r in sorted(a, key=lambda r: r["epoch_pos"])] != list(
        range(n)
    )


def test_transition_matrix_counts_and_probabilities(spark):
    """u1: view->click->purchase; u2: view->view.  Transitions are
    per-user consecutive pairs; p_next is conditional on prev."""
    ev = _events(
        spark,
        [(0, 1, "view"), (1, 1, "click"), (2, 1, "purchase"), (0, 2, "view"), (5, 2, "view")],
    )
    out = {(r["prev_type"], r["next_type"]): r for r in voting.event_transition_matrix(ev).collect()}
    assert out[("view", "click")]["n_transitions"] == 1
    assert out[("view", "view")]["n_transitions"] == 1
    assert out[("click", "purchase")]["n_transitions"] == 1
    assert out[("view", "click")]["p_next"] == 0.5
    assert out[("click", "purchase")]["p_next"] == 1.0
    # no cross-user transition (u1's purchase never precedes u2's view)
    assert ("purchase", "view") not in out


def test_sliding_window_counts_each_vote_twice(spark):
    """2h windows sliding 1h: every vote lands in exactly two
    windows, so the grand total is 2x the vote count."""
    ev = _events(spark, [(0, 1, "A"), (30, 2, "A"), (90, 3, "B")])
    out = voting.votes_sliding_window(ev).collect()
    assert sum(r["total_votes"] for r in out) == 2 * 3
    # the 00:00-02:00 window holds all three votes
    full = {
        (r["window_start"].hour, r["candidate_id"]): r["total_votes"] for r in out
    }
    assert full[(0, "A")] == 2 and full[(0, "B")] == 1
    # the window starting at 23:00 (previous day) holds only hour-0 votes
    assert full[(23, "A")] == 2 and (23, "B") not in full


def test_bigram_logprob_flags_shuffled_word_soup(spark):
    """The discriminating property over the unigram model: a doc with
    the SAME unigram distribution but scrambled word order must score
    lower (its transitions are rare), while the fluent docs that
    dominate the corpus score higher."""
    fluent = "the quick brown fox jumps over the lazy dog"
    shuffled = "dog the over fox lazy jumps quick the brown"
    rows = [(fluent, "en", "fluent")] * 6 + [(shuffled, "en", "soup")]
    out = {r["source"]: r for r in text.bigram_logprob_score(_docs(spark, rows)).collect()}
    assert out["soup"]["avg_logprob"] < out["fluent"]["avg_logprob"]


def test_bigram_logprob_single_token_docs_drop_out(spark):
    """Docs with < 2 tokens have no bigrams and must not appear."""
    rows = [("one", "en", "sA"), ("two words here", "en", "sB")]
    out = text.bigram_logprob_score(_docs(spark, rows)).collect()
    assert {r["source"] for r in out} == {"sB"}


def test_bigram_logprob_empty_text_does_not_crash(spark):
    """Empty / whitespace-only text tokenizes to ZERO tokens; the
    bigram slice must not throw INVALID_PARAMETER_VALUE.LENGTH (the
    never-throw robustness contract).  Such docs simply drop out."""
    rows = [
        ("", "en", "sA"),
        ("   ", "en", "sA"),
        ("two words here again", "en", "sB"),
    ]
    out = text.bigram_logprob_score(_docs(spark, rows)).collect()
    assert {r["source"] for r in out} == {"sB"}


def test_near_dup_triangles_known_graph(spark):
    """Three identical docs form a triangle (cc = 1 among them), two
    more identical docs form an isolated edge: 5 vertices, 4 edges,
    3 wedges, 1 triangle, global cc = 3*1/3 = 1.0."""
    from de_realtime_voting_spark.operators import dedup

    t1 = "alpha beta gamma delta epsilon zeta"
    t2 = "one two three four five six seven"
    rows = [(t1, "en", "s")] * 3 + [(t2, "en", "s")] * 2
    [row] = dedup.near_dup_triangles(_docs(spark, rows)).collect()
    assert row["n_vertices"] == 5
    assert row["n_edges"] == 4
    assert row["n_wedges"] == 3
    assert row["n_triangles"] == 1
    assert row["global_clustering"] == 1.0


def test_near_dup_triangles_empty_graph(spark):
    """No near-dups: zero counts and a 0.0 coefficient, not NaN."""
    from de_realtime_voting_spark.operators import dedup

    rows = [("completely different words here now", "en", "s"),
            ("nothing shared with the other text", "en", "s")]
    [row] = dedup.near_dup_triangles(_docs(spark, rows)).collect()
    assert row["n_edges"] == 0 and row["n_triangles"] == 0
    assert row["global_clustering"] == 0.0


def test_entropy_low_for_repetition_high_for_diversity(spark):
    """A looping doc must score below a same-length all-distinct doc;
    a one-token doc has entropy exactly 0."""
    rows = [
        ("spam " * 12, "en", "loop"),
        ("a b c d e f g h i j k l", "en", "diverse"),
        ("solo", "en", "single"),
    ]
    out = {r["source"]: r for r in text.text_entropy_score(_docs(spark, rows)).collect()}
    assert out["loop"]["avg_entropy"] == 0.0  # all tokens identical
    assert out["diverse"]["avg_entropy"] > 2.0  # ln(12) ~ 2.485
    assert out["single"]["avg_entropy"] == 0.0


def test_voter_stickiness_window_geometry(spark):
    """u1 daily for 8 days, u2 only on day 3: DAU=2 on day 3 only;
    WAU on day 3 counts both; stickiness 1.0 when DAU == WAU."""
    ev = _events(
        spark,
        [(1440 * d, 1, "view") for d in range(8)] + [(1440 * 2, 2, "view")],
    )
    out = {r["day"].date().isoformat(): r for r in voting.voter_stickiness(ev).collect()}
    assert out["2024-01-03"]["dau"] == 2
    assert out["2024-01-03"]["wau"] == 2
    assert out["2024-01-03"]["stickiness"] == 1.0
    # u2's day-3 activity stays in the trailing window through day 9,
    # so day 4..8 have dau=1, wau=2, stickiness 0.5
    assert out["2024-01-04"]["dau"] == 1
    assert out["2024-01-04"]["wau"] == 2
    assert out["2024-01-04"]["stickiness"] == 0.5
    # day 1: only u1 so far
    assert out["2024-01-01"]["wau"] == 1
