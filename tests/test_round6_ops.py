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


# ---------------------------------------------------------------- #
# Batched BPE trainer (r6 item: per-merge driver loop -> per-pass)  #
# ---------------------------------------------------------------- #

def test_bpe_batched_batch1_equals_sequential(spark, sf_dir):
    """With batch=1 the batched trainer degenerates to the classic
    sequential trainer exactly: one selection per pass on fresh
    counts is Sennrich greedy BPE.  Pins the refactor (shared
    _bpe_pair_counts) and the single-merge fold against the
    oracle-gated sequential implementation."""
    from de_realtime_voting_spark.operators.text import (
        _bpe_train,
        _bpe_train_batched,
    )

    docs = _docs(spark, sf_dir)
    seq_merges, _ = _bpe_train(docs)
    bat_merges, _ = _bpe_train_batched(docs, batch=1)
    assert bat_merges == seq_merges


def test_bpe_batched_selection_is_symbol_disjoint(spark, sf_dir):
    """Within each pass the selected pairs' symbol triples
    {left, right, left||right} are pairwise disjoint -- the property
    that makes the one-pass rewrite fold exact."""
    from de_realtime_voting_spark.constants import BPE_BATCH
    from de_realtime_voting_spark.operators.text import _bpe_train_batched

    merges, _ = _bpe_train_batched(_docs(spark, sf_dir))
    assert merges, "corpus trains at least one merge"
    by_pass: dict[int, list] = {}
    for step, left, right, _cnt, new in merges:
        by_pass.setdefault((step - 1) // BPE_BATCH, []).append(
            {left, right, new}
        )
    for syms in by_pass.values():
        for i in range(len(syms)):
            for j in range(i + 1, len(syms)):
                assert not (syms[i] & syms[j])


def test_bpe_batched_fold_matches_sequential_application(spark):
    """Applying a batch of disjoint merges in ONE fold equals
    applying them one at a time: hand corpus where both merges fire
    inside the same word, including the greedy-overlap case."""
    from de_realtime_voting_spark.operators.text import _bpe_train_batched

    # 'aaacd cd cd': counts (c,d)=12 > (a,a)=8 > (a,c)=4, so both
    # trainers pick (c,d) then (a,a) -- (a,c) conflicts in the batch
    # and loses the count race sequentially -- and both merges fire
    # inside the word 'aaacd'; (a,a) over 'aaa' exercises greedy
    # left-to-right overlap ("aaa" -> ["aa", "a"]).
    docs = spark.createDataFrame(
        [("d%d" % i, "aaacd cd cd", "en") for i in range(4)],
        "doc_id string, text string, lang string",
    )
    merges2, vocab2 = _bpe_train_batched(docs, n_merges=2, batch=2)
    merges1, vocab1 = _bpe_train_batched(docs, n_merges=2, batch=1)
    assert [(m[1], m[2]) for m in merges2] == [(m[1], m[2]) for m in merges1]
    rows2 = {r["w"]: r["syms"] for r in vocab2.collect()}
    rows1 = {r["w"]: r["syms"] for r in vocab1.collect()}
    assert rows2 == rows1
    assert rows2["aaacd"] == ["aa", "a", "cd"]


def test_bpe_batched_merge_count_and_schema(spark, sf_dir):
    """The shipped query returns <= BPE_MERGE_STEPS rows with dense
    1..n step numbering and new_symbol = left || right."""
    from de_realtime_voting_spark.constants import BPE_MERGE_STEPS
    from de_realtime_voting_spark.operators.text import bpe_train_merges_batched

    rows = bpe_train_merges_batched(_docs(spark, sf_dir)).collect()
    assert 0 < len(rows) <= BPE_MERGE_STEPS
    assert [r.step for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        assert r.new_symbol == r.left + r.right
        assert r.pair_count > 0


# ---------------------------------------------------------------- #
# semantic_dedup cell-budget split (r6)                             #
# ---------------------------------------------------------------- #

def _split_corpus_rows():
    """600 vectors all in centroid 0's cell: 300 copies of
    c0 + eps*plane0 and 300 of c0 - eps*plane0, eps sized from the
    constants so the halves differ in exactly the plane-0 sign bit
    (and eps stays far below the inter-centroid distance)."""
    import numpy as np

    from de_realtime_voting_spark.constants import LSH_PLANES
    from de_realtime_voting_spark.ivf_model import IVF_TRAINED_CENTROIDS

    c0 = np.array(IVF_TRAINED_CENTROIDS[0][1], dtype=np.float64)
    p0 = np.array(LSH_PLANES[0], dtype=np.float64)
    # eps flips plane-0's sign between the halves with 3x margin
    eps = 3.0 * abs(float(c0 @ p0)) / float(p0 @ p0) + 1e-3
    va = (c0 + eps * p0).astype(np.float32)
    vb = (c0 - eps * p0).astype(np.float32)
    assert float(va.astype(np.float64) @ p0) > 0 > float(
        vb.astype(np.float64) @ p0
    )
    return [(i, [float(x) for x in (va if i < 300 else vb)]) for i in range(600)]


def test_semantic_dedup_budget_split_engages(spark):
    """A cell over SEMDEDUP_CELL_BUDGET members must pair within
    (cell, lsh_bucket) sub-blocks, not across the whole cell.

    Every intra-half cosine is exactly 1; cross-half cosine is also
    ~1 -- so WITHOUT the split the report would read
    pairs=C(600,2)=179700, dropped=599, and WITH the split it must
    read pairs=2*C(300,2)=89700, dropped=598, kept=2."""
    from de_realtime_voting_spark.constants import SEMDEDUP_CELL_BUDGET
    from de_realtime_voting_spark.operators.dedup import semantic_dedup

    assert SEMDEDUP_CELL_BUDGET < 600
    emb = spark.createDataFrame(
        _split_corpus_rows(), "vec_id bigint, embedding array<float>"
    )
    out = semantic_dedup(emb).collect()
    assert len(out) == 1, out  # eps << centroid separation: one cell
    r = out[0]
    assert r.n_vecs == 600
    assert r.n_dup_pairs == 2 * (300 * 299) // 2
    assert r.n_dropped == 598
    assert r.n_kept == 2


def test_semantic_dedup_split_path_matches_duckdb_oracle(spark, tmp_path):
    """Cross-engine check of the OVERSIZED-cell branch: the parity
    sweep's SFs never exceed SEMDEDUP_CELL_BUDGET (cells are ~31-144
    members there), so the sub = lsh_bucket arm of both the operator
    and SQL['semantic_dedup'] would otherwise ship unexercised against
    the oracle.  Run both engines on the synthetic oversized-cell
    corpus and compare the full report."""
    import duckdb

    from de_realtime_voting_spark.operators.dedup import semantic_dedup
    from de_realtime_voting_spark.oracles import SQL

    emb = spark.createDataFrame(
        _split_corpus_rows(), "vec_id bigint, embedding array<float>"
    )
    out = str(tmp_path / "emb")
    emb.write.parquet(out)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{out}/*.parquet'")
    want = sorted(
        map(tuple, con.sql(SQL["semantic_dedup"]).fetchall())
    )
    got = sorted(
        (r.cell, r.n_vecs, r.n_dup_pairs, r.n_dropped, r.n_kept)
        for r in semantic_dedup(emb).collect()
    )
    assert got == want and len(got) == 1


# ---------------------------------------------------------------- #
# repeated_span_excision (Lee et al. exact-substring cut list)      #
# ---------------------------------------------------------------- #

def _span_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_span_excision_keeps_first_occurrence(spark):
    """Two identical 10-token docs: every K-gram repeats, the
    lexicographic-first doc keeps all of them, the second doc gets
    one merged span covering the whole text."""
    from de_realtime_voting_spark.constants import SPAN_NGRAM_K
    from de_realtime_voting_spark.operators.text import repeated_span_excision

    assert SPAN_NGRAM_K == 8  # the hand corpora below assume K=8
    text = " ".join(f"w{i}" for i in range(10))
    out = repeated_span_excision(
        _span_docs(spark, [(1, text), (2, text)])
    ).collect()
    assert [(r.doc_id, r.span_start, r.span_end, r.n_tokens) for r in out] == [
        (2, 1, 10, 10)
    ]


def test_span_excision_within_doc_repeat(spark):
    """A doc that repeats its own opening 8-gram later in the same
    text: the second occurrence is cut even with no other doc."""
    from de_realtime_voting_spark.operators.text import repeated_span_excision

    text = " ".join([f"x{i}" for i in range(8)] * 2)  # 16 tokens
    out = repeated_span_excision(_span_docs(spark, [(3, text)])).collect()
    assert [(r.doc_id, r.span_start, r.span_end, r.n_tokens) for r in out] == [
        (3, 9, 16, 8)
    ]


def test_span_excision_island_gap_splits(spark):
    """Shared prefix and shared suffix separated by a differing
    middle token: removable windows at pos 1 and pos 10 do NOT merge
    (10 > 1 + K), yielding two distinct spans."""
    from de_realtime_voting_spark.operators.text import repeated_span_excision

    a = [f"a{i}" for i in range(8)]
    c = [f"c{i}" for i in range(8)]
    d4 = " ".join(a + ["b"] + c)
    d5 = " ".join(a + ["d"] + c)
    out = repeated_span_excision(
        _span_docs(spark, [(4, d4), (5, d5)])
    ).collect()
    got = sorted((r.doc_id, r.span_start, r.span_end, r.n_tokens) for r in out)
    assert got == [(5, 1, 8, 8), (5, 10, 17, 8)]


def test_span_excision_no_repeats_empty(spark):
    """All-unique corpus -> empty cut list."""
    from de_realtime_voting_spark.operators.text import repeated_span_excision

    out = repeated_span_excision(
        _span_docs(spark, [(1, " ".join(f"u{i}" for i in range(12)))])
    ).collect()
    assert out == []


def test_span_excision_stats_accounting(spark):
    """Two identical 10-token docs in one (lang, source) group: one
    doc keeps everything, the other loses its whole text -- the
    report must show exactly half the group's tokens removed."""
    from de_realtime_voting_spark.operators.text import span_excision_stats

    text = " ".join(f"w{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(1, text, "en", "srcA"), (2, text, "en", "srcA")],
        "doc_id bigint, text string, lang string, source string",
    )
    rows = span_excision_stats(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.lang, r.source) == ("en", "srcA")
    assert r.n_docs == 2 and r.n_docs_cut == 1 and r.n_spans == 1
    assert r.total_tokens == 20 and r.tokens_removed == 10
    assert r.removed_share == 0.5


def test_token_distribution_drift_hand_values(spark):
    """Two 3-token sources with mirrored skews: KL is symmetric here
    by construction and matches the hand-computed value; a source
    identical to the corpus mix would read 0."""
    import math

    from de_realtime_voting_spark.operators.text import (
        token_distribution_drift,
    )

    docs = spark.createDataFrame(
        [(1, "a a b", "en", "srcA"), (2, "a b b", "en", "srcB")],
        "doc_id bigint, text string, lang string, source string",
    )
    rows = {r.source: r for r in token_distribution_drift(docs).collect()}
    assert set(rows) == {"srcA", "srcB"}
    # corpus: a=3, b=3 of 6 -> p_c = 1/2 each; srcA: p(a)=2/3, p(b)=1/3
    want = round(
        (2 / 3) * math.log((2 / 3) / 0.5) + (1 / 3) * math.log((1 / 3) / 0.5),
        6,
    )
    for r in rows.values():
        assert r.n_tokens == 3 and r.vocab_size == 2
        assert r.kl_drift == want


def test_token_distribution_drift_uniform_source_zero(spark):
    """A corpus with one source IS the corpus distribution: KL must
    be exactly 0 (not epsilon) -- the p_s == p_c terms cancel inside
    ln, no float residue survives the rounding."""
    from de_realtime_voting_spark.operators.text import (
        token_distribution_drift,
    )

    docs = spark.createDataFrame(
        [(1, "x y z x", "en", "only")],
        "doc_id bigint, text string, lang string, source string",
    )
    rows = token_distribution_drift(docs).collect()
    assert len(rows) == 1 and rows[0].kl_drift == 0.0


def test_knn_label_purity_matches_bruteforce_composition(spark, sf_dir):
    """Purity must equal what you get by labeling ann_bruteforce_topk's
    neighbor lists by hand -- same probes, same top-k, same
    tie-breaks."""
    from de_realtime_voting_spark.queries import QUERY_REGISTRY
    from de_realtime_voting_spark.sources import load_table

    labels = {
        r.vec_id: r.label
        for r in load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    topk: dict[int, list[int]] = {}
    for r in QUERY_REGISTRY["ann_bruteforce_topk"](spark, sf_dir).collect():
        topk.setdefault(r.query_id, []).append(r.neighbor_id)
    got = {
        r.query_id: (r.query_label, r.n_same_label, r.purity)
        for r in QUERY_REGISTRY["knn_label_purity"](spark, sf_dir).collect()
    }
    assert set(got) == set(topk) and len(got) > 0
    for q, nbrs in topk.items():
        same = sum(1 for n in nbrs if labels[n] == labels[q])
        assert got[q] == (labels[q], same, round(same / len(nbrs), 6))


def test_knn_label_purity_perfect_cluster(spark):
    """A probe whose 5 nearest vectors all share its label reads
    purity 1.0; a probe surrounded by the other label reads 0.0."""
    import numpy as np

    from de_realtime_voting_spark.constants import ANN_K, EMBEDDING_DIM
    from de_realtime_voting_spark.operators.similarity import knn_label_purity

    rng_a = np.zeros(EMBEDDING_DIM, dtype=np.float32)
    rng_a[0] = 1.0
    rng_b = np.zeros(EMBEDDING_DIM, dtype=np.float32)
    rng_b[1] = 1.0
    rows = []
    # probe 0 (label 1) + ANN_K same-label twins near axis 0
    rows.append((0, [float(x) for x in rng_a], 1))
    for i in range(1, ANN_K + 1):
        v = rng_a.copy()
        v[2] = 0.01 * i
        rows.append((i, [float(x) for x in v], 1))
    # probe 5? no -- fill the other cluster far away on axis 1 with
    # label 2 so probe 0's top-k stays inside its own cluster
    for i in range(ANN_K + 1, 2 * ANN_K + 2):
        v = rng_b.copy()
        v[3] = 0.01 * i
        rows.append((i, [float(x) for x in v], 2))
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    out = {r.query_id: r for r in knn_label_purity(emb).collect()}
    assert out[0].purity == 1.0 and out[0].n_same_label == ANN_K


def test_bpe_fertility_batched_invariants(spark, sf_dir):
    """Fertility report sanity for the batched build: merges only
    ever shrink the symbol stream, so per-lang total_symbols is
    bounded by total_chars (the unmerged stream) from above and by
    n_words from below; fertility = symbols/words >= 1."""
    from de_realtime_voting_spark.operators.text import (
        bpe_fertility_stats_batched,
    )

    rows = bpe_fertility_stats_batched(_docs(spark, sf_dir)).collect()
    assert rows
    for r in rows:
        assert r.n_words > 0
        assert r.n_words <= r.total_symbols <= r.total_chars
        assert r.fertility >= 1.0
        assert r.chars_per_symbol >= 1.0
