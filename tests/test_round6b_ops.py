"""Round-6b operator tests: source-pair dup matrix, LSH collision
stats, and the quality x duplication interaction report.

Each op is pinned against the frames it derives from (the verified
minhash pair set / the band frame), so the tests fail if the derived
report ever drifts from its ground truth rather than merely checking
shapes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from de_realtime_voting_spark.operators import dedup
from de_realtime_voting_spark.sources.tables import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_cross_source_dup_matrix_accounts_every_pair(spark, sf_dir):
    """Cell counts must partition the verified pair set exactly:
    summing n_pairs over cells reproduces |pairs|, shares sum to 1,
    and each cell equals a hand-labeled recount of the pair frame."""
    docs = _docs(spark, sf_dir)
    pairs = dedup.dedup_minhash_pairs(docs).collect()
    src = {r.doc_id: r.source for r in docs.select("doc_id", "source").collect()}
    want: dict[tuple[str, str], int] = {}
    for p in pairs:
        a, b = sorted((src[p.doc_a], src[p.doc_b]))
        want[(a, b)] = want.get((a, b), 0) + 1
    spark.catalog.clearCache()

    got = dedup.cross_source_dup_matrix(docs).collect()
    assert {(r.source_a, r.source_b): r.n_pairs for r in got} == want
    assert sum(r.n_pairs for r in got) == len(pairs)
    assert abs(sum(r.pair_share for r in got) - 1.0) < 1e-4
    for r in got:
        assert r.source_a <= r.source_b
    spark.catalog.clearCache()


def test_minhash_band_collision_stats_match_band_frame(spark, sf_dir):
    """Per-band stats must recount the band frame exactly, and the
    candidate_pairs column must equal the exact number of unordered
    in-bucket pairs (the verify-stage workload it predicts)."""
    docs = _docs(spark, sf_dir)
    bands = dedup._doc_bands(docs).collect()
    buckets: dict[tuple[int, str], int] = {}
    for r in bands:
        buckets[(r.band_idx, r.band_hash)] = buckets.get((r.band_idx, r.band_hash), 0) + 1
    want = {}
    for (bi, _), k in buckets.items():
        w = want.setdefault(bi, [0, 0, 0, 0, 0])  # buckets, docs, colliding, pairs, max
        w[0] += 1
        w[1] += k
        w[2] += 1 if k > 1 else 0
        w[3] += k * (k - 1) // 2
        w[4] = max(w[4], k)
    spark.catalog.clearCache()

    got = dedup.minhash_band_collision_stats(docs).collect()
    assert len(got) == len(want)
    for r in got:
        b, d, c, p, m = want[r.band_idx]
        assert (r.n_buckets, r.n_docs, r.n_colliding_buckets) == (b, d, c)
        assert (r.candidate_pairs, r.max_bucket) == (p, m)


def test_dup_quality_report_splits_flagged_vs_clean(spark, sf_dir):
    """n_docs covers every doc of the source, n_dup_docs counts the
    distinct docs in verified pairs, and the two averages are taken
    over disjoint doc sets that union to the source."""
    docs = _docs(spark, sf_dir)
    pairs = dedup.dedup_minhash_pairs(docs).collect()
    flagged = {d for p in pairs for d in (p.doc_a, p.doc_b)}
    totals = {
        r.source: r.cnt
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    dup_by_src = {}
    for r in docs.select("doc_id", "source").collect():
        if r.doc_id in flagged:
            dup_by_src[r.source] = dup_by_src.get(r.source, 0) + 1
    spark.catalog.clearCache()

    got = {r.source: r for r in dedup.dup_quality_report(docs).collect()}
    assert set(got) == set(totals)
    for source, r in got.items():
        assert r.n_docs == totals[source]
        assert r.n_dup_docs == dup_by_src.get(source, 0)
        # a source with no dups has no dup average (and vice versa)
        if r.n_dup_docs == 0:
            assert r.avg_dup_quality is None
        else:
            assert 0.0 <= r.avg_dup_quality <= 1.0
        if r.n_dup_docs == r.n_docs:
            assert r.avg_clean_quality is None
        else:
            assert 0.0 <= r.avg_clean_quality <= 1.0
    spark.catalog.clearCache()


def test_dup_quality_report_null_dup_average_on_clean_corpus(spark):
    """A corpus with no near-dups yields n_dup_docs = 0 everywhere
    and a NULL dup-side average -- the report must not invent 0.0."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta", "en", "s1", 35),
        (2, "one two three four five six seven", "en", "s1", 33),
        (3, "totally different words here now ok", "en", "s2", 35),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {r.source: r for r in dedup.dup_quality_report(docs).collect()}
    assert got["s1"].n_dup_docs == 0 and got["s2"].n_dup_docs == 0
    assert got["s1"].avg_dup_quality is None
    assert got["s1"].avg_clean_quality is not None
    spark.catalog.clearCache()


def test_token_bucket_counts_two_plans_agree(spark, sf_dir):
    """The batch (two-stage) and streamable (one-agg) plans of
    token_bucket_counts must produce identical wide rows -- the
    cms_sketch_from_counts-style twin pin that lets the batch face
    keep the cheaper plan without the faces drifting apart."""
    from de_realtime_voting_spark.operators.text import token_bucket_counts

    docs = load_table(spark, sf_dir, "documents")
    a = {r["source"]: r.asDict() for r in token_bucket_counts(docs).collect()}
    b = {
        r["source"]: r.asDict()
        for r in token_bucket_counts(docs, streamable=True).collect()
    }
    assert a == b and a


def test_corpus_span_excised_matches_cut_list(spark, sf_dir):
    """The materializer must agree with its own report: per doc,
    tokens_removed == n_before - n_after, uncut docs hash their own
    token stream, and a cut doc's kept tokens equal a python replay
    of the span list."""
    import hashlib

    from de_realtime_voting_spark.operators.text import (
        corpus_span_excised,
        repeated_span_excision,
    )

    docs = load_table(spark, sf_dir, "documents")
    spans = {}
    for r in repeated_span_excision(docs).collect():
        spans.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    spark.catalog.clearCache()

    got = {r.doc_id: r for r in corpus_span_excised(docs).collect()}
    assert set(got) == set(texts)
    assert any(spans.values())
    for doc_id, r in got.items():
        toks = [t for t in (texts[doc_id] or "").split(" ") if t]
        cut = set()
        for s, e in spans.get(doc_id, []):
            cut.update(range(s, e + 1))
        kept = [t for i, t in enumerate(toks, start=1) if i not in cut]
        assert r.n_tokens_before == len(toks)
        assert r.n_tokens_after == len(kept)
        want_md5 = hashlib.md5(" ".join(kept).encode()).hexdigest()
        assert r.excised_md5 == want_md5, doc_id
    spark.catalog.clearCache()


def test_embedding_whitened_norms_python_reference(spark, sf_dir):
    """Whitening against the published (rounded) stats: norms match a
    python replay, and the whitened per-dimension variance is ~1
    (the point of the transform)."""
    import math

    from de_realtime_voting_spark.constants import EMBEDDING_DIM, WHITEN_EPS
    from de_realtime_voting_spark.operators.similarity import (
        embedding_whitened_norms,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = {r.vec_id: list(r.embedding) for r in emb.collect()}
    n = len(vecs)
    mu, va = [], []
    for i in range(EMBEDDING_DIM):
        xs = [v[i] for v in vecs.values()]
        m = sum(xs) / n
        mu.append(round(m, 6))
        va.append(round(sum(x * x for x in xs) / n - m * m, 6))

    got = {r.vec_id: r for r in embedding_whitened_norms(emb).collect()}
    assert set(got) == set(vecs)
    whitened_sq_by_dim = [0.0] * EMBEDDING_DIM
    for vec_id, v in vecs.items():
        nb = math.sqrt(sum(x * x for x in v))
        w = [
            (x - mu[i]) / math.sqrt(va[i] + WHITEN_EPS)
            for i, x in enumerate(v)
        ]
        na = math.sqrt(sum(y * y for y in w))
        assert abs(got[vec_id].norm_before - nb) < 2e-5, vec_id
        assert abs(got[vec_id].norm_after - na) < 2e-5, vec_id
        for i, y in enumerate(w):
            whitened_sq_by_dim[i] += y * y
    # whitened second moment per dim ~ 1 (mean removed, var scaled)
    for i in range(EMBEDDING_DIM):
        ratio = whitened_sq_by_dim[i] / n
        assert 0.9 < ratio < 1.15, (i, ratio)


def test_corpus_temperature_sample_preserves_mix_and_determinism(spark, sf_dir):
    """The sampler must (a) keep exactly the docs whose md5 bucket
    clears the source threshold (python replay), (b) keep 100% of the
    max-boost source, and (c) produce kept shares ordered like the
    target rates (the mix actually shifts toward the tail)."""
    import hashlib

    from de_realtime_voting_spark.operators.pipeline import (
        corpus_temperature_sample,
        source_temperature_weights,
    )

    docs = load_table(spark, sf_dir, "documents")
    boosts = {
        r.source: r.mix_boost for r in source_temperature_weights(docs).collect()
    }
    mb = max(boosts.values())
    thresholds = {s: int((b / mb) * 10000) for s, b in boosts.items()}

    def bucket(doc_id):
        h = hashlib.md5(f"temp:{doc_id}".encode()).hexdigest()[:4]
        return int(h, 16) % 10000

    want = {}
    totals = {}
    for r in docs.select("doc_id", "source").collect():
        totals[r.source] = totals.get(r.source, 0) + 1
        if bucket(r.doc_id) < thresholds[r.source]:
            want[r.source] = want.get(r.source, 0) + 1
    spark.catalog.clearCache()

    got = {r.source: r for r in corpus_temperature_sample(docs).collect()}
    assert set(got) == set(totals)
    for source, r in got.items():
        assert r.n_docs == totals[source]
        assert r.n_kept == want.get(source, 0), source
    top = max(boosts, key=boosts.get)
    assert got[top].n_kept == got[top].n_docs  # max-boost source keeps all
    # deterministic: a second run returns identical rows
    again = {r.source: r.n_kept for r in corpus_temperature_sample(docs).collect()}
    assert again == {s: r.n_kept for s, r in got.items()}
    spark.catalog.clearCache()


def test_ann_ivf_probe_sweep_monotone_and_consistent(spark, sf_dir):
    """Recall must be non-decreasing in nprobe (probing more cells
    can only add candidates), the nprobe=IVF_NPROBE row must agree
    with ann_recall_report's ivf arm, and every recall is in [0,1]."""
    from de_realtime_voting_spark.constants import IVF_NPROBE, IVF_PROBE_SWEEP_MAX
    from de_realtime_voting_spark.operators.similarity import (
        ann_ivf_probe_sweep,
        ann_recall_report,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    rows = {r.nprobe: r for r in ann_ivf_probe_sweep(emb).collect()}
    spark.catalog.clearCache()
    assert sorted(rows) == list(range(1, IVF_PROBE_SWEEP_MAX + 1))
    prev = -1.0
    for p in sorted(rows):
        r = rows[p]
        assert 0.0 <= r.min_recall <= r.avg_recall <= 1.0
        assert r.avg_recall >= prev - 1e-9, p
        prev = r.avg_recall

    report = ann_recall_report(emb).where(F.col("method") == "ivf").collect()
    spark.catalog.clearCache()
    # ann_recall_report averages per query with the same exact
    # rationals: its mean recall must equal the sweep's IVF_NPROBE row
    mean = sum(sorted(r.recall for r in report)) / len(report)
    assert abs(rows[IVF_NPROBE].avg_recall - round(mean, 6)) < 2e-6


def test_seq_pack_bestfit_matches_python_and_invariants(spark, sf_dir):
    """The FFD packer must reproduce an independent python replay per
    (lang, shard) and satisfy the packing invariants: FFD never needs
    more windows than next-fit, and every layout respects capacity
    (total <= windows * capacity)."""
    from de_realtime_voting_spark.constants import PACK_SHARDS, PACK_WINDOW_TOKENS
    from de_realtime_voting_spark.operators.pipeline import seq_pack_bestfit

    docs = load_table(spark, sf_dir, "documents")
    win = PACK_WINDOW_TOKENS
    groups = {}
    for r in docs.select("doc_id", "lang", "text").collect():
        toks = [t for t in (r.text or "").split(" ") if t]
        key = (r.lang, r.doc_id % PACK_SHARDS)
        groups.setdefault(key, []).append((min(len(toks), win), r.doc_id))

    def replay(items):
        by_id = sorted(items, key=lambda x: x[1])
        nf, cur = 0, win
        for t, _ in by_id:
            if t == 0:
                continue
            if cur + t > win:
                nf, cur = nf + 1, t
            else:
                cur += t
        bins = []
        for t, _ in sorted(items, key=lambda x: (-x[0], x[1])):
            if t == 0:
                continue
            for i, used in enumerate(bins):
                if used + t <= win:
                    bins[i] = used + t
                    break
            else:
                bins.append(t)
        return nf, len(bins)

    got = {(r.lang, r.shard): r for r in seq_pack_bestfit(docs).collect()}
    assert set(got) == set(groups)
    for key, items in groups.items():
        nf, ffd = replay(items)
        r = got[key]
        assert (r.n_windows_nextfit, r.n_windows_ffd) == (nf, ffd), key
        assert r.n_docs == len(items)
        assert r.total_tokens == sum(t for t, _ in items)
        assert r.n_windows_ffd <= r.n_windows_nextfit
        assert r.total_tokens <= r.n_windows_ffd * win


def test_seq_pack_bestfit_edge_shapes(spark):
    """Synthetic edge shapes in one pass: oversized docs truncate to a
    full window each, a group of n equal half-window docs packs into
    ceil(n/2) windows, and empty-token docs cost nothing."""
    import random

    from de_realtime_voting_spark.constants import PACK_SHARDS, PACK_WINDOW_TOKENS
    from de_realtime_voting_spark.operators.pipeline import seq_pack_bestfit

    win = PACK_WINDOW_TOKENS
    half = win // 2
    rng = random.Random(42)
    rows = []
    # lang 'xx': 5 oversized docs (3x window) on one shard
    rows += [
        (i * PACK_SHARDS, "xx", " ".join(["t"] * (3 * win))) for i in range(5)
    ]
    # lang 'yy': 7 exactly-half-window docs on one shard
    rows += [
        (i * PACK_SHARDS, "yy", " ".join(["t"] * half)) for i in range(7)
    ]
    # lang 'zz': empty and whitespace-only docs on one shard
    rows += [(0, "zz", ""), (PACK_SHARDS, "zz", " "), (2 * PACK_SHARDS, "zz", "x")]
    # lang 'rr': random sizes, replay-checked
    sizes = [rng.randint(1, win) for _ in range(40)]
    rows += [
        (i * PACK_SHARDS, "rr", " ".join(["t"] * s)) for i, s in enumerate(sizes)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {(r.lang, r.shard): r for r in seq_pack_bestfit(docs).collect()}

    xx = got[("xx", 0)]
    assert xx.n_windows_ffd == 5 and xx.total_tokens == 5 * win  # truncated
    yy = got[("yy", 0)]
    assert yy.n_windows_ffd == 4  # ceil(7/2) pairs of half windows
    zz = got[("zz", 0)]
    assert zz.total_tokens == 1 and zz.n_windows_ffd == 1
    rr = got[("rr", 0)]
    bins = []
    for t in sorted(sizes, reverse=True):
        for i, used in enumerate(bins):
            if used + t <= win:
                bins[i] = used + t
                break
        else:
            bins.append(t)
    assert rr.n_windows_ffd == len(bins)
    assert rr.n_windows_ffd <= rr.n_windows_nextfit


def test_token_bucket_drift_zero_for_uniform_source(spark):
    """A source whose token mix IS the corpus mix must read tv=0, and
    a source speaking a disjoint vocabulary reads tv near 1 - its own
    corpus share; all drifts live in [0, 1]."""
    from de_realtime_voting_spark.operators.text import token_bucket_drift

    # two sources with IDENTICAL text -> corpus = each source -> tv=0
    rows = [
        (1, "same words here", "en", "s1", 15),
        (2, "same words here", "en", "s2", 15),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {r.source: r.tv_drift for r in token_bucket_drift(docs).collect()}
    assert got == {"s1": 0.0, "s2": 0.0}
    spark.catalog.clearCache()


def test_fuzzy_decontam_subset_of_pairs_and_catches_weak_overlap(spark, sf_dir):
    """Fuzzy decontam must (a) involve only corpus x eval pairs, (b)
    contain every VERIFIED dup pair that straddles the eval boundary
    (its threshold is lower), and (c) agree with a python Jaccard
    recount on every emitted pair."""
    from de_realtime_voting_spark.constants import (
        EVAL_SOURCE,
        FUZZY_DECONTAM_THRESHOLD,
        SHINGLE_K,
    )
    from de_realtime_voting_spark.operators.dedup import (
        dedup_minhash_pairs,
        fuzzy_decontam,
    )

    docs = load_table(spark, sf_dir, "documents")
    src = {r.doc_id: r.source for r in docs.select("doc_id", "source").collect()}
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    dup_pairs = dedup_minhash_pairs(docs).collect()
    spark.catalog.clearCache()

    got = {(r.doc_id, r.eval_doc_id): r.jaccard for r in fuzzy_decontam(docs).collect()}
    assert got, "sf corpora have dup classes straddling the eval source"
    for (c, e), jac in got.items():
        assert src[c] != EVAL_SOURCE and src[e] == EVAL_SOURCE

        def shingles(t):
            toks = [w for w in (t or "").split(" ") if w]
            return {
                " ".join(toks[i : i + SHINGLE_K])
                for i in range(len(toks) - SHINGLE_K + 1)
            }

        sa, sb = shingles(texts[c]), shingles(texts[e])
        want = len(sa & sb) / len(sa | sb)
        assert abs(jac - want) < 1e-12
        assert jac >= FUZZY_DECONTAM_THRESHOLD
    # every dup-threshold pair across the eval boundary is contained
    for p in dup_pairs:
        a_eval, b_eval = src[p.doc_a] == EVAL_SOURCE, src[p.doc_b] == EVAL_SOURCE
        if a_eval != b_eval:
            key = (p.doc_b, p.doc_a) if a_eval else (p.doc_a, p.doc_b)
            assert key in got, key
    spark.catalog.clearCache()


def test_normalized_dedup_gain_finds_reformatted_copies(spark):
    """Normalization must collapse case/punct/whitespace variants of
    one text into one class while raw hashing keeps them apart, and
    must NEVER split classes raw hashing merged (norm_classes <=
    raw_classes always)."""
    from de_realtime_voting_spark.operators.dedup import normalized_dedup_gain

    rows = [
        (1, "Hello, World!  How are you?", "en", "s1", 27),
        (2, "hello world how are you", "en", "s1", 23),
        (3, "HELLO   WORLD -- how are you", "en", "s1", 28),
        (4, "a completely different text", "en", "s1", 27),
        (5, "same bytes", "en", "s2", 10),
        (6, "same bytes", "en", "s2", 10),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {r.source: r for r in normalized_dedup_gain(docs).collect()}
    s1 = got["s1"]
    assert (s1.n_docs, s1.raw_classes, s1.norm_classes) == (4, 4, 2)
    assert s1.extra_dups == 2  # docs 2 and 3 fold into doc 1's class
    s2 = got["s2"]  # raw-exact dups: normalization adds nothing
    assert (s2.raw_classes, s2.norm_classes, s2.extra_dups) == (1, 1, 0)
    for r in got.values():
        assert r.norm_classes <= r.raw_classes
    spark.catalog.clearCache()
