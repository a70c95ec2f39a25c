"""Behavioral contracts for the round-4 continuation ops (session 4):
token-budget greedy curation, Bloom-prefiltered decontamination, and
the distributed BPE trainer.  (Cross-engine value parity is covered
registry-wide by test_queries_oracle / tools.check_parity.)"""

from __future__ import annotations

from de_realtime_voting_spark.constants import (
    BPE_MERGE_STEPS,
    EVAL_SOURCE,
    TOKEN_BUDGET,
)
from de_realtime_voting_spark.operators import pipeline, text


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", src, len(t)) for i, (t, src) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


# ---------------------------------------------------------------- budget


def _doc_of_tokens(n):
    return " ".join("tok" for _ in range(n))


def test_token_budget_keeps_quality_prefix_with_doc_id_tiebreak(spark):
    """Identical texts score identically, so greedy order is doc_id
    ascending; with 5k-token docs and a 12k budget exactly the first
    two fit (inclusive cumsum: 5k, 10k, 15k>12k)."""
    assert TOKEN_BUDGET == 12_000  # the arithmetic below assumes it
    docs = _docs(spark, [(_doc_of_tokens(5000), f"s{i}") for i in range(3)])
    out = {r["source"]: r for r in pipeline.token_budget_select(docs).collect()}
    assert out["s0"]["n_kept"] == 1 and out["s1"]["n_kept"] == 1
    assert out["s2"]["n_kept"] == 0
    assert out["s2"]["cutoff_quality"] is None
    assert all(r["n_docs"] == 1 and r["total_tokens"] == 5000 for r in out.values())


def test_token_budget_boundary_is_inclusive(spark):
    """A single doc whose inclusive cumsum lands exactly on the budget
    is kept (cum <= TOKEN_BUDGET)."""
    docs = _docs(spark, [(_doc_of_tokens(TOKEN_BUDGET), "sA")])
    [r] = pipeline.token_budget_select(docs).collect()
    assert r["n_kept"] == 1
    assert r["kept_tokens"] == TOKEN_BUDGET


def test_token_budget_two_phase_equals_naive_cumsum(spark):
    """The bucket-offset running sum must equal the single-window
    definition: replay selection in pandas over the same per-doc
    (quality, n_tokens) frame and compare kept counts per source."""
    rows = []
    for i in range(40):
        # vary length and stopword share so qualities spread widely
        body = ("the and of to in " * (i % 7 + 1)) + ("zzz " * (i % 11))
        rows.append((body + _doc_of_tokens(300 + 37 * i), f"s{i % 5}"))
    docs = _docs(spark, rows)
    got = {r["source"]: r["n_kept"] for r in pipeline.token_budget_select(docs).collect()}

    from pyspark.sql import functions as F
    from de_realtime_voting_spark.functions import tokens
    from de_realtime_voting_spark.operators.text import _doc_quality

    per_doc = docs.select(
        "doc_id",
        "source",
        F.size(tokens(F.col("text"))).alias("n_tokens"),
        _doc_quality(tokens(F.col("text"))).alias("quality"),
    ).toPandas()
    per_doc = per_doc.sort_values(["quality", "doc_id"], ascending=[False, True])
    per_doc["cum"] = per_doc["n_tokens"].cumsum()
    kept = per_doc[per_doc["cum"] <= TOKEN_BUDGET]
    want = kept.groupby("source").size().to_dict()
    assert {s: n for s, n in got.items() if n} == {
        s: int(n) for s, n in want.items() if n
    }


# ---------------------------------------------------------------- bloom


def test_bloom_decontam_matches_exact_path(spark):
    """The Bloom prefilter only prunes; the verify join decides -- so
    the report must be row-identical to benchmark_decontam on a
    corpus with planted contamination."""
    gram = "w1 w2 w3 w4 w5 w6 w7 w8"
    rows = [
        (gram + " tailA tailB", EVAL_SOURCE),
        (gram + " other words here", "sX"),  # contaminated
        ("completely different text " + _doc_of_tokens(8), "sX"),
        ("clean corpus doc " + _doc_of_tokens(10), "sY"),
    ]
    docs = _docs(spark, rows)
    got = sorted(map(tuple, pipeline.bloom_decontam(docs).collect()))
    want = sorted(map(tuple, pipeline.benchmark_decontam(docs).collect()))
    assert got == want
    by_src = {t[0]: t for t in got}
    assert by_src["sX"][2] == 1  # n_contaminated


def test_bloom_decontam_no_eval_grams_means_clean(spark):
    """With no eval-source docs the filter is all-zeros and nothing is
    flagged -- and the op must not error on an empty Bloom build."""
    docs = _docs(spark, [(_doc_of_tokens(12), "sA"), (_doc_of_tokens(15), "sB")])
    out = pipeline.bloom_decontam(docs).collect()
    assert {r["source"] for r in out} == {"sA", "sB"}
    assert all(r["n_contaminated"] == 0 for r in out)


# ---------------------------------------------------------------- bpe


def _ref_bpe(freqs: dict[str, int], steps: int):
    """From-scratch BPE trainer (Sennrich et al. 2016): greedy argmax
    pair with (count desc, left asc, right asc) ties, left-to-right
    merge application."""
    vocab = {w: list(w) for w in freqs}
    out = []
    for step in range(1, steps + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, f in freqs.items():
            syms = vocab[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        out.append((step, left, right, cnt, left + right))
        for w, syms in vocab.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    merged.append(left + right)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            vocab[w] = merged
    return out, vocab


def test_bpe_train_matches_python_reference(spark):
    """Pin the distributed trainer to the from-scratch reference on a
    corpus whose merges chain (ab, then ab+c) and repeat symbols."""
    corpus = "abc abc abab ddd ddd ddd dd abcabc"
    docs = _docs(spark, [(corpus, "s")])
    got = [tuple(r) for r in text.bpe_train_merges(docs).collect()]
    freqs: dict[str, int] = {}
    for w in corpus.split():
        freqs[w] = freqs.get(w, 0) + 1
    want, _ = _ref_bpe(freqs, BPE_MERGE_STEPS)
    assert got == want


def test_bpe_merge_application_is_greedy_left_to_right(spark):
    """'aaaa' under pair (a,a) must become [aa, aa] -- 2 per word --
    not the overlapping count 3.  Step 2 then sees (aa, aa)."""
    docs = _docs(spark, [("aaaa aaaa baba", "s")])
    rows = text.bpe_train_merges(docs).collect()
    s1 = rows[0]
    assert (s1["left"], s1["right"]) == ("a", "a")
    # 2 'aaaa' words x 3 adjacent positions = 6 weighted pairs BEFORE
    # merging; the recorded count is the pre-merge pair stat
    assert s1["pair_count"] == 6
    s2 = rows[1]
    assert (s2["left"], s2["right"], s2["pair_count"]) == ("aa", "aa", 2)


def test_bpe_stops_when_no_pairs_remain(spark):
    """Single-char words exhaust immediately: fewer than
    BPE_MERGE_STEPS rows, not an error."""
    docs = _docs(spark, [("a b c a b", "s")])
    rows = text.bpe_train_merges(docs).collect()
    assert rows == []


# ------------------------------------------------------------ soft dedup


def test_soft_weights_split_mass_across_sources(spark):
    """One text duplicated 3x across two sources: class mass 1.0
    splits 2/3 vs 1/3; a unique doc keeps weight 1.0."""
    from de_realtime_voting_spark.operators import dedup

    rows = [
        ("dup text here", "sA"),
        ("dup text here", "sA"),
        ("dup text here", "sB"),
        ("unique doc words", "sB"),
    ]
    out = {r["source"]: r for r in dedup.dedup_soft_weights(_docs(spark, rows)).collect()}
    assert out["sA"]["n_docs"] == 2 and out["sA"]["n_classes"] == 1
    assert abs(out["sA"]["retained_mass"] - 2 / 3) < 1e-3
    assert out["sB"]["n_docs"] == 2 and out["sB"]["n_classes"] == 2
    assert abs(out["sB"]["retained_mass"] - (1 / 3 + 1.0)) < 1e-3
    # effective tokens: 3 tokens/doc weighted
    assert abs(out["sA"]["effective_tokens"] - 3 * 2 / 3) < 1e-3


def test_soft_weights_no_duplicates_is_identity(spark):
    from de_realtime_voting_spark.operators import dedup

    rows = [(f"distinct text number {i}", "s") for i in range(4)]
    [r] = dedup.dedup_soft_weights(_docs(spark, rows)).collect()
    assert r["n_docs"] == r["n_classes"] == 4
    assert r["effective_tokens"] == float(r["total_tokens"])
    assert r["retained_mass"] == 4.0


# ------------------------------------------------------- contamination


def test_contam_span_islands_and_longest_run(spark):
    """Eval doc 'w1..w10' plants 3 consecutive 8-gram hits in a doc
    that embeds w1..w10 verbatim (one island of 3); a doc with the
    same 10 words split by a separator word yields no 8-gram hit."""
    eval_text = " ".join(f"w{i}" for i in range(1, 11))
    contaminated = "prefix " + eval_text + " suffix words"
    broken = " ".join(f"w{i}" for i in range(1, 6)) + " X " + " ".join(
        f"w{i}" for i in range(6, 11)
    )
    rows = [(eval_text, EVAL_SOURCE), (contaminated, "sA"), (broken, "sA")]
    out = pipeline.contam_span_report(_docs(spark, rows)).collect()
    assert len(out) == 1
    [r] = out
    assert r["source"] == "sA"
    # 10-word eval doc has 3 8-grams; all 3 land consecutively
    assert r["n_spans"] == 1
    assert r["longest_span_grams"] == 3
    assert r["n_contam_grams"] == 3


def test_contam_span_separate_islands(spark):
    """Two verbatim eval spans separated by clean text produce two
    islands in the same doc."""
    span1 = " ".join(f"a{i}" for i in range(8))
    span2 = " ".join(f"b{i}" for i in range(8))
    rows = [
        (span1, EVAL_SOURCE),
        (span2, EVAL_SOURCE),
        (span1 + " clean gap words here between " + span2, "sX"),
    ]
    [r] = pipeline.contam_span_report(_docs(spark, rows)).collect()
    assert r["n_spans"] == 2
    assert r["longest_span_grams"] == 1
    assert r["n_contam_grams"] == 2


def test_bpe_fertility_matches_python_reference(spark):
    """Apply-phase pin: fertility/compression per lang must match the
    python reference's post-merge vocab on a mixed corpus."""
    corpus = "abc abc abab ddd ddd ddd dd abcabc xyz"
    docs = _docs(spark, [(corpus, "s")])
    freqs: dict[str, int] = {}
    for w in corpus.split():
        freqs[w] = freqs.get(w, 0) + 1
    _, vocab = _ref_bpe(freqs, BPE_MERGE_STEPS)
    n_words = sum(freqs.values())
    total_chars = sum(len(w) * f for w, f in freqs.items())
    total_syms = sum(len(vocab[w]) * f for w, f in freqs.items())
    [r] = text.bpe_fertility_stats(docs).collect()
    assert r["lang"] == "en"
    assert r["n_words"] == n_words
    assert r["total_chars"] == total_chars
    assert r["total_symbols"] == total_syms
    assert abs(r["fertility"] - total_syms / n_words) < 1e-6
    assert abs(r["chars_per_symbol"] - total_chars / total_syms) < 1e-6


def test_bpe_fertility_merges_reduce_symbols(spark):
    """A merge-friendly corpus must end with fertility strictly below
    the char-level baseline (= avg word length)."""
    corpus = "hello hello hello world world hello world"
    docs = _docs(spark, [(corpus, "s")])
    [r] = text.bpe_fertility_stats(docs).collect()
    assert r["total_symbols"] < r["total_chars"]
    assert r["fertility"] < r["total_chars"] / r["n_words"]


# ------------------------------------------------------------- waterfall


def test_curation_waterfall_stage_by_stage(spark):
    """Hand-built corpus where every stage cuts exactly one doc:
    short doc fails C4, the duplicate loses canonical, the eval-gram
    carrier is decontaminated away, and the budget stage drops the
    lowest-quality survivor."""
    # C4 pass needs >= 20 tokens, avg word len in [3, 10], a stopword.
    # Quality ordering matters for the budget stage: `good` (pure
    # stopwords: len-saturated + stop-ratio 1.0 ~ 0.86) must outrank
    # `huge` (~0.58) so the greedy prefix admits good then runs out.
    good = ("the " * 200).strip()  # 200 tokens, quality ~ 0.86
    eval_span = " ".join(f"evalgram{i}" for i in range(1, 9))  # one 8-gram
    dirty = ("the " + eval_span + " plus more filler words padding here "
             "extra tokens appended until twenty total now").strip()
    huge = ("the " + "xxxx " * 12000).strip()  # 12001 toks > budget
    rows = [
        (eval_span, EVAL_SOURCE),   # eval: excluded from the funnel
        ("too short", "s"),          # fails C4 (< 20 tokens)
        (good, "s"),                 # survives everything
        (good, "s"),                 # exact duplicate: loses canonical
        (dirty, "s"),                # C4-pass but contaminated
        (huge, "s"),                 # clean but blows the 12k budget
    ]
    out = {r["stage"]: r for r in pipeline.curation_waterfall(_docs(spark, rows)).collect()}
    assert [out[k]["n_docs"] for k in sorted(out)] == [5, 4, 3, 2, 1]
    # monotone tokens too
    tok = [out[k]["n_tokens"] for k in sorted(out)]
    assert all(a >= b for a, b in zip(tok, tok[1:]))


def test_curation_waterfall_empty_input_zero_rows(spark, sf_dir):
    """Empty corpus: the funnel still reports all 5 stages, zeroed."""
    from de_realtime_voting_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").limit(0)
    rows = pipeline.curation_waterfall(docs).collect()
    assert [r["stage"] for r in sorted(rows, key=lambda r: r["stage"])] == [
        "1_raw", "2_quality", "3_canonical", "4_decontaminated", "5_token_budget"
    ]
    assert all(r["n_docs"] == 0 and r["n_tokens"] == 0 for r in rows)


# ----------------------------------------------------------- ivf balance


def test_ivf_cell_balance_partitions_the_corpus(spark, sf_dir):
    """Occupancies must sum to the corpus size, shares to ~1, and the
    mean ratio to ~1 -- the invariants an index health check trades on."""
    from de_realtime_voting_spark.operators import similarity
    from de_realtime_voting_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    rows = similarity.ivf_cell_balance(emb).collect()
    assert sum(r["n_vectors"] for r in rows) == emb.count()
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-3
    assert abs(sum(r["ratio_to_mean"] for r in rows) / len(rows) - 1.0) < 1e-3
    assert len({r["cell"] for r in rows}) == len(rows)


# ----------------------------------------------------- sorted neighborhood


def test_snm_finds_prefix_and_suffix_neighbors(spark):
    """Two docs sharing a long prefix (pass 1) and two sharing a long
    suffix but differing at char 1 (pass 2, which prefix sorting
    would miss) must both surface; an unrelated doc pairs with
    nothing."""
    from de_realtime_voting_spark.operators import dedup

    shared = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (shared + " tail one", "s"),                    # 0
        (shared + " tail two", "s"),                    # 1: prefix twin of 0
        ("X " + shared, "s"),                           # 2
        ("Y " + shared, "s"),                           # 3: suffix twin of 2
        ("completely unrelated content 1234567890", "s"),  # 4
    ]
    out = dedup.dedup_sorted_neighborhood(_docs(spark, rows)).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in out}
    assert (0, 1) in pairs
    assert (2, 3) in pairs
    assert not any(4 in p for p in pairs)
    assert all(r["jaccard"] >= 0.8 for r in out)


def test_snm_candidate_bound_holds(spark):
    """Each doc contributes at most 2 passes x SNM_WINDOW candidate
    pairs as the LEFT member -- the construction's hard bound."""
    from collections import Counter

    from de_realtime_voting_spark.constants import SNM_WINDOW
    from de_realtime_voting_spark.operators import dedup

    # identical docs: every neighborhood pair verifies at jaccard 1.0
    rows = [("identical text body repeated verbatim here", "s")] * 6
    out = dedup.dedup_sorted_neighborhood(_docs(spark, rows)).collect()
    c = Counter(r["doc_a"] for r in out)
    assert max(c.values()) <= 2 * SNM_WINDOW
    assert all(r["jaccard"] == 1.0 for r in out)


# ------------------------------------------------------------- cms


def test_cms_never_undercounts_and_matches_python(spark):
    """CMS estimates must be >= exact for every candidate, and equal
    a from-scratch python sketch with the same md5-digit row hashes."""
    import hashlib

    from de_realtime_voting_spark.constants import CMS_DEPTH, CMS_WIDTH
    from de_realtime_voting_spark.operators import text as t

    corpus = "alpha beta alpha gamma alpha beta delta " * 5 + "epsilon"
    docs = _docs(spark, [(corpus, "s")])
    rows = t.token_heavy_hitters_cms(docs).collect()
    assert rows

    def bucket(d, term):
        h = hashlib.md5(f"{d}:{term}".encode()).hexdigest()
        return int(h[:4], 16) % CMS_WIDTH

    counts: dict[str, int] = {}
    for w in corpus.split():
        counts[w] = counts.get(w, 0) + 1
    sketch: dict[tuple[int, int], int] = {}
    for w, c in counts.items():
        for d in range(CMS_DEPTH):
            k = (d, bucket(d, w))
            sketch[k] = sketch.get(k, 0) + c
    for r in rows:
        assert r["exact_count"] == counts[r["term"]]
        want = min(sketch[(d, bucket(d, r["term"]))] for d in range(CMS_DEPTH))
        assert r["cms_estimate"] == want
        assert r["cms_estimate"] >= r["exact_count"]
        assert r["inflation"] >= 1.0


def test_cms_batch_fold_equals_occurrence_sketch(spark):
    """The vocab-folded batch build (cms_sketch_from_counts) must be
    row-identical to the per-occurrence build (cms_sketch_rows, the
    streaming twin's shape) -- same _cms_bucket hash, algebraically
    equal counts."""
    import pyspark.sql.functions as F

    from de_realtime_voting_spark.functions.columns import tokens
    from de_realtime_voting_spark.operators import text as t

    corpus = "alpha beta alpha gamma alpha beta delta " * 3 + "zeta eta"
    docs = _docs(spark, [(corpus, "s"), ("beta beta gamma", "s2")])
    occ = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in t.cms_sketch_rows(docs).collect()
    }
    counts = (
        docs.select(F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )
    fold = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in t.cms_sketch_from_counts(counts).collect()
    }
    assert occ == fold


def test_cms_collision_inflates_estimate(spark):
    """Force a within-row collision check: with a tiny corpus the
    sketch is sparse, so estimates equal exacts; the audit columns
    must then read inflation == 1.0 exactly."""
    from de_realtime_voting_spark.operators import text as t

    docs = _docs(spark, [("one two three two one one", "s")])
    rows = t.token_heavy_hitters_cms(docs).collect()
    assert {r["term"]: r["exact_count"] for r in rows} == {
        "one": 3, "two": 2, "three": 1
    }
    assert all(r["inflation"] == 1.0 for r in rows)


def test_bpe_fertility_oracle_survives_vocab_exhaustion(spark):
    """Regression (code-review finding): a corpus whose vocabulary
    exhausts before BPE_MERGE_STEPS merges (every word 'ab': one
    merge then no pairs) must yield IDENTICAL fertility rows from the
    Spark operator and the DuckDB oracle -- the oracle's vocab chain
    previously annihilated through a CROSS JOIN with the empty
    best{i} frame while Spark's trainer breaks and keeps the last
    vocab."""
    import duckdb

    from de_realtime_voting_spark.oracles import SQL

    docs = _docs(spark, [("ab ab ab", "s")])
    got = sorted(map(tuple, text.bpe_fertility_stats(docs).collect()))
    assert got  # non-empty: the exhausted vocab must survive
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    want = sorted(
        map(tuple, con.sql(SQL["bpe_fertility_stats"]).df().itertuples(index=False))
    )
    assert got == want


# --------------------------------------------------------- source caps


def test_source_caps_truncate_big_domains_only(spark):
    """A domain over the cap keeps its best-quality prefix; a domain
    under the cap passes whole (identical texts tie-break doc_id)."""
    from de_realtime_voting_spark.constants import SOURCE_TOKEN_CAP

    assert SOURCE_TOKEN_CAP == 800  # the arithmetic below assumes it
    rows = [(_doc_of_tokens(300), "big") for _ in range(4)]   # 1200 > 800
    rows += [(_doc_of_tokens(100), "small") for _ in range(2)]  # 200 <= 800
    out = {r["source"]: r for r in pipeline.source_capped_selection(_docs(spark, rows)).collect()}
    assert out["big"]["n_kept"] == 2 and out["big"]["kept_tokens"] == 600
    assert out["small"]["n_kept"] == 2 and out["small"]["kept_tokens"] == 200
    assert out["big"]["total_tokens"] == 1200


def test_source_caps_order_is_quality_first(spark):
    """Within a domain the kept prefix follows quality descending:
    a high-quality (stopword-rich) doc survives over earlier-id
    low-quality filler when only one fits the cap."""
    filler = _doc_of_tokens(700)           # low quality, id 0
    good = ("the " * 700).strip()          # high quality, id 1
    out = {r["source"]: r for r in pipeline.source_capped_selection(
        _docs(spark, [(filler, "s"), (good, "s")])).collect()}
    r = out["s"]
    assert r["n_kept"] == 1
    assert r["kept_tokens"] == 700
    # the survivor is the high-quality doc: its quality IS the cutoff
    assert r["cutoff_quality"] > 0.8


# ---------------------------------------------- jaccard all-pairs pin


def test_ngram_jaccard_matches_allpairs_reference(spark):
    """Behavioral pin for the co-occurrence formulation: the operator
    must return EXACTLY the pairs of a from-scratch all-pairs-in-
    block reference (set Jaccard over distinct trigrams).  Corpus
    mixes near-identical pairs (must survive), an exact duplicate
    family (every pair at jaccard exactly 1.0), and unrelated docs
    sharing only stopword-ish trigrams (must NOT pair).  Guards any
    future candidate-bounding rewrite -- two were measured and
    rejected in r5 (see the operator docstring)."""
    import pyspark.sql.functions as F

    from de_realtime_voting_spark.constants import (
        NGRAM_JACCARD_THRESHOLD,
        NGRAM_LEN_BUCKET,
    )
    from de_realtime_voting_spark.functions.columns import char_ngrams
    from de_realtime_voting_spark.operators import dedup

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [
        (base, "s"),
        (base.replace("lazy", "hazy"), "s"),          # near-dup of 0
        (base, "s"),                                   # exact dup of 0
        (base, "s"),                                   # exact dup family
        ("the cat the hat the mat the bat the rat sat", "s"),  # shares 'the'
        ("completely different words entirely here now okay", "s"),
        ("zzz", "s"),                                  # single-gram doc
    ]
    docs = _docs(spark, rows)
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.dedup_ngram_jaccard(docs).collect()
    }

    # naive reference: all pairs within (lang, len_bucket), exact sets
    g = docs.select(
        "doc_id",
        "lang",
        F.floor(F.length("text") / NGRAM_LEN_BUCKET).cast("int").alias("b"),
        char_ngrams(F.col("text")).alias("grams"),
    ).where(F.length("text") >= 3).collect()
    want = {}
    for i, a in enumerate(g):
        for b in g[i + 1:]:
            x, y = (a, b) if a["doc_id"] < b["doc_id"] else (b, a)
            if (x["lang"], x["b"]) != (y["lang"], y["b"]):
                continue
            sa, sb = set(x["grams"]), set(y["grams"])
            j = len(sa & sb) / len(sa | sb)
            if j >= NGRAM_JACCARD_THRESHOLD:
                want[(x["doc_id"], y["doc_id"])] = j
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-6
    # the duplicate family must appear pairwise (k^2 output case)
    dup_ids = [0, 2, 3]
    for i in dup_ids:
        for j in dup_ids:
            if i < j:
                assert (i, j) in got and got[(i, j)] == 1.0
