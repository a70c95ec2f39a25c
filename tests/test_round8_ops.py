"""Round-8 operator tests.

segment_minhash_dedup is pinned by a full PYTHON REPLAY of its
algorithm (md5 minhash, 4x2 banding, segment classes, keep-first) on
a constructed corpus with exact-dup segments, single-token-edited
near-dup segments, sub-SEGMENT_W docs, and whole-doc duplicates --
the cross-engine oracle proves parity on driver data; this proves
the SEMANTICS on inputs chosen to hit every branch.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

from de_realtime_voting_spark.constants import (
    JACCARD_THRESHOLD,
    MINHASH_BAND_ROWS,
    MINHASH_SIGS,
    SEGMENT_JACCARD_THRESHOLD,
    SEGMENT_SID_MULT,
    SEGMENT_W,
)
from de_realtime_voting_spark.operators import dedup


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _toks(t: str) -> list[str]:
    return [x for x in t.split(" ") if x]


def _shingles(ts: list[str]) -> set[str]:
    return {" ".join(ts[i : i + 3]) for i in range(len(ts) - 2)}


def _sig(sh: set[str]) -> list[str]:
    return [min(_md5(f"{i}:{s}") for s in sh) for i in range(MINHASH_SIGS)]


def _bands(sig: list[str]) -> list[tuple[int, str]]:
    n_bands = MINHASH_SIGS // MINHASH_BAND_ROWS
    return [
        (
            b,
            _md5(
                "|".join(
                    sig[b * MINHASH_BAND_ROWS + r] for r in range(MINHASH_BAND_ROWS)
                )
            ),
        )
        for b in range(n_bands)
    ]


def _jac(a: set[str], b: set[str]) -> float:
    return len(a & b) / len(a | b)


def _banded_verified_pairs(items: dict[int, set[str]], thr: float) -> set[tuple[int, int]]:
    """items: id -> shingle set.  Banded candidates, exact verify."""
    buckets: dict[tuple[int, str], list[int]] = defaultdict(list)
    for i, sh in items.items():
        for key in _bands(_sig(sh)):
            buckets[key].append(i)
    cand = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                cand.add((ids[x], ids[y]))
    return {(a, b) for a, b in cand if _jac(items[a], items[b]) >= thr}


def _replay(rows: list[tuple[int, str, str, str]]) -> dict[tuple[str, str], tuple]:
    """Python replay of segment_minhash_dedup's full report."""
    # ---- doc grain (dedup_minhash_pairs semantics)
    doc_sh = {
        did: _shingles(_toks(text))
        for did, text, _, _ in rows
        if len(_toks(text)) >= 3
    }
    dver = _banded_verified_pairs(doc_sh, JACCARD_THRESHOLD)
    dup_docs = {d for p in dver for d in p}
    # ---- segment grain
    segs = []  # (lang, source, sid, seg_hash, shingle set)
    for did, text, lang, source in rows:
        ts = _toks(text)
        if len(ts) < SEGMENT_W:
            continue
        for k in range(len(ts) // SEGMENT_W):
            st = ts[k * SEGMENT_W : (k + 1) * SEGMENT_W]
            segs.append(
                (
                    lang,
                    source,
                    did * SEGMENT_SID_MULT + k,
                    _md5(" ".join(st)),
                    _shingles(st),
                )
            )
    classes: dict[str, list[int]] = defaultdict(list)
    for _, _, sid, h, _ in segs:
        classes[h].append(sid)
    rep_of = {h: min(sids) for h, sids in classes.items()}
    rep_sh = {
        rep_of[h]: sh for _, _, sid, h, sh in segs if sid == rep_of[h]
    }
    rver = _banded_verified_pairs(rep_sh, SEGMENT_JACCARD_THRESHOLD)
    dropped_reps = {b for _, b in rver}
    # ---- per-group accounting
    out: dict[tuple[str, str], dict] = defaultdict(
        lambda: {"n_docs": 0, "dup": 0, "n_seg": 0, "ex": 0, "nd": 0}
    )
    for did, _, lang, source in rows:
        g = out[(lang, source)]
        g["n_docs"] += 1
        g["dup"] += did in dup_docs
    for lang, source, sid, h, _ in segs:
        g = out[(lang, source)]
        g["n_seg"] += 1
        if sid != rep_of[h]:
            g["ex"] += 1
        elif rep_of[h] in dropped_reps:
            g["nd"] += 1
    return {
        k: (
            g["n_docs"],
            g["dup"],
            round(g["dup"] / g["n_docs"], 6),
            g["n_seg"],
            g["ex"],
            g["nd"],
            round((g["ex"] + g["nd"]) / g["n_seg"], 6) if g["n_seg"] else None,
        )
        for k, g in out.items()
    }


def _corpus() -> list[tuple[int, str, str, str]]:
    boiler = " ".join(f"b{i}" for i in range(SEGMENT_W))
    edited = " ".join(f"b{i}" for i in range(SEGMENT_W - 1)) + " zz"
    uniq = lambda p, n: " ".join(f"{p}{i}" for i in range(n))
    return [
        # doc 1: unique segment + the boilerplate (source A)
        (1, uniq("u", SEGMENT_W) + " " + boiler, "en", "web"),
        # doc 2: boilerplate EXACT copy leading, then unique (source B)
        (2, boiler + " " + uniq("v", SEGMENT_W), "en", "books"),
        # doc 3: single-token-EDITED boilerplate (near-dup candidate)
        (3, edited + " " + uniq("w", SEGMENT_W), "en", "web"),
        # doc 4: too short for any segment, long enough for doc shingles
        (4, uniq("x", SEGMENT_W - 1), "en", "web"),
        # docs 5/6: whole-doc EXACT duplicates (doc-grain near-dups,
        # and their segments form exact classes too)
        (5, uniq("y", 2 * SEGMENT_W), "fr", "web"),
        (6, uniq("y", 2 * SEGMENT_W), "fr", "web"),
    ]


def test_segment_minhash_dedup_matches_python_replay(spark):
    rows = _corpus()
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    got = {
        (r.lang, r.source): (
            r.n_docs,
            r.near_dup_docs,
            float(r.doc_dup_share),
            r.n_segments,
            r.exact_dup_segments,
            r.near_dup_segments,
            None if r.seg_drop_share is None else float(r.seg_drop_share),
        )
        for r in dedup.segment_minhash_dedup(docs).collect()
    }
    assert got == _replay(rows)


def test_segment_minhash_dedup_replay_hits_every_branch(spark):
    """The constructed corpus must actually exercise the branches the
    replay claims to pin -- otherwise the equality test can go green
    on a corpus where everything is zero."""
    exp = _replay(_corpus())
    # exact-dup segment: doc 2's verbatim boilerplate drops against
    # doc 1's earlier copy (cross-source class, rep in (en, web))
    assert exp[("en", "books")] == (1, 0, 0.0, 2, 1, 0, 0.5)
    # near-dup segment: doc 3's single-token-edited boilerplate is
    # FOUND by the banding (collision is deterministic md5 math) and
    # dropped against the earlier rep; the sub-SEGMENT_W doc 4
    # contributes a doc but no segments (3 docs, 4 segments)
    assert exp[("en", "web")] == (3, 0, 0.0, 4, 0, 1, 0.25)
    # whole-doc duplicate pair: doc grain flags both docs, segment
    # grain drops doc 6's two segments as exact copies
    assert exp[("fr", "web")] == (2, 2, 1.0, 4, 2, 0, 0.5)
    # single-token edit: J = 7/9 >= segment bar, < doc bar
    boiler = {" ".join(f"b{i}" for i in range(SEGMENT_W))}
    b = _shingles(_toks(next(iter(boiler))))
    e = _shingles(
        _toks(" ".join(f"b{i}" for i in range(SEGMENT_W - 1)) + " zz")
    )
    assert SEGMENT_JACCARD_THRESHOLD <= _jac(b, e) < JACCARD_THRESHOLD


def test_segment_minhash_dedup_keep_first_is_any_earlier_neighbor(spark):
    """Keep-first rule: the LATER side of every verified pair drops,
    even in chains -- pinned directly on the replay's primitive."""
    items = {1: {"a b c", "b c d"}, 2: {"a b c", "b c d"}, 3: {"a b c", "b c d"}}
    ver = _banded_verified_pairs(items, 0.9)
    dropped = {b for _, b in ver}
    assert dropped == {2, 3}


# ---------------------------------------------------------------
# quality_classifier_{train,score}: full PYTHON REPLAY of the
# hashed-feature logistic regression (bucketing, length-normalized
# features, 3 full-batch gradient steps, half-up weight publication)
# on a constructed corpus -- the oracle proves cross-engine parity on
# driver data; this proves the SEMANTICS bit-for-bit.
# ---------------------------------------------------------------


def _qc_bucket(term: str, m: int) -> int:
    return int(_md5(term)[:4], 16) % m


def _round6(v: float) -> float:
    import math

    return math.floor(v * 1e6 + 0.5) / 1e6


def _qc_replay(docs: list[tuple[int, str, str, str]]):
    """docs: (doc_id, lang, source, text) -> (weights, bias, feats)."""
    from de_realtime_voting_spark.constants import (
        EVAL_SOURCE,
        QC_BUCKETS,
        QC_ITERS,
        QC_LR,
    )

    feats = {}  # doc_id -> {b: x}
    labels = {}
    for doc_id, _lang, source, text in docs:
        toks = _toks(text)
        if not toks:
            continue
        counts = defaultdict(int)
        for t in toks:
            counts[_qc_bucket(t, QC_BUCKETS)] += 1
        feats[doc_id] = {b: c / len(toks) for b, c in counts.items()}
        labels[doc_id] = 1 if source == EVAL_SOURCE else 0
    n = len(labels)
    w = [0.0] * QC_BUCKETS
    bias = 0.0
    for _ in range(QC_ITERS):
        import math as m

        resid = {}
        for d, xs in feats.items():
            s = sum(xs[b] * w[b] for b in sorted(xs))
            p = 1.0 / (1.0 + m.exp(-(bias + s)))
            resid[d] = p - labels[d]
        grads = defaultdict(float)
        for d, xs in feats.items():
            for b, x in xs.items():
                grads[b] += x * resid[d]
        gb = sum(resid.values())
        w = [_round6(w[i] - QC_LR * grads.get(i, 0.0) / n) for i in range(QC_BUCKETS)]
        bias = _round6(bias - QC_LR * gb / n)
    return w, bias, feats, labels


def _qc_corpus():
    from de_realtime_voting_spark.constants import EVAL_SOURCE

    rows = []
    # target docs: a distinctive vocabulary
    for i in range(8):
        rows.append((i, "en", EVAL_SOURCE, f"alpha beta gamma delta tok{i}"))
    # target-like raw docs (share the target vocabulary)
    for i in range(8, 14):
        rows.append((i, "en", "srcA", f"alpha beta gamma epsilon tok{i}"))
    # off-target raw docs (disjoint vocabulary)
    for i in range(14, 22):
        rows.append((i, "de", "srcB", f"zeta eta theta iota kappa word{i}"))
    # edge: empty and whitespace-only docs must be excluded
    rows.append((22, "en", "srcB", ""))
    rows.append((23, "en", "srcB", " "))
    return rows


def test_quality_classifier_train_matches_python_replay(spark):
    from de_realtime_voting_spark.constants import QC_BUCKETS
    from de_realtime_voting_spark.operators.text import quality_classifier_train

    rows = _qc_corpus()
    docs = spark.createDataFrame(rows, "doc_id long, lang string, source string, text string")
    got = {
        r["feature_id"]: r["weight"]
        for r in quality_classifier_train(docs).collect()
    }
    w, bias, _feats, _labels = _qc_replay(rows)
    assert len(got) == QC_BUCKETS + 1
    assert got[-1] == bias
    for i in range(QC_BUCKETS):
        assert got[i] == w[i], f"bucket {i}: {got[i]} != {w[i]}"
    spark.catalog.clearCache()


def test_quality_classifier_score_separates_and_excludes(spark):
    import math as m

    from de_realtime_voting_spark.constants import EVAL_SOURCE
    from de_realtime_voting_spark.operators.text import quality_classifier_score

    rows = _qc_corpus()
    docs = spark.createDataFrame(rows, "doc_id long, lang string, source string, text string")
    got = {r["doc_id"]: r for r in quality_classifier_score(docs).collect()}
    # only non-target docs with tokens are scored
    assert set(got) == {i for i in range(8, 22)}
    assert all(r["source"] != EVAL_SOURCE for r in got.values())
    # separation: every target-like doc outscores every off-target doc
    like = [got[i]["quality_prob"] for i in range(8, 14)]
    off = [got[i]["quality_prob"] for i in range(14, 22)]
    assert min(like) > max(off)
    # probabilities equal the replayed model's sigmoid to the rounding grain
    w, bias, feats, _labels = _qc_replay(rows)
    for d in range(8, 22):
        s = sum(x * w[b] for b, x in sorted(feats[d].items()))
        want = _round6(1.0 / (1.0 + m.exp(-(bias + s))))
        assert abs(got[d]["quality_prob"] - want) < 2e-6
    spark.catalog.clearCache()


# ---------------------------------------------------------------
# embedding_prototype_score: numpy replay of assignment + per-cell
# percentile on the real sf0.001 embeddings -- every row's cell,
# percentile, and tier must match the independent computation.
# ---------------------------------------------------------------


def test_embedding_prototype_score_matches_numpy_replay(spark, sf_dir):
    import numpy as np

    from de_realtime_voting_spark.constants import PROTO_TIER_HI, PROTO_TIER_LO
    from de_realtime_voting_spark.ivf_model import IVF_TRAINED_CENTROIDS
    from de_realtime_voting_spark.operators.similarity import (
        embedding_prototype_score,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = {r["vec_id"]: r for r in embedding_prototype_score(emb).collect()}

    rows = emb.select("vec_id", "embedding").collect()
    cents = {cid: np.array(c, dtype=np.float64) for cid, c in IVF_TRAINED_CENTROIDS}
    by_cell = defaultdict(list)
    for r in rows:
        v = np.array(r["embedding"], dtype=np.float64)
        best = min(
            (
                (-float(v @ c) / (np.linalg.norm(v) * np.linalg.norm(c)), cid)
                for cid, c in cents.items()
            )
        )
        by_cell[best[1]].append((r["vec_id"], -best[0]))
    assert len(got) == len(rows)
    for cell, members in by_cell.items():
        members.sort(key=lambda t: (t[1], t[0]))  # (cos asc, vec_id asc)
        n = len(members)
        for rank, (vid, cos) in enumerate(members):
            row = got[vid]
            assert row["cell"] == cell
            assert abs(row["proto_cos"] - cos) < 1e-6
            pct = 0.0 if n == 1 else rank / (n - 1)
            assert abs(row["cell_pct"] - pct) < 1e-6
            want_tier = (
                "prototype"
                if pct >= PROTO_TIER_HI
                else ("outlier" if pct < PROTO_TIER_LO else "typical")
            )
            assert row["tier"] == want_tier
    spark.catalog.clearCache()


# ---------------------------------------------------------------- #
# dedup_embedding_cosine block-budget split (r8)                    #
# ---------------------------------------------------------------- #

def _oversized_block_rows():
    """600 vectors in ONE (label, lsh_bucket) block that the extra
    planes split in half: base is plane-0 orthogonalized against
    extra-plane-0 (so base itself sits ON the extra-plane-0
    boundary), halves are base +- eps*extra_plane_0 -- eps flips the
    extra-plane-0 sign between halves while every PRIMARY plane sign
    (and every other extra-plane sign) keeps base's margin."""
    import numpy as np

    from de_realtime_voting_spark.constants import LSH_EXTRA_PLANES, LSH_PLANES

    p0 = np.array(LSH_PLANES[0], dtype=np.float64)
    x0 = np.array(LSH_EXTRA_PLANES[0], dtype=np.float64)
    base = p0 - (float(p0 @ x0) / float(x0 @ x0)) * x0  # dot(base, x0) = 0
    eps = 1e-3
    va = (base + eps * x0).astype(np.float32)
    vb = (base - eps * x0).astype(np.float32)
    for plane in LSH_PLANES + LSH_EXTRA_PLANES[1:]:
        p = np.array(plane, dtype=np.float64)
        da = float(va.astype(np.float64) @ p)
        db = float(vb.astype(np.float64) @ p)
        assert da * db > 0, "halves must share every non-split plane sign"
    assert float(va.astype(np.float64) @ x0) > 0 > float(
        vb.astype(np.float64) @ x0
    )
    return [
        (i, [float(x) for x in (va if i < 300 else vb)], 7) for i in range(600)
    ]


def test_dedup_embedding_cosine_budget_split_engages(spark):
    """A (label, bucket) block over EMB_COS_BLOCK_BUDGET members must
    pair within extra-plane sub-buckets, not across the whole block:
    cosine is ~1 everywhere here, so WITHOUT the split the pair count
    would be C(600,2)=179700 and WITH it exactly 2*C(300,2)=89700."""
    from de_realtime_voting_spark.constants import EMB_COS_BLOCK_BUDGET
    from de_realtime_voting_spark.operators.dedup import dedup_embedding_cosine

    assert EMB_COS_BLOCK_BUDGET < 600
    emb = spark.createDataFrame(
        _oversized_block_rows(),
        "vec_id bigint, embedding array<float>, label int",
    )
    assert dedup_embedding_cosine(emb).count() == 2 * (300 * 299) // 2
    spark.catalog.clearCache()


def test_dedup_embedding_cosine_split_path_matches_duckdb_oracle(spark, tmp_path):
    """Cross-engine check of the OVERSIZED-block branch: the parity
    sweep's SFs never push a (label, bucket) block over
    EMB_COS_BLOCK_BUDGET (sf1 blocks average ~31 members), so the
    sub = lsh_bucket_extra arm of both engines would otherwise ship
    unexercised.  Compare full pair sets on the synthetic corpus."""
    import duckdb

    from de_realtime_voting_spark.operators.dedup import dedup_embedding_cosine
    from de_realtime_voting_spark.oracles import SQL

    emb = spark.createDataFrame(
        _oversized_block_rows(),
        "vec_id bigint, embedding array<float>, label int",
    )
    out = str(tmp_path / "emb")
    emb.write.parquet(out)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{out}/*.parquet'")
    want = sorted(map(tuple, con.sql(SQL["dedup_embedding_cosine"]).fetchall()))
    got = sorted(
        (r.vec_a, r.vec_b, r.label, r.cosine)
        for r in dedup_embedding_cosine(emb).collect()
    )
    assert got == want and len(got) == 2 * (300 * 299) // 2
    spark.catalog.clearCache()


# ---------------------------------------------------------------- #
# ann_hard_negatives (r8)                                           #
# ---------------------------------------------------------------- #

def test_ann_hard_negatives_numpy_replay(spark, sf_dir):
    """Exact numpy replay at sf0.001: for each probe, the K most
    cosine-similar vectors with a DIFFERENT label, ties broken by
    neighbor_id -- rank, neighbor set, and rounded cosine must all
    match; no row may carry the probe's own label."""
    import numpy as np

    from de_realtime_voting_spark.constants import ANN_K, ANN_QUERY_IDS
    from de_realtime_voting_spark.operators.similarity import ann_hard_negatives
    from de_realtime_voting_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.collect()
    vecs = {r.vec_id: (np.array(r.embedding, dtype=np.float64), r.label) for r in rows}
    got = ann_hard_negatives(emb).collect()
    by_q = defaultdict(list)
    for r in sorted(got, key=lambda r: (r.query_id, r.rank)):
        assert r.neighbor_label != r.query_label
        by_q[r.query_id].append(r)
    for qid in ANN_QUERY_IDS:
        qv, ql = vecs[qid]
        cand = []
        for vid, (v, lab) in vecs.items():
            if lab == ql:
                continue
            cos = float(qv @ v) / (np.linalg.norm(qv) * np.linalg.norm(v))
            cand.append((-cos, vid, lab))
        cand.sort()
        want = cand[:ANN_K]
        rows_q = by_q[qid]
        assert [r.rank for r in rows_q] == list(range(1, len(want) + 1))
        for r, (neg_cos, vid, lab) in zip(rows_q, want):
            assert r.neighbor_id == vid and r.neighbor_label == lab
            assert abs(r.cosine - round(-neg_cos, 6)) <= 1e-6
    spark.catalog.clearCache()


# ---------------------------------------------------------------- #
# dedup_minhash_topk (r8)                                           #
# ---------------------------------------------------------------- #

def test_dedup_minhash_topk_semantics(spark):
    """Three identical docs + one unrelated: each of the identical
    trio retrieves the other two at jaccard 1.0 with contiguous
    ranks and id-ascending tie order; the unrelated doc (no shared
    band) emits nothing."""
    from de_realtime_voting_spark.operators.dedup import dedup_minhash_topk

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    other = "one two three four five six seven eight nine ten eleven"
    docs = spark.createDataFrame(
        [(1, text), (2, text), (3, text), (9, other)],
        "doc_id bigint, text string",
    )
    got = sorted(
        (r.doc_id, r.rank, r.neighbor_id, r.jaccard)
        for r in dedup_minhash_topk(docs).collect()
    )
    assert got == [
        (1, 1, 2, 1.0), (1, 2, 3, 1.0),
        (2, 1, 1, 1.0), (2, 2, 3, 1.0),
        (3, 1, 1, 1.0), (3, 2, 2, 1.0),
    ]
    spark.catalog.clearCache()


def test_dedup_minhash_topk_contains_verified_pairs(spark, sf_dir):
    """Every dedup_minhash_pairs hit (jaccard >= threshold) must show
    up in BOTH endpoints' retrieval lists unless displaced by
    neighbors at least as similar -- on driver data K=3 exceeds the
    max verified-neighbor count, so displacement cannot occur and
    containment is exact."""
    from de_realtime_voting_spark.operators.dedup import (
        dedup_minhash_pairs,
        dedup_minhash_topk,
    )
    from de_realtime_voting_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup_minhash_pairs(docs).collect()
    assert pairs
    spark.catalog.clearCache()
    top = defaultdict(set)
    for r in dedup_minhash_topk(docs).collect():
        top[r.doc_id].add(r.neighbor_id)
    for p in pairs:
        assert p.doc_b in top[p.doc_a], (p.doc_a, p.doc_b)
        assert p.doc_a in top[p.doc_b], (p.doc_a, p.doc_b)
    spark.catalog.clearCache()


# ---------------------------------------------------------------- #
# ann_ivf_hard_negatives + embedding_centroid_drift (r8)            #
# ---------------------------------------------------------------- #

def _np_cells(vecs):
    """vec_id -> (cell, probe cells) under the trained quantizer,
    numpy replay of the shared assigner."""
    import numpy as np

    from de_realtime_voting_spark.constants import IVF_NPROBE
    from de_realtime_voting_spark.ivf_model import IVF_TRAINED_CENTROIDS

    cents = [(cid, np.array(c, dtype=np.float64)) for cid, c in IVF_TRAINED_CENTROIDS]
    out = {}
    for vid, (v, _lab) in vecs.items():
        ranked = sorted(
            (
                (-float(v @ c) / (np.linalg.norm(v) * np.linalg.norm(c)), cid)
                for cid, c in cents
            )
        )
        out[vid] = (ranked[0][1], [cid for _, cid in ranked[:IVF_NPROBE]])
    return out


def test_ann_ivf_hard_negatives_numpy_replay(spark, sf_dir):
    """Exact numpy replay of the IVF route at sf0.001: per probe, the
    top-K wrong-label vectors among members of the probe's NPROBE
    nearest cells, ties by neighbor_id."""
    import numpy as np

    from de_realtime_voting_spark.constants import ANN_K, ANN_QUERY_IDS
    from de_realtime_voting_spark.operators.similarity import ann_ivf_hard_negatives
    from de_realtime_voting_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = {
        r.vec_id: (np.array(r.embedding, dtype=np.float64), r.label)
        for r in emb.collect()
    }
    cells = _np_cells(vecs)
    got = defaultdict(list)
    for r in sorted(ann_ivf_hard_negatives(emb).collect(), key=lambda r: (r.query_id, r.rank)):
        assert r.neighbor_label != r.query_label
        got[r.query_id].append(r)
    for qid in ANN_QUERY_IDS:
        qv, ql = vecs[qid]
        probes = set(cells[qid][1])
        cand = []
        for vid, (v, lab) in vecs.items():
            if lab == ql or cells[vid][0] not in probes:
                continue
            cos = float(qv @ v) / (np.linalg.norm(qv) * np.linalg.norm(v))
            cand.append((-cos, vid, lab))
        cand.sort()
        want = cand[:ANN_K]
        rows_q = got[qid]
        assert [r.rank for r in rows_q] == list(range(1, len(want) + 1))
        for r, (neg_cos, vid, lab) in zip(rows_q, want):
            assert r.neighbor_id == vid and r.neighbor_label == lab
            assert abs(r.cosine - round(-neg_cos, 6)) <= 1e-6
    spark.catalog.clearCache()


def test_embedding_centroid_drift_numpy_replay(spark, sf_dir):
    """Per cell: member count, corpus share, and the cosine between
    the trained centroid and the (9-decimal-published) member mean --
    numpy replay at sf0.001."""
    import numpy as np
    from decimal import ROUND_HALF_UP, Decimal

    from de_realtime_voting_spark.ivf_model import IVF_TRAINED_CENTROIDS
    from de_realtime_voting_spark.operators.similarity import embedding_centroid_drift
    from de_realtime_voting_spark.sources import load_table

    def r9(x):
        return float(Decimal(repr(x)).quantize(Decimal("1e-9"), ROUND_HALF_UP))

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = {
        r.vec_id: (np.array(r.embedding, dtype=np.float64), r.label)
        for r in emb.collect()
    }
    cells = _np_cells(vecs)
    members = defaultdict(list)
    for vid, (v, _l) in vecs.items():
        members[cells[vid][0]].append(v)
    cents = {cid: np.array(c, dtype=np.float64) for cid, c in IVF_TRAINED_CENTROIDS}
    got = {r.cell: r for r in embedding_centroid_drift(emb).collect()}
    assert set(got) == {c for c, m in members.items() if m}
    n_total = len(vecs)
    for cell, m in members.items():
        if not m:
            continue
        mean = np.array([r9(x) for x in np.mean(np.stack(m), axis=0)])
        c = cents[cell]
        cos = float(mean @ c) / (np.linalg.norm(mean) * np.linalg.norm(c))
        r = got[cell]
        assert r.n_members == len(m)
        assert abs(r.corpus_share - len(m) / n_total) <= 1e-6
        assert abs(r.mean_centroid_cos - cos) <= 2e-6, (cell, r.mean_centroid_cos, cos)
    spark.catalog.clearCache()
