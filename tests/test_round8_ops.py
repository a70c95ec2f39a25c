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
