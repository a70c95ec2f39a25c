"""Round 11: residual sub-bucket occupancy cap (windowed pairing).

The r10 sf100 probe left one measured scale defect: sign-correlated
vectors (same sign on EVERY plane) pile into one sub-bucket that no
depth-k split can rebound -- 3,546 members / 772M candidate pairs /
885 s for dedup_embedding_cosine, and semantic_dedup cut off past
580 s.  r11 caps residual occupancy: groups over
SUB_OCC_CAP_MULT * budget switch from all-pairs to windowed pairing
(rank by normalized EMB_ORDER_PLANE projection, pair with
EMB_PAIR_WINDOW rank-successors).  These tests exercise the CAPPED
branch cross-engine -- driver SFs never reach the cap, so without
them the windowed arm of both engines would ship unexercised (the
same reasoning as the r8 oversized-block tests one level up).
"""

from __future__ import annotations

import numpy as np
import pytest

from de_realtime_voting_spark.constants import (
    EMB_COS_BLOCK_BUDGET,
    EMB_PAIR_WINDOW,
    EMBEDDING_DIM,
    LSH_EXTRA_PLANES,
    LSH_PLANES,
    SEMDEDUP_CELL_BUDGET,
    SUB_OCC_CAP_MULT,
    lsh_plane_weight,
)


def _sign_correlated_rows(n: int, label: int = 3):
    """n vectors sharing EVERY plane sign, primary and extra: the
    exact shape the depth-k splitter cannot split (all members land
    in ONE sub-bucket at any k), so occupancy = n and the cap governs
    whether pairing is all-pairs or windowed.  Directions vary by a
    small per-row perturbation (distinct order-plane projections,
    pairwise cosine ~1 >= threshold), margins asserted on the STORED
    float32 values -- the doubles both engines actually CAST from."""
    u = np.array([lsh_plane_weight(99, i) for i in range(EMBEDDING_DIM)])
    d = np.array([lsh_plane_weight(98, i) for i in range(EMBEDDING_DIM)])
    planes = [np.array(p) for p in LSH_PLANES + LSH_EXTRA_PLANES]
    margins = np.array([abs(float(u @ p)) for p in planes])
    assert margins.min() > 1e-6, "base vector must clear every plane"
    dmax = max(abs(float(d @ p)) for p in planes)
    eps_max = 0.5 * float(margins.min()) / dmax
    base_signs = [float(u @ p) > 0 for p in planes]
    rows = []
    for i in range(n):
        v32 = (u + (eps_max * i / n) * d).astype(np.float32)
        v64 = v32.astype(np.float64)
        for p, s in zip(planes, base_signs):
            assert (float(v64 @ p) > 0) == s, "a plane sign flipped"
        rows.append((i, [float(x) for x in v32], label))
    return rows


def _windowed_pair_count(n: int, w: int = EMB_PAIR_WINDOW) -> int:
    """Pairs when EVERY within-window pair qualifies: member at rank
    i (1-based) pairs with min(w, n - i) successors."""
    return sum(min(w, n - i) for i in range(1, n + 1))


def _duck_with_embeddings(tmp_path, df):
    import duckdb

    out = str(tmp_path / "emb")
    df.write.parquet(out)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{out}/*.parquet'")
    return con


def test_occ_cap_engages_windowed_pairing(spark):
    """A sub-bucket OVER the cap pairs windowed: every cosine here is
    ~1 (all qualify), so the pair count is exactly the window formula
    -- all-pairs would read C(n,2), 8.8x more."""
    from de_realtime_voting_spark.operators.dedup import dedup_embedding_cosine

    cap = SUB_OCC_CAP_MULT * EMB_COS_BLOCK_BUDGET
    n = cap + 76  # 1100 for the shipped constants
    emb = spark.createDataFrame(
        _sign_correlated_rows(n),
        "vec_id bigint, embedding array<float>, label int",
    )
    got = dedup_embedding_cosine(emb).count()
    assert got == _windowed_pair_count(n) != n * (n - 1) // 2
    spark.catalog.clearCache()


def test_occ_cap_boundary_group_stays_all_pairs(spark):
    """A sub-bucket AT the cap (occ == cap, not over) keeps the exact
    r10 all-pairs geometry: C(cap, 2) pairs."""
    from de_realtime_voting_spark.operators.dedup import dedup_embedding_cosine

    cap = SUB_OCC_CAP_MULT * EMB_COS_BLOCK_BUDGET
    emb = spark.createDataFrame(
        _sign_correlated_rows(cap),
        "vec_id bigint, embedding array<float>, label int",
    )
    assert dedup_embedding_cosine(emb).count() == cap * (cap - 1) // 2
    spark.catalog.clearCache()


def test_capped_branch_matches_duckdb_oracle(spark, tmp_path):
    """Cross-engine check of the WINDOWED arm: full pair sets (ids,
    label, rounded cosine) must be identical -- this pins the order
    key (proj double arithmetic + vec_id tie-break), the window
    bound, and the least/greatest pair orientation across engines."""
    from de_realtime_voting_spark.operators.dedup import dedup_embedding_cosine
    from de_realtime_voting_spark.oracles import SQL

    cap = SUB_OCC_CAP_MULT * EMB_COS_BLOCK_BUDGET
    n = cap + 76
    emb = spark.createDataFrame(
        _sign_correlated_rows(n),
        "vec_id bigint, embedding array<float>, label int",
    )
    con = _duck_with_embeddings(tmp_path, emb)
    want = sorted(map(tuple, con.sql(SQL["dedup_embedding_cosine"]).fetchall()))
    got = sorted(
        (r.vec_a, r.vec_b, r.label, r.cosine)
        for r in dedup_embedding_cosine(emb).collect()
    )
    assert got == want and len(got) == _windowed_pair_count(n)
    spark.catalog.clearCache()


def test_semantic_dedup_capped_branch_matches_duckdb_oracle(spark, tmp_path):
    """semantic_dedup is the cap's primary target (its post-depth-k
    sf100 run still exceeded the 580 s cut-off): an over-cap sub-CELL
    must produce the identical per-cell report in both engines, with
    the pair mass bounded by the window formula."""
    from de_realtime_voting_spark.operators.dedup import semantic_dedup
    from de_realtime_voting_spark.oracles import SQL

    cap = SUB_OCC_CAP_MULT * SEMDEDUP_CELL_BUDGET
    n = cap + 52  # 2100 for the shipped constants
    emb = spark.createDataFrame(
        _sign_correlated_rows(n),
        "vec_id bigint, embedding array<float>, label int",
    )
    con = _duck_with_embeddings(tmp_path, emb)
    want = sorted(map(tuple, con.sql(SQL["semantic_dedup"]).fetchall()))
    got = sorted(
        (r.cell, r.n_vecs, r.n_dup_pairs, r.n_dropped, r.n_kept)
        for r in semantic_dedup(emb).collect()
    )
    assert got == want
    # all n vectors share every plane sign -> one cell, one sub-bucket,
    # every within-window cosine ~1: the report must show exactly the
    # windowed pair mass and account for every vector
    assert sum(r[1] for r in got) == n
    assert sum(r[2] for r in got) == _windowed_pair_count(n)
    assert all(r[1] - r[3] == r[4] for r in got)
    spark.catalog.clearCache()


def test_unigram_head_tail_split_matches_oracle(spark, sf_dir, tmp_path, monkeypatch):
    """The r11 sf100 catch: unigram_logprob_score's full-vocab model
    broadcast is corpus-scaled (9.7 GiB at sf100).  The fix splits
    scoring into a bounded top-K head broadcast + skew-free tail
    shuffle join, result-identical to the full join.  Force the TAIL
    path at test scale (head of 2 terms) and require the exact oracle
    report -- the oracle computes the single full join, so equality
    proves the split changes nothing."""
    import duckdb

    import de_realtime_voting_spark.constants as C
    from de_realtime_voting_spark.operators.text import unigram_logprob_score
    from de_realtime_voting_spark.oracles import SQL
    from de_realtime_voting_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    monkeypatch.setattr(C, "UNIGRAM_HEAD_TOP_K", 2)
    got = sorted(
        map(tuple, (r for r in unigram_logprob_score(docs).collect()))
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(map(tuple, con.sql(SQL["unigram_logprob_score"]).fetchall()))
    assert got == want and len(got) > 0
    spark.catalog.clearCache()
