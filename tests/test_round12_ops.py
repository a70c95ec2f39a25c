"""Round 12: second order plane for over-cap windowed pairing, LM
head/tail split, occupancy-cap short-circuit.

The r11 single-plane windowed pass measured 24.7% of sf100 drop
candidates uncovered: ONE projection axis cannot order a dense
cluster in every direction, so a qualifying pair whose endpoints sort
far apart on that axis is missed even when they are adjacent on an
independent axis.  r12 runs the window once per plane
(EMB_ORDER_PLANE / EMB_ORDER_PLANE2) and unions the pair sets.
These tests pin (a) the union actually recovers a pair the first
plane provably misses, (b) the two-plane arm stays cross-engine
identical, and (c) the small-SF short-circuit keeps the exact
all-pairs geometry.
"""

from __future__ import annotations

import numpy as np

from de_realtime_voting_spark.constants import (
    EMB_ORDER_PLANE,
    EMB_ORDER_PLANE2,
    EMB_PAIR_WINDOW,
    EMBEDDING_DIM,
)


def _grid_rows(n_a: int = 20, n_b: int = 10):
    """n_a x n_b vectors v = u + a*eps1*d1 + b*eps2*d2 with d1 built
    orthogonal to EMB_ORDER_PLANE2 and d2 orthogonal to
    EMB_ORDER_PLANE (Gram-Schmidt), so to first order plane-1 rank
    order follows the ``a`` coordinate and plane-2 rank order follows
    ``b``.  A same-b pair with a-gap ~ n_a sorts ~n_a*n_b/n_a apart
    on plane 2 but ~n_a*n_b on plane 1 -- outside the window there
    whenever n_a*n_b >> EMB_PAIR_WINDOW >= n_a.  Coefficients are
    tiny so every pairwise cosine stays ~1 (all pairs qualify)."""
    rng = np.random.default_rng(7)
    u = rng.standard_normal(EMBEDDING_DIM)
    u /= np.linalg.norm(u)
    p1 = np.array(EMB_ORDER_PLANE)
    p2 = np.array(EMB_ORDER_PLANE2)
    d1 = p1 - (p1 @ p2) / (p2 @ p2) * p2  # orthogonal to plane 2
    d2 = p2 - (p2 @ p1) / (p1 @ p1) * p1  # orthogonal to plane 1
    d1 /= np.linalg.norm(d1)
    d2 /= np.linalg.norm(d2)
    eps = 1e-4
    rows = []
    for a in range(n_a):
        for b in range(n_b):
            v32 = (u + a * eps * d1 + b * eps * d2).astype(np.float32)
            rows.append((a * n_b + b, [float(x) for x in v32], a, b))
    return rows


def _rank_gap(rows, plane) -> dict:
    """vec_id -> rank under (normalized projection, vec_id), replayed
    in float64 like both engines."""
    p = np.array(plane)
    keyed = []
    for vec_id, emb, _a, _b in rows:
        v = np.array(emb, dtype=np.float64)
        keyed.append(((float(v @ p) / float(np.linalg.norm(v)), vec_id), vec_id))
    keyed.sort()
    return {vec_id: i for i, (_k, vec_id) in enumerate(keyed)}


def test_second_plane_recovers_first_plane_miss(spark):
    """A same-b pair with maximal a-gap is provably outside the
    plane-1 window (rank gap > W) yet inside the plane-2 window --
    the union must contain it."""
    from de_realtime_voting_spark.operators.dedup import _occ_capped_pairs
    from de_realtime_voting_spark.functions.columns import l2_norm

    import pyspark.sql.functions as F

    rows = _grid_rows()
    n = len(rows)
    assert n > EMB_PAIR_WINDOW
    r1 = _rank_gap(rows, EMB_ORDER_PLANE)
    r2 = _rank_gap(rows, EMB_ORDER_PLANE2)
    # the construction's promise, checked not assumed
    lo, hi = 0 * 10 + 0, 19 * 10 + 0  # (a=0,b=0) and (a=19,b=0)
    assert abs(r1[hi] - r1[lo]) > EMB_PAIR_WINDOW, "plane-1 must miss it"
    assert abs(r2[hi] - r2[lo]) <= EMB_PAIR_WINDOW, "plane-2 must catch it"

    emb = spark.createDataFrame(
        [(vec_id, e) for vec_id, e, _a, _b in rows],
        "vec_id bigint, embedding array<float>",
    )
    normed = emb.select(
        F.lit(1).alias("g"),
        "vec_id",
        "embedding",
        l2_norm(F.col("embedding")).alias("norm"),
    )
    pairs = _occ_capped_pairs(normed, ["g"], occ_cap=100)  # n=200 > cap
    got = {
        (r["vec_a"], r["vec_b"])
        for r in pairs.select("vec_a", "vec_b").collect()
    }
    assert (lo, hi) in got
    # and the union is exactly the two windows' replay -- no extras
    want = set()
    for ranks in (r1, r2):
        order = sorted(ranks, key=lambda v: ranks[v])
        for i, va in enumerate(order):
            for vb in order[i + 1 : i + 1 + EMB_PAIR_WINDOW]:
                want.add((min(va, vb), max(va, vb)))
    assert got == want
    spark.catalog.clearCache()


def test_two_plane_union_matches_duckdb_oracle(spark, tmp_path):
    """Cross-engine identity of the r12 two-plane arm on an over-cap
    group: the full (vec_a, vec_b, label, cosine) sets must match --
    pins both rank orders, both windows, and the union-dedup."""
    import duckdb

    from de_realtime_voting_spark.operators.dedup import dedup_embedding_cosine
    from de_realtime_voting_spark.oracles import SQL

    # reuse the r11 sign-correlated over-cap corpus: a 1-D family is
    # ordered the same way by BOTH planes, so the union must equal
    # either single window -- any divergence is an engine mismatch
    from tests.test_round11_ops import (
        _sign_correlated_rows,
        _windowed_pair_count,
    )
    from de_realtime_voting_spark.constants import (
        EMB_COS_BLOCK_BUDGET,
        SUB_OCC_CAP_MULT,
    )

    cap = SUB_OCC_CAP_MULT * EMB_COS_BLOCK_BUDGET
    n = cap + 76
    emb = spark.createDataFrame(
        _sign_correlated_rows(n),
        "vec_id bigint, embedding array<float>, label int",
    )
    out = str(tmp_path / "emb2")
    emb.write.parquet(out)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{out}/*.parquet'")
    got = {
        (r["vec_a"], r["vec_b"], r["label"], r["cosine"])
        for r in dedup_embedding_cosine(emb).collect()
    }
    want = {
        (a, b, lb, c)
        for a, b, lb, c in con.sql(SQL["dedup_embedding_cosine"]).fetchall()
    }
    assert got == want
    assert len(got) == _windowed_pair_count(n)
    spark.catalog.clearCache()


def test_short_circuit_keeps_all_pairs_geometry(spark):
    """Under-cap corpora take the tier-1/tier-2 short-circuit: the
    result must be the exact all-pairs set (C(n,2) candidates down to
    the threshold filter), identical to the capped plan's output."""
    from tests.test_round11_ops import _sign_correlated_rows
    from de_realtime_voting_spark.operators.dedup import dedup_embedding_cosine

    n = 60  # far under every cap: one block, tier-1 short-circuit
    emb = spark.createDataFrame(
        _sign_correlated_rows(n),
        "vec_id bigint, embedding array<float>, label int",
    )
    assert dedup_embedding_cosine(emb).count() == n * (n - 1) // 2
    spark.catalog.clearCache()
