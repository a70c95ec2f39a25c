"""Train the IVF coarse quantizer by distributed k-means and freeze
the centroids as the shared model artifact.

Replaces the r1-r5 toy quantizer (16 corpus rows sampled by fixed
vec_id) with Lloyd-trained centroids, per the r5 verdict.  Training
runs the exact distributed step ``embedding_kmeans_iter`` documents:
map-side Arrow cell assignment, one shuffle for the per-cell means
(64 column aggregates with partial agg), collect the 16 mean vectors
(the bounded model artifact), re-literalize, repeat to convergence.

The trained centroids are written to
``de_realtime_voting_spark/ivf_model.py`` as plain float literals.
Both engines consume THE SAME literals -- Spark via
``similarity._collect_centroids``, DuckDB via the generated VALUES
CTE in oracles.py -- so the oracle discipline is unchanged: repr()
round-trips doubles exactly, and every downstream cosine uses the
identical fold order both sides.

Usage:  python tools/train_ivf.py [train_sf_dir]   # default sf0.1
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_OUT = os.path.join(_REPO, "de_realtime_voting_spark", "ivf_model.py")

MAX_ITERS = 120
# cosine convergence: stop when every centroid moved by < 1e-12 in
# (1 - cos) -- double noise floor, i.e. a genuinely fixed point.
# Note cosine-assignment/mean-update Lloyd can 2-cycle near cell
# boundaries instead of reaching a fixed point; the artifact is
# deterministic either way (fixed seeds, fixed iteration count), and
# the generated docstring says which stop fired.
TOL = 1e-12


def _cos(a: list[float], b: list[float]) -> float:
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb) if na and nb else 0.0


def main() -> None:
    from de_realtime_voting_spark.constants import EMBEDDING_DIM, IVF_CENTROID_IDS
    from de_realtime_voting_spark.operators.similarity import _assign_cells
    from de_realtime_voting_spark.session import get_spark
    from de_realtime_voting_spark.sources.tables import load_table

    train_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("train-ivf")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, train_dir, "embeddings").persist()
    n_train = emb.count()

    # seed with the historical fixed sample (stable cell ids: the
    # seed vec_ids remain the cell labels across rounds)
    cents = sorted(
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in emb.where(F.col("vec_id").isin(IVF_CENTROID_IDS))
        .select("vec_id", "embedding")
        .collect()
    )
    assert len(cents) == len(IVF_CENTROID_IDS), "seed rows missing from train set"

    iters = 0
    max_move = float("inf")
    for iters in range(1, MAX_ITERS + 1):
        assigned = _assign_cells(emb, cents)
        means = (
            assigned.groupBy(F.col("cell").alias("cent_id"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.avg(F.element_at("embedding", i + 1).cast("double")).alias(
                        f"m{i}"
                    )
                    for i in range(EMBEDDING_DIM)
                ],
            )
            .collect()
        )
        new_by_id = {
            r["cent_id"]: [float(r[f"m{i}"]) for i in range(EMBEDDING_DIM)]
            for r in means
        }
        nxt = []
        max_move = 0.0
        for cid, old in cents:
            new = new_by_id.get(cid, old)  # empty cell keeps its centroid
            max_move = max(max_move, 1.0 - _cos(old, new))
            nxt.append((cid, new))
        cents = nxt
        print(f"iter {iters}: max_move={max_move:.3e}", flush=True)
        if max_move < TOL:
            break

    body = ",\n".join(
        f"    ({cid}, [{', '.join(repr(x) for x in emb_v)}])" for cid, emb_v in cents
    )
    with open(_OUT, "w") as f:
        f.write(
            f'''"""IVF coarse-quantizer model artifact (GENERATED -- do not edit).

Trained by tools/train_ivf.py: distributed Lloyd k-means over
{train_dir} ({n_train} vectors), seeded from the historical fixed
sample (constants.IVF_CENTROID_IDS -- the seed vec_ids remain the
stable cell labels), {"converged in" if max_move < TOL else "stopped at the iteration cap after"} {iters} iterations
(final max centroid move = {max_move:.3e} in 1-cosine).

Shared by BOTH engines: Spark literalizes these doubles in
operators/similarity._collect_centroids; the DuckDB oracle embeds
the same repr() literals in its VALUES CTE (oracles.py).  repr()
round-trips IEEE doubles exactly, so cross-engine parity is bit-safe.
Retrain: python tools/train_ivf.py [sf_dir].
"""

IVF_TRAINED_CENTROIDS: list[tuple[int, list[float]]] = [
{body},
]
'''
        )
    print(f"wrote {_OUT} ({len(cents)} centroids, {iters} iters)")


if __name__ == "__main__":
    main()
