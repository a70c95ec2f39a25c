"""Approximate-nearest-neighbor search over embedding columns.

Baseline: exact brute-force top-k for a bounded query set (queries
broadcast against the corpus -- linear scan, no shuffle of the corpus).
Scale path: random-hyperplane LSH bucketing; each vector lands in one
of 2**LSH_NUM_PLANES buckets and search touches only the query's
bucket, turning a corpus scan per query into a bucket scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

import math

from ..constants import ANN_K, ANN_QUERY_IDS, IVF_CENTROID_IDS, IVF_NPROBE
from ..functions.columns import round_half_up as rnd
from ..functions import cosine_similarity, dot_product, l2_norm, lsh_bucket


def _queries(embeddings: DataFrame) -> DataFrame:
    return embeddings.where(F.col("vec_id").isin(ANN_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )


def _topk(joined: DataFrame) -> DataFrame:
    # Arrow fold twin (r12): bit-identical to cosine_similarity
    # (pinned ==), vectorized per batch -- the candidate x query
    # cosine is the ANN family's hot loop (3 interpreted folds per
    # candidate row otherwise)
    from ..functions.pandas_udfs import cosine_fold_pandas

    cos = cosine_fold_pandas(F.col("q_emb"), F.col("embedding"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        joined.select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cos.alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= ANN_K)
        .select("query_id", "neighbor_id", "rank", rnd("cosine", 6).alias("cosine"))
    )


def ann_bruteforce_topk(embeddings: DataFrame) -> DataFrame:
    """Exact top-k cosine neighbors for the fixed query set; the
    query side broadcasts, corpus streams through map-side."""
    joined = embeddings.join(
        F.broadcast(_queries(embeddings)), F.col("vec_id") != F.col("query_id")
    )
    return _topk(joined)


def knn_label_purity(embeddings: DataFrame) -> DataFrame:
    """Embedding-quality eval: for each probe vector (the fixed
    ANN_QUERY_IDS set, the same probe discipline as the recall
    scoreboard), what share of its exact top-k cosine neighbors
    carries the probe's own label.  Low purity = the embedding space
    does not separate the label structure -- the standard k-NN
    sanity eval run before trusting embeddings for semantic dedup or
    clustering.

    Scale shape: identical to ann_bruteforce_topk -- the probe set
    broadcasts, the corpus streams map-side, the only shuffle is the
    per-probe top-k window over |probes| partitions.  Corpus-wide
    purity at 100 TB swaps the probe set for an IVF-cell-restricted
    neighbor list (the ann_ivf_topk shape), the documented knob.
    """
    q = embeddings.where(F.col("vec_id").isin(ANN_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("query_label"),
    )
    joined = embeddings.join(
        F.broadcast(q), F.col("vec_id") != F.col("query_id")
    )
    from ..functions.pandas_udfs import cosine_fold_pandas

    cos = cosine_fold_pandas(F.col("q_emb"), F.col("embedding"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    top = (
        joined.select(
            "query_id",
            "query_label",
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("neighbor_label"),
            cos.alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= ANN_K)
    )
    same = F.sum(
        F.when(F.col("neighbor_label") == F.col("query_label"), 1).otherwise(0)
    )
    return top.groupBy("query_id", "query_label").agg(
        same.cast("bigint").alias("n_same_label"),
        rnd(same / F.count(F.lit(1)), 6).alias("purity"),
    )


def embedding_lsh_buckets(embeddings: DataFrame) -> DataFrame:
    """LSH bucket histogram: the operational check that hyperplane
    bucketing spreads the corpus (skewed buckets = bad recall AND a
    hot partition at scale)."""
    return (
        embeddings.select("vec_id", lsh_bucket(F.col("embedding")).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min("vec_id").alias("min_vec_id"),
        )
    )


def _collect_centroids(embeddings: DataFrame) -> list[tuple[int, list[float]]]:
    """The 16 coarse centroids -- since r6 a TRAINED k-means model
    artifact (tools/train_ivf.py: distributed Lloyd iterations over
    sf0.1, converged to the double noise floor), frozen as literals
    in ivf_model.py and shared verbatim with the DuckDB oracle's
    VALUES CTE, so cross-engine parity stays bit-exact.

    The ``embeddings`` argument is kept for API stability (and for
    the retraining path, which seeds from corpus rows); an index's
    centroids are a model artifact, independent of the corpus being
    indexed -- this also removes the per-query centroid collect the
    r1-r5 sampled quantizer paid."""
    del embeddings  # model artifact: no per-query corpus dependency
    from ..ivf_model import IVF_TRAINED_CENTROIDS

    return [(cid, list(emb)) for cid, emb in IVF_TRAINED_CENTROIDS]


def _assign_cells(embeddings: DataFrame, cents) -> DataFrame:
    """(vec_id, embedding, cell, probes): nearest-centroid assignment
    via an Arrow-batched Pandas UDF -- map-side, no corpus shuffle,
    one numpy pass per batch instead of K*D interpreted lambda evals
    per row.  Bit-identical to the Catalyst form (_assign_cells_catalyst,
    kept below and pinned by tests): same float64 cast-then-accumulate
    order, same (neg_cos, cent_id) tie-break.
    """
    from ..functions.partitioning import spread_to_parallelism
    from ..functions.pandas_udfs import make_cell_assigner

    assign = make_cell_assigner(cents, IVF_NPROBE)
    # conditional spread (r12): small-SF scans need the parallelism,
    # a production scan already has it and skips the corpus shuffle
    return (
        spread_to_parallelism(embeddings)
        .select("vec_id", "embedding", assign(F.col("embedding")).alias("a"))
        .select("vec_id", "embedding", F.col("a.cell").alias("cell"), F.col("a.probes").alias("probes"))
    )


def _assign_cells_catalyst(embeddings: DataFrame, cents) -> DataFrame:
    """Pure-Catalyst nearest-centroid assignment (no Python in the
    plan).  Semantically identical to _assign_cells; kept as the
    reference implementation and for environments where the Arrow
    path is unavailable.

    Centroid norms fold to literals driver-side (same left-to-right
    sum the engines use, so the doubles are identical); the row norm
    is materialized ONCE behind the repartition barrier -- higher-
    order lambdas are interpreted, so hoisting both norms out of the
    16-way transform cuts the per-row work ~3x.
    """
    # Three single-node array literals zipped into the struct array:
    # one Literal per column instead of one per element keeps the
    # analyzed plan O(1) in K*dim (driver analysis was the dominant
    # cost of this query at small SF).
    cent_lit = F.arrays_zip(
        F.lit([cid for cid, _ in cents]).alias("cent_id"),
        F.lit([emb for _, emb in cents]).alias("c_emb"),
        F.lit([math.sqrt(sum(x * x for x in emb)) for _, emb in cents]).alias(
            "c_norm"
        ),
    )
    # per-row: cosine against all centroids, sort by (-cos, cent_id)
    # -> element 1 is the cell, slice(1, NPROBE) are the probe cells
    ranked = F.array_sort(
        F.transform(
            cent_lit,
            lambda c: F.struct(
                (
                    -(
                        dot_product(F.col("embedding"), c["c_emb"])
                        / (F.col("v_norm") * c["c_norm"])
                    )
                ).alias("neg_cos"),
                c["cent_id"].alias("cent_id"),
            ),
        )
    )
    return (
        embeddings.select(
            "vec_id", "embedding", l2_norm(F.col("embedding")).alias("v_norm")
        )
        .repartition(embeddings.sparkSession.sparkContext.defaultParallelism)
        .select("vec_id", "embedding", ranked.alias("ranked"))
        .select(
            "vec_id",
            "embedding",
            F.element_at("ranked", 1)["cent_id"].alias("cell"),
            F.transform(
                F.slice("ranked", 1, IVF_NPROBE), lambda r: r["cent_id"]
            ).alias("probes"),
        )
    )


def ann_ivf_topk(embeddings: DataFrame) -> DataFrame:
    """IVF-style ANN: assign every vector to its nearest coarse
    centroid (the inverted-file cell), probe the query's IVF_NPROBE
    closest cells, exact top-k within probed cells only.

    Scale shape: map-side cell assignment (_assign_cells), queries x
    probes broadcast; the only corpus shuffle is the final per-query
    top-k, which AQE sizes by the probed subset, not the corpus.
    """
    cents = _collect_centroids(embeddings)
    if not cents:  # empty corpus -> empty result, stable schema
        return embeddings.sparkSession.createDataFrame(
            [], "query_id bigint, neighbor_id bigint, rank int, cosine double"
        )
    return _ivf_topk_with(embeddings, cents)


def _ivf_topk_with(embeddings: DataFrame, cents) -> DataFrame:
    """The IVF probe/top-k machinery under an EXPLICIT centroid set --
    factored out of ann_ivf_topk so ivf_retrain_report can run the
    same search path against a candidate quantizer (old vs retrained
    on one truth set) before it is promoted."""
    assigned = _assign_cells(embeddings, cents)
    q = (
        assigned.where(F.col("vec_id").isin(ANN_QUERY_IDS))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.explode("probes").alias("probe_cell"),
        )
    )
    joined = assigned.join(
        F.broadcast(q),
        (F.col("cell") == F.col("probe_cell")) & (F.col("vec_id") != F.col("query_id")),
    )
    return _topk(joined)


def ann_recall_report(embeddings: DataFrame) -> DataFrame:
    """Index-quality scoreboard: recall@k of each APPROXIMATE ANN
    method (multi-probe LSH, IVF) against the exact brute-force top-k,
    per query -- the acceptance gate an embedding index must pass
    before it replaces exact search in a production retrieval path.
    Turns the pytest-only recall assertion into a first-class,
    oracle-gated report.

    Scale shape: ground truth is the brute-force op (bounded broadcast
    query set, corpus streams map-side) computed ONCE and persisted --
    it feeds one semi-join per method; hit counting is a (query,
    neighbor) semi-join against the k x |queries|-row truth set (tiny,
    broadcast by AQE); output is |methods| x |queries| rows.

    r13 fuse (the ivf_retrain_report template): ONE corpus pass
    computes BOTH index keys (LSH bucket -- a cheap Catalyst
    expression -- and the Arrow IVF cell/probes); candidates carry an
    arm tag map-side (bounded 2-way explode, no shuffle), one
    broadcast equi-join on (arm, key) replaces the two per-arm joins,
    and one per-(arm, query) top-k window replaces the two per-query
    windows.  Per (arm, query) the candidate set, cosines (row-wise
    identical Arrow fold) and (cosine desc, id asc) tie-break are
    exactly ann_lsh_topk's / ann_ivf_topk's, so hits and recalls are
    unchanged; the registry arm ops themselves are untouched.
    """
    from ..constants import LSH_NUM_PLANES
    from ..functions.partitioning import spread_to_parallelism
    from ..functions.pandas_udfs import cosine_fold_pandas, make_cell_assigner

    # persist: ground truth feeds one semi-join per method; without it
    # the full brute-force scan runs |methods|+1 times.  Deliberately
    # not unpersisted (lazy plan outlives the function; LRU-evictable,
    # harnesses clearCache() between queries).
    bf = ann_bruteforce_topk(embeddings).select("query_id", "neighbor_id").persist()
    truth_k = bf.groupBy("query_id").agg(F.count(F.lit(1)).alias("k"))

    cents = _collect_centroids(embeddings)
    assign = make_cell_assigner(cents, IVF_NPROBE)
    base = (
        spread_to_parallelism(embeddings)
        .select(
            "vec_id",
            "embedding",
            lsh_bucket(F.col("embedding")).alias("bucket"),
            assign(F.col("embedding")).alias("a"),
        )
        .select(
            "vec_id",
            "embedding",
            "bucket",
            F.col("a.cell").alias("cell"),
            F.col("a.probes").alias("probes"),
        )
    )
    qsrc = base.where(F.col("vec_id").isin(ANN_QUERY_IDS))
    lsh_probes = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(2**p)) for p in range(LSH_NUM_PLANES)],
    )
    q_all = qsrc.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.lit("lsh").alias("arm_q"),
        F.explode(lsh_probes).alias("probe_key"),
    ).unionByName(
        qsrc.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.lit("ivf").alias("arm_q"),
            F.explode("probes").alias("probe_key"),
        )
    )
    cand = base.select(
        "vec_id",
        "embedding",
        F.explode(
            F.array(
                F.struct(F.lit("lsh").alias("arm"), F.col("bucket").alias("key")),
                F.struct(F.lit("ivf").alias("arm"), F.col("cell").alias("key")),
            )
        ).alias("ac"),
    ).select(
        "vec_id",
        "embedding",
        F.col("ac.arm").alias("arm"),
        F.col("ac.key").alias("key"),
    )
    joined = cand.join(
        F.broadcast(q_all),
        (F.col("arm") == F.col("arm_q"))
        & (F.col("key") == F.col("probe_key"))
        & (F.col("vec_id") != F.col("query_id")),
    )
    cos = cosine_fold_pandas(F.col("q_emb"), F.col("embedding"))
    w = Window.partitionBy("arm", "query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    topk = (
        joined.select(
            "arm",
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cos.alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= ANN_K)
    )
    hits = (
        topk.select("arm", "query_id", "neighbor_id")
        .join(bf, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("arm", "query_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    grid = truth_k.select(
        "query_id",
        "k",
        F.explode(F.array(F.lit("lsh"), F.lit("ivf"))).alias("arm"),
    )
    return grid.join(hits, ["arm", "query_id"], "left").select(
        F.col("arm").alias("method"),
        "query_id",
        "k",
        F.coalesce("n_hit", F.lit(0)).cast("bigint").alias("n_hit"),
        rnd(F.coalesce("n_hit", F.lit(0)) / F.col("k"), 6).alias("recall"),
    )


def embedding_kmeans_iter(embeddings: DataFrame) -> DataFrame:
    """One Lloyd (k-means) iteration over the coarse centroids: assign
    every vector map-side, recompute per-cell mean vectors as 64
    column aggregates (partial aggregation, one shuffle on cell), and
    report per-cell size plus drift = cosine(old centroid, new mean).

    This is the training step behind the IVF index: run it in a
    driver loop (collect the 16 new means, re-literalize, repeat) and
    the whole k-means fits the same map-side-assign shape -- per
    iteration cost is one corpus pass, state is 16 vectors.
    """
    cents = _collect_centroids(embeddings)
    if not cents:
        return embeddings.sparkSession.createDataFrame(
            [], "cent_id bigint, n_members bigint, drift double"
        )
    dim = len(cents[0][1])
    assigned = _assign_cells(embeddings, cents)
    from ..functions.columns import dim_avg_cols

    means = assigned.groupBy(F.col("cell").alias("cent_id")).agg(
        F.count(F.lit(1)).alias("n_members"),
        # SQL-string builds (plan-identical, ~10x fewer py4j calls --
        # the 64-expression list was driver-build-bound; r13)
        *dim_avg_cols("embedding", dim),
    )
    cent_df = embeddings.sparkSession.createDataFrame(
        [(cid, emb) for cid, emb in cents], "cent_id bigint, c_emb array<double>"
    )
    new_emb = F.expr("array(" + ", ".join(f"m{i}" for i in range(dim)) + ")")
    drift = cosine_similarity(new_emb, F.col("c_emb"))
    return (
        means.join(F.broadcast(cent_df), "cent_id")
        .select("cent_id", "n_members", rnd(drift, 6).alias("drift"))
    )


def doc_embedding_stats(documents: DataFrame, embeddings: DataFrame) -> DataFrame:
    """Cross-modal join: document metadata x embedding vectors (the
    multimodal-table pattern of a text column and its vector column
    living in separate stores, keyed by id).  Per (lang, label):
    count and mean vector norm -- the drift monitor for an embedding
    pipeline."""
    joined = documents.select("doc_id", "lang").join(
        embeddings.select(
            "vec_id", "label", l2_norm(F.col("embedding")).alias("norm")
        ),
        F.col("doc_id") == F.col("vec_id"),
    )
    return joined.groupBy("lang", "label").agg(
        F.count(F.lit(1)).alias("n_docs"),
        rnd(F.avg("norm"), 4).alias("avg_norm"),
        rnd(F.min("norm"), 4).alias("min_norm"),
        rnd(F.max("norm"), 4).alias("max_norm"),
    )


def ann_lsh_topk(embeddings: DataFrame) -> DataFrame:
    """Multi-probe LSH ANN: search the query's hyperplane bucket PLUS
    every hamming-distance-1 bucket (one plane's sign flipped).

    Single-bucket probing has a recall cliff -- a near neighbor that
    disagrees on any one of the LSH_NUM_PLANES sign bits is
    invisible.  Multi-probe buys that recall back without touching
    index layout or adding hash tables: the query side (tiny,
    broadcast) explodes to 1 + n_planes probe buckets, the corpus
    side still partitions by its single bucket.  Cost scales with
    the probe count on the broadcast side only.  The oracle mirrors
    the same probe set via the same deterministic planes."""
    from ..constants import LSH_NUM_PLANES

    bucketed = embeddings.withColumn("bucket", lsh_bucket(F.col("embedding")))
    probes = F.array(
        F.col("q_bucket"),
        *[F.col("q_bucket").bitwiseXOR(F.lit(2**p)) for p in range(LSH_NUM_PLANES)],
    )
    q = (
        bucketed.where(F.col("vec_id").isin(ANN_QUERY_IDS))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("bucket").alias("q_bucket"),
        )
        .select("query_id", "q_emb", F.explode(probes).alias("probe_bucket"))
    )
    joined = bucketed.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("probe_bucket")) & (F.col("vec_id") != F.col("query_id")),
    )
    return _topk(joined)


def embedding_norm_outliers(embeddings: DataFrame) -> DataFrame:
    """Per-label embedding-norm distribution monitor: mean/stddev of
    the L2 norm plus the count of vectors whose norm sits more than
    NORM_OUTLIER_Z sample-stddevs from the label mean -- the cheap
    screen for corrupt or mis-scaled vectors before indexing.

    Two passes over the (tiny) per-label stats: an agg keyed on
    label, broadcast back onto the vectors.  Both compare sides are
    rounded to 6 places so cross-engine float-sum ordering in the
    mean/stddev can't flip a count at the threshold.
    """
    from ..constants import NORM_OUTLIER_Z

    normed = embeddings.select(
        "label", l2_norm(F.col("embedding")).alias("norm")
    )
    stats = normed.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.avg("norm").alias("mean_norm"),
        F.stddev_samp("norm").alias("std_norm"),
    )
    dev = rnd(F.abs(F.col("norm") - F.col("mean_norm")), 6)
    cut = rnd(F.lit(NORM_OUTLIER_Z) * F.col("std_norm"), 6)
    return (
        normed.join(F.broadcast(stats), "label")
        .groupBy("label")
        .agg(
            F.max("n_vecs").alias("n_vecs"),
            rnd(F.max("mean_norm"), 4).alias("mean_norm"),
            rnd(F.max("std_norm"), 4).alias("std_norm"),
            F.sum(F.when(dev > cut, 1).otherwise(0)).alias("n_outliers"),
        )
    )


def embedding_quantization_stats(embeddings: DataFrame) -> DataFrame:
    """Int8 affine-quantization audit per label: the per-tensor scale/
    zero-point an int8 export would use, plus the reconstruction error
    it would cost -- the go/no-go table for quantizing an embedding
    store to a quarter of its size.  (No reference analog --
    training-data mandate.)

    Two corpus passes, both map-side until tiny aggs: pass 1 reduces
    each vector to its own min/max (F.aggregate inside codegen) and
    aggs to per-label range; pass 2 broadcasts the |labels|-row range
    table back and folds per-element squared reconstruction error
    without ever exploding the arrays into rows.  Quantization uses
    floor(z + 0.5), bit-identical in any IEEE engine (Spark round()
    and DuckDB round() disagree on ties).
    """
    vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    per_vec = embeddings.select(
        "label",
        F.col("embedding"),
        F.array_min(vec).alias("vmin"),
        F.array_max(vec).alias("vmax"),
        F.size("embedding").alias("dim"),
    )
    ranges = per_vec.groupBy("label").agg(
        F.min("vmin").alias("lo"), F.max("vmax").alias("hi")
    )
    scale = (F.col("hi") - F.col("lo")) / F.lit(255.0)
    with_range = per_vec.join(F.broadcast(ranges), "label").select(
        "label",
        "embedding",
        "dim",
        F.col("lo"),
        scale.alias("scale"),
    )
    # x' = lo + floor((x - lo)/scale + 0.5) * scale; fold sum((x-x')^2)
    err_sum = F.aggregate(
        F.transform(F.col("embedding"), lambda x: x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc
        + F.pow(
            x - (F.col("lo") + F.floor((x - F.col("lo")) / F.col("scale") + 0.5) * F.col("scale")),
            2,
        ),
    )
    # flat range (hi == lo) means every value quantizes exactly:
    # error is 0 by definition -- guarded explicitly because x/0
    # diverges between engines (Spark non-ANSI Divide -> NULL,
    # DuckDB IEEE -> NaN)
    per_vec_err = with_range.select(
        "label",
        "lo",
        "scale",
        "dim",
        F.when(F.col("scale") == 0.0, F.lit(0.0))
        .otherwise(err_sum / F.col("dim"))
        .alias("mse"),
    )
    return per_vec_err.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        rnd(F.min("lo"), 6).alias("range_lo"),
        rnd(F.max(F.col("lo") + F.col("scale") * 255.0), 6).alias("range_hi"),
        rnd(F.max("scale"), 8).alias("scale"),
        rnd(F.avg("mse"), 10).alias("avg_mse"),
    )


def embedding_pca_stats(embeddings: DataFrame) -> DataFrame:
    """Per-dimension moment statistics of the embedding corpus --
    the mean/variance table a whitening or PCA step consumes (PCA
    proper adds the off-diagonal covariances: same single-pass plan
    with K^2 running sums instead of 2K).  (No reference analog --
    training-data mandate.)

    Scale shape: ONE corpus pass producing 2*EMBEDDING_DIM running
    sums as column aggregates -- map-side partial aggregation, a
    one-row shuffle, zero row expansion.  The explode formulation
    (corpus x 64 rows through a shuffle) is the wrong shape at
    100 TB; the unpivot here runs on the 1-row aggregate.
    """
    from ..constants import EMBEDDING_DIM

    from ..functions.columns import dim_avg_cols, el_sql

    # SQL-string builds (plan-identical, ~10x fewer py4j calls; r13)
    row = embeddings.agg(
        F.count(F.lit(1)).alias("n_vecs"),
        *dim_avg_cols("embedding", EMBEDDING_DIM),
        *[
            F.expr(
                f"avg({el_sql('embedding', i + 1)} * {el_sql('embedding', i + 1)})"
            ).alias(f"s{i}")
            for i in range(EMBEDDING_DIM)
        ],
    )
    stack = F.expr(
        "stack({n}, {cols}) AS (dim, mean_d, e2_d)".format(
            n=EMBEDDING_DIM,
            cols=", ".join(f"{i}, m{i}, s{i}" for i in range(EMBEDDING_DIM)),
        )
    )
    return (
        row.select("n_vecs", stack)
        # empty corpus -> zero rows, matching the oracle's GROUP BY
        # over an empty unnest (the global agg would otherwise emit
        # EMBEDDING_DIM all-NULL rows)
        .where(F.col("n_vecs") > 0)
        .select(
            F.col("dim").cast("int").alias("dim"),
            F.col("n_vecs").cast("bigint").alias("n_vecs"),
            rnd(F.col("mean_d"), 6).alias("mean_d"),
            rnd(F.col("e2_d") - F.col("mean_d") * F.col("mean_d"), 6).alias("var_d"),
        )
    )


def _collect_pq_codebook(embeddings: DataFrame) -> list[list[list[float]]]:
    """CB[m][c][j]: codeword j-th component of code c in subspace m.
    Codewords are the fixed deterministic corpus sample
    (PQ_CODEBOOK_IDS, code = ascending vec_id rank) -- an index/model
    artifact collected once, like the IVF centroids."""
    from ..constants import PQ_CODEBOOK_IDS, PQ_M, PQ_SUB_DIM

    rows = sorted(
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in embeddings.where(F.col("vec_id").isin(PQ_CODEBOOK_IDS))
        .select("vec_id", "embedding")
        .collect()
    )
    return [
        [emb[m * PQ_SUB_DIM : (m + 1) * PQ_SUB_DIM] for _, emb in rows]
        for m in range(PQ_M)
    ]


def _sqdist(a, b) -> "F.Column":
    """Left-to-right squared L2 over two double arrays ((x-y)*(x-y),
    not pow -- pow(x,2) may route through exp/log and diverge from
    the oracle's multiply)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _pq_codes_catalyst(embeddings: DataFrame, cb) -> DataFrame:
    """Pure-Catalyst PQ encoding reference: (vec_id, codes) where
    codes[m] = argmin_{code} ||x_m - codeword||^2 (left-to-right
    double fold, ties to the low code via the (dist, code) struct
    sort).  Semantically identical to the Arrow encoder
    (functions.pandas_udfs.make_pq_encoder, pinned by test); kept as
    the no-Python-path reference, like _assign_cells_catalyst."""
    from ..constants import PQ_M, PQ_N_CODES, PQ_SUB_DIM

    vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    spread = embeddings.select("vec_id", vec.alias("v")).repartition(
        embeddings.sparkSession.sparkContext.defaultParallelism
    )

    def code_m(m):
        cands = F.array(
            *[
                F.struct(
                    _sqdist(
                        F.slice(F.col("v"), m * PQ_SUB_DIM + 1, PQ_SUB_DIM),
                        F.lit(cb[m][c]),
                    ).alias("dist"),
                    F.lit(c).alias("code"),
                )
                for c in range(PQ_N_CODES)
            ]
        )
        return F.element_at(F.array_sort(cands), 1)["code"]

    return spread.select(
        "vec_id", F.array(*[code_m(m) for m in range(PQ_M)]).alias("codes")
    )


def _pq_codes(embeddings: DataFrame, cb) -> DataFrame:
    """(vec_id, codes): Arrow-batched PQ encoding -- one numpy pass
    per batch instead of PQ_M * PQ_N_CODES interpreted folds per row
    (measured ~3x on the encode stage at sf0.1).  Bit-identical to
    _pq_codes_catalyst (same float64 accumulation order, same
    first-minimum tie-break), pinned by tests/test_functions.py."""
    from ..functions.pandas_udfs import make_pq_encoder

    encode = make_pq_encoder(cb)
    return (
        embeddings.repartition(embeddings.sparkSession.sparkContext.defaultParallelism)
        .select("vec_id", encode(F.col("embedding")).alias("codes"))
    )


def _pq_adc_rank(embeddings: DataFrame, k: int) -> DataFrame:
    """ADC-ranked (query_id, neighbor_id, rank, adc_dist) rows up to
    rank k -- the shared scan behind ann_pq_topk (k = ANN_K) and the
    two-stage re-ranker (k = PQ_RERANK_SHORTLIST).  See ann_pq_topk
    for the algorithm and scale argument."""
    return _ann_pq_ranked(embeddings, k)


def ann_pq_topk(embeddings: DataFrame) -> DataFrame:
    """Product-quantization ANN: encode every vector as PQ_M codebook
    codes (nearest codeword per contiguous subspace), then rank
    neighbors for the fixed query set by ADC (asymmetric distance:
    exact query subvector vs the neighbor's CODEWORD, summed over
    subspaces).  The memory shape that makes billion-vector search
    work: the corpus compresses to PQ_M bytes per vector, and a scan
    touches codes, never raw vectors.

    The ADC scan is the textbook LUT form: each query precomputes its
    PQ_M x PQ_N_CODES distance table DRIVER-side (query set is
    bounded, like the IVF centroid collect) in the same left-to-right
    double fold the oracle uses, so scoring is pure table lookups --
    8 element_at's and 7 adds per (query, neighbor), zero per-row
    distance folds.

    Scale shape: encoding is map-side only (Arrow-batched, codebook
    broadcast in the closure), no corpus shuffle; the LUT table
    (|queries| rows) broadcasts, and the only wide shuffle is the
    per-query top-k carrying (query, neighbor, dist) triples.  Ties
    break on code/neighbor id, so both engines pick identical codes
    and ranks.
    """
    from ..constants import ANN_K

    return (
        _ann_pq_ranked(embeddings, ANN_K)
        .select(
            "query_id", "neighbor_id", "rank", rnd("adc_dist", 6).alias("adc_dist")
        )
    )


def _ann_pq_ranked(embeddings: DataFrame, k: int) -> DataFrame:
    from ..constants import ANN_QUERY_IDS, PQ_M, PQ_SUB_DIM

    cb = _collect_pq_codebook(embeddings)
    if not cb or not cb[0]:
        return embeddings.sparkSession.createDataFrame(
            [], "query_id bigint, neighbor_id bigint, rank int, adc_dist double"
        )
    encoded = _pq_codes(embeddings, cb)
    # per-query ADC lookup tables, built driver-side with the exact
    # fold order of the oracle's list_aggregate (Python floats ARE
    # IEEE doubles; left-to-right accumulation matches)
    q_rows = sorted(
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in embeddings.where(F.col("vec_id").isin(ANN_QUERY_IDS))
        .select("vec_id", "embedding")
        .collect()
    )

    def lut_row(q_emb):
        lut = []
        for m in range(PQ_M):
            row = []
            for cw in cb[m]:
                acc = 0.0
                for j in range(PQ_SUB_DIM):
                    d = q_emb[m * PQ_SUB_DIM + j] - cw[j]
                    acc = acc + d * d
                row.append(acc)
            lut.append(row)
        return lut

    lut_df = embeddings.sparkSession.createDataFrame(
        [(qid, lut_row(emb)) for qid, emb in q_rows],
        "query_id bigint, lut array<array<double>>",
    )
    pairs = encoded.select(
        F.col("vec_id").alias("neighbor_id"), "codes"
    ).join(F.broadcast(lut_df), F.col("neighbor_id") != F.col("query_id"))
    adc = None
    for m in range(PQ_M):
        d_m = F.element_at(
            F.element_at("lut", m + 1), F.element_at("codes", m + 1) + 1
        )
        adc = d_m if adc is None else adc + d_m
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.select("query_id", "neighbor_id", adc.alias("adc_dist"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def ann_pq_rerank_topk(embeddings: DataFrame) -> DataFrame:
    """Two-stage retrieval: PQ-ADC shortlist -> exact-cosine re-rank.
    The production billion-vector pattern: the compressed scan (codes
    only, PQ_M bytes/vector) finds PQ_RERANK_SHORTLIST candidates per
    query cheaply; RAW vectors are then fetched ONLY for the
    shortlist -- a |queries| x SHORTLIST row join keyed on
    neighbor_id, never a corpus scan of raw floats -- and exact
    cosine fixes the ADC quantization error in the final top-ANN_K
    order.  Ties break on neighbor_id; ranks are deterministic.

    Scale shape: stage 1 is ann_pq_topk's scan (shared _pq_adc_rank,
    one definition); stage 2's raw-vector fetch is a broadcast-able
    join of a tiny frame against the embeddings table's (vec_id,
    embedding) projection, and the re-rank window partitions by
    query over SHORTLIST rows."""
    from ..constants import ANN_K, ANN_QUERY_IDS, PQ_RERANK_SHORTLIST

    short = _pq_adc_rank(embeddings, PQ_RERANK_SHORTLIST).select(
        "query_id", "neighbor_id"
    )
    q = embeddings.where(F.col("vec_id").isin(ANN_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    nb = embeddings.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("n_emb")
    )
    scored = (
        short.join(F.broadcast(q), "query_id")
        .join(nb, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("q_emb"), F.col("n_emb")).alias("cosine"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= ANN_K)
        .select("query_id", "neighbor_id", "rank", rnd("cosine", 6).alias("cosine"))
    )


def embedding_label_cohesion(embeddings: DataFrame) -> DataFrame:
    """Per-label clustering-cohesion audit: each label's centroid
    (the per-dimension mean) and the mean/min cosine of members to
    their own centroid -- the cheap screen for mislabeled or
    incoherent embedding groups before they feed supervised
    curation.  (No reference analog -- training-data mandate.)

    Scale shape: centroids are EMBEDDING_DIM column aggregates per
    label (map-side partial agg, |labels|-row result) joined back
    broadcast; the cosine pass is map-side.  No row explosion, two
    corpus passes total.
    """
    from ..constants import EMBEDDING_DIM

    from ..functions.columns import dim_avg_cols

    cents = embeddings.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        # SQL-string builds (plan-identical, ~10x fewer py4j calls; r13)
        *dim_avg_cols("embedding", EMBEDDING_DIM),
    )
    cent_arr = F.expr(
        "array(" + ", ".join(f"m{i}" for i in range(EMBEDDING_DIM)) + ")"
    )
    cent_df = cents.select("label", "n_vecs", cent_arr.alias("centroid"))
    cos = cosine_similarity(F.col("embedding"), F.col("centroid"))
    return (
        embeddings.join(F.broadcast(cent_df), "label")
        .select("label", "n_vecs", cos.alias("cos"))
        .groupBy("label")
        .agg(
            F.max("n_vecs").alias("n_vecs"),
            rnd(F.avg("cos"), 4).alias("avg_cohesion"),
            rnd(F.min("cos"), 4).alias("min_cohesion"),
        )
    )


def ivf_cell_balance(embeddings: DataFrame) -> DataFrame:
    """Operational health check for the IVF index: per-cell occupancy
    with each cell's corpus share and ratio to the mean cell.  Skewed
    cells are the ANN equivalent of hot shuffle keys -- a cell holding
    10x its share makes every probe of it 10x the work, and the fix
    (re-train or split the hot centroid) starts from exactly this
    table.  Run after every index build / nightly ingest.

    Scale shape: the same Arrow-batched map-side assigner as
    ann_ivf_topk (bit-identical to the Catalyst twin, so the oracle's
    cross-join argmax agrees); one agg shuffle down to <= |centroids|
    rows; the share/ratio windows run over that tiny post-agg frame
    (the corpus_source_mix idiom -- the unpartitioned window never
    sees the corpus)."""
    cents = _collect_centroids(embeddings)
    cells = (
        _assign_cells(embeddings, cents)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )
    w = Window.partitionBy()
    return cells.select(
        F.col("cell").cast("bigint").alias("cell"),
        F.col("n_vectors").cast("bigint").alias("n_vectors"),
        rnd(F.col("n_vectors") / F.sum("n_vectors").over(w), 6).alias("share"),
        rnd(F.col("n_vectors") / F.avg("n_vectors").over(w), 6).alias(
            "ratio_to_mean"
        ),
    )


def embedding_whitened_norms(embeddings: DataFrame) -> DataFrame:
    """MATERIALIZE the whitening transform embedding_pca_stats (#57)
    reports the inputs for: per vector, the L2 norm before and after
    per-dimension standardization w_i = (x_i - mean_i)/sqrt(var_i +
    WHITEN_EPS) -- the report -> transform closure (the
    corpus_span_excised pattern) for the embedding-prep side.
    Whitening uses the PUBLISHED stats table (means/variances rounded
    to 6, exactly what #57 emits), so both engines transform against
    bit-identical constants instead of racing double summation order;
    norms fold in ascending dimension order (deterministic IEEE).

    Scale shape: the stats row is ONE corpus pass of 2*EMBEDDING_DIM
    column aggregates riding a broadcast 1-row frame; the transform
    is a map-side array fold per vector -- zero row expansion, one
    scan each for stats and transform.
    """
    from ..constants import EMBEDDING_DIM, WHITEN_EPS

    from ..functions.columns import el_sql, rnd_sql

    # SQL-string builds (plan-identical, ~10x fewer py4j calls; r13)
    def _avg(i):
        return f"avg({el_sql('embedding', i + 1)})"

    stats = F.broadcast(
        embeddings.agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.array(
                *[F.expr(rnd_sql(_avg(i), 6)) for i in range(EMBEDDING_DIM)]
            ).alias("mu"),
            F.array(
                *[
                    F.expr(
                        rnd_sql(
                            f"(avg({el_sql('embedding', i + 1)} * "
                            f"{el_sql('embedding', i + 1)}) - "
                            f"({_avg(i)} * {_avg(i)}))",
                            6,
                        )
                    )
                    for i in range(EMBEDDING_DIM)
                ]
            ).alias("va"),
        )
    )
    x = F.transform(F.col("embedding"), lambda v: v.cast("double"))
    sq_sum = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0.0), lambda a, v: a + v * v
    )
    w = F.zip_with(
        x,
        F.sequence(F.lit(0), F.lit(EMBEDDING_DIM - 1)),
        lambda v, i: (v - F.element_at(F.col("mu"), i + 1))
        / F.sqrt(F.element_at(F.col("va"), i + 1) + F.lit(WHITEN_EPS)),
    )
    return embeddings.crossJoin(stats).select(
        "vec_id",
        rnd(F.sqrt(sq_sum(x)), 6).alias("norm_before"),
        rnd(F.sqrt(sq_sum(w)), 6).alias("norm_after"),
    )


def ann_ivf_probe_sweep(embeddings: DataFrame) -> DataFrame:
    """IVF tuning curve: recall@k vs nprobe (1..IVF_PROBE_SWEEP_MAX)
    against the exact brute-force truth -- the dedup_threshold_sweep
    of the vector-index world: the report read to pick the
    recall/latency point BEFORE an index serves traffic, instead of
    discovering a bad nprobe in production.  (No reference analog --
    training-data mandate.)

    Scale shape (r7 rewrite, measured 6.2 s -> ~2.5 s at sf0.1): cell
    assignment runs ONCE at the maximum probe depth (probe lists are
    proximity-ordered, so each sweep arm is a prefix slice); ground
    truth is the brute-force op computed once.  The per-arm corpus
    joins + top-k windows of the original plan are PROVABLY
    redundant: under the total candidate order (cosine desc, id asc)
    every truth neighbor outranks every non-truth candidate (anything
    that beats a global-top-k member is itself a global-top-k
    member), so the depth-p hit count is exactly |candidate pool at
    depth p  INTERSECT  truth| -- determined per truth neighbor by
    the FIRST probe depth at which its cell enters the query's probe
    list (array_position on the one assignment).  That is ONE
    broadcast join of the k x |queries| truth rows against the
    assignment, then tiny driver-free arithmetic over
    |truth| x MAX_P rows; results are bit-identical to the arm-join
    formulation (same oracle, re-gated).  Output is
    IVF_PROBE_SWEEP_MAX rows.  Numeric determinism: per-query recalls
    are exact rationals; the average folds in ascending sorted order
    (the pagerank idiom).
    """
    from ..constants import IVF_PROBE_SWEEP_MAX
    from ..functions.pandas_udfs import make_cell_assigner

    cents = _collect_centroids(embeddings)
    if not cents:
        return embeddings.sparkSession.createDataFrame(
            [], "nprobe int, n_queries bigint, avg_recall double, min_recall double"
        )
    assign = make_cell_assigner(cents, IVF_PROBE_SWEEP_MAX)
    assigned = (
        embeddings.repartition(
            embeddings.sparkSession.sparkContext.defaultParallelism
        )
        .select("vec_id", assign(F.col("embedding")).alias("a"))
        .select(
            "vec_id",
            F.col("a.cell").alias("cell"),
            F.col("a.probes").alias("probes"),
        )
        .persist()
    )
    bf = ann_bruteforce_topk(embeddings).select("query_id", "neighbor_id").persist()
    truth_k = bf.groupBy("query_id").agg(F.count(F.lit(1)).alias("k"))
    # each truth neighbor enters the candidate pool at the first
    # probe depth whose cell matches its assignment (0 = never within
    # MAX_P); corpus side is filtered map-side by the broadcast truth
    q_probes = assigned.where(F.col("vec_id").isin(ANN_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), "probes"
    )
    first_depth = (
        assigned.select(F.col("vec_id").alias("neighbor_id"), "cell")
        .join(F.broadcast(bf), "neighbor_id")
        .join(F.broadcast(q_probes), "query_id")
        .select(
            "query_id",
            F.array_position("probes", F.col("cell")).alias("d"),
        )
        .where(F.col("d") >= 1)
    )
    # a neighbor first seen at depth d is a hit for every p >= d:
    # explode the (bounded) depth range -- |truth| x MAX_P rows max
    n_hit = (
        first_depth.select(
            "query_id",
            F.explode(
                F.sequence(F.col("d").cast("int"), F.lit(IVF_PROBE_SWEEP_MAX))
            ).alias("nprobe"),
        )
        .groupBy("query_id", "nprobe")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    grid = truth_k.select(
        "query_id",
        "k",
        F.explode(F.sequence(F.lit(1), F.lit(IVF_PROBE_SWEEP_MAX))).alias(
            "nprobe"
        ),
    )
    union = grid.join(n_hit, ["query_id", "nprobe"], "left").select(
        "nprobe",
        (F.coalesce("n_hit", F.lit(0)).cast("double") / F.col("k")).alias(
            "recall"
        ),
    )
    return union.groupBy("nprobe").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        rnd(
            F.aggregate(
                F.array_sort(F.collect_list("recall")),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            / F.count(F.lit(1)),
            6,
        ).alias("avg_recall"),
        rnd(F.min("recall"), 6).alias("min_recall"),
    )


def embedding_prototype_score(embeddings: DataFrame) -> DataFrame:
    """D4-style prototypicality scores (Tirumala et al. 2023,
    arXiv:2308.12284): every vector's cosine to its ASSIGNED coarse
    centroid, ranked as a percentile WITHIN its cell.  The top decile
    (near-centroid "prototypes" -- semantically redundant cluster
    cores D4 prunes alongside SemDeDup's near-dups) and the bottom
    decile (far-from-centroid outliers, the noise tail) get tier
    labels; a diversification pass keeps the middle.  Composes with
    semantic_dedup (same cells, different criterion: that op drops
    pairwise near-dups, this one drops cluster-density extremes).

    Scale shape: assignment is the shared map-side _assign_cells (no
    corpus shuffle); the percentile is ONE window sort partitioned by
    cell -- K=64 cells means K sort groups, each ~corpus/K (the same
    per-cell working set semantic_dedup already holds); ties broken
    by vec_id so the rank is total and deterministic in both engines.
    Output is |corpus| rows -- a report -> transform input, same as
    dsir_importance_score.
    """
    from ..constants import PROTO_TIER_HI, PROTO_TIER_LO

    cents = _collect_centroids(embeddings)
    cent_df = embeddings.sparkSession.createDataFrame(
        [(cid, emb) for cid, emb in cents], "cell bigint, c_emb array<double>"
    )
    asg = _assign_cells(embeddings, cents).select("vec_id", "embedding", "cell")
    cos = cosine_similarity(F.col("embedding"), F.col("c_emb"))
    scored = asg.join(F.broadcast(cent_df), "cell").select(
        "vec_id", "cell", cos.alias("proto_cos")
    )
    w = Window.partitionBy("cell").orderBy(
        F.col("proto_cos").asc(), F.col("vec_id").asc()
    )
    pct = F.percent_rank().over(w)
    return scored.select(
        "vec_id",
        "cell",
        rnd("proto_cos", 6).alias("proto_cos"),
        rnd(pct, 6).alias("cell_pct"),
        F.when(pct >= F.lit(PROTO_TIER_HI), F.lit("prototype"))
        .when(pct < F.lit(PROTO_TIER_LO), F.lit("outlier"))
        .otherwise(F.lit("typical"))
        .alias("tier"),
    )


def ann_hard_negatives(embeddings: DataFrame) -> DataFrame:
    """Hard-negative mining for contrastive training: for each probe
    vector (the fixed ANN_QUERY_IDS set), the top-K corpus vectors by
    cosine whose label DIFFERS from the probe's -- the
    highest-similarity wrong-label examples, i.e. exactly the
    negatives a contrastive or reranker training loop wants next to
    each anchor (the standard in-batch-negatives upgrade at corpus
    scale).  Output: (query_id, query_label, neighbor_id,
    neighbor_label, rank, cosine), rank 1 = hardest.
    (No reference analog -- training-data mandate.)

    Scale shape: identical to ann_bruteforce_topk -- the probe set
    broadcasts, the corpus streams map-side (the label inequality is
    part of the broadcast-join predicate, so same-label rows never
    leave the scan), the only shuffle is the per-probe top-K window
    over |probes| partitions.  The 100 TB route swaps the exact scan
    for the IVF-probed candidate list (ann_ivf_topk's shape) --
    hard negatives only need to be hard, not provably hardest.
    """
    q = embeddings.where(F.col("vec_id").isin(ANN_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("query_label"),
    )
    joined = embeddings.join(
        F.broadcast(q), F.col("label") != F.col("query_label")
    )
    cos = cosine_similarity(F.col("q_emb"), F.col("embedding"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        joined.select(
            "query_id",
            "query_label",
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("neighbor_label"),
            cos.alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= ANN_K)
        .select(
            "query_id",
            "query_label",
            "neighbor_id",
            "neighbor_label",
            "rank",
            rnd("cosine", 6).alias("cosine"),
        )
    )


def ann_ivf_hard_negatives(embeddings: DataFrame) -> DataFrame:
    """Hard-negative mining through the IVF index -- the production
    route for ann_hard_negatives' exact scan: each probe explores its
    IVF_NPROBE nearest cells only and takes the top-K wrong-label
    vectors found there.  Hard negatives only need to be HARD, not
    provably hardest, so trading the exact scan's full corpus pass
    for the probed fraction is precisely the ANN serving argument
    (and the recall trade is observable: compare against
    ann_hard_negatives, the exact twin, the ann_recall_report
    pattern).  Output schema matches the exact twin.

    Scale shape: map-side cell assignment (shared Arrow assigner,
    label carried through), queries x probes broadcast; the corpus
    shuffle is the final per-query top-K over the probed subset
    only.
    """
    from ..functions.pandas_udfs import make_cell_assigner

    cents = _collect_centroids(embeddings)
    if not cents:  # empty corpus -> empty result, stable schema
        return embeddings.sparkSession.createDataFrame(
            [],
            "query_id bigint, query_label int, neighbor_id bigint, "
            "neighbor_label int, rank int, cosine double",
        )
    assign = make_cell_assigner(cents, IVF_NPROBE)
    asg = (
        embeddings.repartition(
            embeddings.sparkSession.sparkContext.defaultParallelism
        )
        .select("vec_id", "embedding", "label", assign(F.col("embedding")).alias("a"))
        .select(
            "vec_id",
            "embedding",
            "label",
            F.col("a.cell").alias("cell"),
            F.col("a.probes").alias("probes"),
        )
    )
    q = (
        asg.where(F.col("vec_id").isin(ANN_QUERY_IDS))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("label").alias("query_label"),
            F.explode("probes").alias("probe_cell"),
        )
    )
    joined = asg.join(
        F.broadcast(q),
        (F.col("cell") == F.col("probe_cell"))
        & (F.col("label") != F.col("query_label")),
    )
    cos = cosine_similarity(F.col("q_emb"), F.col("embedding"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        joined.select(
            "query_id",
            "query_label",
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("neighbor_label"),
            cos.alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= ANN_K)
        .select(
            "query_id",
            "query_label",
            "neighbor_id",
            "neighbor_label",
            "rank",
            rnd("cosine", 6).alias("cosine"),
        )
    )


def embedding_centroid_drift(embeddings: DataFrame) -> DataFrame:
    """IVF index STALENESS monitor: per cell, the cosine between the
    TRAINED centroid (the frozen ivf_model artifact) and the current
    mean of the vectors assigned to it, plus member count and corpus
    share -- the dashboard row that tells an index owner when the
    corpus has drifted away from the quantizer it is being served by
    (low mean-centroid cosine and/or share swings = re-train; the
    temporal complement to ivf_cell_balance's occupancy skew).

    Scale shape: map-side assignment (shared Arrow assigner), then
    ONE per-cell aggregation of DIM avg columns over element_at (the
    embedding_kmeans_iter shape; r12 -- the former posexplode fanned
    out |corpus| x DIM rows through a Generate and paid a second
    (cell, dim) -> cell shuffle plus a collect_list/array_sort
    reassembly) -- map-side combine reduces the corpus to K x (DIM+1)
    partial buffers before the exchange -- and the centroid
    comparison runs on the K-row result against array literals.
    Mean components are half-up-rounded at 9 decimals BEFORE the
    cosine (published-artifact discipline, the quality-classifier
    pattern): the corpus-order float reassociation noise (~1e-15
    relative) vanishes at that grain, so both engines compute the
    cosine from identical doubles.
    """
    from ..constants import EMBEDDING_DIM

    cents = _collect_centroids(embeddings)
    if not cents:
        return embeddings.sparkSession.createDataFrame(
            [],
            "cell bigint, n_members bigint, corpus_share double, "
            "mean_centroid_cos double",
        )
    asg = _assign_cells(embeddings, cents).select("cell", "embedding")
    from ..functions.columns import dim_avg_cols

    per_cell = asg.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_members"),
        # SQL-string builds (plan-identical, ~10x fewer py4j calls; r13)
        *dim_avg_cols("embedding", EMBEDDING_DIM, round_to=9),
    )
    mean_emb = F.expr(
        "array(" + ", ".join(f"m{i}" for i in range(EMBEDDING_DIM)) + ")"
    )
    cent_df = embeddings.sparkSession.createDataFrame(
        [(cid, list(emb)) for cid, emb in cents], "cell bigint, c_emb array<double>"
    )
    total = per_cell.select(F.sum("n_members").alias("n_total"))
    cos = cosine_similarity(mean_emb, F.col("c_emb"))
    return (
        per_cell.join(F.broadcast(cent_df), "cell")
        .crossJoin(F.broadcast(total))
        .select(
            F.col("cell").cast("bigint").alias("cell"),
            F.col("n_members").cast("bigint").alias("n_members"),
            rnd(F.col("n_members") / F.col("n_total"), 6).alias("corpus_share"),
            rnd(cos, 6).alias("mean_centroid_cos"),
        )
    )


def _lloyd_step(embeddings: DataFrame, cents) -> tuple[list, dict]:
    """One published-artifact Lloyd pass: assign every vector to its
    nearest centroid (shared Arrow assigner), recompute per-cell
    per-dim means HALF-UP-rounded at IVF_RETRAIN_ROUND decimals (the
    publication step -- both engines compute the next iteration from
    identical doubles), and return (new centroid list, member counts).
    A cell with no members keeps its previous centroid (standard
    Lloyd) and reports n=0.

    Scale shape: one corpus pass -- map-side assignment, then ONE
    per-cell aggregation of DIM avg columns over element_at (the
    embedding_kmeans_iter shape, r12: the former posexplode fanned
    out |corpus| x DIM rows through a Generate and paid a second
    (cell, dim) -> cell shuffle plus a collect_list/array_sort
    reassembly; the column aggregate averages the identical value
    stream per dimension with map-side partial agg and no row
    expansion); the driver collects only K x DIM rounded doubles per
    iteration (bounded model state, the quality_classifier_train
    pattern).
    """
    from ..constants import IVF_RETRAIN_ROUND

    dim = len(cents[0][1])
    asg = _assign_cells(embeddings, cents).select("cell", "embedding")
    from ..functions.columns import dim_avg_cols

    per_cell = asg.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n"),
        # SQL-string builds (plan-identical, ~10x fewer py4j calls; r13)
        *dim_avg_cols("embedding", dim, round_to=IVF_RETRAIN_ROUND),
    )
    got = {}
    for r in per_cell.collect():
        mean = [r[f"m{i}"] for i in range(dim)]
        if any(m is None for m in mean):
            # degenerate (empty member arrays): the old posexplode form
            # produced no (cell, dim) rows -> cell kept its previous
            # centroid with n=0; preserve that contract
            continue
        got[int(r["cell"])] = ([float(m) for m in mean], int(r["n"]))
    new_cents, members = [], {}
    for cid, old in cents:
        mean, n = got.get(cid, (list(old), 0))
        new_cents.append((cid, mean))
        members[cid] = n
    return new_cents, members


def ivf_retrain_report(embeddings: DataFrame) -> DataFrame:
    """IVF index-lifecycle closer: ACT on the embedding_centroid_drift
    staleness signal by re-training the coarse quantizer from the
    current corpus (IVF_RETRAIN_ITERS Lloyd iterations seeded from the
    frozen ivf_model artifact, per-dim means published at the
    IVF_RETRAIN_ROUND grain each pass) and gating the candidate with
    RECALL NON-REGRESSION against the exact truth set before anyone
    promotes it -- the ann_recall_report acceptance pattern applied to
    old-vs-new quantizers instead of LSH-vs-IVF.

    Long-format report (component, cell, n, value):
      - 'iter_move'      cell=iteration 1..T, n = non-empty cells that
        pass, value = MIN over cells of cos(prev centroid, new
        centroid) -- the convergence trajectory a drift-threshold
        loop would stop on (fixed budget here: oracle replayability,
        see constants.IVF_RETRAIN_ITERS).
      - 'centroid_move'  cell=cell id, n = members in the final Lloyd
        pass (the assignment that produced the final centroids),
        value = cos(trained centroid, retrained centroid).
      - 'recall_trained' / 'recall_retrained'  cell=query id,
        n = exact-top-k hits, value = recall@k for the frozen vs the
        retrained quantizer on the SAME brute-force truth set.
      - 'gate'           cell=-1, value = round(mean retrained recall
        - mean trained recall, 6), n = 1 iff value >= 0 (promote) --
        rounding BEFORE the sign test so cross-engine reassociation
        noise on an exactly-tied recall cannot flip the gate.

    Scale shape: T+2 bounded corpus passes (T Lloyd + brute-force
    truth + ONE fused dual-quantizer probe pass -- r13: the two
    recall arms shared a single corpus scan via the Arrow dual
    assigner instead of one full pass each), each map-side-assign +
    one shuffle; the truth pass is independent of the Lloyd loop, so
    it materializes on a driver thread WHILE the Lloyd collect
    barriers run (guide's overlap-independent-jobs pattern) -- the
    serial critical path is max(T Lloyd, truth) + 1 fused pass.  All
    derived math (cosines, recalls, the gate) runs on K- or
    |queries|-row frames built from published literals, so both
    engines fold identical doubles in identical order.  Truth set
    and the fused recall frame persist -- each feeds two consumers.
    """
    from pyspark import InheritableThread

    from ..constants import IVF_RETRAIN_ITERS

    spark = embeddings.sparkSession
    schema = "component string, cell bigint, n bigint, value double"
    cents0 = _collect_centroids(embeddings)
    if not cents0:
        return spark.createDataFrame([], schema)

    # truth feeds both recall arms AND the gate means; persisted (the
    # ann_recall_report idiom) and materialized CONCURRENTLY with the
    # Lloyd iterations below -- it depends only on the input corpus,
    # not on any retrained centroid, so its corpus pass overlaps the
    # Lloyd collect barriers instead of serializing after them.
    bf = ann_bruteforce_topk(embeddings).select("query_id", "neighbor_id").persist()
    bf_err: list = []

    def _materialize_truth() -> None:
        try:
            bf.count()  # populates the persisted blocks
        except Exception as e:  # surfaced after join() below
            bf_err.append(e)

    bf_thread = InheritableThread(target=_materialize_truth)
    bf_thread.start()

    cur = cents0
    trail = []  # (iteration, prev centroids, new centroids, members)
    for it in range(1, IVF_RETRAIN_ITERS + 1):
        new_cents, members = _lloyd_step(embeddings, cur)
        trail.append((it, cur, new_cents, members))
        cur = new_cents

    bf_thread.join()
    if bf_err:
        raise bf_err[0]

    step_rows = [
        (it, cid, prev_emb, new_emb, members[cid])
        for it, prev, new, members in trail
        for (cid, prev_emb), (_, new_emb) in zip(prev, new)
    ]
    steps = spark.createDataFrame(
        step_rows,
        "it int, cell bigint, prev_emb array<double>, "
        "new_emb array<double>, n_members bigint",
    )
    step_cos = cosine_similarity(F.col("prev_emb"), F.col("new_emb"))
    iter_move = steps.groupBy("it").agg(
        F.sum((F.col("n_members") > 0).cast("bigint")).alias("n"),
        rnd(F.min(step_cos), 6).alias("value"),
    ).select(
        F.lit("iter_move").alias("component"),
        F.col("it").cast("bigint").alias("cell"),
        "n",
        "value",
    )

    fin = dict(cur)
    last_members = trail[-1][3]
    moved = spark.createDataFrame(
        [(cid, list(emb0), fin[cid], last_members[cid]) for cid, emb0 in cents0],
        "cell bigint, c0 array<double>, ct array<double>, n bigint",
    )
    centroid_move = moved.select(
        F.lit("centroid_move").alias("component"),
        "cell",
        "n",
        rnd(cosine_similarity(F.col("c0"), F.col("ct")), 6).alias("value"),
    )

    # fused probe arms (r13): ONE corpus scan computes BOTH the
    # trained (cents0) and retrained (cur) assignments via the Arrow
    # dual assigner; candidates carry an arm tag map-side (a bounded
    # 2-way explode of (arm, cell) structs -- no shuffle), one
    # broadcast equi-join on (arm, cell) replaces the two per-arm
    # joins, and one per-(arm, query) top-k window replaces the two
    # per-query windows.  Per (arm, query) partition the candidate
    # set, cosine values (row-wise identical Arrow fold) and
    # (cosine desc, id asc) tie-break are exactly the per-arm
    # _ivf_topk_with computation, so ranks -- and therefore hits and
    # recalls -- are unchanged.
    from ..functions.partitioning import spread_to_parallelism
    from ..functions.pandas_udfs import cosine_fold_pandas, make_dual_cell_assigner

    truth_k = bf.groupBy("query_id").agg(F.count(F.lit(1)).alias("k"))
    dual = make_dual_cell_assigner(cents0, cur, IVF_NPROBE)
    asg2 = (
        spread_to_parallelism(embeddings)
        .select("vec_id", "embedding", dual(F.col("embedding")).alias("a"))
        .select(
            "vec_id",
            "embedding",
            F.col("a.cell_a").alias("cell_t"),
            F.col("a.probes_a").alias("probes_t"),
            F.col("a.cell_b").alias("cell_r"),
            F.col("a.probes_b").alias("probes_r"),
        )
    )
    qsrc = asg2.where(F.col("vec_id").isin(ANN_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        "probes_t",
        "probes_r",
    )
    q_all = qsrc.select(
        "query_id",
        "q_emb",
        F.lit("t").alias("arm_q"),
        F.explode("probes_t").alias("probe_cell"),
    ).unionByName(
        qsrc.select(
            "query_id",
            "q_emb",
            F.lit("r").alias("arm_q"),
            F.explode("probes_r").alias("probe_cell"),
        )
    )
    cand = asg2.select(
        "vec_id",
        "embedding",
        F.explode(
            F.array(
                F.struct(F.lit("t").alias("arm"), F.col("cell_t").alias("cell")),
                F.struct(F.lit("r").alias("arm"), F.col("cell_r").alias("cell")),
            )
        ).alias("ac"),
    ).select(
        "vec_id",
        "embedding",
        F.col("ac.arm").alias("arm"),
        F.col("ac.cell").alias("cell"),
    )
    joined = cand.join(
        F.broadcast(q_all),
        (F.col("arm") == F.col("arm_q"))
        & (F.col("cell") == F.col("probe_cell"))
        & (F.col("vec_id") != F.col("query_id")),
    )
    cos = cosine_fold_pandas(F.col("q_emb"), F.col("embedding"))
    w = Window.partitionBy("arm", "query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    topk = (
        joined.select(
            "arm",
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cos.alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= ANN_K)
    )
    hits = (
        topk.select("arm", "query_id", "neighbor_id")
        .join(bf, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("arm", "query_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    # every query appears in both arms (0-hit queries included), as in
    # the per-arm truth_k left joins; persisted ONCE so the two output
    # arms and the two gate means all read the same materialization.
    grid = truth_k.select(
        "query_id", "k", F.explode(F.array(F.lit("t"), F.lit("r"))).alias("arm")
    )
    recalls = (
        grid.join(hits, ["arm", "query_id"], "left")
        .select(
            "arm",
            "query_id",
            F.coalesce("n_hit", F.lit(0)).cast("bigint").alias("n"),
            (F.coalesce("n_hit", F.lit(0)) / F.col("k")).alias("recall"),
        )
        .persist()
    )
    arm_out = [
        recalls.where(F.col("arm") == tag).select(
            F.lit(name).alias("component"),
            F.col("query_id").cast("bigint").alias("cell"),
            "n",
            rnd(F.col("recall"), 6).alias("value"),
        )
        for name, tag in (("recall_trained", "t"), ("recall_retrained", "r"))
    ]
    delta = rnd(F.col("ar") - F.col("at"), 6)
    gate = (
        recalls.where(F.col("arm") == "r")
        .agg(F.avg("recall").alias("ar"))
        .crossJoin(
            recalls.where(F.col("arm") == "t").agg(F.avg("recall").alias("at"))
        )
        .select(
            F.lit("gate").alias("component"),
            F.lit(-1).cast("bigint").alias("cell"),
            F.when(delta >= 0, 1).otherwise(0).cast("bigint").alias("n"),
            delta.alias("value"),
        )
    )
    out = iter_move.unionByName(centroid_move)
    for arm in arm_out:
        out = out.unionByName(arm)
    return out.unionByName(gate)
