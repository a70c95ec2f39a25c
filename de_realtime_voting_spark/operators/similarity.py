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

from ..constants import ANN_K, ANN_QUERY_IDS
from ..functions.columns import round_half_up as rnd
from ..functions import cosine_similarity, lsh_bucket


def _queries(embeddings: DataFrame) -> DataFrame:
    return embeddings.where(F.col("vec_id").isin(ANN_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )


def _topk(joined: DataFrame) -> DataFrame:
    cos = cosine_similarity(F.col("q_emb"), F.col("embedding"))
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


def ann_lsh_topk(embeddings: DataFrame) -> DataFrame:
    """LSH-bucketed ANN: search only the query's hyperplane bucket.
    Recall is approximate by construction; the oracle mirrors the
    same algorithm (same deterministic planes)."""
    bucketed = embeddings.withColumn("bucket", lsh_bucket(F.col("embedding")))
    q = (
        bucketed.where(F.col("vec_id").isin(ANN_QUERY_IDS))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("bucket").alias("q_bucket"),
        )
    )
    joined = bucketed.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != F.col("query_id")),
    )
    return _topk(joined)
