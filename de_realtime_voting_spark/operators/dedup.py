"""Deduplication operators for training-data pipelines.

All candidate generation is hash-bucketed (groupBy / shuffle on a
band or signature key) -- never O(n^2) over the corpus.  Exact
verification (Jaccard, cosine) runs only inside buckets/blocks, which
is what keeps these runnable at 100 TB.

Signature computation is pure Catalyst array lambdas (map-side, no
Python), mirrored exactly by the DuckDB oracle SQL in oracles.py via
shared constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..constants import (
    COSINE_THRESHOLD,
    JACCARD_THRESHOLD,
    MINHASH_BAND_ROWS,
    MINHASH_SIGS,
    SHINGLE_K,
)
from ..functions import cosine_similarity, minhash_signature, simhash16, tokens, word_shingles

N_BANDS = MINHASH_SIGS // MINHASH_BAND_ROWS


def dedup_exact(documents: DataFrame) -> DataFrame:
    """Exact duplicate clusters by content hash: one shuffle on
    md5(text), map-side partial agg."""
    return (
        documents.groupBy(F.md5("text").alias("text_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
        )
    )


def _doc_shingles(documents: DataFrame) -> DataFrame:
    toks = tokens(F.col("text"))
    return (
        documents.select("doc_id", word_shingles(toks).alias("shingles"))
        .where(F.size("shingles") > 0)
    )


def _doc_bands(documents: DataFrame) -> DataFrame:
    """(doc_id, band_idx, band_hash): LSH bands over the MinHash
    signature; docs sharing any band are near-dup candidates."""
    sig = minhash_signature(F.col("shingles"))
    bands = F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|",
                    *[
                        F.element_at(F.col("sig"), b * MINHASH_BAND_ROWS + r + 1)
                        for r in range(MINHASH_BAND_ROWS)
                    ],
                )
            )
            for b in range(N_BANDS)
        ]
    )
    return (
        _doc_shingles(documents)
        .select("doc_id", sig.alias("sig"))
        .select("doc_id", F.posexplode(bands).alias("band_idx", "band_hash"))
    )


def dedup_minhash_bands(documents: DataFrame) -> DataFrame:
    """LSH candidate buckets: bands with >1 member."""
    return (
        _doc_bands(documents)
        .groupBy("band_idx", "band_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
        .where(F.col("n_docs") > 1)
    )


def dedup_minhash_pairs(documents: DataFrame) -> DataFrame:
    """Full MinHash-LSH dedup: banded candidate pairs, then exact
    shingle-Jaccard verification within candidates only.

    Jaccard is |A∩B| / |A∪B| of distinct shingle sets -- an integer
    ratio, so Spark and the oracle agree bit-for-bit.
    """
    bands = _doc_bands(documents)
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sh = _doc_shingles(documents)
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    jaccard = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jaccard.alias("jaccard"))
        .where(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


def dedup_simhash(documents: DataFrame) -> DataFrame:
    """SimHash collision buckets (16-bit signature over tokens)."""
    toks = tokens(F.col("text"))
    per_doc = (
        documents.select("doc_id", toks.alias("toks"))
        .where(F.size("toks") > 0)
        .select("doc_id", simhash16(F.col("toks")).alias("simhash"))
    )
    return (
        per_doc.groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
        .where(F.col("n_docs") > 1)
    )


def dedup_embedding_cosine(embeddings: DataFrame) -> DataFrame:
    """Embedding near-dup pairs, blocked by label (the blocking key a
    real pipeline gets from coarse clustering/LSH): pairwise cosine
    only *within* blocks."""
    a = embeddings.select(
        F.col("vec_id").alias("vec_a"), F.col("label"), F.col("embedding").alias("emb_a")
    )
    b = embeddings.select(
        F.col("vec_id").alias("vec_b"),
        F.col("label").alias("label_b"),
        F.col("embedding").alias("emb_b"),
    )
    cos = cosine_similarity(F.col("emb_a"), F.col("emb_b"))
    return (
        a.join(b, (F.col("label") == F.col("label_b")) & (F.col("vec_a") < F.col("vec_b")))
        .select("vec_a", "vec_b", "label", F.round(cos, 6).alias("cosine"))
        .where(F.col("cosine") >= COSINE_THRESHOLD)
    )
