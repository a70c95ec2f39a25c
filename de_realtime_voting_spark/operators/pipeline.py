"""Corpus-construction operators: the steps between "curated
documents" and "training batches" in an LLM data pipeline.

Three ops a training-data engine must provide beyond dedup/quality
(reference has no analog -- these extend the engine per the
training-data mandate):

- deterministic stratified train/val/test split (hash of doc_id, not
  rand(): stable across reruns, engines, and cluster sizes);
- sequence packing stats (concat-and-chop docs into fixed token
  windows, per (lang, shard) so no ordered cumsum spans the corpus);
- benchmark decontamination (flag corpus docs sharing word n-grams
  with a held-out eval source -- the contamination audit run before
  every training job).

All pure Catalyst expressions; the only Python is plan construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..constants import (
    DECONTAM_NGRAM_K,
    EVAL_SOURCE,
    PACK_SHARDS,
    PACK_WINDOW_TOKENS,
    SPLIT_TEST_PCT,
    SPLIT_VAL_PCT,
)
from ..functions import tokens, word_shingles
from ..functions.columns import md5_pct_bucket, round_half_up as rnd


def corpus_train_split(documents: DataFrame) -> DataFrame:
    """Per (split, lang) sizing report for a deterministic hash split.

    Scale shape: the split column is a map-side expression over
    doc_id -- no shuffle to assign, one small agg shuffle to report.
    At 100 TB the same expression tags every row in place; nothing
    about the split depends on partition count or row order.
    """
    pct = md5_pct_bucket(F.col("doc_id"))
    split = (
        F.when(pct < SPLIT_TEST_PCT, F.lit("test"))
        .when(pct < SPLIT_TEST_PCT + SPLIT_VAL_PCT, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    per_doc = documents.select(
        split.alias("split"),
        "lang",
        F.size(tokens(F.col("text"))).alias("n_tokens"),
        F.length("text").alias("n_chars"),
    )
    return per_doc.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        rnd(F.avg("n_chars"), 4).alias("avg_chars"),
    )


def seq_pack_stats(documents: DataFrame) -> DataFrame:
    """Sequence-packing layout stats: docs are concatenated in doc_id
    order within (lang, shard) and chopped into PACK_WINDOW_TOKENS
    windows; report windows needed, boundary-crossing docs, and fill
    ratio per (lang, shard).

    Sharding is the scale design: packing needs an ordered running
    sum, which cannot parallelize within a partition key -- so the
    corpus is sharded deterministically (doc_id % PACK_SHARDS) and
    packed per shard, exactly how real pipelines pack per input file.
    The window sort is bounded by shard size, never corpus size.
    """
    win = PACK_WINDOW_TOKENS
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    per_doc = documents.select(
        "lang",
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
        "doc_id",
        F.size(tokens(F.col("text"))).alias("n_tokens"),
    )
    cum = per_doc.withColumn("cum", F.sum("n_tokens").over(w))
    start_win = F.floor((F.col("cum") - F.col("n_tokens")) / win)
    end_win = F.floor((F.col("cum") - 1) / win)
    flagged = cum.select(
        "lang",
        "shard",
        "n_tokens",
        "cum",
        F.when((F.col("n_tokens") > 0) & (end_win > start_win), 1)
        .otherwise(0)
        .alias("crosses"),
    )
    n_windows = F.floor((F.max("cum") - 1) / win) + 1
    return flagged.groupBy("lang", "shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        n_windows.cast("bigint").alias("n_windows"),
        F.sum("crosses").cast("bigint").alias("boundary_docs"),
        rnd(F.max("cum") / (n_windows * float(win)), 6).alias("avg_fill"),
    )


def benchmark_decontam(documents: DataFrame) -> DataFrame:
    """Benchmark decontamination audit: per source, how many corpus
    docs share at least one DECONTAM_NGRAM_K-word n-gram with the
    held-out eval source (EVAL_SOURCE), plus the worst overlap.

    Scale shape: the eval gram set is small by construction (eval
    benchmarks are tiny next to the corpus) and broadcasts; corpus
    grams explode map-side into the broadcast-hash probe, then one
    shuffle aggregates hits per doc.  Never an n x m doc comparison.
    """
    grams = word_shingles(tokens(F.col("text")), DECONTAM_NGRAM_K)
    docs_g = documents.select("doc_id", "source", grams.alias("grams")).where(
        F.size("grams") > 0
    )
    eval_grams = (
        docs_g.where(F.col("source") == EVAL_SOURCE)
        .select(F.explode("grams").alias("gram"))
        .distinct()
    )
    corpus = docs_g.where(F.col("source") != EVAL_SOURCE)
    hits = (
        corpus.select("doc_id", F.explode("grams").alias("gram"))
        .join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    per_doc = (
        corpus.select("doc_id", "source")
        .join(hits, "doc_id", "left")
        .select("source", F.coalesce("overlap", F.lit(0)).alias("overlap"))
    )
    contaminated = F.sum((F.col("overlap") > 0).cast("int"))
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        contaminated.cast("bigint").alias("n_contaminated"),
        F.max("overlap").cast("bigint").alias("max_overlap"),
        rnd(contaminated / F.count(F.lit(1)), 6).alias("contam_rate"),
    )
