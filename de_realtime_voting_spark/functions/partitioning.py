"""Parallelism-spread helper shared by the CPU-heavy map-side stages.

Small-file corpora (the test SFs: one parquet split) arrive as fewer
scan partitions than the session has cores, so per-row signature /
assignment work serializes unless it is spread first.  At production
scale the OPPOSITE holds: the scan already yields thousands of splits,
and an unconditional round-robin repartition is a FULL SHUFFLE of the
corpus (plus the sort-before-repartition cost, SPARK-23207) inserted
ahead of work that needed no redistribution at all -- the r12 audit
found several operators whose docstrings called this "a cheap no-op-ish
rebalance at 100 TB"; it is not, and this guard makes the claim true.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_to_parallelism(df: DataFrame) -> DataFrame:
    """Round-robin repartition to ``defaultParallelism`` ONLY when the
    frame currently has fewer partitions -- the scan of a large corpus
    already provides the parallelism, and skipping the repartition
    removes a corpus-wide Exchange (guide: shuffles are removed, not
    tuned).  Streaming frames keep the unconditional repartition (no
    partition count exists before execution).  Planning-only: the
    partition probe builds the RDD plan but runs no job.
    """
    p = df.sparkSession.sparkContext.defaultParallelism
    if df.isStreaming:
        return df.repartition(p)
    try:
        if df.rdd.getNumPartitions() >= p:
            return df
    except Exception:
        # a frame whose RDD plan cannot be built cheaply falls back to
        # the historical unconditional spread
        pass
    return df.repartition(p)
