"""Streaming sources & sinks.

Kafka builders mirror the reference wiring (spark-streaming.py:56-61
source, :83-103 sinks).  They only *configure* readers/writers -- the
Kafka connector jar isn't in this offline environment, so nothing
here calls load()/start(); tests exercise the framing and the
foreachBatch sink, which is connector-free.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_source(
    spark: SparkSession,
    servers: str,
    topic: str,
    starting_offsets: str = "earliest",
):
    """Configured (unstarted) Kafka stream reader (reference
    spark-streaming.py:56-61)."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )


def to_kafka_frame(df: DataFrame, key_col: str | None = None) -> DataFrame:
    """Aggregate rows -> Kafka-writable frame: value = to_json(struct(*))
    (reference spark-streaming.py:83-84), optional partitioning key.
    Keyed output preserves per-key ordering across Kafka partitions."""
    cols = [F.to_json(F.struct(*df.columns)).alias("value")]
    if key_col is not None:
        cols.insert(0, F.col(key_col).cast("string").alias("key"))
    return df.select(*cols)


def kafka_sink(
    df: DataFrame,
    servers: str,
    topic: str,
    checkpoint: str,
    output_mode: str = "update",
):
    """Configured (unstarted) Kafka stream writer with checkpointing
    (reference spark-streaming.py:85-92)."""
    return (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
    )


def foreach_batch_upsert(
    target_dir: str,
    key_cols: list[str],
    order_col: str,
) -> Callable[[DataFrame, int], None]:
    """Idempotent upsert sink via foreachBatch -- the Spark-native
    analog of the reference's Postgres `INSERT ... votes` with a
    primary key (main.py:56-66, voting.py:98-105).

    Each micro-batch is merged with the existing snapshot, keeping
    the first row per key (earliest order_col): re-processing a batch
    after failure cannot double-count votes.  Everything runs as
    DataFrame ops inside the batch function -- no driver-side rows.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F2

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        new = batch_df
        if os.path.exists(target_dir):
            old = spark.read.parquet(target_dir)
            new = old.unionByName(new)
        w = Window.partitionBy(*key_cols).orderBy(F2.col(order_col).asc())
        merged = (
            new.withColumn("__rn", F2.row_number().over(w))
            .where(F2.col("__rn") == 1)
            .drop("__rn")
        )
        tmp = target_dir.rstrip("/") + ".__tmp__"
        merged.write.mode("overwrite").parquet(tmp)
        final = spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(target_dir)

    return write
