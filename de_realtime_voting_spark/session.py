"""SparkSession factory tuned for the target workload.

Used by tests and bench; the driver supplies its own session to
``__spark_entry__`` callables, so operators never create sessions.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

TUNED_CONF = {
    # AQE re-plans at runtime: coalesces shuffle partitions, converts
    # sort-merge joins to broadcast when a side turns out small, and
    # splits skewed partitions -- all essential at 100 TB.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # 128 MiB input splits: big enough to amortize task overhead,
    # small enough that a partition's hash tables fit executor memory.
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    "spark.sql.streaming.statefulOperator.checkCorrectness.enabled": "true",
}


def get_spark(app_name: str = "de-realtime-voting-spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name).master(f"local[{cpus}]")
    for k, v in TUNED_CONF.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def apply_session_tuning(spark: SparkSession) -> SparkSession:
    """Best-effort runtime tuning for an externally-created session
    (e.g. the driver's); only touches runtime-settable confs."""
    for k, v in TUNED_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on a live session -- keep the session's value
    return spark
