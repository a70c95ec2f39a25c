"""Batch sources: the parquet star schema.

The scan is the single biggest lever at 100 TB: operators must select
only the columns they need (column pruning reaches the parquet
footer) and filter as early as possible (predicate pushdown).  Loads
here are plain ``spark.read.parquet`` so Catalyst owns both.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Parquet timestamps written without isAdjustedToUTC read as
    # TIMESTAMP_NTZ under Spark 4's default inference, but chrono
    # builtins (unix_micros, window, ...) expect TIMESTAMP.  Turn NTZ
    # inference off AT THE SCAN so the column is LTZ from the footer
    # up -- a cast on top of the scan would block predicate pushdown
    # on timestamp filters.  Session tz is UTC (session.py:22) so the
    # instant is identical and the DuckDB oracle's naive-as-UTC
    # timestamps stay value-matched.  Scoped set/restore because the
    # driver may hand us ITS session.
    key = "spark.sql.parquet.inferTimestampNTZ.enabled"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "false")
    try:
        if name == "events":
            df = _load_events(spark, os.path.join(sf_dir, "events.parquet"))
        else:
            df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    return _normalize_ntz(df)


def _normalize_ntz(df: DataFrame) -> DataFrame:
    """Fallback: cast any TIMESTAMP_NTZ column that slipped past the
    scan-level conf to TIMESTAMP (ltz).  No-op (returns df unchanged,
    plan untouched) when the conf did its job."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampNTZType

    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    if not ntz:
        return df
    return df.withColumns({c: F.col(c).cast("timestamp_ltz") for c in ntz})


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS), which Spark's parquet
    reader rejects outright.  Read nanos as long (legacy conf, set
    before the scan) and floor-divide to microseconds JVM-side --
    integer `div`, not `/`, because the ns epoch (~1.7e18) exceeds
    double's 2^53 exact-integer range.  The DuckDB oracle mirrors
    this with CAST(ts AS TIMESTAMP) (ns -> us truncation)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    # Scope the legacy conf to this scan: the FileScan captures the
    # conf value when the plan is BUILT, so setting it around the
    # read is sufficient -- and restoring it afterwards keeps one
    # table load from changing how every later parquet read in the
    # session treats TIMESTAMP(NANOS) columns.
    key = "spark.sql.legacy.parquet.nanosAsLong"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "true")
    try:
        df = spark.read.parquet(path)
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql use."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
