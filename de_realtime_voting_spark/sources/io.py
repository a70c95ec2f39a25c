"""Generic sources & sinks beyond the star-schema parquet loader.

The reference ingests JSON from Kafka and lands rows in Postgres
(reference spark-streaming.py:56-61, main.py:20-66); batch-side the
equivalents are schema-enforced JSON/CSV readers, a partitioned
parquet sink, and a partition-parallel JDBC reader.  Everything here
keeps Catalyst in charge: explicit schemas (no inference scans),
partition columns that prune at the scan, and no driver-side I/O.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_json(
    spark: SparkSession, path: str, schema: StructType | str
) -> DataFrame:
    """Schema-enforced JSON lines reader.

    An explicit schema skips the inference pass (a full extra scan at
    100 TB) and pins column types; malformed rows land in
    ``_corrupt_record`` instead of failing the job (PERMISSIVE), so
    one bad producer message cannot kill a backfill.
    """
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def read_csv(
    spark: SparkSession, path: str, schema: StructType | str, header: bool = True
) -> DataFrame:
    """Schema-enforced CSV reader (same no-inference rationale)."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned parquet sink.

    Partition columns become directories, so downstream filters on
    them prune whole files before any row is read (PartitionFilters
    in the scan plan).  Partition by low-cardinality query keys
    (candidate, date, lang) -- never by a high-cardinality id, which
    would explode into millions of tiny files.
    """
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    n_buckets: int,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: rows hash-partitioned into n_buckets
    files by the join key at WRITE time.

    Two tables bucketed on their join key with the same bucket count
    join with ZERO exchange -- the shuffle is prepaid once at ingest
    and amortized over every subsequent join, the single biggest win
    for repeated fact-fact joins at 100 TB.  sort_by additionally
    pre-sorts within buckets so sort-merge join skips its sort.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.format("parquet").saveAsTable(table)


def jdbc_reader(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    **options: str,
):
    """Partition-parallel JDBC reader builder (the reference's
    Postgres dimension tables at scale).

    Without partition_column a JDBC read is ONE task on one executor;
    the (column, bounds, numPartitions) split turns it into
    num_partitions range-predicate queries that run in parallel.
    Returns the configured DataFrameReader -- ``.load()`` executes
    it.  Executed for real against embedded Derby (the driver ships
    inside the Spark distribution) in tests/test_jdbc_derby.py,
    including the partition-parallel split; a Postgres/MySQL target
    is the same builder with a different url/driver.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partition_column requires lower_bound and upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader


def jdbc_writer(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = 10_000,
    num_partitions: int | None = None,
    isolation_level: str = "READ_COMMITTED",
    **options: str,
):
    """JDBC writer builder -- the batch analog of the reference's
    Postgres persistence (reference main.py:123-133 writes votes and
    dimension rows into created tables, main.py:20-68).

    Each write partition opens one connection and streams rows in
    ``batchsize``-sized executeBatch calls; ``num_partitions``
    coalesces first so a 10k-task DataFrame doesn't open 10k database
    connections (the classic way a big job knocks over a small
    Postgres).  Exactly-once does NOT come from this writer -- JDBC
    appends are at-least-once on task retry; route idempotent upserts
    through a keyed foreachBatch (streaming/sinks.foreach_batch_upsert
    for parquet snapshots, foreach_batch_jdbc_upsert for the
    staging-table + MERGE database shape).

    Returns the configured DataFrameWriter -- ``.save()`` executes.
    Executed for real against embedded Derby in
    tests/test_jdbc_derby.py (write -> read round-trip, value-exact).
    """
    if mode not in {"append", "overwrite", "ignore", "error", "errorifexists"}:
        raise ValueError(f"jdbc_writer: invalid mode {mode!r}")
    if num_partitions is not None:
        df = df.coalesce(num_partitions)
    writer = (
        df.write.format("jdbc")
        .mode(mode)
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .option("isolationLevel", isolation_level)
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    return writer


def read_orc(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    """ORC reader (the other columnar lake format Spark ships a
    vectorized native reader for).  Same scan-level behavior as the
    parquet path: predicate pushdown, column pruning, partition
    pruning; pass a schema to skip footer-merging across a very wide
    file listing."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """ORC sink, optionally hive-partitioned (same pruning rationale
    as write_partitioned)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_binary_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Directory-of-blobs reader (Spark's `binaryFile` source): one
    row per file with (path, modificationTime, length, content) --
    the ingestion face of the multimodal pipeline (operators/
    multimodal.py decodes the `content` column).

    Scale notes: files are the parallelism unit (one task per file
    up to maxPartitionBytes), so millions of small blobs want a
    compaction pass into parquet binary columns (multimodal_chunk
    pattern) rather than living as loose files; `glob` prunes the
    listing (e.g. '*.jpg') BEFORE any read, and `max_bytes` guards
    executors against a rogue multi-GiB blob entering a row.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.where(F.col("length") <= max_bytes)
    return df
