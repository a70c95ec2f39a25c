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


def socket_source(spark: SparkSession, host: str, port: int):
    """Configured (unstarted) TCP socket stream reader -- the
    connector-free live transport this environment CAN run end-to-end
    (tests feed it from a local server thread).  Same one-string-row
    contract as the Kafka value column, so parse_vote_stream works on
    either; unlike Kafka the socket source has no offsets/replay, so
    it is a demo/dev transport, not the production path."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", str(port))
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
    descending: bool = False,
) -> Callable[[DataFrame, int], None]:
    """Idempotent upsert sink via foreachBatch -- the Spark-native
    analog of the reference's Postgres `INSERT ... votes` with a
    primary key (main.py:56-66, voting.py:98-105).

    Each micro-batch is merged with the existing snapshot, keeping
    one row per key: earliest order_col by default (first-write-wins,
    the votes-PK semantics -- re-processing a batch after failure
    cannot double-count), or largest order_col with descending=True
    (latest-aggregate-wins, the UPDATE-mode dashboard semantics where
    each micro-batch re-emits a key's grown total and idempotent
    replay re-delivers the same maximum).  Everything runs as
    DataFrame ops inside the batch function -- no driver-side rows.

    Crash safety: each merge lands in a fresh versioned directory
    ``{target}.__v{batch_id}__`` and ``target_dir`` is an atomically
    renamed SYMLINK to the current version (POSIX rename(2) replaces
    a symlink in one step).  A crash at ANY point leaves either the
    old or the new complete snapshot reachable -- never a partially
    overwritten one; leftover version dirs from interrupted batches
    are skipped (only the symlinked one is ever read) and reaped on
    the next successful swap.  On object stores swap the symlink for
    a pointer-file compare-and-set; same two-phase shape.
    """
    import shutil

    from pyspark.sql import Window
    from pyspark.sql import functions as F2

    base = target_dir.rstrip("/")

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        new = batch_df
        if os.path.exists(base):  # follows the symlink
            old = spark.read.parquet(base)
            new = old.unionByName(new)
        order = F2.col(order_col).desc() if descending else F2.col(order_col).asc()
        w = Window.partitionBy(*key_cols).orderBy(order)
        merged = (
            new.withColumn("__rn", F2.row_number().over(w))
            .where(F2.col("__rn") == 1)
            .drop("__rn")
        )
        vdir = f"{base}.__v{batch_id}__"
        merged.write.mode("overwrite").parquet(vdir)
        prev = os.readlink(base) if os.path.islink(base) else None
        if os.path.isdir(base) and not os.path.islink(base):
            # legacy plain-directory snapshot: retire it, then swap in
            # the (already complete) merged version
            os.rename(base, f"{base}.__legacy__")
            prev = f"{base}.__legacy__"
        tmp_ln = f"{base}.__ln{batch_id}__"
        if os.path.lexists(tmp_ln):
            os.remove(tmp_ln)
        os.symlink(vdir, tmp_ln)
        os.rename(tmp_ln, base)  # atomic: old or new, never partial
        if prev and os.path.exists(prev) and os.path.realpath(prev) != os.path.realpath(vdir):
            shutil.rmtree(prev, ignore_errors=True)
        # reap version dirs orphaned by interrupted earlier batches
        parent, name = os.path.split(base)
        current = os.path.realpath(base)
        for entry in os.listdir(parent or "."):
            p = os.path.join(parent, entry)
            if (
                entry.startswith(name + ".__v")
                and entry.endswith("__")
                and os.path.realpath(p) != current
            ):
                shutil.rmtree(p, ignore_errors=True)

    return write


def _quote_sql_ident(c: str) -> str:
    """Double-quote a SQL identifier (Spark's JDBC writer quotes the
    column names it creates, so unquoted references would resolve to
    the uppercase-folded forms and miss)."""
    if '"' in c:
        raise ValueError(f"unsupported identifier: {c!r}")
    return f'"{c}"'


def foreach_batch_jdbc_upsert(
    url: str,
    table: str,
    key_cols: list[str],
    order_col: str,
    descending: bool = False,
    staging_table: str | None = None,
    driver: str | None = None,
    create_table_column_types: str | None = None,
    create_ddl: str | None = None,
) -> Callable[[DataFrame, int], None]:
    """Idempotent JDBC upsert sink: staging table + one MERGE.

    The database-backed twin of ``foreach_batch_upsert`` and the
    direct analog of the reference's Postgres votes insert with a
    primary key (reference main.py:56-66 creates the PK;
    voting.py:98-105 inserts).  Executed for real against embedded
    Derby in tests/test_jdbc_derby.py -- the same builder targets
    Postgres 15+ by swapping url/driver (both ship ANSI MERGE;
    table-existence is probed with a zero-row SELECT rather than by
    matching dialect-specific SQLStates, so the create-once path is
    portable too).  MySQL has no MERGE statement -- targeting it
    needs the INSERT .. ON DUPLICATE KEY UPDATE rewrite of step 3.

    Per micro-batch:

    1. keep one row per key within the batch (earliest ``order_col``
       by default = first-write-wins, the votes-PK semantics;
       ``descending=True`` = latest-aggregate-wins);
    2. overwrite the staging table via the partition-parallel JDBC
       writer (overwrite is idempotent under task retry -- the
       at-least-once JDBC append hazard lands in staging, where
       replays are absorbed);
    3. one driver-side ANSI ``MERGE`` folds staging into the target:
       ``WHEN NOT MATCHED INSERT`` only for first-write-wins (replay
       inserts 0 rows), plus ``WHEN MATCHED AND s.order > t.order
       UPDATE`` for latest-wins (replay matches with equal order and
       updates 0 rows; a late older record in a later batch cannot
       clobber newer target data).  The MERGE
       is a set operation executed BY THE DATABASE -- no driver-side
       row loops; the driver ships one statement.

    The target table is created on first use from ``create_ddl`` when
    given (the place to declare the real PRIMARY KEY), else via
    ``CREATE TABLE .. AS SELECT .. WITH NO DATA`` from staging.
    ``create_table_column_types`` is forwarded to the staging writer
    (Derby maps StringType to CLOB by default, and CLOBs cannot be
    MERGE-join keys -- pass e.g. "voter_id VARCHAR(64)").
    """
    from ..sources.io import jdbc_writer

    stage = staging_table or f"{table}_stage"
    q = _quote_sql_ident

    def write(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window

        spark = batch_df.sparkSession
        order = F.col(order_col).desc() if descending else F.col(order_col).asc()
        w = Window.partitionBy(*key_cols).orderBy(order)
        winners = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
        opts: dict[str, str] = {}
        if driver:
            opts["driver"] = driver
        if create_table_column_types:
            opts["createTableColumnTypes"] = create_table_column_types
        jdbc_writer(winners, url, stage, mode="overwrite", **opts).save()

        cols = winners.columns
        jvm = spark._jvm
        if driver:
            jvm.java.lang.Class.forName(driver)
        conn = jvm.java.sql.DriverManager.getConnection(url)
        try:
            st = conn.createStatement()
            # Portable table-exists probe: a zero-row SELECT succeeds iff
            # the target exists, with no dialect SQLState matching
            # (Derby says X0Y32, Postgres 42P07, ... -- don't parse them).
            # A probe failure is only trusted as "missing" if the CREATE
            # then succeeds; if the CREATE also fails (e.g. the probe hit
            # a transient connection/permission error and the table DOES
            # exist, so CREATE reports already-exists), both exceptions
            # surface chained so the root cause is never masked (ADVICE
            # r6).
            probe_err: Exception | None = None
            try:
                st.executeQuery(f"SELECT 1 FROM {table} WHERE 1=0").close()
                exists = True
            except Exception as e:  # noqa: BLE001 - py4j wraps SQLException
                exists = False
                probe_err = e
            if not exists:
                try:
                    st.executeUpdate(
                        create_ddl
                        or f"CREATE TABLE {table} AS SELECT * FROM {stage} "
                        "WITH NO DATA"
                    )
                except Exception as create_err:  # noqa: BLE001
                    raise RuntimeError(
                        f"table-exists probe for {table} failed AND the "
                        "subsequent CREATE failed. Either the table is "
                        "missing and the CREATE DDL is at fault (see the "
                        "chained cause), or the probe failure was transient "
                        "(connection/permissions) and the table already "
                        f"exists; probe error: {probe_err}"
                    ) from create_err
            on = " AND ".join(f"t.{q(c)} = s.{q(c)}" for c in key_cols)
            collist = ", ".join(q(c) for c in cols)
            vals = ", ".join(f"s.{q(c)}" for c in cols)
            matched = ""
            if descending:
                upd = ", ".join(
                    f"{q(c)} = s.{q(c)}" for c in cols if c not in key_cols
                )
                # Guard on order_col so latest-wins holds ACROSS batches:
                # a late-arriving older record in a later micro-batch must
                # not overwrite newer target data (within-batch dedup alone
                # would make it last-batch-wins).
                matched = (
                    f"WHEN MATCHED AND s.{q(order_col)} > t.{q(order_col)} "
                    f"THEN UPDATE SET {upd} "
                )
            st.executeUpdate(
                f"MERGE INTO {table} t USING {stage} s ON ({on}) "
                f"{matched}"
                f"WHEN NOT MATCHED THEN INSERT ({collist}) VALUES ({vals})"
            )
        finally:
            conn.close()

    return write
