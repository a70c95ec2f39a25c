"""JDBC path EXECUTED against a real database (embedded Derby).

The reference persists candidates/voters/votes in Postgres
(main.py:20-66) and upserts votes under a primary key
(voting.py:98-105).  Earlier rounds could only unit-test the JDBC
builders lazily -- no driver jar, no server.  Apache Derby ships
INSIDE the Spark distribution (derby*.jar on every classpath for the
Hive metastore), so the embedded engine gives these tests a real
ACID SQL database with zero new dependencies: every test here runs
actual writes, reads, and MERGEs through java.sql, the same code
path a Postgres URL would take (swap url + driver + column types).

Derby is single-JVM (embedded) -- fine under local[*] where executors
share the driver JVM; a real cluster points the same builders at a
served database.  That environmental boundary is exactly what these
tests are scoped to prove executable.
"""

from __future__ import annotations

import pytest

from de_realtime_voting_spark.sources import jdbc_reader, jdbc_writer
from de_realtime_voting_spark.streaming import foreach_batch_jdbc_upsert

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "db"
    return f"jdbc:derby:{db};create=true"


@pytest.fixture()
def votes_df(spark):
    return spark.createDataFrame(
        [
            (i, f"voter_{i:04d}", f"cand_{i % 3}", float(i % 7), i % 100)
            for i in range(500)
        ],
        "id int, voter_id string, candidate string, weight double, ts int",
    )


VARCHARS = "voter_id VARCHAR(64), candidate VARCHAR(64)"


def test_jdbc_write_read_roundtrip(spark, derby_url, votes_df):
    """jdbc_writer -> Derby -> jdbc_reader round-trips rows and
    values exactly (the reference's votes persistence, executed)."""
    jdbc_writer(
        votes_df,
        derby_url,
        "votes_rt",
        mode="overwrite",
        driver=DERBY_DRIVER,
        createTableColumnTypes=VARCHARS,
    ).save()
    back = jdbc_reader(spark, derby_url, "votes_rt", driver=DERBY_DRIVER).load()
    assert back.count() == 500
    a = sorted(votes_df.collect(), key=lambda r: r.id)
    b = sorted(back.collect(), key=lambda r: r.id)
    assert [r.asDict() for r in a] == [r.asDict() for r in b]


def test_jdbc_partitioned_read_is_parallel_and_complete(spark, derby_url, votes_df):
    """The (partitionColumn, bounds, numPartitions) split must yield
    N <= num_partitions range scans that together cover every row
    exactly once -- the scale shape for dimension-table ingest."""
    jdbc_writer(
        votes_df,
        derby_url,
        "votes_part",
        mode="overwrite",
        driver=DERBY_DRIVER,
        createTableColumnTypes=VARCHARS,
    ).save()
    back = jdbc_reader(
        spark,
        derby_url,
        "votes_part",
        partition_column="id",
        lower_bound=0,
        upper_bound=500,
        num_partitions=4,
        driver=DERBY_DRIVER,
    ).load()
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 500
    assert back.select("id").distinct().count() == 500


def test_jdbc_upsert_first_write_wins_and_replay_idempotent(spark, derby_url, votes_df):
    """The votes-PK semantics executed end to end: a replayed batch
    inserts nothing; a later batch with colliding keys cannot
    overwrite the first write."""
    sink = foreach_batch_jdbc_upsert(
        derby_url,
        "votes_fw",
        key_cols=["voter_id"],
        order_col="ts",
        driver=DERBY_DRIVER,
        create_table_column_types=VARCHARS,
        create_ddl=(
            'CREATE TABLE votes_fw ("id" INT, "voter_id" VARCHAR(64) '
            'PRIMARY KEY, "candidate" VARCHAR(64), "weight" DOUBLE, "ts" INT)'
        ),
    )
    sink(votes_df, 0)
    read = lambda t: jdbc_reader(spark, derby_url, t, driver=DERBY_DRIVER).load()
    assert read("votes_fw").count() == 500

    sink(votes_df, 1)  # exact replay: at-least-once redelivery
    assert read("votes_fw").count() == 500

    # colliding keys, different payload: first write must survive
    collide = votes_df.selectExpr(
        "id", "voter_id", "'cand_X' AS candidate", "weight * 10 AS weight", "ts + 1 AS ts"
    )
    sink(collide, 2)
    out = read("votes_fw")
    assert out.count() == 500
    assert out.where("candidate = 'cand_X'").count() == 0


def test_jdbc_upsert_latest_wins_updates(spark, derby_url, votes_df):
    """descending=True is the UPDATE-mode dashboard semantics: the
    same key's newer aggregate replaces the old row, and replaying
    the newer batch is a no-op."""
    sink = foreach_batch_jdbc_upsert(
        derby_url,
        "votes_lw",
        key_cols=["voter_id"],
        order_col="ts",
        descending=True,
        driver=DERBY_DRIVER,
        create_table_column_types=VARCHARS,
    )
    sink(votes_df, 0)
    newer = votes_df.selectExpr(
        "id", "voter_id", "candidate", "weight + 1000 AS weight", "ts + 10 AS ts"
    )
    sink(newer, 1)
    sink(newer, 2)  # replay of the newer batch
    out = jdbc_reader(spark, derby_url, "votes_lw", driver=DERBY_DRIVER).load()
    assert out.count() == 500
    assert out.where("weight >= 1000").count() == 500


def test_jdbc_upsert_within_batch_dedup(spark, derby_url):
    """A single batch carrying several rows per key must land exactly
    one winner per key (MERGE rejects duplicate source keys, so the
    sink's window dedup is load-bearing, not cosmetic)."""
    df = spark.createDataFrame(
        [("v1", "a", 1), ("v1", "b", 2), ("v2", "c", 5), ("v2", "d", 4)],
        "voter_id string, candidate string, ts int",
    )
    sink = foreach_batch_jdbc_upsert(
        derby_url,
        "votes_wb",
        key_cols=["voter_id"],
        order_col="ts",
        driver=DERBY_DRIVER,
        create_table_column_types=VARCHARS,
    )
    sink(df, 0)
    out = jdbc_reader(spark, derby_url, "votes_wb", driver=DERBY_DRIVER).load()
    rows = {r.voter_id: r.candidate for r in out.collect()}
    assert rows == {"v1": "a", "v2": "d"}  # earliest ts wins


def test_streaming_query_drives_jdbc_upsert(spark, derby_url, tmp_path):
    """The sink attached to a REAL streaming query (rate source ->
    foreachBatch -> Derby): rows flow through the streaming engine
    into the database, proving the wiring the reference runs against
    Postgres (spark-streaming.py:83-103 shape, JDBC flavored)."""
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "50")
        .load()
        .selectExpr(
            "CAST(value % 20 AS INT) AS id",
            "CONCAT('voter_', value % 20) AS voter_id",
            "CONCAT('cand_', value % 3) AS candidate",
            "CAST(value AS DOUBLE) AS weight",
            "CAST(value AS INT) AS ts",
        )
    )
    q = (
        stream.writeStream.foreachBatch(
            foreach_batch_jdbc_upsert(
                derby_url,
                "votes_stream",
                key_cols=["voter_id"],
                order_col="ts",
                driver=DERBY_DRIVER,
                create_table_column_types=VARCHARS,
                staging_table="votes_stream_stage",
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        import time

        deadline = time.time() + 30
        n = 0
        while time.time() < deadline:
            try:
                n = (
                    jdbc_reader(spark, derby_url, "votes_stream", driver=DERBY_DRIVER)
                    .load()
                    .count()
                )
            except Exception:
                n = 0  # table not created yet
            if n > 0:
                break
            time.sleep(1)
    finally:
        q.stop()
    assert 0 < n <= 20  # keyed upsert: at most one row per voter key
