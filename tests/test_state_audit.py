"""Executed no-unbounded-growth checks for the streaming state audit
(tools/state_soak.py writes the full STATE_AUDIT.md; this pins the
worst offender in CI).

The stream-stream self-join (`stream_repeat_vote_pairs`) is the one
pipeline whose state is linear in RATE by contract — O(rate x
join-horizon).  Its boundedness claim is about TIME: however long the
stream has run, buffered state holds roughly ONE join horizon of
events, because the watermark evicts rows older than `within` +
delay.  A soak over 4 horizons at fixed rate asserts exactly that:
final state ≪ total input, ≈ one horizon.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import pytest

from tools.state_soak import run_stateful, write_vote_slices


@pytest.fixture
def rocksdb_spark(spark):
    """Enable the RocksDB state store for one test and RESTORE the
    session default afterwards -- the session fixture is shared, and
    test_streaming.py::test_stateful_pipelines_under_rocksdb asserts
    the default provider really is HDFS-backed before its A/B."""
    from de_realtime_voting_spark.session import enable_rocksdb_state_store

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    enable_rocksdb_state_store(spark)
    yield spark
    if prev is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, prev)


def _vote_schema():
    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
        TimestampType,
    )

    return StructType([
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ])


@pytest.mark.slow  # soak/duration test: fast-lane skips it (r13, conftest)
def test_join_state_evicts_over_time(rocksdb_spark, tmp_path):
    """4 join-horizons of stream at fixed rate: the join buffers must
    hold ~one horizon at the end, not the whole history — the
    eviction that makes O(rate x horizon) an honest bound."""
    spark = rocksdb_spark
    from de_realtime_voting_spark.streaming.pipelines import (
        stream_repeat_vote_pairs,
    )

    within, span_min, n_slices, volume = "30 minutes", 240, 16, 16_000
    src = str(tmp_path / "votes")
    write_vote_slices(src, volume, span_min=span_min, n_slices=n_slices)

    m = run_stateful(
        spark, src, _vote_schema(),
        lambda v: stream_repeat_vote_pairs(v, within=within, delay="1 minute"),
        "append",
    )
    # both join sides buffer ~ (within + delay + one 15-min slice of
    # watermark lag) of events = ~46 min of a 240-min feed ≈ 19% per
    # side.  Assert the state is a small fraction of total input and
    # comfortably under two horizons per side — NOT O(history).
    total_seen = 2 * volume  # volume rows buffered on each join side
    assert 0 < m["state_rows"] < 0.5 * total_seen, m
    horizon_rows = volume * 46 / span_min  # rows inside one horizon
    assert m["state_rows"] <= 2 * 2 * horizon_rows, m


@pytest.mark.slow  # soak/duration test: fast-lane skips it (r13, conftest)
def test_join_state_time_flat_across_horizons(rocksdb_spark, tmp_path):
    """The horizon-SCALING assertion (r7): at FIXED rate, feeding the
    stream-stream join for ~8 horizons instead of ~4 must leave the
    buffered state ~flat in rows AND bytes -- eviction over time is
    what makes O(rate x horizon) an honest bound, and this pins it at
    the boundary rather than inferring it from one run."""
    spark = rocksdb_spark
    from de_realtime_voting_spark.streaming.pipelines import (
        stream_repeat_vote_pairs,
    )

    rate_per_min = 100
    arms = {}
    for mult, n_slices in ((4, 12), (8, 24)):
        span = round(mult * 46.0)  # within 30 + delay 1 + slice lag
        volume = span * rate_per_min
        src = str(tmp_path / f"votes_{mult}h")
        write_vote_slices(src, volume, span_min=span, n_slices=n_slices)
        arms[mult] = run_stateful(
            spark, src, _vote_schema(),
            lambda v: stream_repeat_vote_pairs(
                v, within="30 minutes", delay="1 minute"
            ),
            "append",
        )
    four, eight = arms[4], arms[8]
    assert four["peak_rows"] > 0
    # rows: doubling feed LENGTH at fixed rate leaves the buffers
    # holding ~one horizon -- peak within 25% across arms
    assert eight["peak_rows"] <= 1.25 * four["peak_rows"], arms
    # and never O(history): the 8-horizon arm's peak is far below its
    # own total buffered input (2 sides x volume)
    assert eight["peak_rows"] < 0.5 * 2 * (8 * 46 * rate_per_min), arms
    # bytes: the physical footprint must be time-flat too (RocksDB
    # compaction makes bytes noisier than rows -- 1.6x headroom)
    if four["memory_bytes"] and eight["memory_bytes"]:
        assert eight["memory_bytes"] <= 1.6 * four["memory_bytes"], arms


def test_ttl_dedup_state_is_horizon_bounded(rocksdb_spark, tmp_path):
    """dropDuplicatesWithinWatermark: after a 4-hour feed the dedup
    state holds only voters whose ts is inside the watermark horizon,
    not every (voter, vote) ever seen."""
    spark = rocksdb_spark
    from de_realtime_voting_spark.streaming.pipelines import (
        stream_one_vote_per_voter_ttl,
    )

    volume = 16_000
    src = str(tmp_path / "votes_ttl")
    write_vote_slices(src, volume, span_min=240, n_slices=16)

    m = run_stateful(
        spark, src, _vote_schema(),
        lambda v: stream_one_vote_per_voter_ttl(v, delay="1 minute"),
        "append",
    )
    # horizon = 1 min delay + watermark lag of one 15-min slice: the
    # PEAK dedup state is at most ~2 slices of rows = 2 * volume/16,
    # far under the 16k total (and under the 2k electorate the no-TTL
    # variant keeps).  Peak is the assertion target: the run's final
    # batch sits post-eviction (the soak harness drains trailing
    # empty batches, so final rows can legitimately reach 0).
    assert 0 < m["peak_rows"] <= 2 * (volume // 16), m
    assert m["state_rows"] <= m["peak_rows"], m
