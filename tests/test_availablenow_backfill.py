"""Trigger.AvailableNow backfill semantics (VERDICT r7 #6).

Production restarts drain a downtime backlog with AvailableNow; these
tests pin, for the two stateful shapes the suite's other recovery
tests don't cover -- a WATERMARKED append-mode window agg and an
applyInPandasWithState custom-state pipeline -- that

* a checkpointed AvailableNow catch-up after a downtime gap reaches
  the SAME end state as one continuous (processAllAvailable-driven)
  run over the identical delivery sequence, and
* nothing is emitted twice across the restart.

The input is split at the median event time so the backlog file
contains no rows that are late w.r.t. the first run's watermark --
the split must not CHANGE the answer, only the trigger schedule.
"""

from __future__ import annotations

import glob
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from de_realtime_voting_spark.operators import voting
from de_realtime_voting_spark.sources import load_table
from de_realtime_voting_spark.streaming import (
    parse_vote_stream,
    running_tally,
    stream_votes_per_candidate_hourly,
)


@pytest.fixture(scope="module")
def time_split_json(spark, sf_dir):
    """events as JSON text files split AT THE MEDIAN ts: part A holds
    the earlier half, part B the later -- delivering B after A can
    never lose rows to A's watermark."""
    events = load_table(spark, sf_dir, "events")
    cutoff = events.select(
        F.expr("percentile(unix_micros(ts), 0.5)").alias("c")
    ).collect()[0]["c"]
    root = tempfile.mkdtemp(prefix="anow_src_")
    fmt = {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"}
    payload = F.to_json(F.struct(*events.columns), fmt).alias("value_json")
    half = F.unix_micros("ts") <= F.lit(int(cutoff))
    events.where(half).select(payload).coalesce(1).write.mode(
        "overwrite"
    ).text(f"{root}/a")
    events.where(~half).select(payload).coalesce(1).write.mode(
        "overwrite"
    ).text(f"{root}/b")
    yield root
    shutil.rmtree(root, ignore_errors=True)


def _deliver(split_root: str, src: str, part: str) -> None:
    for i, f in enumerate(sorted(glob.glob(f"{split_root}/{part}/part-*"))):
        shutil.copy(f, f"{src}/{part}{i}.txt")


def _vote_stream(spark, src: str):
    return parse_vote_stream(
        spark.readStream.schema("value_json string").text(src), "value_json"
    )


@pytest.mark.slow  # soak/duration test: fast-lane skips it (r13, conftest)
def test_watermarked_agg_availablenow_backfill_equals_continuous(
    spark, sf_dir, time_split_json
):
    root = tempfile.mkdtemp(prefix="anow_wm_")
    paths = {
        n: f"{root}/{n}" for n in ("src_c", "out_c", "ck_c", "src_r", "out_r", "ck_r")
    }
    try:
        # --- continuous arm: ONE query stays up across both deliveries
        import os

        os.makedirs(paths["src_c"])
        _deliver(time_split_json, paths["src_c"], "a")
        qc = (
            stream_votes_per_candidate_hourly(_vote_stream(spark, paths["src_c"]))
            .writeStream.format("parquet")
            .option("path", paths["out_c"])
            .option("checkpointLocation", paths["ck_c"])
            .outputMode("append")
            .start()
        )
        qc.processAllAvailable()
        _deliver(time_split_json, paths["src_c"], "b")
        qc.processAllAvailable()
        qc.stop()
        cont = spark.read.parquet(paths["out_c"]).collect()

        # --- restart arm: AvailableNow, downtime gap, AvailableNow
        os.makedirs(paths["src_r"])

        def catch_up():
            q = (
                stream_votes_per_candidate_hourly(
                    _vote_stream(spark, paths["src_r"])
                )
                .writeStream.format("parquet")
                .option("path", paths["out_r"])
                .option("checkpointLocation", paths["ck_r"])
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        _deliver(time_split_json, paths["src_r"], "a")
        catch_up()
        _deliver(time_split_json, paths["src_r"], "b")  # arrives while down
        catch_up()
        back = spark.read.parquet(paths["out_r"]).collect()

        key = lambda r: (r["window_start"], r["candidate_id"])
        # no duplicate emissions across the restart
        assert len({key(r) for r in back}) == len(back)
        assert len({key(r) for r in cont}) == len(cont)
        # end-state equality between trigger modes
        assert {key(r): (r["total_votes"], r["total_weight"]) for r in back} == {
            key(r): (r["total_votes"], r["total_weight"]) for r in cont
        }
        # and the emitted windows carry the batch ground truth
        truth = {
            (r["window_start"], r["candidate_id"]): r["total_votes"]
            for r in voting.votes_per_candidate_hourly(
                load_table(spark, sf_dir, "events")
            ).collect()
        }
        assert len(back) > 0
        for r in back:
            assert truth[key(r)] == r["total_votes"]
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_stateful_tally_availablenow_backfill_equals_continuous(
    spark, sf_dir, time_split_json
):
    """running_tally (applyInPandasWithState, update mode) through a
    foreachBatch parquet sink that stamps batch_id -- duplicate
    emission would surface as a repeated (batch_id, candidate_id)."""
    import os

    root = tempfile.mkdtemp(prefix="anow_st_")
    paths = {
        n: f"{root}/{n}" for n in ("src_c", "out_c", "ck_c", "src_r", "out_r", "ck_r")
    }

    def writer(out_dir):
        def write(batch_df, batch_id):
            # per-batch-id subdir + overwrite = idempotent on replay
            batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
                "overwrite"
            ).parquet(f"{out_dir}/b{batch_id:05d}")

        return write

    def run(src, out, ck, available_now):
        q = (
            running_tally(_vote_stream(spark, src))
            .writeStream.foreachBatch(writer(out))
            .outputMode("update")
            .option("checkpointLocation", ck)
        )
        q = q.trigger(availableNow=True).start() if available_now else q.start()
        return q

    def final_state(out):
        rows = spark.read.option("recursiveFileLookup", "true").parquet(out).collect()
        # no duplicate emissions: one row per (batch, candidate)
        seen = {(r["batch_id"], r["candidate_id"]) for r in rows}
        assert len(seen) == len(rows)
        last = {}
        for r in sorted(rows, key=lambda r: r["batch_id"]):
            last[r["candidate_id"]] = (r["total_votes"], r["total_weight"])
        return last

    try:
        # --- continuous arm
        os.makedirs(paths["src_c"])
        _deliver(time_split_json, paths["src_c"], "a")
        qc = run(paths["src_c"], paths["out_c"], paths["ck_c"], available_now=False)
        qc.processAllAvailable()
        _deliver(time_split_json, paths["src_c"], "b")
        qc.processAllAvailable()
        qc.stop()
        cont = final_state(paths["out_c"])

        # --- restart arm with a downtime-gap delivery
        os.makedirs(paths["src_r"])
        _deliver(time_split_json, paths["src_r"], "a")
        q1 = run(paths["src_r"], paths["out_r"], paths["ck_r"], available_now=True)
        q1.awaitTermination(120)
        mid = final_state(paths["out_r"])
        _deliver(time_split_json, paths["src_r"], "b")
        q2 = run(paths["src_r"], paths["out_r"], paths["ck_r"], available_now=True)
        q2.awaitTermination(120)
        back = final_state(paths["out_r"])

        # end-state equality across trigger modes, and vs batch truth
        assert back == cont
        truth = {
            r["candidate_id"]: r["total_votes"]
            for r in voting.votes_per_candidate(
                load_table(spark, sf_dir, "events")
            ).collect()
        }
        assert {c: v[0] for c, v in back.items()} == truth
        # the catch-up CONTINUED from recovered state (did not recount
        # part A): every candidate's tally is strictly monotone
        for c, v in mid.items():
            assert back[c][0] >= v[0]
        assert any(back[c][0] > v[0] for c, v in mid.items())
    finally:
        shutil.rmtree(root, ignore_errors=True)


@pytest.mark.slow  # soak/duration test: fast-lane skips it (r13, conftest)
def test_stream_stream_join_availablenow_backfill_equals_continuous(
    spark, sf_dir, time_split_json
):
    """stream_repeat_vote_pairs (watermarked stream-stream self-join,
    append mode): a checkpointed AvailableNow catch-up across a
    downtime gap must emit the SAME pair set as one continuous run --
    including CROSS-delivery pairs whose first vote arrived before the
    restart (the buffered join state must survive the checkpoint).
    The median-ts split guarantees no pair is lost to state eviction:
    a pair's second vote is within 1h of its first, and any first-half
    row old enough to be evicted after delivery A (first_ts + 1h <
    watermark_A) could only pair with seconds that are themselves in
    the first half."""
    import os

    from de_realtime_voting_spark.streaming import stream_repeat_vote_pairs

    root = tempfile.mkdtemp(prefix="anow_ssj_")
    paths = {
        n: f"{root}/{n}" for n in ("src_c", "out_c", "ck_c", "src_r", "out_r", "ck_r")
    }

    def run_sink(src, out, ck):
        return (
            stream_repeat_vote_pairs(_vote_stream(spark, src))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
        )

    key = lambda r: (r["first_event"], r["second_event"])
    try:
        # --- continuous arm
        os.makedirs(paths["src_c"])
        _deliver(time_split_json, paths["src_c"], "a")
        qc = run_sink(paths["src_c"], paths["out_c"], paths["ck_c"]).start()
        qc.processAllAvailable()
        _deliver(time_split_json, paths["src_c"], "b")
        qc.processAllAvailable()
        qc.stop()
        cont = spark.read.parquet(paths["out_c"]).collect()

        # --- restart arm: AvailableNow, downtime delivery, AvailableNow
        os.makedirs(paths["src_r"])

        def catch_up():
            q = (
                run_sink(paths["src_r"], paths["out_r"], paths["ck_r"])
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)

        _deliver(time_split_json, paths["src_r"], "a")
        catch_up()
        mid = {key(r) for r in spark.read.parquet(paths["out_r"]).collect()}
        _deliver(time_split_json, paths["src_r"], "b")
        catch_up()
        back = spark.read.parquet(paths["out_r"]).collect()

        # no duplicate emissions across the restart, end states equal
        assert len({key(r) for r in back}) == len(back)
        assert len({key(r) for r in cont}) == len(cont)
        assert {key(r) for r in back} == {key(r) for r in cont}
        # and both equal the batch ground truth over the full feed
        truth = {
            key(r)
            for r in streaming_pipelines_repeat_truth(spark, sf_dir).collect()
        }
        assert {key(r) for r in back} == truth
        # the catch-up joined NEW seconds against RECOVERED firsts:
        # cross-delivery pairs exist that no single delivery contains
        assert len(back) > len(mid)
        cross = {k for k in truth if k not in mid}
        assert cross and cross <= {key(r) for r in back}
    finally:
        shutil.rmtree(root, ignore_errors=True)


def streaming_pipelines_repeat_truth(spark, sf_dir):
    from de_realtime_voting_spark.streaming import repeat_vote_pairs

    return repeat_vote_pairs(load_table(spark, sf_dir, "events"))
