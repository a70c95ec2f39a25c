"""Round-4 hardening tests: fault-tolerant lineage cuts, skew
remediation evidence, state-size honesty, degenerate-variance guards,
and the bench schema fail-fast.

These pin the scale/reliability CLAIMS the operator docstrings make --
each test here corresponds to a SURVEY §6 or SCALE.md sentence that
previously rested on configuration or prose alone.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F


# --------------------------------------------------------------- skew
def test_aqe_splits_deliberately_skewed_join(spark):
    """SURVEY §6 claims hot keys are handled by AQE skew-join: build a
    fact where one key carries ~90% of rows, force a sort-merge join,
    lower the AQE skew thresholds to test scale, and assert the final
    adaptive plan actually SPLIT the skewed partition."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.coalescePartitions.enabled",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        fact = spark.range(300_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("payload"),
        )
        dim = spark.range(1_000).select(
            F.col("id").alias("k2"), (F.col("id") * 2).alias("attr")
        )
        # no aggregation downstream of the join: a consumer that needs
        # hash distribution on k would make the skew split introduce
        # an extra shuffle, which OptimizeSkewedJoin refuses by default
        joined = fact.join(dim, fact["k"] == dim["k2"]).select("payload", "attr")
        # materialize THIS DataFrame's own query execution so the AQE
        # final plan (with the skew split) is what we inspect -- a
        # .count() would execute a different QueryExecution
        n = len(joined.collect())
        assert n > 250_000  # the hot key really dominated
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        # AQE marks the split read as skewed in the final plan
        assert "skew=true" in plan or "skewed" in plan.lower(), plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salted_join_on_skewed_fact_parity_and_fanout(spark):
    """The manual remediation path: a deliberately skewed fact joined
    through salted_join must (a) return row-identical results to the
    plain join and (b) actually fan the hot key out over the salt in
    the physical plan."""
    from de_realtime_voting_spark.functions.skew import salted_join

    fact = spark.range(50_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("row_id"),
    )
    dim = spark.range(100).select(
        F.col("id").alias("k2"), (F.col("id") * 3).alias("attr")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        salted = salted_join(fact, dim, "k", "k2", salt_source="row_id")
        plain = fact.join(dim, fact["k"] == dim["k2"])
        key = lambda r: (r["row_id"], r["attr"])
        assert sorted(map(key, salted.collect())) == sorted(map(key, plain.collect()))
        plan = salted._jdf.queryExecution().executedPlan().toString()
        assert "_salt" in plan and "xxhash64" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


# ----------------------------------------------- reliable lineage cut
def test_dedup_loops_identical_with_reliable_checkpoint(spark, sf_dir, tmp_path):
    """dedup's iterative loops default to localCheckpoint (executor-
    local blocks -- fine in one JVM, lost on executor preemption on a
    cluster).  With a reliable checkpoint dir configured the loops
    must take the fault-tolerant path and produce identical clusters."""
    from de_realtime_voting_spark.operators.dedup import (
        dedup_clusters,
        dedup_clusters_bigstar,
    )
    from de_realtime_voting_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    key = lambda r: (r["cluster_id"], r["n_docs"], r["max_doc_id"])
    local_cc = sorted(map(key, dedup_clusters(docs).collect()))
    local_star = sorted(map(key, dedup_clusters_bigstar(docs).collect()))

    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None  # default path really is local
    sc.setCheckpointDir(str(tmp_path / "reliable_ckpt"))
    try:
        assert sc.getCheckpointDir() is not None
        reliable_cc = sorted(map(key, dedup_clusters(docs).collect()))
        reliable_star = sorted(map(key, dedup_clusters_bigstar(docs).collect()))
    finally:
        # SparkContext has no unset; point it back at a scratch dir so
        # later tests that accidentally checkpoint still work, and
        # assert the contract this test relies on stays documented
        sc.setCheckpointDir(str(tmp_path / "reliable_ckpt"))
    assert reliable_cc == local_cc
    assert reliable_star == local_star


# ------------------------------------------------------- funnel state
class _FakeGroupState:
    """Minimal stand-in for pyspark's GroupState: tracks update()."""

    def __init__(self, value=None):
        self._value = value
        self.updated = []

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        if self._value is None:
            raise ValueError("state does not exist")
        return self._value

    def update(self, v):
        self._value = v
        self.updated.append(v)


def _funnel_batch(events):
    return iter(
        [
            pd.DataFrame(
                {
                    "ts": [pd.Timestamp(t) for t, _ in events],
                    "event_type": [e for _, e in events],
                }
            )
        ]
    )


def test_funnel_state_not_written_for_non_funnel_users():
    """State must stay O(users in the funnel): a user whose events
    never include a view (stage stays 0, no prior state) leaves no
    state row behind -- with NoTimeout such rows would never be
    evicted."""
    from de_realtime_voting_spark.streaming.state import _update_funnel

    state = _FakeGroupState()
    out = list(
        _update_funnel(
            (42,),
            _funnel_batch([("2024-01-01 10:00:00", "click"),
                           ("2024-01-01 10:01:00", "purchase")]),
            state,
        )
    )
    assert out == []
    assert state.updated == []  # the leak ADVICE.md r3 flagged


def test_funnel_state_written_once_user_enters_funnel():
    from de_realtime_voting_spark.streaming.state import _update_funnel

    state = _FakeGroupState()
    out = list(
        _update_funnel(
            (7,),
            _funnel_batch([("2024-01-01 10:00:00", "view"),
                           ("2024-01-01 10:02:00", "click")]),
            state,
        )
    )
    assert len(state.updated) == 1
    assert state.updated[0][0] == 2  # stage advanced to clicked
    assert len(out) == 1 and list(out[0]["stage"]) == [
        "viewed",
        "clicked_after_view",
    ]

    # an EXISTING state row keeps updating even if this batch has no
    # qualifying event (stage can't regress, state can't vanish)
    out2 = list(
        _update_funnel(
            (7,), _funnel_batch([("2024-01-01 10:03:00", "view")]), state
        )
    )
    assert out2 == []
    assert len(state.updated) == 2


# ------------------------------------------------- zero-variance guard
def test_anomaly_zscore_skips_zero_variance_candidates(spark):
    """A candidate with perfectly uniform hourly counts has var_pop=0;
    z = 0/0 = NaN, and Spark orders NaN >= 2.0 as TRUE -- the guard
    must keep such candidates out of the anomaly report entirely."""
    from de_realtime_voting_spark.operators.voting import votes_anomaly_zscore

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    # 'uniform': exactly 2 votes in each of 4 hours -> var_pop == 0
    for h in range(4):
        for i in range(2):
            rows.append(("uniform", base + dt.timedelta(hours=h, minutes=i)))
    # 'bursty': needs n>=2 distinct hourly counts; one hot hour among
    # many quiet ones produces |z| >= 2 rows
    for h in range(10):
        rows.append(("bursty", base + dt.timedelta(hours=h)))
    for i in range(30):
        rows.append(("bursty", base + dt.timedelta(hours=11, minutes=i)))
    votes = spark.createDataFrame(rows, ["event_type", "ts"])
    out = votes_anomaly_zscore(votes).collect()
    cands = {r["candidate_id"] for r in out}
    assert "uniform" not in cands  # previously emitted as NaN anomaly
    assert "bursty" in cands
    assert all(r["z_score"] == r["z_score"] for r in out)  # no NaNs


# ------------------------------------------------- bench schema guard
def test_bench_schema_guard_passes_on_real_testdata(spark, sf_dir):
    import bench

    bench.schema_guard(spark, sf_dir)  # must not raise


def test_bench_schema_guard_names_drifted_schema(spark, tmp_path, capsys):
    """The BENCH_r02 failure mode generalized: a testdata regen whose
    type change the loader CANNOT absorb (here ts as raw int64 micros)
    must die BEFORE timing with a named error, not as a mid-run py4j
    traceback.  (The NTZ flavor of drift is absorbed by load_table and
    is covered by the passing-guard test above.)"""
    import shutil

    import bench

    drift = tmp_path / "sf_drift"
    drift.mkdir()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"):
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", drift / f"{t}.parquet")
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table("/root/testdata/sf0.001/events.parquet")
    t = t.set_column(
        t.schema.get_field_index("ts"), "ts", pc.cast(t["ts"], pa.int64())
    )
    pq.write_table(t, str(drift / "events.parquet"))

    with pytest.raises(bench.SchemaGuardError, match="events.ts"):
        bench.schema_guard(spark, str(drift))
    assert "SCHEMA_GUARD_FAILED" in capsys.readouterr().out
