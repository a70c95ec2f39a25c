"""Voting-domain operators (reference parity, Spark-first).

Domain mapping onto the driver testdata: ``events`` is the vote
stream (user_id=voter, event_type=candidate, ts=voting_time,
value=vote weight); ``customer`` is the voter registry;
``nation``/``region`` give voter geography.

Every function is a pure DataFrame transform so the exact same logic
runs in batch queries AND under readStream (Structured Streaming
reuses these in streaming/pipelines.py) -- the Spark-native analog of
the reference running one streaming job (spark-streaming.py) against
the same tables Postgres holds (main.py).

Scale notes: voter/candidate dims are tiny next to the vote fact at
100 TB -> dimension joins are broadcast.  All aggregations are
builtin groupBy aggs (map-side partial aggregation for free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.columns import round_half_up as rnd
from ..functions import candidate_party


def _micros(c) -> "F.Column":
    """``unix_micros`` tolerant of TIMESTAMP_NTZ inputs.

    Parquet ``timestamp[us]`` without isAdjustedToUTC reads as
    TIMESTAMP_NTZ in Spark 4, and ``unix_micros`` only accepts
    TIMESTAMP.  The session timezone is pinned to UTC
    (session.py:22) so the NTZ->LTZ cast is instant-preserving; on
    an already-LTZ column the cast is a no-op."""
    col = F.col(c) if isinstance(c, str) else c
    return F.unix_micros(col.cast("timestamp_ltz"))


def _votes_with_location(votes: DataFrame, voters: DataFrame, nations: DataFrame) -> DataFrame:
    """Vote fact enriched with voter nation; dims broadcast."""
    return votes.join(
        F.broadcast(voters.select("c_custkey", "c_nationkey", "c_mktsegment", "c_name", "c_acctbal")),
        votes["user_id"] == F.col("c_custkey"),
    ).join(F.broadcast(nations.select("n_nationkey", "n_name", "n_regionkey")),
           F.col("c_nationkey") == F.col("n_nationkey"))


def votes_per_candidate(votes: DataFrame) -> DataFrame:
    """Total votes + weighted votes per candidate.

    Reference parity: spark-streaming.py:75-76 (groupBy candidate,
    sum(vote)); here count(*) is the unit-vote sum and ``value`` the
    weighted variant.
    """
    return (
        votes.groupBy(F.col("event_type").alias("candidate_id"))
        .agg(
            F.count(F.lit(1)).alias("total_votes"),
            rnd(F.sum("value"), 2).alias("total_weight"),
        )
    )


def turnout_by_location(votes: DataFrame, voters: DataFrame, nations: DataFrame) -> DataFrame:
    """Turnout per voter nation (reference spark-streaming.py:78-79
    groupBy address.state -> count)."""
    return (
        _votes_with_location(votes, voters, nations)
        .groupBy(F.col("n_name").alias("location"))
        .agg(F.count(F.lit(1)).alias("total_turnout_votes"))
    )


def turnout_by_region(
    votes: DataFrame, voters: DataFrame, nations: DataFrame, regions: DataFrame
) -> DataFrame:
    return (
        _votes_with_location(votes, voters, nations)
        .join(F.broadcast(regions), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"))
        .agg(F.count(F.lit(1)).alias("total_turnout_votes"))
    )


def turnout_by_segment(votes: DataFrame, voters: DataFrame) -> DataFrame:
    """Demographic turnout breakdown (reference dashboard-style split
    by voter attributes, main.py voter demographics)."""
    return (
        votes.join(
            F.broadcast(voters.select("c_custkey", "c_mktsegment")),
            votes["user_id"] == F.col("c_custkey"),
        )
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("total_turnout_votes"),
            rnd(F.avg("value"), 4).alias("avg_vote_weight"),
        )
    )


def votes_per_candidate_hourly(votes: DataFrame) -> DataFrame:
    """Tumbling 1-hour event-time window per candidate -- the batch
    twin of the watermarked streaming agg (spark-streaming.py:72-76).

    Uses F.window so the identical expression works under
    readStream with ``withWatermark``; window starts align to the
    hour, matching date_trunc('hour') in the oracle.
    """
    return (
        votes.groupBy(
            # group by the window() expression itself (not .start):
            # streaming append mode only recognizes the watermark on a
            # windowed aggregate in this form
            F.window("ts", "1 hour").alias("w"),
            F.col("event_type").alias("candidate_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("total_votes"),
            rnd(F.sum("value"), 2).alias("total_weight"),
        )
        .select(
            F.col("w").start.alias("window_start"),
            "candidate_id",
            "total_votes",
            "total_weight",
        )
    )


def one_vote_per_voter(votes: DataFrame) -> DataFrame:
    """First-vote-wins dedup: the reference enforces one vote per
    voter with a UNIQUE/PK constraint (main.py:56-66); Spark-natively
    that is a row_number window keeping the earliest event."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        votes.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col("user_id").alias("voter_id"),
            F.col("event_id").alias("vote_event_id"),
            F.col("event_type").alias("candidate_id"),
            F.col("ts").alias("voting_time"),
        )
    )


def votes_enriched(votes: DataFrame, voters: DataFrame, nations: DataFrame) -> DataFrame:
    """The reference's enriched vote record: vote = voter | candidate
    | timestamp (voting.py:86-91), normalized through the dims."""
    return _votes_with_location(votes, voters, nations).select(
        F.col("event_id").alias("vote_id"),
        F.col("user_id").alias("voter_id"),
        F.col("c_name").alias("voter_name"),
        F.col("n_name").alias("nationality"),
        F.col("event_type").alias("candidate_id"),
        candidate_party(F.col("event_type")).alias("party_affiliation"),
        F.col("ts").alias("voting_time"),
        F.lit(1).alias("vote"),
    )


def election_winner(votes: DataFrame) -> DataFrame:
    """Overall winner over deduped (one-per-voter) votes."""
    counted = (
        one_vote_per_voter(votes)
        .groupBy("candidate_id")
        .agg(F.count(F.lit(1)).alias("total_votes"))
    )
    w = Window.orderBy(F.col("total_votes").desc(), F.col("candidate_id").asc())
    return (
        counted.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("candidate_id", "total_votes")
    )


def leading_candidate_per_hour(votes: DataFrame) -> DataFrame:
    """Per-window argmax candidate (live leaderboard top-1)."""
    hourly = votes.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("window_start"),
        F.col("event_type").alias("candidate_id"),
    ).agg(F.count(F.lit(1)).alias("total_votes"))
    w = Window.partitionBy("window_start").orderBy(
        F.col("total_votes").desc(), F.col("candidate_id").asc()
    )
    return (
        hourly.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("window_start", "candidate_id", "total_votes")
    )


def voter_registration_stats(
    voters: DataFrame, nations: DataFrame, regions: DataFrame
) -> DataFrame:
    """Registered-voter demographics per region x segment (the
    reference's voter-registration analytics, main.py:91-116)."""
    return (
        voters.join(F.broadcast(nations), voters["c_nationkey"] == F.col("n_nationkey"))
        .join(F.broadcast(regions), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"), F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("registered_voters"),
            rnd(F.avg("c_acctbal"), 4).alias("avg_acctbal"),
        )
    )


def votes_value_stats(votes: DataFrame) -> DataFrame:
    """Per-candidate weight distribution stats."""
    return (
        votes.groupBy(F.col("event_type").alias("candidate_id"))
        .agg(
            F.count(F.lit(1)).alias("n_votes"),
            rnd(F.min("value"), 2).alias("min_weight"),
            rnd(F.max("value"), 2).alias("max_weight"),
            rnd(F.avg("value"), 4).alias("avg_weight"),
            rnd(F.stddev("value"), 4).alias("stddev_weight"),
        )
    )


def invalid_vote_rate(votes: DataFrame, voters: DataFrame, nations: DataFrame) -> DataFrame:
    """Share of 'error' events per nation -- the stream-quality
    monitor a production voting pipeline runs beside the tallies."""
    return (
        _votes_with_location(votes, voters, nations)
        .groupBy(F.col("n_name").alias("location"))
        .agg(
            F.count(F.lit(1)).alias("total_votes"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("bigint")
            .alias("invalid_votes"),
        )
        .withColumn("invalid_rate", F.col("invalid_votes") / F.col("total_votes"))
    )


def unique_voters_per_candidate(votes: DataFrame) -> DataFrame:
    """Distinct-voter reach per candidate (dedup-aware tally)."""
    return (
        votes.groupBy(F.col("event_type").alias("candidate_id"))
        .agg(
            F.countDistinct("user_id").alias("unique_voters"),
            F.count(F.lit(1)).alias("total_votes"),
        )
    )


def votes_sessionized(votes: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Voting sessions per voter: events within `gap` of the previous
    event share a session (Spark's native session_window -- the same
    expression works under readStream with a watermark).

    Session state at scale is bounded by the watermark; batch-side it
    is one shuffle on user_id."""
    return (
        votes.groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_votes"),
            F.max("ts").alias("last_vote"),
            rnd(F.sum("value"), 2).alias("session_weight"),
        )
        .select(
            F.col("user_id").alias("voter_id"),
            F.col("w").start.alias("session_start"),
            F.col("last_vote"),
            "n_votes",
            "session_weight",
        )
    )


def cumulative_daily_votes(votes: DataFrame) -> DataFrame:
    """Daily tally per candidate plus the running (election-to-date)
    total -- the dashboard cumulative chart."""
    daily = votes.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.col("event_type").alias("candidate_id"),
    ).agg(F.count(F.lit(1)).alias("daily_votes"))
    w = (
        Window.partitionBy("candidate_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.withColumn(
        "cumulative_votes", F.sum("daily_votes").over(w).cast("bigint")
    )


def votes_minute_rate(votes: DataFrame) -> DataFrame:
    """15-minute ingest-rate monitor over the vote stream."""
    return (
        votes.groupBy(F.window("ts", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_votes"),
            rnd(F.avg("value"), 4).alias("avg_weight"),
        )
        .select(F.col("w").start.alias("bucket_start"), "n_votes", "avg_weight")
    )


def voter_profile(votes: DataFrame) -> DataFrame:
    """Wide per-voter activity profile (feature-store style rollup)."""
    return votes.groupBy(F.col("user_id").alias("voter_id")).agg(
        F.count(F.lit(1)).alias("n_votes"),
        F.countDistinct("event_type").alias("n_candidates"),
        F.min("ts").alias("first_vote"),
        F.max("ts").alias("last_vote"),
        rnd(F.sum("value"), 2).alias("total_weight"),
    )


def vote_weight_percentiles(votes: DataFrame) -> DataFrame:
    """Exact interpolated percentiles of vote weight per candidate
    (Spark `percentile` == DuckDB `quantile_cont`, verified
    bit-identical)."""
    return votes.groupBy(F.col("event_type").alias("candidate_id")).agg(
        F.count(F.lit(1)).alias("n_votes"),
        F.percentile("value", 0.25).alias("p25"),
        F.percentile("value", 0.5).alias("p50"),
        F.percentile("value", 0.75).alias("p75"),
        F.percentile("value", 0.9).alias("p90"),
    )


def turnout_rollup(votes: DataFrame, voters: DataFrame, nations: DataFrame,
                   regions: DataFrame) -> DataFrame:
    """Hierarchical turnout: region -> nation -> grand total in one
    pass via ROLLUP grouping sets (single shuffle, partial aggs)."""
    enriched = (
        _votes_with_location(votes, voters, nations)
        .join(F.broadcast(regions), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        enriched.rollup(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).alias("total_turnout_votes"))
    )


def vote_interarrival(votes: DataFrame) -> DataFrame:
    """Per-candidate inter-arrival-time statistics: lag() over each
    voter's event-time-ordered vote stream, then one agg shuffle.

    The window partitions on user_id (high cardinality -- spreads
    evenly); ties on ts break on event_id so both engines rank
    identically."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = (
        _micros("ts") - _micros(F.lag("ts").over(w))
    ) / F.lit(1000000.0)
    per_vote = votes.select(
        F.col("event_type").alias("candidate_id"), gap_s.alias("gap_s")
    ).where(F.col("gap_s").isNotNull())
    return per_vote.groupBy("candidate_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        rnd(F.avg("gap_s"), 4).alias("avg_gap_s"),
        rnd(F.min("gap_s"), 4).alias("min_gap_s"),
        rnd(F.max("gap_s"), 4).alias("max_gap_s"),
    )


def votes_approx_stats(votes: DataFrame) -> DataFrame:
    """Sketch-based per-candidate stats: HyperLogLog++ distinct voters
    and t-digest-style approximate percentiles.

    THE scale path for 100 TB: exact count-distinct shuffles every
    (candidate, voter) pair; the HLL sketch is a few KB per candidate
    and merges map-side.  No SQL oracle -- sketch internals are
    engine-specific (driver records the weaker rows-only check);
    tests assert <5% error against the exact answers instead.

    The two percentiles come out of ONE t-digest sketch (the array
    form of percentile_approx) and are split into scalar columns so
    the result frame is flat -- canonicalizers that sort rows can't
    hash array cells."""
    pcts = F.percentile_approx("value", F.array(F.lit(0.5), F.lit(0.95)), 10000)
    return votes.groupBy(F.col("event_type").alias("candidate_id")).agg(
        F.approx_count_distinct("user_id").alias("approx_voters"),
        F.element_at(pcts, 1).alias("value_p50"),
        F.element_at(pcts, 2).alias("value_p95"),
        F.count(F.lit(1)).alias("total_votes"),
    )


def registered_non_voters(
    votes: DataFrame, voters: DataFrame, nations: DataFrame
) -> DataFrame:
    """Registered voters who never cast a vote, per nation -- the
    turnout-gap report.  LEFT ANTI join: the vote fact is reduced to
    distinct user_ids map-side, then the anti-join probes it; no wide
    row ever shuffles."""
    voted = votes.select(F.col("user_id").alias("c_custkey")).distinct()
    non = voters.join(voted, "c_custkey", "left_anti")
    return (
        non.join(
            F.broadcast(nations.select("n_nationkey", "n_name")),
            non["c_nationkey"] == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_non_voters"),
            rnd(F.avg("c_acctbal"), 4).alias("avg_balance"),
        )
    )


def party_vote_share(votes: DataFrame) -> DataFrame:
    """Vote share per party: candidate -> party via the reference's
    round-robin affiliation (main.py:15,81), then share-of-total with
    a window over the 3-row aggregate (no second scan)."""
    per_party = (
        votes.select(candidate_party(F.col("event_type")).alias("party"))
        .groupBy("party")
        .agg(F.count(F.lit(1)).alias("party_votes"))
    )
    total = F.sum("party_votes").over(Window.partitionBy())
    return per_party.select(
        "party",
        "party_votes",
        rnd(F.col("party_votes") / total, 6).alias("vote_share"),
    )


def candidate_hourly_pivot(votes: DataFrame) -> DataFrame:
    """Hour x candidate tally matrix via PIVOT.  The candidate list
    is pinned (shared constant), so Spark skips the distinct-values
    discovery pass and the pivot is a single groupBy shuffle."""
    from ..constants import CANDIDATES

    return (
        votes.groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .pivot("event_type", CANDIDATES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, CANDIDATES)
    )


def votes_cube(
    votes: DataFrame, voters: DataFrame, nations: DataFrame
) -> DataFrame:
    """CUBE over (candidate, nation): every marginal in one shuffle
    with partial aggregation -- the dashboard's drill-down matrix."""
    enriched = _votes_with_location(votes, voters, nations)
    return enriched.cube(
        F.col("event_type").alias("candidate_id"), F.col("n_name").alias("nation")
    ).agg(
        F.count(F.lit(1)).alias("n_votes"),
        rnd(F.sum("value"), 2).alias("total_weight"),
    )


def voter_value_quartiles(votes: DataFrame) -> DataFrame:
    """Voters bucketed into activity quartiles by total vote weight,
    then per-quartile stats -- the segmentation cut analytics teams
    run on any fact.

    EXACT ntile semantics with NO single-partition window over the
    fact-derived aggregate: per-voter totals are range-bucketed by
    floor(total_weight); each voter's global rank = its row_number
    within its bucket (a window PARTITIONED on the bucket) plus the
    broadcast cumulative count of all smaller buckets.  Only the
    bucket-count table -- one row per distinct integer weight, data-
    range-bounded, not corpus-bounded -- goes through an ordered
    window.  The quartile is then pure arithmetic on (rank, N): the
    first N%4 quartiles take ceil(N/4) voters, the rest floor(N/4),
    exactly what ntile(4) assigns, so the DuckDB ntile oracle matches
    row-for-row."""
    per_voter = votes.groupBy("user_id").agg(
        rnd(F.sum("value"), 2).alias("total_weight")
    )
    bucketed = per_voter.withColumn("bkt", F.floor("total_weight").cast("long"))
    counts = bucketed.groupBy("bkt").agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "bkt",
        F.coalesce(F.sum("cnt").over(w_cum), F.lit(0)).alias("offset"),
        F.sum("cnt").over(Window.partitionBy()).alias("n_total"),
    )
    w_in = Window.partitionBy("bkt").orderBy(
        F.col("total_weight").asc(), F.col("user_id").asc()
    )
    ranked = bucketed.join(F.broadcast(offsets), "bkt").select(
        "total_weight",
        (F.row_number().over(w_in) + F.col("offset")).alias("rank"),
        "n_total",
    )
    base = F.floor(F.col("n_total") / 4)
    rem = F.col("n_total") % 4
    cut = rem * (base + 1)
    q = (
        F.when(F.col("rank") <= cut, F.floor((F.col("rank") - 1) / (base + 1)))
        .otherwise(rem + F.floor((F.col("rank") - 1 - cut) / F.greatest(base, F.lit(1))))
        + 1
    )
    return (
        ranked.select("total_weight", q.cast("int").alias("quartile"))
        .groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n_voters"),
            rnd(F.min("total_weight"), 2).alias("min_weight"),
            rnd(F.max("total_weight"), 2).alias("max_weight"),
            rnd(F.avg("total_weight"), 4).alias("avg_weight"),
        )
    )


def lapsed_voters(
    votes: DataFrame, voters: DataFrame, nations: DataFrame
) -> DataFrame:
    """(voter, candidate) engagement pairs present in the election's
    first week but gone from its last (EXCEPT set semantics), rolled
    up per candidate and voter nation -- the re-engagement list.
    Both cohorts reduce to distinct pairs map-side before the set
    difference, so the EXCEPT shuffles narrow keys only."""
    from ..constants import ELECTION_EARLY_END, ELECTION_LATE_START

    pairs = lambda df: df.select("user_id", "event_type").distinct()  # noqa: E731
    early = pairs(votes.where(F.col("ts") < F.lit(ELECTION_EARLY_END).cast("timestamp")))
    late = pairs(votes.where(F.col("ts") >= F.lit(ELECTION_LATE_START).cast("timestamp")))
    lapsed = early.subtract(late)
    return (
        lapsed.join(
            F.broadcast(voters.select("c_custkey", "c_nationkey")),
            lapsed["user_id"] == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nations.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            F.col("event_type").alias("candidate_id"),
            F.col("n_name").alias("nation"),
        )
        .agg(F.count(F.lit(1)).alias("n_lapsed_voters"))
    )


def votes_asof_prior_click(votes: DataFrame) -> DataFrame:
    """As-of join (an operator Spark lacks natively): for each
    'purchase' vote, the voter's most recent 'click' at-or-before it.

    Expressed as a composition of built-ins -- tag, sort within
    voter, carry the latest click forward with last(ignorenulls) over
    a running frame -- ONE shuffle on user_id, no per-row lookup, no
    range self-join blowup.  Tie-break is total: (ts, is_target,
    event_id), clicks ordering before targets at equal ts so an
    equal-timestamp click counts as prior (the asof >= convention).
    """
    prior = F.last(
        F.when(
            F.col("event_type") == "click",
            F.struct(F.col("ts").alias("ts"), F.col("event_id").alias("event_id")),
        ),
        ignorenulls=True,
    ).over(
        Window.partitionBy("user_id").orderBy(
            "ts", (F.col("event_type") == "purchase").cast("int"), "event_id"
        )
    )
    gap_s = (
        _micros("ts") - _micros(F.col("prior")["ts"])
    ) / F.lit(1000000.0)
    return (
        votes.select("user_id", "event_id", "ts", "event_type", prior.alias("prior"))
        .where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_event"),
            F.col("ts").alias("purchase_ts"),
            F.col("prior")["event_id"].alias("prior_click_event"),
            F.col("prior")["ts"].alias("prior_click_ts"),
            gap_s.alias("gap_s"),
        )
    )


def votes_in_launch_windows(votes: DataFrame) -> DataFrame:
    """Range join: total vote traffic inside each candidate's launch
    window (first vote -> +6 hours).  The window table is a tiny
    aggregate, so the inequality join broadcasts it (nested-loop over
    5 rows) -- the correct physical shape for dim-sized range joins;
    fact-fact range joins would bucket the time axis first."""
    windows = votes.groupBy(F.col("event_type").alias("w_candidate")).agg(
        F.min("ts").alias("w_start")
    ).select(
        "w_candidate",
        "w_start",
        (F.col("w_start") + F.expr("INTERVAL 6 HOURS")).alias("w_end"),
    )
    return (
        votes.join(
            F.broadcast(windows),
            (F.col("ts") >= F.col("w_start")) & (F.col("ts") <= F.col("w_end")),
        )
        .groupBy("w_candidate")
        .agg(
            F.count(F.lit(1)).alias("n_events_in_window"),
            F.countDistinct("user_id").alias("n_voters_in_window"),
        )
    )


def events_json_props(votes: DataFrame) -> DataFrame:
    """JSON payload extraction + agg: the reference's from_json parse
    of Kafka values (spark-streaming.py:62-65) applied to ``props``."""
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        votes.select(F.col("event_type").alias("candidate_id"), k.alias("k"))
        .groupBy("candidate_id")
        .agg(
            F.sum("k").cast("bigint").alias("sum_k"),
            rnd(F.avg("k"), 4).alias("avg_k"),
            F.sum(F.when(F.col("k") > 50, 1).otherwise(0)).cast("bigint").alias("n_high"),
        )
    )


def vote_key_skew(votes: DataFrame, n_top: int = 20) -> DataFrame:
    """Shuffle-key skew audit over the vote stream: the N hottest
    voter keys with their share of all events and their ratio to the
    mean key load -- the diagnostic that decides whether a downstream
    join/agg on this key needs salting or AQE skew handling before it
    melts a partition at 100 TB.

    Scale shape: one groupBy(user_id) shuffle with map-side partial
    agg (the skewed key itself collapses map-side -- counting is the
    one operation a hot key cannot hurt); top-N via orderBy().limit()
    which compiles to TakeOrderedAndProject -- per-partition partial
    top-N merged on one n_top-row frame, NEVER a global window over
    the per-key frame (billions of rows through one task at corpus
    scale); the mean key load rides along via a tiny single-row
    broadcast and rank is a window over the n_top survivors only.
    """
    per_key = votes.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    totals = per_key.agg(
        F.sum("cnt").cast("double").alias("total"),
        F.count(F.lit(1)).cast("double").alias("n_keys"),
    )
    top = per_key.orderBy(F.col("cnt").desc(), F.col("user_id").asc()).limit(n_top)
    w = Window.orderBy(F.col("cnt").desc(), F.col("user_id").asc())
    return (
        top.crossJoin(F.broadcast(totals))
        .withColumn("rank", F.row_number().over(w))
        .select(
            "rank",
            "user_id",
            F.col("cnt").cast("bigint").alias("cnt"),
            rnd(F.col("cnt") / F.col("total"), 6).alias("share"),
            rnd(F.col("cnt") * F.col("n_keys") / F.col("total"), 4).alias(
                "x_mean_load"
            ),
        )
    )


def hot_key_join_salted(votes: DataFrame, customer: DataFrame) -> DataFrame:
    """Skew REMEDIATION twin of vote_key_skew's diagnosis: a fact-dim
    join whose key is deliberately collapsed so one key carries the
    click firehose (every 'click' maps to custkey 1 -- the
    celebrity-candidate / empty-string-doc shape), executed through
    functions.skew.salted_join so no single reducer ever materializes
    the hot key alone.

    The salt spreads each key over SALT_N shuffle sub-keys
    (deterministic xxhash64 of the event id -- re-executable, no
    rand()) and replicates the dim side SALT_N times; the oracle runs
    the PLAIN unsalted SQL, so the driver's hash gate proves salting
    is result-invisible -- a physical strategy, not a semantic one.
    This is the §6 claim ("hot keys -> salting/AQE") as a verified
    query instead of configuration; tests/test_hardening.py holds the
    AQE-skew-split twin of the same claim.

    Scale shape: one (key, salt) shuffle for the fact side; the dim
    replication is SALT_N x |customer| rows -- acceptable exactly
    because the build side is dim-sized; the rollup after the join is
    a dim-cardinality agg with map-side partials.
    """
    from ..functions.skew import salted_join

    fact = votes.select(
        "event_id",
        "value",
        F.when(F.col("event_type") == "click", F.lit(1))
        .otherwise(F.col("user_id"))
        .alias("skew_key"),
    )
    dim = customer.select("c_custkey", "c_mktsegment")
    joined = salted_join(
        fact, dim, "skew_key", "c_custkey", salt_source="event_id"
    )
    return joined.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct(F.col("skew_key")).alias("n_keys"),
        rnd(F.sum("value"), 2).alias("total_value"),
    )


def voter_retention_cohort(votes: DataFrame) -> DataFrame:
    """Monthly cohort retention matrix: voters grouped by their
    first-vote month (the cohort), counted in every month they were
    active, with the integer month offset -- the engagement-decay
    view every election/product dashboard opens with.

    Scale shape: first-vote month is a per-voter min (one shuffle on
    user_id, map-side partial agg); activity reduces to distinct
    (user, month) pairs map-side before joining the cohort dim back
    (broadcast-or-shuffle by AQE -- the cohort frame is one row per
    voter).  The final matrix is |cohorts| x |months| -- dim-sized.
    Month offset is pure integer arithmetic, identical cross-engine.
    """
    cohort = votes.groupBy("user_id").agg(
        F.date_trunc("month", F.min("ts")).alias("cohort_month")
    )
    active = votes.select(
        "user_id", F.date_trunc("month", F.col("ts")).alias("activity_month")
    ).distinct()
    offset = (
        (F.year("activity_month") - F.year("cohort_month")) * 12
        + (F.month("activity_month") - F.month("cohort_month"))
    )
    return (
        active.join(cohort, "user_id")
        .groupBy("cohort_month", offset.alias("month_offset"))
        .agg(F.count(F.lit(1)).alias("n_voters"))
    )


def funnel_conversion(votes: DataFrame, voters: DataFrame) -> DataFrame:
    """Ordered conversion funnel per voter segment: voters who viewed,
    then clicked AT-OR-AFTER their first view, then purchased at-or-
    after that first qualifying click -- the event-ORDER-aware funnel
    (a click before the first view does not count), which a naive
    per-stage count gets wrong.

    Scale shape: three conditional-min aggregations, each shuffling
    on user_id -- the same high-cardinality key every time, so AQE/
    exchange reuse keeps the data co-partitioned; no self-join, no
    window over the fact.  The segment dim broadcasts; output is
    |segments| rows.  All stage tests are timestamp comparisons and
    integer counts -- exact cross-engine.
    """
    first_view = votes.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view")
    )
    with_view = votes.join(first_view, "user_id")
    first_click = with_view.groupBy("user_id").agg(
        F.max("first_view").alias("first_view"),
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") >= F.col("first_view")),
                F.col("ts"),
            )
        ).alias("first_click"),
    )
    staged = (
        votes.join(first_click, "user_id")
        .groupBy("user_id")
        .agg(
            F.max("first_view").alias("first_view"),
            F.max("first_click").alias("first_click"),
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= F.col("first_click")),
                    F.col("ts"),
                )
            ).alias("first_purchase"),
        )
    )
    seg = staged.join(
        F.broadcast(voters.select("c_custkey", "c_mktsegment")),
        staged["user_id"] == F.col("c_custkey"),
    )
    n_total = F.count(F.lit(1))
    n_view = F.sum(F.col("first_view").isNotNull().cast("int"))
    n_click = F.sum(F.col("first_click").isNotNull().cast("int"))
    n_buy = F.sum(F.col("first_purchase").isNotNull().cast("int"))
    return seg.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        n_total.alias("n_voters"),
        n_view.cast("bigint").alias("n_viewed"),
        n_click.cast("bigint").alias("n_clicked_after_view"),
        n_buy.cast("bigint").alias("n_purchased_after_click"),
        rnd(n_buy / n_total, 6).alias("full_funnel_rate"),
    )


def votes_anomaly_zscore(votes: DataFrame) -> DataFrame:
    """Hourly volume anomaly detection per candidate: hours whose
    vote count sits >= 2 population-stddevs from the candidate's
    hourly mean -- the burst/outage screen a live election dashboard
    alarms on.

    Determinism is engineered: hourly counts are integers, so
    mean = sum/n and var_pop = avg(c^2) - mean^2 are single divisions
    over exact integer sums -- bit-identical cross-engine (stddev_samp
    builtins use different accumulation algorithms between engines and
    are NOT used).  Scale shape: one (candidate, hour) count shuffle
    with map-side partial agg; the stats frame is |candidates| rows,
    broadcast back onto the |candidates| x |hours| aggregate.
    """
    hourly = votes.groupBy(
        F.col("event_type").alias("candidate_id"),
        F.date_trunc("hour", F.col("ts")).alias("hour"),
    ).agg(F.count(F.lit(1)).alias("n_votes"))
    return flag_hourly_anomalies(hourly, candidate_hourly_stats(votes))


def candidate_hourly_stats(votes: DataFrame) -> DataFrame:
    """Per-candidate hourly-volume moment sums (n_hours, s1, s2) --
    the |candidates|-row model artifact behind votes_anomaly_zscore,
    exposed separately so a STREAMING anomaly gate can build it
    offline and broadcast it against live tallies
    (streaming.stream_votes_anomaly)."""
    return (
        votes.groupBy(
            F.col("event_type").alias("candidate_id"),
            F.date_trunc("hour", F.col("ts")).alias("hour"),
        )
        .agg(F.count(F.lit(1)).alias("n_votes"))
        .groupBy("candidate_id")
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.sum("n_votes").alias("s1"),
            F.sum(F.col("n_votes") * F.col("n_votes")).alias("s2"),
        )
    )


def flag_hourly_anomalies(hourly: DataFrame, stats: DataFrame) -> DataFrame:
    """Shared tail of the batch/stream anomaly detectors: broadcast
    the per-candidate moment sums onto (candidate, hour, n_votes)
    rows and keep |z| >= 2 outliers.  A candidate with perfectly
    uniform hourly counts has var_pop = 0 and z = 0/0 = NaN; Spark's
    NaN ordering treats NaN >= 2.0 as true, so the predicate guards
    var_pop > 0 explicitly (mirrored in the oracle SQL) -- a
    zero-variance candidate has no outliers by definition."""
    mean = F.col("s1").cast("double") / F.col("n_hours")
    var_pop = F.col("s2").cast("double") / F.col("n_hours") - mean * mean
    z = (F.col("n_votes") - mean) / F.sqrt(var_pop)
    return (
        hourly.join(F.broadcast(stats), "candidate_id")
        .where((var_pop > 0) & (F.abs(z) >= 2.0))
        .select(
            "candidate_id",
            "hour",
            "n_votes",
            rnd(mean, 4).alias("hourly_mean"),
            rnd(z, 4).alias("z_score"),
        )
    )


def vote_value_histogram(votes: DataFrame) -> DataFrame:
    """Fixed-width histogram of vote weights per candidate: 10-wide
    buckets clamped to [0, 90+] -- the distribution fingerprint a
    monitoring dashboard renders, computed with plain floor
    arithmetic (identical IEEE op in both engines; no engine
    histogram builtin, whose bucketing rules differ).

    Scale shape: bucket assignment is map-side; one
    (candidate, bucket) count shuffle with map-side partial agg;
    output is |candidates| x 10 rows."""
    bucket = F.greatest(
        F.lit(0), F.least(F.lit(9), F.floor(F.col("value") / F.lit(10.0)))
    ).cast("int")
    return (
        votes.groupBy(
            F.col("event_type").alias("candidate_id"), bucket.alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("n_votes"))
        .select(
            "candidate_id",
            "bucket",
            (F.col("bucket") * 10).alias("bucket_lo"),
            "n_votes",
        )
    )


def voter_party_loyalty(votes: DataFrame, voters: DataFrame) -> DataFrame:
    """Party-loyalty split per voter segment: how many voters engaged
    with exactly one party vs several, with the cross-party rate --
    the swing-voter share every campaign report leads with.

    Scale shape: one distinct-party count per voter (shuffle on
    user_id, map-side partial agg), segment dim broadcast, final agg
    on the |segments| key.  Counts and the rate are exact integers /
    one division -- cross-engine deterministic.
    """
    per_voter = votes.groupBy("user_id").agg(
        F.countDistinct(candidate_party(F.col("event_type"))).alias("n_parties")
    )
    seg = per_voter.join(
        F.broadcast(voters.select("c_custkey", "c_mktsegment")),
        per_voter["user_id"] == F.col("c_custkey"),
    )
    multi = (F.col("n_parties") > 1).cast("int")
    return seg.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_voters"),
        F.sum(1 - multi).cast("bigint").alias("n_single_party"),
        F.sum(multi).cast("bigint").alias("n_multi_party"),
        rnd(F.sum(multi) / F.count(F.lit(1)), 6).alias("multi_party_rate"),
    )


def turnout_grouping_sets(
    votes: DataFrame, voters: DataFrame, nations: DataFrame, regions: DataFrame
) -> DataFrame:
    """Turnout by GROUPING SETS ((region), (segment), ()): three
    independent marginals plus the grand total in ONE aggregation
    pass -- the grouping-sets shape (rollup and cube are its special
    cases; this is the general form a dashboard's side-by-side
    breakdowns compile to).

    Scale shape: the enriched fact expands once per grouping set
    inside Spark's Expand operator (x3 here), then one shuffle with
    map-side partial agg -- cheaper than three separate scans+aggs.
    Dims broadcast.
    """
    enriched = (
        _votes_with_location(votes, voters, nations)
        .join(F.broadcast(regions), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            F.col("r_name").alias("region"),
            F.col("c_mktsegment").alias("segment"),
        )
    )
    return (
        enriched.groupingSets([["region"], ["segment"], []], "region", "segment")
        .agg(F.count(F.lit(1)).alias("total_turnout_votes"))
    )


def event_transition_matrix(events: DataFrame) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    stream: for every (prev_type, next_type) pair of CONSECUTIVE
    events within a user (ordered by ts, event_id as the total
    tie-break), the transition count and the conditional probability
    P(next | prev) -- the sequence-mining view of the click stream
    (what users do after an error, what precedes a purchase).

    Scale shape: the lag() window shuffles ONCE on user_id with
    per-task work bounded by a single user's history (never corpus-
    global); the transition matrix itself is |event_types|^2 rows --
    single digits squared -- so the normalizing sum-over-prev window
    runs on a dashboard-sized frame.  Counts are exact bigints; the
    single probability division is rounded to 6 in both engines.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNotNull())
    )
    counts = pairs.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_transitions"))
    wt = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n_transitions",
        rnd(
            F.col("n_transitions") / F.sum("n_transitions").over(wt), 6
        ).alias("p_next"),
    )


def votes_sliding_window(votes: DataFrame) -> DataFrame:
    """Sliding 2-hour windows advancing every hour, per candidate --
    the OVERLAPPING-window twin of votes_per_candidate_hourly
    (tumbling).  Every vote lands in exactly two windows: the ones
    starting at date_trunc('hour', ts) and one hour earlier, which
    is precisely how the oracle expresses it (UNION ALL of the two
    shifted tumbling assignments).

    Streaming-ready: the identical F.window(slideDuration=) grouping
    expression runs under readStream with a watermark.  Scale: the
    2x row expansion happens inside the partial aggregation (each
    input row feeds two window groups map-side), so the shuffle
    carries pre-aggregated (window, candidate) partials, never the
    doubled fact.
    """
    return (
        votes.groupBy(
            F.window("ts", "2 hours", "1 hour").alias("w"),
            F.col("event_type").alias("candidate_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("total_votes"),
            rnd(F.sum("value"), 2).alias("total_weight"),
        )
        .select(
            F.col("w").start.alias("window_start"),
            "candidate_id",
            "total_votes",
            "total_weight",
        )
    )


def voter_stickiness(events: DataFrame) -> DataFrame:
    """DAU/WAU stickiness per day: distinct daily actives over
    distinct actives in the TRAILING 7-day window ending that day --
    the engagement ratio every live dashboard tracks (1/7 = everyone
    shows up once a week, 1.0 = the whole weekly base is in daily).

    Scale shape: the fact collapses to distinct (day, user) FIRST
    (one dedup shuffle bounded by actives, not events); the trailing
    window is an explode of each active-day into the <= 7 window-days
    it contributes to (sequence(day, day+6) -- bounded fan-out, never
    a range self-join), deduped and counted per window day.  Exact
    distinct counts by construction; the one ratio division is
    rounded.  Window days past the observed range are dropped by the
    inner join (a day with zero daily actives has no DAU row).
    """
    # date_trunc (timestamp), not to_date: the repo's day-key idiom --
    # both engines surface it as a timestamp, so the comparator sees
    # one dtype (a DATE arrives as datetime.date from Spark but
    # datetime64 from DuckDB)
    daily = events.select(
        F.date_trunc("day", F.col("ts")).alias("day"), "user_id"
    ).distinct()
    dau = daily.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("dau")
    )
    weekly = (
        daily.select(
            F.explode(
                F.sequence(
                    F.col("day"),
                    F.col("day") + F.expr("INTERVAL 6 DAYS"),
                    F.expr("INTERVAL 1 DAY"),
                )
            ).alias("win_day"),
            "user_id",
        )
        .distinct()
        .groupBy("win_day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("wau"))
    )
    return dau.join(weekly, dau["day"] == weekly["win_day"]).select(
        "day",
        "dau",
        "wau",
        rnd(F.col("dau") / F.col("wau"), 6).alias("stickiness"),
    )
