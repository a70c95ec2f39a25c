"""Custom stateful streaming: running per-candidate tally via
applyInPandasWithState (the arbitrary-state API the reference's
update-mode aggregation approximates).

State per candidate is two numbers (count, weight) -- O(candidates)
total state, Arrow-batched per group, no skew risk since candidate
cardinality is tiny.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

TALLY_OUTPUT = StructType(
    [
        StructField("candidate_id", StringType()),
        StructField("total_votes", LongType()),
        StructField("total_weight", DoubleType()),
    ]
)

TALLY_STATE = StructType(
    [StructField("votes", LongType()), StructField("weight", DoubleType())]
)


def _update_tally(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    votes, weight = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        votes += len(pdf)
        weight += float(pdf["value"].sum())
    state.update((votes, weight))
    yield pd.DataFrame(
        {"candidate_id": [key[0]], "total_votes": [votes], "total_weight": [round(weight, 2)]}
    )


def running_tally(votes: DataFrame) -> DataFrame:
    """Cumulative per-candidate tally that survives across
    micro-batches (emits the updated total for each candidate seen in
    the batch)."""
    return (
        votes.groupBy("event_type")
        .applyInPandasWithState(
            _update_tally,
            outputStructType=TALLY_OUTPUT,
            stateStructType=TALLY_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


SESSION_OUTPUT = StructType(
    [
        StructField("voter_id", LongType()),
        StructField("n_votes", LongType()),
        StructField("session_start_us", LongType()),
        StructField("session_end_us", LongType()),
        StructField("closed_by_timeout", StringType()),
    ]
)

SESSION_STATE = StructType(
    [
        StructField("n", LongType()),
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
    ]
)


def _make_update_session(gap_ms: int):
    """Closure factory (not a default-arg lambda: the captured value
    must ship inside the pickled function, and default args change
    the inferred arity) binding the session gap for the worker side."""

    def _update_session(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, start_us, last_us = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "voter_id": [key[0]],
                    "n_votes": [n],
                    "session_start_us": [start_us],
                    "session_end_us": [last_us],
                    "closed_by_timeout": ["yes"],
                }
            )
            return
        n, start_us, last_us = state.get if state.exists else (0, None, None)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            us = pdf["ts"].astype("datetime64[us]").astype("int64").tolist()
            n += len(us)
            start_us = min(us) if start_us is None else min(start_us, min(us))
            last_us = max(us) if last_us is None else max(last_us, max(us))
        state.update((n, start_us, last_us))
        # close the session if no new votes arrive within the gap;
        # nothing is emitted while the voter stays active
        state.setTimeoutDuration(gap_ms)

    return _update_session


def voter_sessions_with_timeout(
    votes: DataFrame, gap_ms: int = 30 * 60 * 1000
) -> DataFrame:
    """Custom stateful sessionization with PROCESSING-TIME timeout:
    a voter's session closes (and its summary row is emitted) only
    when no vote arrives for `gap_ms` of wall clock (default 30
    minutes) -- the state-TTL pattern for operators session_window
    can't express (emit-on-close, state removed on expiry, bounded
    memory per live voter).

    Timeout semantics are processing-time (GroupStateTimeout), so the
    pytest drives it structurally: state accumulates across batches
    and nothing is emitted while voters stay active.  NOTE for
    bounded harnesses (availableNow soaks): the query keeps running
    until pending processing-time timeouts fire, so drive it with a
    short `gap_ms` there."""
    return (
        votes.groupBy("user_id")
        .applyInPandasWithState(
            _make_update_session(gap_ms),
            outputStructType=SESSION_OUTPUT,
            stateStructType=SESSION_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


FUNNEL_OUTPUT = StructType(
    [
        StructField("voter_id", LongType()),
        StructField("stage", StringType()),
        StructField("stage_ts_us", LongType()),
    ]
)

# stage encoding: 0 = nothing, 1 = viewed, 2 = clicked-after-view,
# 3 = purchased-after-click; *_us timestamps of the qualifying events
FUNNEL_STATE = StructType(
    [
        StructField("stage", LongType()),
        StructField("view_us", LongType()),
        StructField("click_us", LongType()),
    ]
)

_STAGE_NAMES = {1: "viewed", 2: "clicked_after_view", 3: "purchased_after_click"}


def _update_funnel(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    stage, view_us, click_us = state.get if state.exists else (0, None, None)
    advanced = []
    events = []
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        us = pdf["ts"].astype("datetime64[us]").astype("int64").tolist()
        events.extend(zip(us, pdf["event_type"].tolist()))
    # event-time order within the batch; state carries order across
    # batches (a click arriving before any view never advances).
    # Equal-timestamp ties process in funnel order (view, click,
    # purchase) so the at-or-after (>=) semantics match the batch op:
    # a click at exactly the first-view timestamp counts.
    prio = {"view": 0, "click": 1, "purchase": 2}
    for ts_us, etype in sorted(
        events, key=lambda e: (e[0], prio.get(e[1], 3))
    ):
        if stage == 0 and etype == "view":
            stage, view_us = 1, ts_us
            advanced.append((1, ts_us))
        elif stage == 1 and etype == "click" and ts_us >= view_us:
            stage, click_us = 2, ts_us
            advanced.append((2, ts_us))
        elif stage == 2 and etype == "purchase" and ts_us >= click_us:
            stage = 3
            advanced.append((3, ts_us))
    # Only persist state for users actually IN the funnel: writing a
    # (0, None, None) row for every user ever seen would grow state
    # O(all users) with NoTimeout (never evicted), not O(live voters)
    # as documented below.  A user whose events never include a view
    # leaves no state behind.
    if stage > 0 or state.exists:
        state.update((stage, view_us, click_us))
    if advanced:
        yield pd.DataFrame(
            {
                "voter_id": [key[0]] * len(advanced),
                "stage": [_STAGE_NAMES[s] for s, _ in advanced],
                "stage_ts_us": [t for _, t in advanced],
            }
        )


def funnel_tracker(votes: DataFrame) -> DataFrame:
    """Stateful streaming funnel: per-voter view -> click -> purchase
    stage machine over the live vote stream, emitting a row the
    moment a voter ADVANCES a stage -- the real-time twin of batch
    voting.funnel_conversion (which reports the settled totals).

    State per voter is three numbers (stage + two timestamps) --
    O(live voters) total, hash-partitioned; the stage machine only
    moves forward, so a voter's state is touched at most three times
    over their lifetime.  Order correctness: events sort by event
    time within each batch and the carried state enforces order
    ACROSS batches -- a click seen before any view never advances the
    funnel, exactly like the batch op's at-or-after conditions."""
    return (
        votes.groupBy("user_id")
        .applyInPandasWithState(
            _update_funnel,
            outputStructType=FUNNEL_OUTPUT,
            stateStructType=FUNNEL_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


DRIFT_ALARM_OUTPUT = StructType(
    [
        StructField("source", StringType()),
        StructField("event", StringType()),
        StructField("tv", DoubleType()),
        StructField("n_tokens", LongType()),
    ]
)


def _drift_alarm_state_type():
    from pyspark.sql.types import ArrayType

    return StructType(
        [
            StructField("counts", ArrayType(LongType())),
            StructField("n", LongType()),
            StructField("alarmed", LongType()),
        ]
    )


def _make_update_drift_alarm(ref: list[float], threshold: float, clear_factor: float):
    """Closure factory (the session-tracker rule: captured values ship
    in the pickled function; default args change the arity)."""
    import hashlib

    from ..constants import DRIFT_BUCKETS

    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        counts, n, alarmed = (
            state.get if state.exists else ([0] * DRIFT_BUCKETS, 0, 0)
        )
        counts = list(counts)
        for pdf in pdfs:
            for text in pdf["text"]:
                for tok in (text or "").split(" "):
                    if not tok:
                        continue
                    b = (
                        int(hashlib.md5(tok.encode()).hexdigest()[:4], 16)
                        % DRIFT_BUCKETS
                    )
                    counts[b] += 1
                    n += 1
        if n == 0:
            state.update((counts, n, alarmed))
            return
        tv = 0.5 * sum(
            abs(counts[i] / n - ref[i]) for i in range(DRIFT_BUCKETS)
        )
        event = None
        if alarmed == 0 and tv >= threshold:
            alarmed, event = 1, "raise"
        elif alarmed == 1 and tv < threshold * clear_factor:
            alarmed, event = 0, "clear"
        state.update((counts, n, alarmed))
        if event is not None:
            yield pd.DataFrame(
                {
                    "source": [key[0]],
                    "event": [event],
                    "tv": [round(tv, 6)],
                    "n_tokens": [n],
                }
            )

    return _update


def drift_alarm_tracker(
    documents: DataFrame,
    ref: list[float],
    threshold: float,
    clear_factor: float = 0.8,
) -> DataFrame:
    """EDGE-TRIGGERED drift alarm: per source, maintain the cumulative
    DRIFT_BUCKETS token histogram in state and emit a row ONLY when
    the total-variation distance vs the static reference CROSSES the
    threshold -- ``raise`` on the way up, ``clear`` when it falls back
    under threshold * clear_factor (hysteresis, so a source sitting
    on the line doesn't flap).  stream_token_drift is the LEVEL
    monitor (re-emits the current tv every batch a source moves);
    this is the ALERT feed a pager wants -- transition semantics an
    update-mode aggregation cannot express, hence
    applyInPandasWithState.

    State per source: DRIFT_BUCKETS+2 numbers (counts, n, alarm flag)
    -- rate- and vocabulary-independent, the same bound the soak
    pins for stream_token_drift.  The md5 bucket hash matches
    operators.text.token_bucket_counts exactly, so the tv this alarm
    acts on is the one the batch/level monitors report.
    """
    return documents.groupBy("source").applyInPandasWithState(
        _make_update_drift_alarm(ref, threshold, clear_factor),
        outputStructType=DRIFT_ALARM_OUTPUT,
        stateStructType=_drift_alarm_state_type(),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


PACK_OUTPUT = StructType(
    [
        StructField("lang", StringType()),
        StructField("shard", LongType()),
        StructField("docs_packed", LongType()),
        StructField("windows_closed", LongType()),
        StructField("open_fill", LongType()),
    ]
)

PACK_STATE = StructType(
    [
        StructField("docs", LongType()),
        StructField("closed", LongType()),
        StructField("fill", LongType()),
    ]
)


def _update_pack(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    from ..constants import PACK_WINDOW_TOKENS as WIN

    docs, closed, fill = state.get if state.exists else (0, 0, 0)
    batch = []
    for pdf in pdfs:
        batch.extend(zip(pdf["doc_id"].tolist(), pdf["n_tokens"].tolist()))
    # arrival order within a micro-batch is not defined; doc_id order
    # inside the batch is (the documented per-batch contract)
    for _, t in sorted(batch):
        t = min(int(t), WIN)
        if t == 0:
            continue
        if fill + t > WIN:
            closed += 1
            fill = t
        else:
            fill += t
        docs += 1
    state.update((docs, closed, fill))
    yield pd.DataFrame(
        {
            "lang": [key[0]],
            "shard": [int(key[1])],
            "docs_packed": [docs],
            "windows_closed": [closed],
            "open_fill": [fill],
        }
    )


def stream_pack_nextfit(documents: DataFrame) -> DataFrame:
    """ONLINE sequence packing: the streaming training-shard writer.
    Per (lang, shard), one open window lives in state; each arriving
    doc (whole, never split -- the seq_pack_bestfit regime) either
    extends it or closes it and starts the next.  This IS next-fit in
    arrival order -- the only packing discipline an online writer can
    implement (FFD needs the whole set; that is the batch op's job)
    -- so the batch seq_pack_bestfit report's n_windows_nextfit
    column is this pipeline's exact ground truth when arrival order
    is doc_id order (parity pytest-pinned).

    State per key: THREE numbers (docs, closed windows, open fill) --
    rate/corpus-independent, the funnel_tracker bound.  Update mode:
    each batch re-emits the keys it advanced with cumulative layout
    counters; a downstream writer rotates output files on
    windows_closed increments.
    """
    from pyspark.sql import functions as F  # noqa: F401 (doc parity)

    from ..constants import PACK_SHARDS
    from ..functions import tokens

    per_doc = documents.select(
        "doc_id",
        "lang",
        (F.col("doc_id") % PACK_SHARDS).cast("bigint").alias("shard"),
        # greatest(.., 0): size(NULL) is -1 under non-ANSI defaults
        F.greatest(F.size(tokens(F.col("text"))), F.lit(0)).alias("n_tokens"),
    )
    return per_doc.groupBy("lang", "shard").applyInPandasWithState(
        _update_pack,
        outputStructType=PACK_OUTPUT,
        stateStructType=PACK_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
