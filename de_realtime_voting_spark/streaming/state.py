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
