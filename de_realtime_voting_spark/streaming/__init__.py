from .pipelines import (
    VOTE_SCHEMA,
    parse_vote_stream,
    repeat_vote_pairs,
    stream_dedup_exact,
    stream_doc_quality,
    stream_repeat_vote_pairs,
    stream_one_vote_per_voter,
    stream_turnout_by_location,
    stream_votes_per_candidate,
    stream_votes_per_candidate_hourly,
    stream_votes_sessionized,
    watermark_votes,
)
from .sinks import (
    foreach_batch_upsert,
    kafka_sink,
    kafka_source,
    socket_source,
    to_kafka_frame,
)
from .state import running_tally, voter_sessions_with_timeout

__all__ = [
    "VOTE_SCHEMA",
    "parse_vote_stream",
    "repeat_vote_pairs",
    "stream_dedup_exact",
    "stream_one_vote_per_voter",
    "stream_repeat_vote_pairs",
    "stream_turnout_by_location",
    "stream_votes_per_candidate",
    "stream_votes_per_candidate_hourly",
    "stream_votes_sessionized",
    "watermark_votes",
    "foreach_batch_upsert",
    "kafka_sink",
    "kafka_source",
    "socket_source",
    "to_kafka_frame",
    "running_tally",
    "voter_sessions_with_timeout",
]
