"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``de_realtime_voting_spark`` (SURVEY.md §2
is the inventory; queries.py is the registry; oracles.py the SQL
twins).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from de_realtime_voting_spark.oracles import SQL as _ORACLE_SQL
from de_realtime_voting_spark.queries import NO_ORACLE, QUERY_REGISTRY
from de_realtime_voting_spark.session import apply_session_tuning


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: votes-per-candidate tally (the reference's
    headline streaming aggregation, spark-streaming.py:75-76) on
    /root/testdata/sf0.001."""
    apply_session_tuning(spark)
    return QUERY_REGISTRY["votes_per_candidate"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_session_tuning(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in QUERY_REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query."""
    return {
        name: _ORACLE_SQL[name]
        for name in QUERY_REGISTRY
        if name not in NO_ORACLE and name in _ORACLE_SQL
    }
