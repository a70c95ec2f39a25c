"""Skew-handling helpers.

First line of defense is AQE (`spark.sql.adaptive.skewJoin.enabled`,
on in session.py), which splits oversized shuffle partitions at
runtime.  Manual salting remains the tool when a *specific* hot key
is known in advance (a celebrity candidate, an empty-string doc) and
the join must never materialize that key in one task -- salting
spreads each key over SALT_N sub-keys at the cost of replicating the
other side SALT_N times, so reserve it for joins whose build side is
small enough to replicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_N = 8


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    skewed_key: str,
    other_key: str,
    salt_source: str,
    n_salts: int = SALT_N,
    how: str = "inner",
) -> DataFrame:
    """Join a skew-prone fact against `other`, spreading every fact
    key over `n_salts` shuffle sub-keys.

    The fact side salts deterministically from an existing unique-ish
    column (`salt_source`, e.g. the event id) -- no rand(), so the
    plan stays re-executable and speculative tasks agree.  The other
    side is replicated once per salt with a generated column, then
    the join runs on (key, salt): a key that previously landed in one
    reducer now lands in n_salts of them.

    Result is row-identical to the unsalted join (the salt columns
    are dropped); `tests/test_functions.py` asserts it.

    Only inner/left-style joins are legal: the replicated side's
    unmatched rows exist once PER SALT, so right/full outer would
    emit each unmatched `other` row n_salts times.
    """
    if how.replace("_", "").lower() not in {
        "inner", "left", "leftouter", "leftsemi", "semi", "leftanti", "anti", "cross",
    }:
        raise ValueError(
            f"salted_join: how={how!r} is not salt-safe -- the build side is "
            f"replicated {n_salts}x, so right/full outer joins would emit "
            f"unmatched build rows once per salt. Use inner/left variants."
        )
    salted_fact = skewed.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_source)), F.lit(n_salts))
    )
    replicated = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(n_salts)]))
    )
    joined = salted_fact.join(
        replicated,
        (salted_fact[skewed_key] == replicated[other_key])
        & (salted_fact["_salt"] == replicated["_salt"]),
        how,
    )
    return joined.drop("_salt")
