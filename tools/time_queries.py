"""Isolated per-query timer: fresh session, noop sink, sf0.001 codegen
warmup then N timed reps per query with clearCache between reps -- the
bench harness's exact per-query methodology, for single-operator A/Bs.

Usage: SPARK_GRAFT_SF_DIR=... python3 tools/time_queries.py q1 q2 ... [--reps=N]
Prints one JSON line: {"query": [sec, ...], ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from de_realtime_voting_spark.queries import QUERY_REGISTRY
from de_realtime_voting_spark.session import get_spark


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 2
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    spark = get_spark("time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            force(QUERY_REGISTRY[name](spark, warm))
        except Exception:
            pass
        spark.catalog.clearCache()
    out: dict[str, list[float]] = {}
    for name in names:
        fn = QUERY_REGISTRY[name]
        out[name] = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"time:{name}")
            t0 = time.perf_counter()
            force(fn(spark, sf_dir))
            out[name].append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            spark.catalog.clearCache()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
