"""Benchmark harness: runs every registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value" (total sec), "unit", "queries":
{name: sec}, "sf"}.

Execution is forced with the noop sink (full pipeline runs, nothing
shipped to the driver) so timings measure the engine, not result
transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from de_realtime_voting_spark.queries import QUERY_REGISTRY
from de_realtime_voting_spark.session import get_spark


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup on the smallest SF so per-query numbers
    # measure steady-state execution
    warm = "/root/testdata/sf0.001"
    for name in ("votes_per_candidate", "q1_pricing_summary"):
        force(QUERY_REGISTRY[name](spark, warm))

    timings: dict[str, float] = {}
    for name, fn in QUERY_REGISTRY.items():
        t0 = time.perf_counter()
        force(fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    print(
        json.dumps(
            {
                "metric": f"total wall-clock over all {len(timings)} registry queries (noop sink)",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
