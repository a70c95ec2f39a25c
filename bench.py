"""Benchmark harness: runs every registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output layout is capture-aware: the harness that records this run
keeps only the LAST ~2 KB of stdout, so the full per-query dump goes
FIRST (and to BENCH_DETAIL.json beside this script), and the final
stdout line is a compact (<1.5 KB) JSON summary -- total seconds, sf,
and the slowest queries -- guaranteed to survive tail capture intact.

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

    # JVM/codegen warmup: run EVERY query once at the smallest SF so
    # the timed pass measures steady-state execution, not janino
    # compilation of each query's generated code (the wide hash-agg
    # shapes pay multi-second one-time compiles; the codegen cache is
    # keyed on generated source, which is data-size independent).
    warm = "/root/testdata/sf0.001"
    for name, fn in QUERY_REGISTRY.items():
        try:
            force(fn(spark, warm))
        except Exception:
            pass  # a warmup failure surfaces in the timed pass
        spark.catalog.clearCache()

    timings: dict[str, float] = {}
    for name, fn in QUERY_REGISTRY.items():
        t0 = time.perf_counter()
        force(fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)
        # cached blocks (persist() inside multi-use plans) are scoped
        # to one query; drop them so 86 queries don't accumulate
        spark.catalog.clearCache()

    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    full = {
        "metric": f"total wall-clock over all {len(timings)} registry queries (noop sink)",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
    with open(detail_path, "w") as f:
        json.dump(full, f, indent=1)
    # full dump first (humans / generous captures) ...
    print(json.dumps(full))
    # ... compact summary LAST: slowest queries only, keeps the line
    # well under the ~2 KB stdout tail window
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:20])
    print(
        json.dumps(
            {
                "metric": full["metric"],
                "value": full["value"],
                "unit": "sec",
                "sf": sf_val,
                "n_queries": len(timings),
                "queries": {k: round(v, 2) for k, v in slowest.items()},
                "detail": "BENCH_DETAIL.json",
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
