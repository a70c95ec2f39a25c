"""Merge chunked sf1 bench runs into the committed BENCH_SF1.json.

The sf1 (10x) full-registry pass exceeds a single background-task
window, so it runs as SPARK_GRAFT_QUERIES chunks, each writing its
own SPARK_GRAFT_DETAIL file; this stitches them back into one
artifact with provenance (commit, date, chunk totals).

Usage: python tools/merge_bench_sf1.py chunk1.json chunk2.json ...
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    chunks = sys.argv[1:]
    if not chunks:
        raise SystemExit("usage: merge_bench_sf1.py chunk.json ...")
    queries: dict[str, float] = {}
    for path in chunks:
        with open(path) as f:
            part = json.load(f)
        dup = set(part["queries"]) & set(queries)
        if dup:
            raise SystemExit(f"query timed in two chunks: {sorted(dup)[:5]}")
        queries.update(part["queries"])
    commit = subprocess.run(
        ["git", "-C", _REPO, "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True,
    ).stdout.strip()
    out = {
        "metric": (
            f"total wall-clock over all {len(queries)} registry queries "
            f"(noop sink), sf1 = 10x sf0.1 (tools/make_sf1.py)"
        ),
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": dict(sorted(queries.items())),
        "sf": 1.0,
        "provenance": {
            "commit": commit,
            "n_chunks": len(chunks),
            "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
            "note": (
                "run chunked (SPARK_GRAFT_QUERIES) on idle local[32]; "
                "chunks are sequential, never concurrent"
            ),
        },
    }
    dest = os.path.join(_REPO, "BENCH_SF1.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"n": len(queries), "total_sec": out["value"],
                      "dest": dest}))


if __name__ == "__main__":
    main()
