"""Dump .explain("formatted") output for named registry queries.

Usage:
    python tools/dump_plans.py <out_dir> <suffix> [sf_dir] query [query ...]

Writes <out_dir>/<query>_<suffix>.txt for each query -- the r12
optimization-round evidence files (plans/r12/<query>_before.txt /
_after.txt).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from de_realtime_voting_spark.queries import QUERY_REGISTRY
from de_realtime_voting_spark.session import get_spark


def main() -> int:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    if rest and os.path.isdir(rest[0]):
        sf_dir, names = rest[0], rest[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.01", rest
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERY_REGISTRY[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
        spark.catalog.clearCache()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
