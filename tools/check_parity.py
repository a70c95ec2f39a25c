"""Local replica of the driver's t2 correctness gate.

Runs every registry query on Spark and its DuckDB oracle twin at the
given SF dir, then compares row count, column names, dtypes, and an
order-insensitive value hash.  Usage:

    python tools/check_parity.py [sf_dir] [query ...]

Set PARITY_JSON=<path> to also write a machine-readable summary (the
per-round PARITY_r{N}.json artifact committed at round close).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from de_realtime_voting_spark.oracles import SQL
from de_realtime_voting_spark.queries import NO_ORACLE, QUERY_REGISTRY
from de_realtime_voting_spark.session import get_spark
from de_realtime_voting_spark.sources.tables import TABLE_NAMES


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    payload = df.to_csv(index=False, float_format="%.9g").encode()
    return hashlib.sha256(payload).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(QUERY_REGISTRY)

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    spark = get_spark("parity-check")
    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = QUERY_REGISTRY[name](spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name in NO_ORACLE:
            print(f"ok   {name} ({time.time() - t0:.1f}s, {len(sdf)} rows, rows-only: no oracle)")
            continue
        try:
            ddf = con.sql(SQL[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            failures.append(name)
            continue
        s, d = normalize(sdf), normalize(ddf)
        dt = time.time() - t0
        problems = []
        if len(s) != len(d):
            problems.append(f"rows {len(s)} vs {len(d)}")
        if list(s.columns) != list(d.columns):
            problems.append(f"cols {list(s.columns)} vs {list(d.columns)}")
        elif [str(t) for t in s.dtypes] != [str(t) for t in d.dtypes]:
            problems.append(
                f"dtypes {dict(zip(s.columns, map(str, s.dtypes)))} vs "
                f"{dict(zip(d.columns, map(str, d.dtypes)))}"
            )
        if not problems and value_hash(s) != value_hash(d):
            problems.append("value hash mismatch")
            merged = s.compare(d) if s.shape == d.shape else None
            if merged is not None and not merged.empty:
                print(merged.head(5))
        if problems:
            print(f"FAIL {name} ({dt:.1f}s): {'; '.join(problems)}")
            failures.append(name)
        else:
            print(f"ok   {name} ({dt:.1f}s, {len(s)} rows)")
        # persisted blocks are scoped to one query; don't let 86
        # queries' caches accumulate in a single session
        spark.catalog.clearCache()
    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    if failures:
        print("failed:", " ".join(failures))
    json_path = os.environ.get("PARITY_JSON")
    if json_path:
        import json

        with open(json_path, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_queries": len(names),
                    "n_passed": len(names) - len(failures),
                    "failed": failures,
                    "rows_only": sorted(n for n in names if n in NO_ORACLE),
                },
                f,
                indent=1,
            )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
