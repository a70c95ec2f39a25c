"""Command-line surface: list, run, or explain any registry query,
or materialize the curated corpus.

    python -m de_realtime_voting_spark list
    python -m de_realtime_voting_spark run votes_per_candidate
    python -m de_realtime_voting_spark explain q1_pricing_summary
    python -m de_realtime_voting_spark curate /tmp/curated

The reference exposes runnable entry points (main.py, voting.py,
spark-streaming.py); this is the engine's equivalent front door.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="de_realtime_voting_spark")
    p.add_argument(
        "--sf-dir",
        default="/root/testdata/sf0.01",
        help="input table directory (parquet star schema)",
    )
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list registry queries")
    run_p = sub.add_parser("run", help="run a query and show rows")
    run_p.add_argument("query")
    run_p.add_argument("-n", type=int, default=20, help="rows to show")
    exp_p = sub.add_parser("explain", help="formatted physical plan")
    exp_p.add_argument("query")
    cur_p = sub.add_parser("curate", help="materialize the curated corpus")
    cur_p.add_argument("out_dir")
    cur_p.add_argument(
        "--keep-contaminated",
        action="store_true",
        help="skip the benchmark-decontamination drop",
    )
    cur_p.add_argument(
        "--fuzzy-gate",
        action="store_true",
        help="also drop docs MinHash-near an eval doc",
    )
    cur_p.add_argument(
        "--excise-spans",
        action="store_true",
        help="cut cross-doc repeated spans from shipped text",
    )
    cur_p.add_argument(
        "--temperature-sample",
        action="store_true",
        help="deterministic temperature-mix downsampling",
    )
    cur_p.add_argument(
        "--quality-threshold",
        type=float,
        default=None,
        metavar="P",
        help="train the learned quality filter and ship only docs "
        "with quality_prob >= P",
    )
    cur_p.add_argument(
        "--dsir-sample",
        action="store_true",
        help="DSIR importance-resampling selection",
    )
    cur_p.add_argument(
        "--pack",
        action="store_true",
        help="write FFD whole-doc (pack_shard, pack_window) columns",
    )
    cur_p.add_argument(
        "--epoch-shuffle",
        type=int,
        default=None,
        metavar="SEED",
        help="write the seeded epoch-shuffle sort key as a column",
    )
    args = p.parse_args(argv)

    from .queries import NO_ORACLE, QUERY_REGISTRY

    if args.cmd == "list":
        for name in QUERY_REGISTRY:
            tag = " (rows-only: no oracle)" if name in NO_ORACLE else ""
            print(f"{name}{tag}")
        return 0

    from .session import get_spark

    spark = get_spark("cli")
    spark.sparkContext.setLogLevel("ERROR")
    if args.cmd in ("run", "explain"):
        if args.query not in QUERY_REGISTRY:
            print(f"unknown query: {args.query}", file=sys.stderr)
            return 2
        df = QUERY_REGISTRY[args.query](spark, args.sf_dir)
        if args.cmd == "run":
            df.show(args.n, truncate=False)
        else:
            df.explain("formatted")
        return 0
    if args.cmd == "curate":
        from .curate import curate_corpus
        from .sources import load_table

        docs = load_table(spark, args.sf_dir, "documents")
        manifest = curate_corpus(
            docs,
            args.out_dir,
            drop_contaminated=not args.keep_contaminated,
            fuzzy_gate=args.fuzzy_gate,
            excise_spans=args.excise_spans,
            temperature_sample=args.temperature_sample,
            quality_threshold=args.quality_threshold,
            dsir_sample=args.dsir_sample,
            pack=args.pack,
            epoch_shuffle=args.epoch_shuffle,
        )
        print(json.dumps(manifest, indent=1))
        return 0
    return 2  # pragma: no cover


if __name__ == "__main__":
    raise SystemExit(main())
