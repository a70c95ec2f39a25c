"""Full-option curation run at scale (sf1 = 10x the driver's largest
SF by default; pass a .scaledata dir name, e.g. ``sf10``, for the
100x pass -> CURATE_SF10.json).

The sf0.1 pytest gate (tests/test_curate.py) pins the manifest <->
waterfall identity per stage; this tool runs the ENTIRE option set at
once (C4 gates + exact dedup + exact decontam + fuzzy decontam +
learned quality threshold + DSIR sampling + span excision +
temperature sampling + split + FFD packing + epoch-shuffle key) at
scale and asserts the token-conservation identity that must hold
regardless of which docs the selection stages keep:

    sum(manifest partition approx_tokens) + n_tokens_excised
        == sum(size(tokens(text))) over the SHIPPED doc_ids
           evaluated on the ORIGINAL (pre-excision) corpus

It holds exactly because the excised delta is accounted over shipped
docs only and tokens() re-tokenizes the join-spaced kept stream to
exactly the kept array (the same argument as the sf0.1 gate, now under
every stage simultaneously and one decade more data).

r9 note: with the learned stages on, n_tokens_excised can legitimately
be 0 -- at sf1 every excision-eligible survivor of the dedup chain
scores BELOW the median quality bar (measured: 195/195), i.e. the
repeated-span docs are exactly the boilerplate the classifier drops
first, the dup_quality_report interaction acting in the materializer.
The identity is stage-order-independent either way.

Writes CURATE_SF1.json at the repo root: the manifest (wall_s,
written_bytes, per-partition token rows, temperature table) plus the
identity check, so the run is a pinned artifact, not a claim.

With --pack on, the report also pins the loader-layout invariant:
max_window_tokens_used <= PACK_WINDOW_TOKENS over every written
window (a violation would mean the written layout diverged from the
FFD rule the #47n report audits).

Usage:  python tools/curate_sf1.py [sfN]
        (needs .scaledata/sfN -- tools/make_sf1.py [--copies 100])
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

from pyspark.sql import functions as F  # noqa: E402

from de_realtime_voting_spark.curate import curate_corpus  # noqa: E402
from de_realtime_voting_spark.functions.columns import tokens  # noqa: E402
from de_realtime_voting_spark.session import get_spark  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    name = sys.argv[1] if len(sys.argv) > 1 else "sf1"
    # validate the sfN argument BEFORE deriving anything from it
    # (ADVICE r10: a malformed arg like 'sf1x' or a stray flag used to
    # die in float() with no usage hint)
    import re

    m = re.fullmatch(r"sf(\d+(?:\.\d+)?)?", name)
    if not m:
        raise SystemExit(
            f"bad scale argument {name!r}: expected sfN "
            "(e.g. sf1, sf10, sf0.1) -- usage: python tools/curate_sf1.py [sfN]"
        )
    sf_val = float(m.group(1) or "1")
    sf_dir = os.path.join(_REPO, ".scaledata", name)
    dest = os.path.join(_REPO, f"CURATE_{name.upper()}.json")
    if not os.path.isdir(sf_dir):
        raise SystemExit(
            f"missing .scaledata/{name} -- run tools/make_sf1.py first"
        )
    spark = get_spark(f"curate-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    # the learned filter's bar: the corpus-median published prob (the
    # QC_ITERS=3 model separates narrowly -- ~1e-3 wide around 0.3526
    # -- so an absolute constant like 0.5 would ship nothing; a real
    # deployment picks the bar off the score distribution exactly like
    # this, then freezes it)
    from de_realtime_voting_spark.operators.text import (  # noqa: E402
        quality_classifier_score,
    )

    q_bar = (
        quality_classifier_score(docs)
        .agg(F.expr("percentile(quality_prob, 0.5)"))
        .collect()[0][0]
    )
    spark.catalog.clearCache()

    out = tempfile.mkdtemp(prefix=f"curated_{name}_")
    try:
        manifest = curate_corpus(
            docs,
            out,
            drop_contaminated=True,
            fuzzy_gate=True,
            excise_spans=True,
            temperature_sample=True,
            quality_threshold=q_bar,
            dsir_sample=True,
            pack=True,
            epoch_shuffle=1,
        )
        written_tokens = sum(p["approx_tokens"] for p in manifest["partitions"])
        excised = manifest["n_tokens_excised"]

        # pre-excision token mass of the shipped doc set, evaluated on
        # the ORIGINAL corpus (shipped ids joined back against docs)
        shipped_ids = spark.read.parquet(out).select("doc_id")
        pre_tokens = (
            docs.join(shipped_ids, "doc_id")
            .agg(F.sum(F.size(tokens(F.col("text")))).cast("bigint"))
            .collect()[0][0]
        )
        identity_holds = written_tokens + excised == pre_tokens
        from de_realtime_voting_spark.constants import (  # noqa: E402
            PACK_WINDOW_TOKENS,
        )

        pack_ok = (
            manifest["pack"]["max_window_tokens_used"] <= PACK_WINDOW_TOKENS
        )

        report = {
            "sf": sf_val,
            "stages": manifest["stages"],
            "drop_contaminated": manifest["drop_contaminated"],
            "n_input_docs": manifest["n_input_docs"],
            "n_written_docs": manifest["n_written_docs"],
            "written_bytes": manifest["written_bytes"],
            "wall_s": manifest["wall_s"],
            "written_tokens": int(written_tokens),
            "n_tokens_excised": int(excised),
            "pre_excision_tokens_of_shipped": int(pre_tokens),
            "token_conservation_holds": bool(identity_holds),
            "n_partitions": len(manifest["partitions"]),
            "temperature": manifest.get("temperature"),
            "quality": manifest.get("quality"),
            "dsir": manifest.get("dsir"),
            "pack": manifest.get("pack"),
            "pack_capacity_holds": bool(pack_ok),
            "epoch_shuffle": manifest.get("epoch_shuffle"),
        }
        with open(dest, "w") as f:
            json.dump(report, f, indent=1)
        print(json.dumps(report, indent=1))
        if not identity_holds:
            raise SystemExit(
                f"token conservation FAILED: {written_tokens} + {excised} "
                f"!= {pre_tokens}"
            )
        if not pack_ok:
            raise SystemExit(
                f"pack capacity FAILED: max used "
                f"{manifest['pack']['max_window_tokens_used']} > "
                f"{PACK_WINDOW_TOKENS}"
            )
    finally:
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
