"""The materializing curation pipeline: quality gates -> exact dedup
-> benchmark decontamination -> deterministic split -> partitioned
parquet, plus a machine-readable manifest.  This is the "actually
ship the training corpus" entry point; the registry queries are the
audits AROUND this step, and both sides share one definition of every
rule (operators/pipeline.py::curation_tags, decontam_overlap), so the
accounting can never drift from the bytes written.

Reference parity note: the reference persists its curated facts to
Postgres (main.py:20-68); here the lake is partitioned parquet --
the Spark-native warehouse surface -- with the JDBC writer
(sources/io.py) available when a Postgres target exists.

Scale shape: every rule is the same map-side expression / single
shuffle the audited queries use; the write itself partitions by
(split, lang) so downstream training readers prune to their split
without scanning the rest.  Nothing in this module collects corpus
data to the driver -- the manifest aggregates |splits| x |langs|
rows.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.pipeline import curation_tags, decontam_overlap


def curate_corpus(
    documents: DataFrame,
    out_dir: str,
    drop_contaminated: bool = True,
) -> dict:
    """Run the full curation chain over ``documents`` and write the
    surviving corpus to ``out_dir`` partitioned by (split, lang).

    Keep rule: passes the C4 gates AND is the canonical copy of its
    exact-dup class AND (optionally) shares no word n-gram with the
    held-out eval source -- eval docs themselves never ship.
    Idempotent: overwrite mode, deterministic hash split, so re-runs
    produce byte-equivalent partitions.  Returns the manifest dict
    (also written as _MANIFEST.json beside the data).
    """
    tags = curation_tags(documents)
    keep = tags.where(F.col("kept")).select("doc_id", "split")
    if drop_contaminated:
        _toks, hits = decontam_overlap(documents)
        keep = keep.join(hits.select("doc_id"), "doc_id", "left_anti")
        # the eval source never ships: its docs exist to be held out
        from .constants import EVAL_SOURCE

        keep = keep.join(
            documents.where(F.col("source") == EVAL_SOURCE).select("doc_id"),
            "doc_id",
            "left_anti",
        )
    curated = documents.join(keep, "doc_id")
    curated.write.partitionBy("split", "lang").mode("overwrite").parquet(out_dir)

    # manifest from the WRITTEN data (not the plan): what a training
    # job reads is what gets accounted
    written = documents.sparkSession.read.parquet(out_dir)
    from .functions.columns import tokens

    per_part = (
        written.groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            # the SAME tokens() definition as every audit query, so
            # manifest totals are comparable to the waterfall's
            # stage rows token-for-token (cross-artifact pytest)
            F.sum(F.size(tokens(F.col("text")))).cast("bigint").alias(
                "approx_tokens"
            ),
        )
        .collect()
    )
    manifest = {
        "out_dir": out_dir,
        "n_input_docs": documents.count(),
        "n_written_docs": written.count(),
        "drop_contaminated": drop_contaminated,
        "partitions": sorted(
            (
                {
                    "split": r["split"],
                    "lang": r["lang"],
                    "n_docs": r["n_docs"],
                    "approx_tokens": r["approx_tokens"],
                }
                for r in per_part
            ),
            key=lambda d: (d["split"], d["lang"]),
        ),
    }
    with open(os.path.join(out_dir, "_MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest
