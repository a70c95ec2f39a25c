"""A/B the sequential vs batched BPE trainer at real merge counts.

The shipped queries run BPE_MERGE_STEPS=6 merges, where the per-merge
driver round-trip is invisible; a production tokenizer run is 10^4-10^5
merges, where the per-merge recount + rewrite dominates.  This measures
both trainers at larger merge counts on a real SF dir and prints one
JSON line per cell -- the PLANS.md evidence for keeping (or not
keeping) each variant.

Also reports tokenizer-quality drift of the batched approximation:
corpus symbol count after applying each trainer's final vocab (lower =
better compression; equal merges => equal count).

Usage: python tools/bpe_ab.py [sf_dir] [n_merges ...]
Env:   SPARK_GRAFT_BPE_BATCHES=3,8,16  -- batch widths for the
       batched arm (default: the shipped constants.BPE_BATCH), so
       production-depth runs can tune the width in one sweep.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from de_realtime_voting_spark.operators.text import (
    _bpe_train,
    _bpe_train_batched,
)
from de_realtime_voting_spark.session import get_spark
from de_realtime_voting_spark.sources.tables import load_table


def corpus_symbols(vocab) -> int:
    """Total post-merge symbol count over the corpus (freq-weighted):
    the compression number a tokenizer eval quotes."""
    return vocab.select(
        F.sum(F.col("freq") * F.size("syms")).alias("s")
    ).collect()[0]["s"]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    merge_counts = [int(a) for a in sys.argv[2:]] or [6, 24, 48]
    batches = [
        int(b)
        for b in os.environ.get("SPARK_GRAFT_BPE_BATCHES", "").split(",")
        if b.strip()
    ] or [None]  # None = the shipped constants.BPE_BATCH
    spark = get_spark()
    docs = load_table(spark, sf_dir, "documents")
    skip_seq = os.environ.get("SPARK_GRAFT_BPE_SKIP_SEQ") == "1"
    for n in merge_counts:
        arms = (
            []
            if skip_seq
            else [("sequential", lambda d, k: _bpe_train(d, n_merges=k), None)]
        )
        for b in batches:
            arms.append(
                (
                    "batched" if b is None else f"batched_b{b}",
                    lambda d, k, b=b: _bpe_train_batched(d, n_merges=k, batch=b),
                    b,
                )
            )
        for name, fn, b in arms:
            t0 = time.time()
            merges, vocab = fn(docs, n)
            syms = corpus_symbols(vocab)
            dt = time.time() - t0
            print(json.dumps({
                "trainer": name,
                "n_merges_requested": n,
                "n_merges_learned": len(merges),
                "sec": round(dt, 2),
                "corpus_symbols": int(syms),
                "sf_dir": sf_dir,
            }), flush=True)
            spark.catalog.clearCache()


if __name__ == "__main__":
    main()
