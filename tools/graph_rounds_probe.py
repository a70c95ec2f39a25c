"""Rounds-vs-per-round decomposition of the iterative graph family
(VERDICT r12 items 3/6): run dedup_clusters' min-label loop and
dedup_clusters_bigstar's contraction loop at a given SF with a
timestamp around every phase -- edge materialization (the MinHash
pairs pipeline + checkpoint), label init, each propagation/contraction
round, and the final labels aggregation -- so SCALE.md can say how
much of the query is round COUNT vs per-round cost at scale.

The loops here MIRROR operators/dedup.py's production loops (same
helpers, same round expressions); they exist only to interleave
timers, and any change to the production loop must be mirrored here
or the probe is measuring a stale shape.

Usage: SPARK_GRAFT_SF_DIR=<dir> python tools/graph_rounds_probe.py [clusters|bigstar]
Prints one JSON line per phase.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

from pyspark.sql import functions as F  # noqa: E402

from de_realtime_voting_spark.session import get_spark  # noqa: E402


def probe_clusters(spark, sf_dir: str) -> None:
    from de_realtime_voting_spark.operators.dedup import (
        _lineage_cut,
        dedup_minhash_pairs,
    )
    from de_realtime_voting_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    t0 = time.perf_counter()
    pairs = dedup_minhash_pairs(docs).select("doc_a", "doc_b")
    edges = _lineage_cut(
        pairs.union(
            pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
        )
    )
    print(json.dumps({"phase": "edges_checkpoint", "sec": round(time.perf_counter() - t0, 2)}))
    t0 = time.perf_counter()
    labels = _lineage_cut(
        edges.groupBy(F.col("doc_a").alias("doc_id"))
        .agg(F.min("doc_b").alias("nbr"))
        .select("doc_id", F.least("doc_id", "nbr").alias("label"))
    )
    print(json.dumps({"phase": "init_fold", "sec": round(time.perf_counter() - t0, 2)}))
    max_iter = 20
    for r in range(max_iter - 1):
        t0 = time.perf_counter()
        contrib = edges.join(labels, edges["doc_b"] == labels["doc_id"]).select(
            F.col("doc_a").alias("doc_id"), "label"
        )
        new_labels = _lineage_cut(
            labels.select("doc_id", "label", F.lit(1).alias("own"))
            .unionByName(contrib.select("doc_id", "label", F.lit(0).alias("own")))
            .groupBy("doc_id")
            .agg(
                F.min("label").alias("label"),
                F.max(F.when(F.col("own") == 1, F.col("label"))).alias("old"),
            )
            .select(
                "doc_id",
                "label",
                (F.col("label") < F.col("old")).cast("int").alias("changed"),
            ),
            eager=False,
        )
        labels = new_labels.select("doc_id", "label")
        checked = r == 0 or r % 2 == 1 or r == max_iter - 2
        changed = None
        if checked:
            changed = new_labels.agg(F.sum("changed")).first()[0] or 0
        print(json.dumps({"phase": f"round_{r}", "checked": checked,
                          "changed": changed,
                          "sec": round(time.perf_counter() - t0, 2)}))
        if checked and changed == 0:
            break
    t0 = time.perf_counter()
    n = labels.groupBy("label").count().count()
    print(json.dumps({"phase": "final_agg", "clusters": n,
                      "sec": round(time.perf_counter() - t0, 2)}))


def probe_bigstar(spark, sf_dir: str) -> None:
    from de_realtime_voting_spark.operators.dedup import (
        _lineage_cut,
        dedup_minhash_pairs,
    )
    from de_realtime_voting_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    t0 = time.perf_counter()
    pairs = dedup_minhash_pairs(docs).select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    )
    edges = _lineage_cut(
        pairs.union(pairs.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    print(json.dumps({"phase": "edges_checkpoint", "sec": round(time.perf_counter() - t0, 2)}))
    fingerprint = None
    for i in range(30):
        t0 = time.perf_counter()
        m = edges.groupBy("u").agg(F.min("v").alias("mv")).select(
            "u", F.least("u", "mv").alias("m")
        )
        large = (
            edges.where(F.col("v") > F.col("u"))
            .join(m, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .union(m.select(F.col("u"), F.col("m").alias("v")).where(F.col("u") != F.col("m")))
        )
        sym = large.union(large.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m2 = sym.groupBy("u").agg(F.min("v").alias("mv")).select(
            "u", F.least("u", "mv").alias("m")
        )
        small = (
            sym.where(F.col("v") < F.col("u"))
            .join(m2, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(m2.select(F.col("u"), F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
        )
        new_edges = _lineage_cut(
            small.union(small.select(F.col("v").alias("u"), F.col("u").alias("v")))
            .distinct(),
            eager=False,
        )
        row = new_edges.agg(
            F.count(F.lit(1)).alias("n"), F.bit_xor(F.xxhash64("u", "v")).alias("chk")
        ).first()
        edges = new_edges
        new_fingerprint = (row["n"], row["chk"])
        stable = new_fingerprint == fingerprint
        print(json.dumps({"phase": f"round_{i}", "n_edges": row["n"],
                          "stable": stable,
                          "sec": round(time.perf_counter() - t0, 2)}))
        if stable:
            break
        fingerprint = new_fingerprint


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "clusters"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("graph-rounds-probe")
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps({"probe": which, "sf_dir": sf_dir}))
    if which == "bigstar":
        probe_bigstar(spark, sf_dir)
    else:
        probe_clusters(spark, sf_dir)


if __name__ == "__main__":
    main()
