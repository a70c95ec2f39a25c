"""Empirical scaling probe: run the heavy operator families at every
available scale factor and report the growth exponent of wall-clock
vs input scale (alpha in t ~ sf^alpha, least-squares over log-log).

alpha ~ 1 means linear scaling (the 100 TB requirement for scan-bound
ops); alpha >> 1 flags a shape whose cost curve will not survive a
scale-up (quadratic pairing, unbounded windows).  Constant-dominated
ops at toy SFs show alpha ~ 0 (fixed overhead hides the data term),
so read LOW alphas as "overhead-bound here", not "free at scale".

Usage:
    python tools/scale_probe.py [query ...]   # default: heavy families
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# sf1 broadcast builds need more heap than the GC-friendly 8g the
# bench default uses (see session.py); must be set before JVM launch
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

from de_realtime_voting_spark.queries import QUERY_REGISTRY
from de_realtime_voting_spark.session import get_spark

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SF1_DIR = os.path.join(_REPO, ".scaledata", "sf1")
_SF10_DIR = os.path.join(_REPO, ".scaledata", "sf10")


def sf_dir(sf: float) -> str:
    """Driver-shipped SFs live under /root/testdata; the 10x/100x
    probe points (tools/make_sf1.py [--copies 100]) live in the repo."""
    if sf == 1.0:
        return _SF1_DIR
    if sf == 10.0:
        return _SF10_DIR
    return f"/root/testdata/sf{sf}"


# include the sf1/sf10 points when the generated datasets exist -- at
# the driver SFs alone most heavy ops are overhead-bound and alpha
# only proves the absence of blow-ups; the 10x point makes it
# meaningful and the 100x point (opt-in via SPARK_GRAFT_SF10=1; it
# multiplies probe wall-clock ~4-8x) extends the frontier a decade
SFS = (
    [0.001, 0.01, 0.1]
    + ([1.0] if os.path.isdir(_SF1_DIR) else [])
    + (
        [10.0]
        if os.path.isdir(_SF10_DIR) and os.environ.get("SPARK_GRAFT_SF10") == "1"
        else []
    )
)

# the ops whose scale shape matters most: dedup pairing, clustering,
# ANN, span/gram machinery, and the widest voting aggregations
DEFAULT = [
    "dedup_exact",
    "dedup_minhash_pairs",
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_scaled",
    "dedup_clusters",
    "dedup_clusters_bigstar",
    "dedup_embedding_cosine",
    "dedup_incremental",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "embedding_kmeans_iter",
    "repeated_ngram_spans",
    "benchmark_decontam",
    "corpus_quality_keep",
    "tfidf_top_terms",
    "votes_enriched",
    "voter_value_quartiles",
    "q5_regional_revenue",
    "unigram_logprob_score",
    "embedding_quantization_stats",
    "doc_length_percentile_filter",
    "ann_pq_topk",
    "ngram_containment",
    "source_url_dedup",
    "doc_chunk_windows",
    "minhash_jaccard_estimate",
    "voter_retention_cohort",
    "embedding_label_cohesion",
    # round-4 additions with pairing/join cost terms worth probing
    "semantic_dedup",
    "ann_recall_report",
    "q9_product_profit",
    "hot_key_join_salted",
    "segment_dedup",
    "dedup_threshold_sweep",
    "doc_winnowing_fingerprints",
    "doc_length_mad_outliers",
    "source_temperature_weights",
    "near_dup_pagerank",
    "doc_embed_inference",
    # round-4 session-2 additions with join/fold cost terms
    "bigram_logprob_score",
    "near_dup_triangles",
    "text_entropy_score",
    "domain_quality_topk",
    "voter_stickiness",
    "event_transition_matrix",
    # round-4 session-4 additions: selection/decontam/tokenizer ops
    "token_budget_select",
    "bloom_decontam",
    "bpe_train_merges",
    "bpe_fertility_stats",
    "dedup_soft_weights",
    "contam_span_report",
    "curation_waterfall",
    "ivf_cell_balance",
    "dedup_sorted_neighborhood",
    "token_heavy_hitters_cms",
    "ann_pq_rerank_topk",
    "source_capped_selection",
]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def fit_alpha(points: list[tuple[float, float]]) -> float:
    """Least-squares slope of log(t) vs log(sf)."""
    xs = [math.log10(sf) for sf, _ in points]
    ys = [math.log10(t) for _, t in points]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    denom = sum((x - mx) ** 2 for x in xs)
    return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    # Long single-session probe runs accumulate finished queries'
    # localCheckpoint blocks until a JVM GC frees them (the sf100
    # bpe task-OOM chain); opt in to the tight ContextCleaner GC
    # interval here -- bench sessions keep Spark's default.
    os.environ.setdefault("SPARK_GRAFT_PERIODIC_GC", "60s")
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # codegen warmup at the smallest SF so timings exclude compiles
    for name in names:
        force(QUERY_REGISTRY[name](spark, sf_dir(SFS[0])))
        spark.catalog.clearCache()

    rows = []
    for name in names:
        points = []
        for sf in SFS:
            best = math.inf
            for _ in range(2):  # best-of-2 damps scheduler noise
                t0 = time.perf_counter()
                force(QUERY_REGISTRY[name](spark, sf_dir(sf)))
                best = min(best, time.perf_counter() - t0)
                spark.catalog.clearCache()
            points.append((sf, best))
        alpha = fit_alpha(points)
        rows.append(
            {
                "query": name,
                "alpha": round(alpha, 2),
                **{f"t_sf{sf}": round(t, 2) for sf, t in points},
            }
        )
        print(json.dumps(rows[-1]))
    print(json.dumps({"n": len(rows), "max_alpha": max(r["alpha"] for r in rows)}))


if __name__ == "__main__":
    main()
