"""Shared constants used by BOTH the Spark operators and the DuckDB
oracle SQL (de_realtime_voting_spark.oracles).

Everything here must be computable identically in Spark SQL and
DuckDB SQL; keeping one source of truth prevents Spark/oracle drift.
"""

from __future__ import annotations

# --- voting domain -------------------------------------------------
# The reference's three parties (reference main.py:15). Candidates in
# our mapped domain are the 5 event types; party assignment follows
# the reference's round-robin ``PARTIES[i % total_parties]``
# (reference main.py:81) over the sorted candidate list.
PARTIES = ["Management Party", "Savior Party", "Tech Republic Party"]
CANDIDATES = ["click", "error", "purchase", "signup", "view"]  # sorted
CANDIDATE_PARTY = {c: PARTIES[i % len(PARTIES)] for i, c in enumerate(CANDIDATES)}

# --- text / dedup --------------------------------------------------
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]
SHINGLE_K = 3          # word-shingle width for MinHash / fingerprints
MINHASH_SIGS = 8       # number of md5-permutation signatures
MINHASH_BAND_ROWS = 2  # rows per LSH band -> 4 bands
JACCARD_THRESHOLD = 0.8
SIMHASH_BITS = 16      # bits taken from the first 4 hex chars of md5

# --- embeddings ----------------------------------------------------
EMBEDDING_DIM = 64
COSINE_THRESHOLD = 0.30   # near-dup threshold (synthetic data tops out ~0.4)
ANN_QUERY_IDS = list(range(10))
ANN_K = 5
LSH_NUM_PLANES = 6        # 64 hyperplane buckets


def lsh_plane_weight(p: int, i: int) -> float:
    """Deterministic pseudo-random hyperplane weight in [-1, 1).

    Pure integer arithmetic below 2**53 so Python, Spark SQL and
    DuckDB all evaluate it exactly; the float literals are embedded in
    both dialects from here.
    """
    return ((1 + p * EMBEDDING_DIM + i) * 2654435761 % 2000) / 1000.0 - 1.0


LSH_PLANES = [
    [lsh_plane_weight(p, i) for i in range(EMBEDDING_DIM)]
    for p in range(LSH_NUM_PLANES)
]
