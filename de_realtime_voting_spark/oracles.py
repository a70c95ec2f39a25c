"""DuckDB oracle SQL for every query in queries.QUERY_REGISTRY.

Each statement mirrors the Spark implementation exactly -- same
aliases, same arithmetic order, same constants (imported from
constants.py, the single source of truth) -- so integer ratios are
bit-identical and double expressions agree to the last ulp wherever
both engines evaluate the same fold order.
"""

from __future__ import annotations

from .constants import (
    FUZZY_DECONTAM_THRESHOLD,
    ANN_K,
    MAD_OUTLIER_K,
    THRESHOLD_SWEEP_BINS,
    WINNOW_K,
    WINNOW_W,
    C4_MIN_TOKENS,
    C4_WORD_LEN_MAX,
    C4_WORD_LEN_MIN,
    NORM_OUTLIER_Z,
    Q2_MIN_SIZE,
    Q2_PART_TYPE,
    Q2_REGION,
    Q2_TOP_N,
    Q11_FRACTION,
    Q11_REGION,
    Q9_NAME_TOKEN,
    Q20_NAME_PREFIX,
    Q20_YEAR_END,
    Q20_YEAR_START,
    Q21_LATE_DAYS,
    Q21_TOP_N,
    SIMHASH_HAM_MAX,
    TFIDF_TOP_K,
    ANN_QUERY_IDS,
    BPE_TOKEN_RE,
    CANDIDATE_PARTY,
    CHAR_NGRAM_K,
    COSINE_THRESHOLD,
    DECONTAM_NGRAM_K,
    EDIT_REL_THRESHOLD,
    ELECTION_EARLY_END,
    ELECTION_LATE_START,
    EMBEDDING_DIM,
    EVAL_SOURCE,
    PACK_SHARDS,
    PACK_WINDOW_TOKENS,
    SPLIT_TEST_PCT,
    SPLIT_VAL_PCT,
    IVF_CENTROID_IDS,
    IVF_NPROBE,
    IVF_RETRAIN_ITERS,
    IVF_RETRAIN_ROUND,
    JACCARD_THRESHOLD,
    SIM_TOPK_K,
    EMB_COS_BLOCK_BUDGET,
    LSH_EXTRA_PLANES,
    LSH_PLANES,
    MEDIA_CHUNK_BYTES,
    MINHASH_BAND_ROWS,
    MINHASH_SIGS,
    NGRAM_JACCARD_THRESHOLD,
    NGRAM_LEN_BUCKET,
    PII_EMAIL_RE,
    PII_PHONE_RE,
    REP_DUP_BIGRAM_MAX,
    SAMPLE_RATE_DEFAULT_PCT,
    SAMPLE_RATE_PCT,
    SIMHASH_BAND_BITS,
    SIMHASH_N_BANDS,
    SEGMENT_JACCARD_THRESHOLD,
    SEGMENT_SID_MULT,
    SEGMENT_W,
    SPAN_NGRAM_K,
    SPAN_TOP_N,
    STOPWORDS,
    VOCAB_TOP_K,
    BPE_PAIR_TOP_N,
    INCREMENTAL_EXISTING_PCT,
    CHUNK_STRIDE,
    CHUNK_W,
    ZIPF_TOP_K,
    CONTAINMENT_MAX_DF,
    CONTAINMENT_NGRAM_K,
    CONTAINMENT_THRESHOLD,
    PQ_CODEBOOK_IDS,
    PQ_M,
    PQ_SUB_DIM,
)

# ---------------------------------------------------------------- shared
_N_BANDS = MINHASH_SIGS // MINHASH_BAND_ROWS

_TOKS = "list_filter(string_split(text, ' '), x -> x <> '')"
_STOPLIST = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"

# word 3-shingles over toks (requires len(toks) >= 3)
_SHINGLES = (
    "list_distinct(list_transform(range(1, len(toks) - 1), "
    "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))"
)

def _hex_fold_expr(h: str, n: int) -> str:
    """Big-endian integer parse of ``n`` lowercase hex chars -- the
    SQL twin of functions.columns._hexval folding (md5_int60 at
    n=15).  Pure 64-bit integer arithmetic in both engines."""
    e = "CAST(0 AS BIGINT)"
    for i in range(1, n + 1):
        e = (
            f"({e} * 16 + (instr('0123456789abcdef', "
            f"substring({h}, {i}, 1)) - 1))"
        )
    return e


# element-wise 60-bit digest of a shingle array -- the twin of
# functions.columns.md5_int60_set (r12: verify joins ship digests,
# not strings).  Outer transform folds a 15-hex-char prefix computed
# ONCE per element by the inner transform.
_SHINGLES_H = (
    "list_transform(list_transform(shingles, s -> substring(md5(s), 1, 15)), "
    f"h -> {_hex_fold_expr('h', 15)})"
)

_DOC_SHINGLES_CTE = f"""
toksed AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
sh AS (
    SELECT doc_id, {_SHINGLES} AS shingles
    FROM toksed WHERE len(toks) >= 3
),
shh AS (
    SELECT doc_id, {_SHINGLES_H} AS shingles FROM sh
)"""

_SIG_COLS = ", ".join(
    f"list_aggregate(list_transform(shingles, s -> md5('{i}:' || s)), 'min') AS sig{i}"
    for i in range(MINHASH_SIGS)
)

_BANDS_UNION = "\n    UNION ALL ".join(
    "SELECT doc_id, {b} AS band_idx, md5({cat}) AS band_hash FROM sigs".format(
        b=b,
        cat=" || '|' || ".join(
            f"sig{b * MINHASH_BAND_ROWS + r}" for r in range(MINHASH_BAND_ROWS)
        ),
    )
    for b in range(_N_BANDS)
)

_MINHASH_CTES = f"""WITH {_DOC_SHINGLES_CTE},
sigs AS (SELECT doc_id, {_SIG_COLS} FROM sh),
bands AS (
    {_BANDS_UNION}
)"""


def _simhash_parse_band(b: int) -> str:
    """Big-endian parse of hex chars [4b+1, 4b+4] -- the twin of
    columns.simhash_token_bands' parse_band."""
    v = "0"
    for d in range(4):
        pos = 4 * b + d + 1
        hv = f"(strpos('0123456789abcdef', substr(h, {pos}, 1)) - 1)"
        v = f"({v} * 16 + {hv})"
    return v


def _simhash_band_expr(b: int) -> str:
    """Twin of columns.simhash_band: bit k of band b set when more
    than half the tokens have bit k set in their own band value."""
    terms = []
    for k in range(SIMHASH_BAND_BITS):
        pred = f"(CAST(FLOOR(a[{b + 1}] / {2 ** k}) AS INT) % 2) = 1"
        terms.append(
            f"CASE WHEN 2 * len(list_filter(tbs, a -> {pred})) > n "
            f"THEN {2 ** k} ELSE 0 END"
        )
    return "0 + " + "\n        + ".join(terms)


# shared CTE chain: distinct tokens -> per-token md5 64-bit prefix ->
# per-token band ints -> per-doc band signature columns
_SIMHASH_CTES = f"""WITH toksed AS (SELECT doc_id, {{toks}} AS toks FROM documents),
d AS (
    SELECT doc_id, list_distinct(toks) AS dt FROM toksed WHERE len(toks) > 0
),
tb AS (
    SELECT doc_id, len(dt) AS n,
           list_transform(
               list_transform(dt, w -> substr(md5(w), 1, 16)),
               h -> [{", ".join(_simhash_parse_band(b) for b in range(SIMHASH_N_BANDS))}]
           ) AS tbs
    FROM d
),
bands AS (
    SELECT doc_id,
           {", ".join(f"{_simhash_band_expr(b)} AS b{b}" for b in range(SIMHASH_N_BANDS))}
    FROM tb
)"""


def _dot(a: str, b: str) -> str:
    return (
        f"list_aggregate(list_transform(range(1, {EMBEDDING_DIM + 1}), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), 'sum')"
    )


def _cos(a: str, b: str) -> str:
    return f"({_dot(a, b)} / (sqrt({_dot(a, a)}) * sqrt({_dot(b, b)})))"


def _plane_sign_bucket_expr(emb: str, planes: list[list[float]]) -> str:
    terms = []
    for p, plane in enumerate(planes):
        lit = "[" + ", ".join(repr(w) for w in plane) + "]"
        dot = (
            f"list_aggregate(list_transform(range(1, {EMBEDDING_DIM + 1}), "
            f"i -> CAST({emb}[i] AS DOUBLE) * ({lit})[i]), 'sum')"
        )
        terms.append(f"CASE WHEN {dot} >= 0 THEN {2 ** p} ELSE 0 END")
    return "0 + " + " + ".join(terms)


def _bucket_expr(emb: str) -> str:
    return _plane_sign_bucket_expr(emb, LSH_PLANES)


def _bucket_extra_expr(emb: str) -> str:
    """Second hyperplane family (constants.LSH_EXTRA_PLANES) -- the
    block-budget sub-key dedup_embedding_cosine / semantic_dedup use."""
    return _plane_sign_bucket_expr(emb, LSH_EXTRA_PLANES)


def _order_proj_expr(emb: str, plane: list[float] | None = None) -> str:
    """SQL twin of the r11 windowed-pairing ORDER key (operators.
    dedup._occ_capped_pairs): normalized projection onto
    constants.EMB_ORDER_PLANE (or the r12 second plane when passed).
    Both engines fold the dot product left-to-right over the same
    doubles, so the (proj, vec_id) order is identical -- the same
    cross-engine determinism the ANN ranks already rely on."""
    from .constants import EMB_ORDER_PLANE

    lit = "[" + ", ".join(repr(w) for w in plane or EMB_ORDER_PLANE) + "]"
    dot = (
        f"list_aggregate(list_transform(range(1, {EMBEDDING_DIM + 1}), "
        f"i -> CAST({emb}[i] AS DOUBLE) * ({lit})[i]), 'sum')"
    )
    return f"({dot} / sqrt({_dot(emb, emb)}))"


def _split_fanout_expr(n: str, budget: int) -> str:
    """SQL twin of operators.dedup._split_fanout:
    max(2^LSH_EXTRA_MIN_PLANES, 2^ceil(log2(n/budget))) as a pure
    integer sum of threshold tests -- no float log, so both engines
    compute the identical depth-k sub-split width on every block
    size (floor = the r8 fixed-split geometry, depth engages above
    64x the budget)."""
    from .constants import LSH_EXTRA_MIN_PLANES, LSH_EXTRA_NUM_PLANES

    terms = " + ".join(
        f"CASE WHEN {n} > {budget << i} THEN {1 << i} ELSE 0 END"
        for i in range(LSH_EXTRA_NUM_PLANES)
    )
    return f"GREATEST({1 << LSH_EXTRA_MIN_PLANES}, (1 + {terms}))"


_PARTY_CASE = "CASE event_type " + " ".join(
    f"WHEN '{c}' THEN '{p}'" for c, p in CANDIDATE_PARTY.items()
) + " ELSE NULL END"

_ANN_IDS = "(" + ", ".join(str(i) for i in ANN_QUERY_IDS) + ")"
# IVF_CENTROID_IDS kept only as the trainer seed; oracles now embed
# the trained centroid literals (see _IVF_CENT_VALUES below).
from .ivf_model import IVF_TRAINED_CENTROIDS as _IVF_TRAINED_CENTROIDS  # noqa: E402

# events.ts is TIMESTAMP(NANOS) in parquet; Spark reads it as long ns
# and floors to microseconds, so the oracle casts ns -> us the same way.
_EVENTS_CTE = (
    "ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, "
    "event_type, value, props FROM events)"
)

_VOTE_GEO_JOIN = """FROM ev e
JOIN customer c ON e.user_id = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey"""

# ---------------------------------------------------------------- SQL
SQL: dict[str, str] = {}

SQL["votes_per_candidate"] = f"""
WITH {_EVENTS_CTE}
SELECT event_type AS candidate_id,
       CAST(COUNT(*) AS BIGINT) AS total_votes,
       ROUND(SUM(value), 2) AS total_weight
FROM ev GROUP BY event_type
"""

SQL["turnout_by_location"] = f"""
WITH {_EVENTS_CTE}
SELECT n.n_name AS location, CAST(COUNT(*) AS BIGINT) AS total_turnout_votes
{_VOTE_GEO_JOIN}
GROUP BY n.n_name
"""

SQL["turnout_by_region"] = f"""
WITH {_EVENTS_CTE}
SELECT r.r_name AS region, CAST(COUNT(*) AS BIGINT) AS total_turnout_votes
{_VOTE_GEO_JOIN}
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
"""

SQL["turnout_by_segment"] = f"""
WITH {_EVENTS_CTE}
SELECT c.c_mktsegment AS segment,
       CAST(COUNT(*) AS BIGINT) AS total_turnout_votes,
       ROUND(AVG(e.value), 4) AS avg_vote_weight
FROM ev e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
"""

SQL["votes_per_candidate_hourly"] = f"""
WITH {_EVENTS_CTE}
SELECT date_trunc('hour', ts) AS window_start,
       event_type AS candidate_id,
       CAST(COUNT(*) AS BIGINT) AS total_votes,
       ROUND(SUM(value), 2) AS total_weight
FROM ev GROUP BY 1, 2
"""

SQL["one_vote_per_voter"] = f"""
WITH {_EVENTS_CTE}
SELECT user_id AS voter_id, event_id AS vote_event_id,
       event_type AS candidate_id, ts AS voting_time
FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM ev
) WHERE rn = 1
"""

SQL["votes_enriched"] = f"""
WITH {_EVENTS_CTE}
SELECT e.event_id AS vote_id, e.user_id AS voter_id,
       c.c_name AS voter_name, n.n_name AS nationality,
       e.event_type AS candidate_id,
       {_PARTY_CASE} AS party_affiliation,
       e.ts AS voting_time, CAST(1 AS INTEGER) AS vote
{_VOTE_GEO_JOIN}
"""

SQL["election_winner"] = f"""
WITH {_EVENTS_CTE},
deduped AS (
    SELECT event_type FROM (
        SELECT event_type,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM ev
    ) WHERE rn = 1
),
counted AS (
    SELECT event_type AS candidate_id, CAST(COUNT(*) AS BIGINT) AS total_votes
    FROM deduped GROUP BY 1
)
SELECT candidate_id, total_votes FROM counted
ORDER BY total_votes DESC, candidate_id LIMIT 1
"""

SQL["leading_candidate_per_hour"] = f"""
WITH {_EVENTS_CTE},
hourly AS (
    SELECT date_trunc('hour', ts) AS window_start,
           event_type AS candidate_id,
           CAST(COUNT(*) AS BIGINT) AS total_votes
    FROM ev GROUP BY 1, 2
)
SELECT window_start, candidate_id, total_votes FROM (
    SELECT *, row_number() OVER (
        PARTITION BY window_start ORDER BY total_votes DESC, candidate_id
    ) AS rk FROM hourly
) WHERE rk = 1
"""

SQL["voter_registration_stats"] = """
SELECT r.r_name AS region, c.c_mktsegment AS segment,
       CAST(COUNT(*) AS BIGINT) AS registered_voters,
       ROUND(AVG(c.c_acctbal), 4) AS avg_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY 1, 2
"""

SQL["votes_value_stats"] = f"""
WITH {_EVENTS_CTE}
SELECT event_type AS candidate_id,
       CAST(COUNT(*) AS BIGINT) AS n_votes,
       ROUND(MIN(value), 2) AS min_weight,
       ROUND(MAX(value), 2) AS max_weight,
       ROUND(AVG(value), 4) AS avg_weight,
       ROUND(STDDEV_SAMP(value), 4) AS stddev_weight
FROM ev GROUP BY 1
"""

SQL["invalid_vote_rate"] = f"""
WITH {_EVENTS_CTE},
g AS (
    SELECT n.n_name AS location,
           CAST(COUNT(*) AS BIGINT) AS total_votes,
           CAST(SUM(CASE WHEN e.event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
               AS invalid_votes
    {_VOTE_GEO_JOIN}
    GROUP BY 1
)
SELECT location, total_votes, invalid_votes,
       invalid_votes / total_votes AS invalid_rate
FROM g
"""

SQL["events_json_props"] = f"""
WITH {_EVENTS_CTE},
parsed AS (
    SELECT event_type AS candidate_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM ev
)
SELECT candidate_id,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       ROUND(AVG(k), 4) AS avg_k,
       CAST(SUM(CASE WHEN k > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_high
FROM parsed GROUP BY 1
"""

SQL["q1_pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6) AS sum_charge,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       ROUND(AVG(l_extendedprice), 4) AS avg_price,
       ROUND(AVG(l_discount), 4) AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY 1, 2
"""

SQL["q3_shipping_priority"] = """
SELECT o_orderkey, o_orderdate, o_orderpriority,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND c_mktsegment = 'BUILDING'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, o_orderkey LIMIT 10
"""

SQL["q5_regional_revenue"] = """
SELECT n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY 1
"""

SQL["top_brand_revenue"] = """
SELECT p_brand,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1
ORDER BY revenue DESC, p_brand LIMIT 10
"""

SQL["customer_top_orders"] = """
SELECT o_custkey AS custkey, o_orderkey AS orderkey,
       ROUND(o_totalprice, 2) AS totalprice,
       CAST(order_rank AS INTEGER) AS order_rank
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
    ) AS order_rank
    FROM orders
) WHERE order_rank <= 3
"""

SQL["order_priority_count"] = """
SELECT o_orderpriority AS order_priority,
       CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_quantity > 45
)
GROUP BY 1
"""

SQL["nation_acctbal"] = """
SELECT n_name AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND(SUM(c_acctbal), 2) AS sum_acctbal,
       ROUND(AVG(c_acctbal), 4) AS avg_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1
"""

SQL["dedup_exact"] = """
SELECT md5(text) AS text_hash,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(doc_id) AS keep_doc_id
FROM documents GROUP BY 1
"""

SQL["dedup_minhash_bands"] = f"""{_MINHASH_CTES}
SELECT band_idx, band_hash,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(doc_id) AS min_doc_id
FROM bands GROUP BY 1, 2 HAVING COUNT(*) > 1
"""

SQL["dedup_minhash_pairs"] = f"""{_MINHASH_CTES},
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
     AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, jaccard FROM (
    SELECT doc_a, doc_b,
           len(list_intersect(sa.shingles, sb.shingles))
           / len(list_distinct(list_concat(sa.shingles, sb.shingles))) AS jaccard
    FROM cand
    JOIN shh sa ON sa.doc_id = doc_a
    JOIN shh sb ON sb.doc_id = doc_b
) WHERE jaccard >= {JACCARD_THRESHOLD}
"""

SQL["dedup_minhash_topk"] = f"""{_MINHASH_CTES},
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
     AND a.doc_id < b.doc_id
),
pairs AS (
    SELECT doc_a, doc_b,
           len(list_intersect(sa.shingles, sb.shingles))
           / len(list_distinct(list_concat(sa.shingles, sb.shingles))) AS jaccard
    FROM cand
    JOIN shh sa ON sa.doc_id = doc_a
    JOIN shh sb ON sb.doc_id = doc_b
),
directed AS (
    SELECT doc_a AS doc_id, doc_b AS neighbor_id, jaccard FROM pairs
    UNION ALL
    SELECT doc_b AS doc_id, doc_a AS neighbor_id, jaccard FROM pairs
),
r AS (
    SELECT doc_id, neighbor_id,
           CAST(row_number() OVER (
               PARTITION BY doc_id ORDER BY jaccard DESC, neighbor_id
           ) AS INTEGER) AS "rank",
           jaccard
    FROM directed
)
SELECT doc_id, neighbor_id, "rank", ROUND(jaccard, 6) AS jaccard
FROM r WHERE "rank" <= {SIM_TOPK_K}
"""

SQL["dedup_edit_distance"] = f"""{_MINHASH_CTES},
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
     AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, edit_distance, rel_distance FROM (
    SELECT doc_a, doc_b,
           CAST(levenshtein(da.text, db.text) AS INT) AS edit_distance,
           ROUND(levenshtein(da.text, db.text)
                 / greatest(length(da.text), length(db.text)), 6) AS rel_distance
    FROM cand
    JOIN documents da ON da.doc_id = doc_a
    JOIN documents db ON db.doc_id = doc_b
) WHERE rel_distance <= {EDIT_REL_THRESHOLD}
"""

SQL["dedup_simhash"] = f"""
{_SIMHASH_CTES.format(toks=_TOKS)},
sims AS (
    SELECT doc_id,
           {" || ".join(f"lpad(lower(hex(b{b})), 4, '0')" for b in reversed(range(SIMHASH_N_BANDS)))}
               AS simhash
    FROM bands
)
SELECT simhash, CAST(COUNT(*) AS BIGINT) AS n_docs, MIN(doc_id) AS min_doc_id
FROM sims GROUP BY 1 HAVING COUNT(*) > 1
"""

from .constants import (  # noqa: E402
    EMB_ORDER_PLANE2,
    EMB_PAIR_WINDOW,
    SUB_OCC_CAP_MULT,
)

# r11 residual occupancy cap mirrors _occ_capped_pairs exactly:
# groups at or under SUB_OCC_CAP_MULT * budget pair all-pairs (the
# r10 geometry), groups above it pair each member with its
# EMB_PAIR_WINDOW successors in (normalized order-plane projection,
# vec_id) rank order -- splitter-failure sub-buckets (sign-correlated
# vectors) go O(n*W) instead of O(n^2) in BOTH engines.
SQL["dedup_embedding_cosine"] = f"""
WITH bucketed AS (
    SELECT vec_id, label, embedding, {_bucket_expr('embedding')} AS bucket
    FROM embeddings
),
bsizes AS (
    SELECT label, bucket, COUNT(*) AS block_n,
           {_split_fanout_expr('COUNT(*)', EMB_COS_BLOCK_BUDGET)} AS fanout
    FROM bucketed GROUP BY 1, 2
),
subbed AS (
    SELECT c.vec_id, c.label, c.bucket, c.embedding,
           CASE WHEN s.block_n > {EMB_COS_BLOCK_BUDGET}
                THEN ({_bucket_extra_expr('c.embedding')}) % s.fanout
                ELSE 0 END AS sub
    FROM bucketed c JOIN bsizes s USING (label, bucket)
),
occ AS (
    SELECT label, bucket, sub, COUNT(*) AS occ_n
    FROM subbed GROUP BY 1, 2, 3
),
t AS (
    SELECT s.*, o.occ_n FROM subbed s JOIN occ o USING (label, bucket, sub)
),
small_pairs AS (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
           ROUND({_cos('a.embedding', 'b.embedding')}, 6) AS cosine
    FROM t a JOIN t b
      ON a.label = b.label AND a.bucket = b.bucket AND a.sub = b.sub
     AND a.vec_id < b.vec_id
    WHERE a.occ_n <= {SUB_OCC_CAP_MULT * EMB_COS_BLOCK_BUDGET}
),
ranked AS (
    SELECT label, bucket, sub, vec_id, embedding,
           row_number() OVER (
               PARTITION BY label, bucket, sub
               ORDER BY {_order_proj_expr('embedding')}, vec_id
           ) AS rn,
           row_number() OVER (
               PARTITION BY label, bucket, sub
               ORDER BY {_order_proj_expr('embedding', EMB_ORDER_PLANE2)},
                        vec_id
           ) AS rn2
    FROM t WHERE occ_n > {SUB_OCC_CAP_MULT * EMB_COS_BLOCK_BUDGET}
),
-- r12: two independent order planes; UNION (not ALL) dedups pairs
-- found by both, mirroring the Spark distinct()
big_pairs AS (
    SELECT LEAST(a.vec_id, b.vec_id) AS vec_a,
           GREATEST(a.vec_id, b.vec_id) AS vec_b, a.label AS label,
           ROUND({_cos('a.embedding', 'b.embedding')}, 6) AS cosine
    FROM ranked a JOIN ranked b
      ON a.label = b.label AND a.bucket = b.bucket AND a.sub = b.sub
     AND b.rn > a.rn AND b.rn <= a.rn + {EMB_PAIR_WINDOW}
    UNION
    SELECT LEAST(a.vec_id, b.vec_id) AS vec_a,
           GREATEST(a.vec_id, b.vec_id) AS vec_b, a.label AS label,
           ROUND({_cos('a.embedding', 'b.embedding')}, 6) AS cosine
    FROM ranked a JOIN ranked b
      ON a.label = b.label AND a.bucket = b.bucket AND a.sub = b.sub
     AND b.rn2 > a.rn2 AND b.rn2 <= a.rn2 + {EMB_PAIR_WINDOW}
)
SELECT vec_a, vec_b, label, cosine FROM (
    SELECT * FROM small_pairs UNION ALL SELECT * FROM big_pairs
) WHERE cosine >= {COSINE_THRESHOLD}
"""

SQL["ann_bruteforce_topk"] = f"""
WITH q AS (
    SELECT vec_id AS query_id, embedding AS q_emb
    FROM embeddings WHERE vec_id IN {_ANN_IDS}
),
j AS (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           {_cos('q.q_emb', 'e.embedding')} AS cosine
    FROM embeddings e JOIN q ON e.vec_id <> q.query_id
),
r AS (
    SELECT query_id, neighbor_id,
           CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
           ) AS INTEGER) AS "rank",
           cosine
    FROM j
)
SELECT query_id, neighbor_id, "rank", ROUND(cosine, 6) AS cosine
FROM r WHERE "rank" <= {ANN_K}
"""

# exact top-k label agreement per probe; ranks on the unrounded
# cosine exactly like ann_bruteforce_topk
SQL["ann_hard_negatives"] = f"""
WITH q AS (
    SELECT vec_id AS query_id, embedding AS q_emb, label AS query_label
    FROM embeddings WHERE vec_id IN {_ANN_IDS}
),
j AS (
    SELECT q.query_id, q.query_label, e.vec_id AS neighbor_id,
           e.label AS neighbor_label,
           {_cos('q.q_emb', 'e.embedding')} AS cosine
    FROM embeddings e JOIN q ON e.label <> q.query_label
),
r AS (
    SELECT query_id, query_label, neighbor_id, neighbor_label,
           CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
           ) AS INTEGER) AS "rank",
           cosine
    FROM j
)
SELECT query_id, query_label, neighbor_id, neighbor_label, "rank",
       ROUND(cosine, 6) AS cosine
FROM r WHERE "rank" <= {ANN_K}
"""

SQL["knn_label_purity"] = f"""
WITH q AS (
    SELECT vec_id AS query_id, embedding AS q_emb, label AS query_label
    FROM embeddings WHERE vec_id IN {_ANN_IDS}
),
j AS (
    SELECT q.query_id, q.query_label, e.vec_id AS neighbor_id,
           e.label AS neighbor_label,
           {_cos('q.q_emb', 'e.embedding')} AS cosine
    FROM embeddings e JOIN q ON e.vec_id <> q.query_id
),
r AS (
    SELECT query_id, query_label, neighbor_label,
           row_number() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
           ) AS rn
    FROM j
)
SELECT query_id, query_label,
       CAST(SUM(CASE WHEN neighbor_label = query_label THEN 1 ELSE 0 END)
            AS BIGINT) AS n_same_label,
       ROUND(SUM(CASE WHEN neighbor_label = query_label THEN 1 ELSE 0 END)
             / COUNT(*), 6) AS purity
FROM r WHERE rn <= {ANN_K}
GROUP BY 1, 2
"""

SQL["ann_lsh_topk"] = f"""
WITH b AS (
    SELECT vec_id, embedding, {_bucket_expr('embedding')} AS bucket
    FROM embeddings
),
q0 AS (
    SELECT vec_id AS query_id, embedding AS q_emb, bucket AS q_bucket
    FROM b WHERE vec_id IN {_ANN_IDS}
),
q AS (
    SELECT query_id, q_emb, probe_bucket
    FROM q0, unnest([{", ".join(["q_bucket"] + [f"xor(q_bucket, {2 ** p})" for p in range(len(LSH_PLANES))])}]) AS t(probe_bucket)
),
j AS (
    SELECT q.query_id, b.vec_id AS neighbor_id,
           {_cos('q.q_emb', 'b.embedding')} AS cosine
    FROM b JOIN q ON b.bucket = q.probe_bucket AND b.vec_id <> q.query_id
),
r AS (
    SELECT query_id, neighbor_id,
           CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
           ) AS INTEGER) AS "rank",
           cosine
    FROM j
)
SELECT query_id, neighbor_id, "rank", ROUND(cosine, 6) AS cosine
FROM r WHERE "rank" <= {ANN_K}
"""

SQL["text_token_count"] = f"""
WITH d AS (
    SELECT lang, len({_TOKS}) AS n_tokens, length(text) AS n_chars_actual
    FROM documents
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       ROUND(AVG(n_tokens), 4) AS avg_tokens,
       CAST(SUM(n_chars_actual) AS BIGINT) AS total_chars
FROM d GROUP BY 1
"""

SQL["text_lang_id"] = f"""
WITH d AS (SELECT lang, {_TOKS} AS toks FROM documents),
p AS (
    SELECT lang,
           CASE WHEN len(toks) = 0 THEN 'unknown'
                WHEN len(list_filter(toks, w -> list_contains({_STOPLIST}, w)))
                     / len(toks) > 0.05 THEN 'en'
                ELSE 'other' END AS pred_lang
    FROM d
)
SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM p GROUP BY 1, 2
"""

SQL["text_quality_score"] = f"""
WITH d AS (SELECT source, {_TOKS} AS toks FROM documents),
s AS (
    SELECT source,
           CASE WHEN len(toks) > 0 THEN ROUND(
               LEAST(len(toks) / 200.0, 1.0) * 0.5
               + (len(list_filter(toks, w -> list_contains({_STOPLIST}, w)))
                  / len(toks)) * 0.3
               + LEAST((list_aggregate(list_transform(toks, w -> length(w)), 'sum')
                        / len(toks)) / 10.0, 1.0) * 0.2,
               6)
           ELSE 0.0 END AS quality
    FROM d
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(quality), 4) AS avg_quality,
       ROUND(MIN(quality), 4) AS min_quality,
       ROUND(MAX(quality), 4) AS max_quality
FROM s GROUP BY 1
"""

SQL["doc_fingerprint"] = f"""
WITH {_DOC_SHINGLES_CTE},
f AS (
    SELECT doc_id,
           list_aggregate(list_transform(shingles, s -> md5(s)), 'min') AS fingerprint
    FROM sh
)
SELECT fingerprint, CAST(COUNT(*) AS BIGINT) AS n_docs, MIN(doc_id) AS min_doc_id
FROM f GROUP BY 1 HAVING COUNT(*) > 1
"""

SQL["multimodal_binary_stats"] = """
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       ROUND(AVG(octet_length(encode(text))), 4) AS avg_bytes,
       CAST(COUNT(DISTINCT sha256(text)) AS BIGINT) AS n_distinct_payloads
FROM documents GROUP BY 1
"""

SQL["unique_voters_per_candidate"] = f"""
WITH {_EVENTS_CTE}
SELECT event_type AS candidate_id,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS unique_voters,
       CAST(COUNT(*) AS BIGINT) AS total_votes
FROM ev GROUP BY 1
"""

SQL["votes_sessionized"] = f"""
WITH {_EVENTS_CTE},
lagged AS (
    SELECT user_id, event_id, ts, value,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                THEN 1 ELSE 0 END AS new_s
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
    SELECT user_id, ts, value,
           SUM(new_s) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING
           ) AS sid
    FROM lagged
)
SELECT user_id AS voter_id,
       MIN(ts) AS session_start,
       MAX(ts) AS last_vote,
       CAST(COUNT(*) AS BIGINT) AS n_votes,
       ROUND(SUM(value), 2) AS session_weight
FROM sess GROUP BY user_id, sid
"""

SQL["cumulative_daily_votes"] = f"""
WITH {_EVENTS_CTE},
daily AS (
    SELECT date_trunc('day', ts) AS day,
           event_type AS candidate_id,
           CAST(COUNT(*) AS BIGINT) AS daily_votes
    FROM ev GROUP BY 1, 2
)
SELECT day, candidate_id, daily_votes,
       CAST(SUM(daily_votes) OVER (
           PARTITION BY candidate_id ORDER BY day ROWS UNBOUNDED PRECEDING
       ) AS BIGINT) AS cumulative_votes
FROM daily
"""

SQL["votes_minute_rate"] = f"""
WITH {_EVENTS_CTE}
SELECT time_bucket(INTERVAL '15 minutes', ts) AS bucket_start,
       CAST(COUNT(*) AS BIGINT) AS n_votes,
       ROUND(AVG(value), 4) AS avg_weight
FROM ev GROUP BY 1
"""

SQL["voter_profile"] = f"""
WITH {_EVENTS_CTE}
SELECT user_id AS voter_id,
       CAST(COUNT(*) AS BIGINT) AS n_votes,
       CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_candidates,
       MIN(ts) AS first_vote,
       MAX(ts) AS last_vote,
       ROUND(SUM(value), 2) AS total_weight
FROM ev GROUP BY 1
"""

SQL["q7_nation_volume"] = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
GROUP BY 1, 2
"""

SQL["q10_returned_items"] = """
SELECT c_custkey AS custkey, c_name AS cust_name, n_name AS nation,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, custkey LIMIT 20
"""

SQL["ngram_top"] = f"""
WITH toksed AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
bi AS (
    SELECT list_distinct(
        list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
    ) AS bigrams
    FROM toksed WHERE len(toks) >= 2
),
x AS (SELECT unnest(bigrams) AS bigram FROM bi)
SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM x GROUP BY 1 ORDER BY n_docs DESC, bigram LIMIT 20
"""

SQL["embedding_lsh_buckets"] = f"""
WITH b AS (
    SELECT vec_id, {_bucket_expr('embedding')} AS bucket FROM embeddings
)
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_vectors, MIN(vec_id) AS min_vec_id
FROM b GROUP BY 1
"""


SQL["vote_weight_percentiles"] = f"""
WITH {_EVENTS_CTE}
SELECT event_type AS candidate_id,
       CAST(COUNT(*) AS BIGINT) AS n_votes,
       quantile_cont(value, 0.25) AS p25,
       quantile_cont(value, 0.5) AS p50,
       quantile_cont(value, 0.75) AS p75,
       quantile_cont(value, 0.9) AS p90
FROM ev GROUP BY 1
"""

SQL["turnout_rollup"] = f"""
WITH {_EVENTS_CTE}
SELECT r.r_name AS region, n.n_name AS nation,
       CAST(COUNT(*) AS BIGINT) AS total_turnout_votes
{_VOTE_GEO_JOIN}
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP(r.r_name, n.n_name)
"""


SQL["vote_interarrival"] = f"""
WITH {_EVENTS_CTE},
l AS (
    SELECT event_type AS candidate_id,
           (epoch_us(ts) - epoch_us(lag(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ))) / 1000000.0 AS gap_s
    FROM ev
)
SELECT candidate_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
       ROUND(AVG(gap_s), 4) AS avg_gap_s,
       ROUND(MIN(gap_s), 4) AS min_gap_s,
       ROUND(MAX(gap_s), 4) AS max_gap_s
FROM l WHERE gap_s IS NOT NULL GROUP BY 1
"""

SQL["registered_non_voters"] = f"""
WITH {_EVENTS_CTE},
voted AS (SELECT DISTINCT user_id FROM ev),
non AS (
    SELECT c.c_nationkey, c.c_acctbal FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM voted v WHERE v.user_id = c.c_custkey)
)
SELECT n.n_name AS nation, CAST(COUNT(*) AS BIGINT) AS n_non_voters,
       ROUND(AVG(c_acctbal), 4) AS avg_balance
FROM non JOIN nation n ON non.c_nationkey = n.n_nationkey
GROUP BY 1
"""

SQL["party_vote_share"] = f"""
WITH {_EVENTS_CTE},
p AS (SELECT {_PARTY_CASE} AS party FROM ev),
a AS (SELECT party, CAST(COUNT(*) AS BIGINT) AS party_votes FROM p GROUP BY 1)
SELECT party, party_votes,
       ROUND(party_votes / (SUM(party_votes) OVER ()), 6) AS vote_share
FROM a
"""

SQL["lapsed_voters"] = f"""
WITH {_EVENTS_CTE},
lapsed AS (
    SELECT DISTINCT user_id, event_type
    FROM ev WHERE ts < TIMESTAMP '{ELECTION_EARLY_END}'
    EXCEPT
    SELECT DISTINCT user_id, event_type
    FROM ev WHERE ts >= TIMESTAMP '{ELECTION_LATE_START}'
)
SELECT l.event_type AS candidate_id, n.n_name AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_lapsed_voters
FROM lapsed l
JOIN customer c ON l.user_id = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY 1, 2
"""

SQL["votes_asof_prior_click"] = f"""
WITH {_EVENTS_CTE},
p AS (SELECT user_id, event_id, ts FROM ev WHERE event_type = 'purchase'),
c AS (SELECT user_id, event_id, ts FROM ev WHERE event_type = 'click'),
j AS (
    SELECT p.user_id, p.event_id AS purchase_event, p.ts AS purchase_ts,
           c.event_id AS prior_click_event, c.ts AS prior_click_ts,
           row_number() OVER (
               PARTITION BY p.event_id ORDER BY c.ts DESC, c.event_id DESC
           ) AS rn
    FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
)
SELECT user_id, purchase_event, purchase_ts, prior_click_event, prior_click_ts,
       (epoch_us(purchase_ts) - epoch_us(prior_click_ts)) / 1000000.0 AS gap_s
FROM j WHERE rn = 1
"""

SQL["votes_in_launch_windows"] = f"""
WITH {_EVENTS_CTE},
w AS (
    SELECT event_type AS w_candidate, MIN(ts) AS w_start,
           MIN(ts) + INTERVAL 6 HOUR AS w_end
    FROM ev GROUP BY 1
)
SELECT w.w_candidate, CAST(COUNT(*) AS BIGINT) AS n_events_in_window,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_voters_in_window
FROM ev e JOIN w ON e.ts >= w.w_start AND e.ts <= w.w_end
GROUP BY 1
"""

SQL["text_redact_pii"] = f"""
WITH d AS (
    SELECT source,
           len(regexp_extract_all(lower(text), '{PII_EMAIL_RE}')) AS n_email,
           len(regexp_extract_all(lower(text), '{PII_PHONE_RE}')) AS n_phone,
           length(text) - length(
               regexp_replace(
                   regexp_replace(lower(text), '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
                   '{PII_PHONE_RE}', '<PHONE>', 'g')) AS chars_delta
    FROM documents
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n_email > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_email,
       CAST(SUM(CASE WHEN n_phone > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_phone,
       CAST(SUM(n_email) AS BIGINT) AS total_emails,
       CAST(SUM(n_phone) AS BIGINT) AS total_phones,
       CAST(SUM(chars_delta) AS BIGINT) AS total_chars_delta
FROM d GROUP BY 1
"""

_PIVOT_COLS = ",\n       ".join(
    f"CAST(COUNT(*) FILTER (event_type = '{c}') AS BIGINT) AS {c}"
    for c in CANDIDATE_PARTY
)

SQL["candidate_hourly_pivot"] = f"""
WITH {_EVENTS_CTE}
SELECT date_trunc('hour', ts) AS hour,
       {_PIVOT_COLS}
FROM ev GROUP BY 1
"""

SQL["votes_cube"] = f"""
WITH {_EVENTS_CTE}
SELECT e.event_type AS candidate_id, n.n_name AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_votes,
       ROUND(SUM(e.value), 2) AS total_weight
{_VOTE_GEO_JOIN}
GROUP BY CUBE(e.event_type, n.n_name)
"""

SQL["voter_value_quartiles"] = f"""
WITH {_EVENTS_CTE},
pv AS (
    SELECT user_id, ROUND(SUM(value), 2) AS total_weight
    FROM ev GROUP BY 1
),
t AS (
    SELECT total_weight,
           ntile(4) OVER (ORDER BY total_weight, user_id) AS quartile
    FROM pv
)
SELECT quartile, CAST(COUNT(*) AS BIGINT) AS n_voters,
       ROUND(MIN(total_weight), 2) AS min_weight,
       ROUND(MAX(total_weight), 2) AS max_weight,
       ROUND(AVG(total_weight), 4) AS avg_weight
FROM t GROUP BY 1
"""

SQL["supplier_nation_revenue"] = """
SELECT n.n_name AS nation, CAST(year(l.l_shipdate) AS INT) AS ship_year,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY 1, 2
"""

# Shared recursive-CTE prefix: verified near-dup edges -> per-doc
# connected-component labels (the `final` CTE) -- used by the cluster
# aggregate, the bigstar twin, and canonical-survivor selection.
_CLUSTER_LABEL_CTES = "WITH RECURSIVE " + _MINHASH_CTES[len("WITH "):] + f""",
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
     AND a.doc_id < b.doc_id
),
pairs AS (
    SELECT doc_a, doc_b FROM (
        SELECT doc_a, doc_b,
               len(list_intersect(sa.shingles, sb.shingles))
               / len(list_distinct(list_concat(sa.shingles, sb.shingles))) AS jaccard
        FROM cand
        JOIN shh sa ON sa.doc_id = doc_a
        JOIN shh sb ON sb.doc_id = doc_b
    ) WHERE jaccard >= {JACCARD_THRESHOLD}
),
edges AS (
    SELECT doc_a, doc_b FROM pairs
    UNION ALL
    SELECT doc_b AS doc_a, doc_a AS doc_b FROM pairs
),
reach(doc_id, label) AS (
    SELECT DISTINCT doc_a AS doc_id, doc_a AS label FROM edges
    UNION
    SELECT e.doc_a AS doc_id, r.label
    FROM reach r JOIN edges e ON e.doc_b = r.doc_id
),
final AS (SELECT doc_id, MIN(label) AS label FROM reach GROUP BY doc_id)
"""

SQL["dedup_clusters"] = _CLUSTER_LABEL_CTES + """
SELECT label AS cluster_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
       MAX(doc_id) AS max_doc_id
FROM final GROUP BY 1
"""

SQL["dedup_keep_canonical"] = _CLUSTER_LABEL_CTES + """,
sized AS (
    SELECT f.label, d.doc_id, d.n_chars
    FROM final f JOIN documents d ON d.doc_id = f.doc_id
),
ranked AS (
    SELECT label, doc_id, n_chars,
           row_number() OVER (
               PARTITION BY label ORDER BY n_chars DESC, doc_id ASC
           ) AS rn
    FROM sized
)
SELECT label AS cluster_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MAX(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS keep_doc_id,
       CAST(MAX(CASE WHEN rn = 1 THEN n_chars END) AS BIGINT) AS keep_chars,
       CAST(SUM(n_chars) - MAX(CASE WHEN rn = 1 THEN n_chars END) AS BIGINT)
           AS reclaimed_chars
FROM ranked GROUP BY 1
"""

SQL["dedup_ngram_jaccard"] = f"""
WITH g AS (
    SELECT doc_id, lang,
           CAST(FLOOR(length(text) / {NGRAM_LEN_BUCKET}) AS INT) AS len_bucket,
           list_distinct(list_transform(
               range(1, length(text) - {CHAR_NGRAM_K - 2}),
               i -> substr(text, i, {CHAR_NGRAM_K}))) AS grams
    FROM documents WHERE length(text) >= {CHAR_NGRAM_K}
)
SELECT doc_a, doc_b, lang, jaccard FROM (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.lang AS lang,
           ROUND(len(list_intersect(a.grams, b.grams))
                 / len(list_distinct(a.grams || b.grams)), 6) AS jaccard
    FROM g a JOIN g b
      ON a.lang = b.lang AND a.len_bucket = b.len_bucket
     AND a.doc_id < b.doc_id
) WHERE jaccard >= {NGRAM_JACCARD_THRESHOLD}
"""

SQL["dedup_ngram_jaccard_scaled"] = f"""{_MINHASH_CTES},
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
     AND a.doc_id < b.doc_id
),
g AS (
    SELECT doc_id, lang,
           list_distinct(list_transform(
               range(1, length(text) - {CHAR_NGRAM_K - 2}),
               i -> substr(text, i, {CHAR_NGRAM_K}))) AS grams
    FROM documents WHERE length(text) >= {CHAR_NGRAM_K}
)
SELECT doc_a, doc_b, lang, jaccard FROM (
    SELECT doc_a, doc_b, ga.lang AS lang,
           ROUND(len(list_intersect(ga.grams, gb.grams))
                 / len(list_distinct(ga.grams || gb.grams)), 6) AS jaccard
    FROM cand
    JOIN g ga ON ga.doc_id = doc_a
    JOIN g gb ON gb.doc_id = doc_b AND gb.lang = ga.lang
) WHERE jaccard >= {NGRAM_JACCARD_THRESHOLD}
"""

# Trained IVF centroids (ivf_model.py, k-means via tools/train_ivf.py)
# embedded as a literal VALUES CTE: repr() round-trips IEEE doubles,
# so both engines see the identical model -- same discipline as the
# LSH plane literals.
_IVF_CENT_VALUES = ",\n    ".join(
    f"({cid}, [{', '.join(repr(x) for x in emb)}])"
    for cid, emb in _IVF_TRAINED_CENTROIDS
)

_IVF_ASG_CTES = f"""cent AS (
    SELECT * FROM (VALUES
    {_IVF_CENT_VALUES}
    ) AS t(cent_id, c_emb)
),
scored AS (
    SELECT e.vec_id, e.embedding, c.cent_id,
           {_cos('e.embedding', 'c.c_emb')} AS cos
    FROM embeddings e CROSS JOIN cent c
),
asg AS (
    SELECT vec_id, embedding, cent_id,
           row_number() OVER (
               PARTITION BY vec_id ORDER BY cos DESC, cent_id
           ) AS rn
    FROM scored
)"""

SQL["ann_ivf_topk"] = f"""
WITH {_IVF_ASG_CTES},
cells AS (SELECT vec_id, embedding, cent_id AS cell FROM asg WHERE rn = 1),
q AS (
    SELECT vec_id AS query_id, embedding AS q_emb, cent_id AS probe_cell
    FROM asg WHERE vec_id IN {_ANN_IDS} AND rn <= {IVF_NPROBE}
),
j AS (
    SELECT q.query_id, cells.vec_id AS neighbor_id,
           {_cos('q.q_emb', 'cells.embedding')} AS cosine
    FROM cells JOIN q
      ON cells.cell = q.probe_cell AND cells.vec_id <> q.query_id
),
r AS (
    SELECT query_id, neighbor_id,
           CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
           ) AS INTEGER) AS "rank",
           cosine
    FROM j
)
SELECT query_id, neighbor_id, "rank", ROUND(cosine, 6) AS cosine
FROM r WHERE "rank" <= {ANN_K}
"""

SQL["small_quantity_revenue"] = """
WITH pp AS (
    SELECT l_partkey AS avg_partkey, AVG(l_quantity) * 0.5 AS half_avg_qty
    FROM lineitem GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
       ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey AND p.p_brand = 'Brand#19'
JOIN pp ON l.l_partkey = pp.avg_partkey
WHERE l.l_quantity < pp.half_avg_qty
"""

SQL["large_volume_orders"] = """
WITH big AS (
    SELECT l_orderkey, SUM(l_quantity) AS total_qty
    FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 300.0
)
SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
       ROUND(o.o_totalprice, 2) AS total_price,
       ROUND(b.total_qty, 2) AS total_qty
FROM orders o JOIN big b ON o.o_orderkey = b.l_orderkey
"""

SQL["doc_embedding_stats"] = f"""
WITH j AS (
    SELECT d.lang, e.label, sqrt({_dot('e.embedding', 'e.embedding')}) AS norm
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
)
SELECT lang, label, CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(norm), 4) AS avg_norm,
       ROUND(MIN(norm), 4) AS min_norm,
       ROUND(MAX(norm), 4) AS max_norm
FROM j GROUP BY 1, 2
"""

_KMEANS_MEANS = ", ".join(
    f"AVG(CAST(embedding[{i + 1}] AS DOUBLE))" for i in range(EMBEDDING_DIM)
)

SQL["embedding_kmeans_iter"] = f"""
WITH {_IVF_ASG_CTES},
cells AS (SELECT vec_id, embedding, cent_id FROM asg WHERE rn = 1),
m AS (
    SELECT cent_id, CAST(COUNT(*) AS BIGINT) AS n_members,
           list_value({_KMEANS_MEANS}) AS mean_emb
    FROM cells GROUP BY 1
)
SELECT m.cent_id, m.n_members,
       ROUND({_cos('m.mean_emb', 'c.c_emb')}, 6) AS drift
FROM m JOIN cent c ON m.cent_id = c.cent_id
"""

SQL["text_bpe_tokens"] = f"""
WITH d AS (
    SELECT lang,
           len(regexp_extract_all(lower(text), '{BPE_TOKEN_RE}')) AS n_bpe,
           len({_TOKS}) AS n_ws
    FROM documents
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_bpe) AS BIGINT) AS total_bpe_tokens,
       CAST(SUM(n_ws) AS BIGINT) AS total_ws_tokens,
       ROUND(AVG(CASE WHEN n_ws > 0 THEN n_bpe / n_ws END), 4) AS avg_fertility
FROM d GROUP BY 1
"""

SQL["multimodal_chunk_stats"] = f"""
WITH c AS (
    SELECT source,
           unnest(list_transform(
               range(0, CAST(ceil(length(text) / {MEDIA_CHUNK_BYTES}) AS INT)),
               i -> substr(text, i * {MEDIA_CHUNK_BYTES} + 1, {MEDIA_CHUNK_BYTES}))) AS chunk
    FROM documents WHERE length(text) > 0
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(COUNT(DISTINCT md5(chunk)) AS BIGINT) AS n_distinct_chunks,
       ROUND(AVG(length(chunk)), 4) AS avg_chunk_len
FROM c GROUP BY 1
"""


SQL["text_repetition_score"] = f"""
WITH d AS (SELECT source, {_TOKS} AS toks FROM documents),
b AS (
    SELECT source,
           ROUND(1 - len(list_distinct(list_transform(
                     range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])))
                 / (len(toks) - 1), 6) AS dup_frac
    FROM d WHERE len(toks) >= 2
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(dup_frac), 4) AS avg_dup_frac,
       ROUND(MAX(dup_frac), 4) AS max_dup_frac,
       CAST(SUM(CASE WHEN dup_frac > {REP_DUP_BIGRAM_MAX} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_flagged
FROM b GROUP BY 1
"""


# hex digit value of char i (1-based) of an md5 hex string
def _duck_hexval(h: str, i: int) -> str:
    return f"(instr('0123456789abcdef', substr({h}, {i}, 1)) - 1)"


_MD5_PCT = (
    "(("
    + " + ".join(
        f"{_duck_hexval('md5(CAST(doc_id AS VARCHAR))', i + 1)} * {16 ** (3 - i)}"
        for i in range(4)
    )
    + ") % 100)"
)

SQL["corpus_train_split"] = f"""
WITH d AS (
    SELECT CASE WHEN {_MD5_PCT} < {SPLIT_TEST_PCT} THEN 'test'
                WHEN {_MD5_PCT} < {SPLIT_TEST_PCT + SPLIT_VAL_PCT} THEN 'val'
                ELSE 'train' END AS split,
           lang, len({_TOKS}) AS n_tokens, length(text) AS n_chars
    FROM documents
)
SELECT split, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       ROUND(AVG(n_chars), 4) AS avg_chars
FROM d GROUP BY 1, 2
"""

SQL["seq_pack_stats"] = f"""
WITH d AS (
    SELECT lang, doc_id % {PACK_SHARDS} AS shard, doc_id,
           len({_TOKS}) AS n_tokens
    FROM documents
),
c AS (
    SELECT lang, shard, n_tokens,
           SUM(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum
    FROM d
),
f AS (
    SELECT lang, shard, n_tokens, cum,
           CASE WHEN n_tokens > 0
                AND FLOOR((cum - 1) / {PACK_WINDOW_TOKENS})
                    > FLOOR((cum - n_tokens) / {PACK_WINDOW_TOKENS})
                THEN 1 ELSE 0 END AS crosses
    FROM c
)
SELECT lang, shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(FLOOR((MAX(cum) - 1) / {PACK_WINDOW_TOKENS}) + 1 AS BIGINT) AS n_windows,
       CAST(SUM(crosses) AS BIGINT) AS boundary_docs,
       ROUND(MAX(cum) / ((FLOOR((MAX(cum) - 1) / {PACK_WINDOW_TOKENS}) + 1)
             * {float(PACK_WINDOW_TOKENS)}), 6) AS avg_fill
FROM f GROUP BY 1, 2
"""

_DECONTAM_CAT = " || ' ' || ".join(
    "toks[i]" if j == 0 else f"toks[i+{j}]" for j in range(DECONTAM_NGRAM_K)
)

SQL["benchmark_decontam"] = f"""
WITH toksed AS (
    SELECT doc_id, source, {_TOKS} AS toks FROM documents
),
g AS (
    SELECT doc_id, source,
           list_distinct(list_transform(
               range(1, len(toks) - {DECONTAM_NGRAM_K - 2}), i -> {_DECONTAM_CAT}
           )) AS grams
    FROM toksed WHERE len(toks) >= {DECONTAM_NGRAM_K}
),
eval_g AS (
    SELECT DISTINCT unnest(grams) AS gram FROM g WHERE source = '{EVAL_SOURCE}'
),
corpus AS (SELECT * FROM g WHERE source <> '{EVAL_SOURCE}'),
hits AS (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS overlap
    FROM (SELECT doc_id, unnest(grams) AS gram FROM corpus) cg
    JOIN eval_g USING (gram) GROUP BY 1
),
per_doc AS (
    SELECT c.source, COALESCE(h.overlap, 0) AS overlap
    FROM corpus c LEFT JOIN hits h USING (doc_id)
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN overlap > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
       CAST(MAX(overlap) AS BIGINT) AS max_overlap,
       ROUND(SUM(CASE WHEN overlap > 0 THEN 1 ELSE 0 END) / COUNT(*), 6) AS contam_rate
FROM per_doc GROUP BY 1
"""


# Cross-doc exact-substring spans: positional K-grams (the identical
# _DECONTAM_CAT concatenation, 1-based positions matching Spark's
# F.sequence), total-occurrence cap, diagonal gaps-and-islands -- all
# integers, so the value hash is exact by construction.
from .constants import SUBSTR_GRAM_MAX_OCC, SUBSTR_RUN_MIN_TOKENS  # noqa: E402

SQL["dedup_substring_spans"] = f"""
WITH toksed AS (
    SELECT doc_id, {_TOKS} AS toks FROM documents
),
g AS (
    SELECT doc_id, i AS pos, {_DECONTAM_CAT} AS gram
    FROM toksed, UNNEST(range(1, len(toks) - {DECONTAM_NGRAM_K - 2})) AS t(i)
    WHERE len(toks) >= {DECONTAM_NGRAM_K}
),
rare_g AS (
    SELECT gram FROM g
    GROUP BY gram HAVING COUNT(*) <= {SUBSTR_GRAM_MAX_OCC}
),
rare AS (SELECT g.* FROM g JOIN rare_g USING (gram)),
m AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           a.pos AS pos_a, b.pos AS pos_b, a.pos - b.pos AS diag
    FROM rare a JOIN rare b
      ON a.gram = b.gram AND a.doc_id < b.doc_id
),
isl AS (
    SELECT doc_a, doc_b, diag, pos_a, pos_b,
           pos_a - ROW_NUMBER() OVER (
               PARTITION BY doc_a, doc_b, diag ORDER BY pos_a
           ) AS island
    FROM m
),
runs AS (
    SELECT doc_a, doc_b,
           CAST(MIN(pos_a) AS BIGINT) AS a_start,
           CAST(MIN(pos_b) AS BIGINT) AS b_start,
           CAST(COUNT(*) + {DECONTAM_NGRAM_K - 1} AS BIGINT) AS run_tokens
    FROM isl GROUP BY doc_a, doc_b, diag, island
)
SELECT doc_a, doc_b, a_start, b_start, run_tokens
FROM runs WHERE run_tokens >= {SUBSTR_RUN_MIN_TOKENS}
"""


def _rewrite_rounds(sql: str) -> str:
    """Replace ROUND(expr, n) with FLOOR((expr) * 10^n + 0.5) / 10^n.

    Spark round() (BigDecimal HALF_UP) and DuckDB round() can disagree
    on the SAME double when x*10^n sits exactly on .5; the Spark
    operators use functions.columns.round_half_up with this identical
    floor formula, making rounding bit-deterministic across engines.
    """
    out = []
    i = 0
    upper = sql.upper()
    while True:
        j = upper.find("ROUND(", i)
        if j < 0:
            out.append(sql[i:])
            return "".join(out)
        out.append(sql[i:j])
        depth = 0
        k = j + 5  # points at '('
        end = None
        for k in range(j + 5, len(sql)):
            if sql[k] == "(":
                depth += 1
            elif sql[k] == ")":
                depth -= 1
                if depth == 0:
                    end = k
                    break
        inner = sql[j + 6 : end]
        expr, _, ndigits = inner.rpartition(",")
        scale = 10 ** int(ndigits.strip())
        out.append(f"FLOOR(({expr.strip()}) * {scale}.0 + 0.5) / {scale}.0")
        i = end + 1


# (ROUND -> half-up rewrite applied once at the END of this module,
# after every SQL entry is registered.)

SQL["q6_forecast_revenue"] = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.04 AND 0.06
  AND l_quantity < 24
"""

SQL["q8_market_share"] = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       ROUND(
           SUM(CASE WHEN supp_nation = 'NATION_2'
                    THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
           / SUM(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN (
    SELECT c_custkey FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
) ON o_custkey = c_custkey
JOIN (
    SELECT s_suppkey, n_name AS supp_nation FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
) ON l_suppkey = s_suppkey
GROUP BY 1
"""

SQL["q12_ship_lag_priority"] = """
SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) > 60 THEN 'late'
            WHEN datediff('day', o_orderdate, l_shipdate) >= 0 THEN 'on_time'
            ELSE 'preshipped' END AS ship_bucket,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_priority_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""

SQL["q13_customer_distribution"] = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
    SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY 1
)
GROUP BY 1
"""

SQL["q14_promo_revenue"] = """
SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue_pct,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
"""

SQL["q15_top_supplier"] = """
WITH per_supp AS (
    SELECT l_suppkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    GROUP BY 1
)
SELECT s_suppkey AS suppkey, s_name AS supp_name, total_revenue
FROM (
    SELECT *, MAX(total_revenue) OVER () AS max_rev FROM per_supp
)
JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = max_rev
"""

SQL["q16_part_supplier_counts"] = """
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_size <= 25
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""

SQL["q19_disjunctive_revenue"] = """
SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
"""

SQL["q22_idle_rich_customers"] = """
SELECT c_nationkey AS cntry,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       ROUND(SUM(c_acctbal), 2) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY 1
"""

SQL["tfidf_top_terms"] = f"""
WITH toksed AS (SELECT doc_id, lang, {_TOKS} AS toks FROM documents),
terms AS (SELECT lang, doc_id, unnest(toks) AS term FROM toksed),
stats AS (
    SELECT lang, term,
           CAST(COUNT(*) AS BIGINT) AS cf,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
    FROM terms GROUP BY 1, 2
),
ld AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_lang_docs FROM documents GROUP BY 1),
scored AS (
    SELECT lang, term, cf, df,
           CAST(cf AS DOUBLE) * n_lang_docs / df AS tfidf
    FROM stats JOIN ld USING (lang)
)
SELECT lang, term, cf, df, ROUND(tfidf, 6) AS tfidf, CAST(rank AS INTEGER) AS rank
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY lang ORDER BY tfidf DESC, term
    ) AS rank FROM scored
) WHERE rank <= {TFIDF_TOP_K}
"""

SQL["text_c4_filters"] = f"""
WITH toksed AS (SELECT source, {_TOKS} AS toks FROM documents),
per AS (
    SELECT source,
           len(toks) < {C4_MIN_TOKENS} AS too_short,
           CASE WHEN len(toks) > 0 THEN
               (list_aggregate(list_transform(toks, x -> length(x)), 'sum')
                / len(toks) < {C4_WORD_LEN_MIN}
                OR list_aggregate(list_transform(toks, x -> length(x)), 'sum')
                / len(toks) > {C4_WORD_LEN_MAX})
           ELSE TRUE END AS word_len_out,
           len(list_filter(toks, x -> list_contains({_STOPLIST}, x))) = 0
               AS no_stopword
    FROM toksed
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN too_short THEN 1 ELSE 0 END) AS BIGINT) AS n_too_short,
       CAST(SUM(CASE WHEN word_len_out THEN 1 ELSE 0 END) AS BIGINT) AS n_word_len_out,
       CAST(SUM(CASE WHEN no_stopword THEN 1 ELSE 0 END) AS BIGINT) AS n_no_stopword,
       CAST(SUM(CASE WHEN NOT too_short AND NOT word_len_out AND NOT no_stopword
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM per GROUP BY 1
"""

SQL["dedup_simhash_pairs"] = f"""
{_SIMHASH_CTES.format(toks=_TOKS)},
expl AS (
    {" UNION ALL ".join(f"SELECT doc_id, {b} AS band_idx, b{b} AS band_val FROM bands" for b in range(SIMHASH_N_BANDS))}
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM expl a JOIN expl b
      ON a.band_idx = b.band_idx AND a.band_val = b.band_val
     AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, hamming FROM (
    SELECT doc_a, doc_b,
           CAST({" + ".join(f"bit_count(xor(CAST(sa.b{b} AS BIGINT), CAST(sb.b{b} AS BIGINT)))" for b in range(SIMHASH_N_BANDS))}
                AS INTEGER) AS hamming
    FROM cand
    JOIN bands sa ON sa.doc_id = doc_a
    JOIN bands sb ON sb.doc_id = doc_b
) WHERE hamming <= {SIMHASH_HAM_MAX}
"""

SQL["embedding_norm_outliers"] = f"""
WITH normed AS (
    SELECT label, sqrt({_dot('embedding', 'embedding')}) AS norm FROM embeddings
),
stats AS (
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
           AVG(norm) AS mean_norm, STDDEV_SAMP(norm) AS std_norm
    FROM normed GROUP BY 1
)
SELECT label,
       MAX(n_vecs) AS n_vecs,
       ROUND(MAX(mean_norm), 4) AS mean_norm,
       ROUND(MAX(std_norm), 4) AS std_norm,
       CAST(SUM(CASE WHEN ROUND(ABS(norm - mean_norm), 6)
                          > ROUND({NORM_OUTLIER_Z} * std_norm, 6)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM normed JOIN stats USING (label)
GROUP BY 1
"""

SQL["q2_min_cost_supplier"] = f"""
WITH cost AS (
    SELECT l_partkey, l_suppkey,
           MIN(l_extendedprice / l_quantity) AS supplycost
    FROM lineitem GROUP BY 1, 2
),
regional AS (
    SELECT s_suppkey, s_name, s_acctbal, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = '{Q2_REGION}'
),
sized AS (
    SELECT p_partkey, p_name FROM part
    WHERE p_type = '{Q2_PART_TYPE}' AND p_size >= {Q2_MIN_SIZE}
),
offers AS (
    SELECT * FROM cost
    JOIN regional ON l_suppkey = s_suppkey
    JOIN sized ON l_partkey = p_partkey
),
best AS (SELECT l_partkey AS bk, MIN(supplycost) AS min_cost FROM offers GROUP BY 1)
SELECT l_partkey AS partkey, p_name, l_suppkey AS suppkey, s_name, n_name,
       ROUND(s_acctbal, 2) AS acctbal, ROUND(supplycost, 6) AS supplycost
FROM offers JOIN best ON l_partkey = bk AND supplycost = min_cost
ORDER BY acctbal DESC, suppkey ASC, partkey ASC
LIMIT {Q2_TOP_N}
"""

from .constants import SEMDEDUP_CELL_BUDGET  # noqa: E402

# cell-budget split mirrors the operator exactly: sub = 0 within
# budget (exact SemDeDup geometry), hyperplane bucket for oversized
# cells -- pairs only within (cell, sub)
SQL["semantic_dedup"] = f"""
WITH {_IVF_ASG_CTES},
cells AS (SELECT vec_id, embedding, cent_id AS cell FROM asg WHERE rn = 1),
csizes AS (SELECT cell, COUNT(*) AS cell_n,
                  {_split_fanout_expr('COUNT(*)', SEMDEDUP_CELL_BUDGET)} AS fanout
           FROM cells GROUP BY 1),
subbed AS (
    SELECT c.vec_id, c.embedding, c.cell,
           CASE WHEN s.cell_n > {SEMDEDUP_CELL_BUDGET}
                THEN ({_bucket_extra_expr('c.embedding')}) % s.fanout
                ELSE 0 END AS sub
    FROM cells c JOIN csizes s USING (cell)
),
occ AS (SELECT cell, sub, COUNT(*) AS occ_n FROM subbed GROUP BY 1, 2),
t AS (SELECT s.*, o.occ_n FROM subbed s JOIN occ o USING (cell, sub)),
small_pairs AS (
    SELECT a.cell, b.vec_id AS vec_b,
           ROUND({_cos('a.embedding', 'b.embedding')}, 6) AS cosine
    FROM t a JOIN t b
      ON a.cell = b.cell AND a.sub = b.sub AND a.vec_id < b.vec_id
    WHERE a.occ_n <= {SUB_OCC_CAP_MULT * SEMDEDUP_CELL_BUDGET}
),
ranked AS (
    SELECT cell, sub, vec_id, embedding,
           row_number() OVER (
               PARTITION BY cell, sub
               ORDER BY {_order_proj_expr('embedding')}, vec_id
           ) AS rn,
           row_number() OVER (
               PARTITION BY cell, sub
               ORDER BY {_order_proj_expr('embedding', EMB_ORDER_PLANE2)},
                        vec_id
           ) AS rn2
    FROM t WHERE occ_n > {SUB_OCC_CAP_MULT * SEMDEDUP_CELL_BUDGET}
),
-- r12 two-plane union at FULL-pair granularity (vec_a kept) so the
-- dedup matches Spark's distinct() over whole pairs; vec_a is
-- projected away only after
big_pairs_full AS (
    SELECT a.cell, LEAST(a.vec_id, b.vec_id) AS vec_a,
           GREATEST(a.vec_id, b.vec_id) AS vec_b,
           ROUND({_cos('a.embedding', 'b.embedding')}, 6) AS cosine
    FROM ranked a JOIN ranked b
      ON a.cell = b.cell AND a.sub = b.sub
     AND b.rn > a.rn AND b.rn <= a.rn + {EMB_PAIR_WINDOW}
    UNION
    SELECT a.cell, LEAST(a.vec_id, b.vec_id) AS vec_a,
           GREATEST(a.vec_id, b.vec_id) AS vec_b,
           ROUND({_cos('a.embedding', 'b.embedding')}, 6) AS cosine
    FROM ranked a JOIN ranked b
      ON a.cell = b.cell AND a.sub = b.sub
     AND b.rn2 > a.rn2 AND b.rn2 <= a.rn2 + {EMB_PAIR_WINDOW}
),
big_pairs AS (SELECT cell, vec_b, cosine FROM big_pairs_full),
pairs AS (SELECT * FROM small_pairs UNION ALL SELECT * FROM big_pairs),
kept_pairs AS (SELECT * FROM pairs WHERE cosine >= {COSINE_THRESHOLD}),
tot AS (
    SELECT cell, CAST(count(*) AS BIGINT) AS n_vecs FROM cells GROUP BY 1
),
dup AS (
    SELECT cell, CAST(count(*) AS BIGINT) AS n_dup_pairs,
           CAST(count(DISTINCT vec_b) AS BIGINT) AS n_dropped
    FROM kept_pairs GROUP BY 1
)
SELECT t.cell, t.n_vecs,
       CAST(COALESCE(d.n_dup_pairs, 0) AS BIGINT) AS n_dup_pairs,
       CAST(COALESCE(d.n_dropped, 0) AS BIGINT) AS n_dropped,
       CAST(t.n_vecs - COALESCE(d.n_dropped, 0) AS BIGINT) AS n_kept
FROM tot t LEFT JOIN dup d ON t.cell = d.cell
"""

SQL["q9_product_profit"] = f"""
WITH flt AS (
    SELECT p_partkey FROM part WHERE p_name LIKE '%{Q9_NAME_TOKEN}%'
),
cost AS (
    SELECT l_partkey, l_suppkey,
           MIN(l_extendedprice / l_quantity) AS supplycost
    FROM lineitem JOIN flt ON l_partkey = p_partkey
    GROUP BY 1, 2
)
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS INT) AS o_year,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)
                 - c.supplycost * l.l_quantity), 2) AS profit
FROM lineitem l
JOIN flt ON l.l_partkey = flt.p_partkey
JOIN cost c ON l.l_partkey = c.l_partkey AND l.l_suppkey = c.l_suppkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY 1, 2
"""

SQL["q11_important_stock"] = f"""
WITH regional AS (
    SELECT s_suppkey FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = '{Q11_REGION}'
),
per_part AS (
    SELECT l_partkey, SUM(l_extendedprice) AS value
    FROM lineitem JOIN regional ON l_suppkey = s_suppkey
    GROUP BY 1
),
tot AS (SELECT SUM(value) AS total FROM per_part)
SELECT l_partkey AS partkey, ROUND(value, 4) AS value
FROM per_part CROSS JOIN tot
WHERE ROUND(value, 4) > ROUND({Q11_FRACTION} * total, 4)
"""

SQL["q20_excess_suppliers"] = f"""
WITH pairs AS (
    SELECT l_partkey, l_suppkey,
           SUM(l_quantity) AS qty_total,
           SUM(CASE WHEN l_shipdate >= TIMESTAMP '{Q20_YEAR_START}'
                     AND l_shipdate <  TIMESTAMP '{Q20_YEAR_END}'
                    THEN l_quantity ELSE 0.0 END) AS qty_year
    FROM lineitem
    JOIN (SELECT p_partkey FROM part WHERE p_name LIKE '{Q20_NAME_PREFIX}%') p
      ON l_partkey = p_partkey
    GROUP BY 1, 2
    HAVING SUM(CASE WHEN l_shipdate >= TIMESTAMP '{Q20_YEAR_START}'
                     AND l_shipdate <  TIMESTAMP '{Q20_YEAR_END}'
                    THEN l_quantity ELSE 0.0 END) * 2 > SUM(l_quantity)
)
SELECT l_suppkey AS suppkey, s_name, n_name,
       CAST(COUNT(*) AS BIGINT) AS n_excess_parts
FROM pairs
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY 1, 2, 3
"""

SQL["q21_waiting_suppliers"] = f"""
WITH lines AS (
    SELECT l_orderkey, l_suppkey,
           datediff('day', o_orderdate, l_shipdate) > {Q21_LATE_DAYS} AS is_late
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
),
per_order AS (
    SELECT l_orderkey AS ok,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT CASE WHEN is_late THEN l_suppkey END) AS n_late_supp
    FROM lines GROUP BY 1
),
blamed AS (
    SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lines WHERE is_late)
    JOIN per_order ON l_orderkey = ok
    WHERE n_supp >= 2 AND n_late_supp = 1
    GROUP BY 1
)
SELECT l_suppkey AS suppkey, s_name, n_name, numwait
FROM blamed
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
ORDER BY numwait DESC, suppkey ASC
LIMIT {Q21_TOP_N}
"""


# ------------------------------------------------- round-2 additions

def _duck_md5_pct(arg_sql: str) -> str:
    """Twin of columns.md5_pct_bucket over an arbitrary string expr."""
    return (
        "(("
        + " + ".join(
            f"{_duck_hexval(f'md5({arg_sql})', i + 1)} * {16 ** (3 - i)}"
            for i in range(4)
        )
        + ") % 100)"
    )


SQL["corpus_quality_keep"] = f"""
WITH d AS (
    SELECT doc_id, lang, md5(text) AS text_hash, {_TOKS} AS toks,
           CASE WHEN {_duck_md5_pct('CAST(doc_id AS VARCHAR)')} < {SPLIT_TEST_PCT} THEN 'test'
                WHEN {_duck_md5_pct('CAST(doc_id AS VARCHAR)')} < {SPLIT_TEST_PCT + SPLIT_VAL_PCT} THEN 'val'
                ELSE 'train' END AS split
    FROM documents
),
flags AS (
    SELECT doc_id, lang, text_hash, split, len(toks) AS n_tokens,
           len(toks) >= {C4_MIN_TOKENS}
           AND CASE WHEN len(toks) > 0 THEN
                   (list_aggregate(list_transform(toks, w -> length(w)), 'sum') / len(toks))
                       BETWEEN {C4_WORD_LEN_MIN} AND {C4_WORD_LEN_MAX}
               ELSE FALSE END
           AND len(list_filter(toks, w -> list_contains({_STOPLIST}, w))) > 0
               AS passes_c4
    FROM d
),
canon AS (SELECT text_hash, MIN(doc_id) AS keep_doc_id FROM flags GROUP BY 1),
tagged AS (
    SELECT split, lang, n_tokens,
           passes_c4 AND f.doc_id = c.keep_doc_id AS kept
    FROM flags f JOIN canon c USING (text_hash)
)
SELECT split, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN kept THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens,
       ROUND(SUM(CASE WHEN kept THEN 1 ELSE 0 END) / COUNT(*), 6) AS keep_rate
FROM tagged GROUP BY 1, 2
"""

_SAMPLE_CASE = (
    "CASE lang "
    + " ".join(f"WHEN '{lang}' THEN {pct}" for lang, pct in sorted(SAMPLE_RATE_PCT.items()))
    + f" ELSE {SAMPLE_RATE_DEFAULT_PCT} END"
)

SQL["corpus_stratified_sample"] = f"""
WITH d AS (
    SELECT lang, {_SAMPLE_CASE} AS rate_pct,
           {_duck_md5_pct("'sample:' || CAST(doc_id AS VARCHAR)")} < ({_SAMPLE_CASE})
               AS sampled,
           len({_TOKS}) AS n_tokens
    FROM documents
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       MAX(rate_pct) AS rate_pct,
       CAST(SUM(CASE WHEN sampled THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       CAST(SUM(CASE WHEN sampled THEN n_tokens ELSE 0 END) AS BIGINT) AS sampled_tokens,
       ROUND(SUM(CASE WHEN sampled THEN 1 ELSE 0 END) / COUNT(*), 6) AS actual_rate
FROM d GROUP BY 1
"""

SQL["bpe_pair_counts"] = f"""
WITH bt AS (
    SELECT regexp_extract_all(lower(text), '{BPE_TOKEN_RE}') AS t FROM documents
),
pairs AS (
    SELECT t[pos] || ' ' || t[pos + 1] AS pair
    FROM bt, unnest(range(1, len(t))) AS u(pos)
    WHERE len(t) >= 2
)
SELECT pair, CAST(COUNT(*) AS BIGINT) AS n_occurrences
FROM pairs GROUP BY 1
ORDER BY n_occurrences DESC, pair ASC
LIMIT {BPE_PAIR_TOP_N}
"""

SQL["vocab_coverage"] = f"""
WITH tc AS (
    SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM (SELECT lang, unnest({_TOKS}) AS term FROM documents)
    GROUP BY 1, 2
),
ranked AS (
    SELECT lang, cnt,
           row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, term ASC) AS rnk
    FROM tc
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_terms,
       CAST(SUM(cnt) AS BIGINT) AS total_tokens,
       CAST(SUM(CASE WHEN rnk <= {VOCAB_TOP_K} THEN cnt ELSE 0 END) AS BIGINT)
           AS top_k_tokens,
       ROUND(SUM(CASE WHEN rnk <= {VOCAB_TOP_K} THEN cnt ELSE 0 END) / SUM(cnt), 6)
           AS coverage
FROM ranked GROUP BY 1
"""

_SPAN_CAT = " || ' ' || ".join(
    "toks[i]" if j == 0 else f"toks[i+{j}]" for j in range(SPAN_NGRAM_K)
)

SQL["repeated_ngram_spans"] = f"""
WITH toksed AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
g AS (
    SELECT doc_id, md5(gram) AS gram_hash FROM (
        SELECT doc_id, unnest(list_transform(
            range(1, len(toks) - {SPAN_NGRAM_K - 2}), i -> {_SPAN_CAT}
        )) AS gram
        FROM toksed WHERE len(toks) >= {SPAN_NGRAM_K}
    )
),
per_gram AS (
    SELECT gram_hash,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           MIN(doc_id) AS min_doc_id
    FROM g GROUP BY 1
)
SELECT gram_hash, n_docs, n_occurrences, min_doc_id
FROM per_gram WHERE n_docs > 1
ORDER BY n_docs DESC, n_occurrences DESC, gram_hash ASC
LIMIT {SPAN_TOP_N}
"""

# excision CTEs: keep the lexicographic-first occurrence of every
# repeated K-gram, merge the other occurrences' windows into maximal
# per-doc spans (gaps-and-islands); mirror the operator exactly and
# feed both the cut-list query and the impact report
_EXCISION_CTES = f"""toksed AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
g AS (
    SELECT doc_id, CAST(i AS BIGINT) AS pos, md5({_SPAN_CAT}) AS gram_hash
    FROM toksed, unnest(range(1, len(toks) - {SPAN_NGRAM_K - 2})) AS u(i)
    WHERE len(toks) >= {SPAN_NGRAM_K}
),
ranked AS (
    SELECT doc_id, pos,
           ROW_NUMBER() OVER (
               PARTITION BY gram_hash ORDER BY doc_id, pos
           ) AS rn
    FROM g
),
rm AS (SELECT doc_id, pos FROM ranked WHERE rn > 1),
flagged AS (
    SELECT doc_id, pos,
           CASE WHEN pos <= LAG(pos) OVER (
                    PARTITION BY doc_id ORDER BY pos
                ) + {SPAN_NGRAM_K}
                THEN 0 ELSE 1 END AS brk
    FROM rm
),
isl AS (
    SELECT doc_id, pos,
           SUM(brk) OVER (
               PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING
           ) AS island
    FROM flagged
),
spans AS (
    SELECT doc_id,
           CAST(MIN(pos) AS BIGINT) AS span_start,
           CAST(MAX(pos) + {SPAN_NGRAM_K - 1} AS BIGINT) AS span_end,
           CAST(MAX(pos) + {SPAN_NGRAM_K - 1} - MIN(pos) + 1 AS BIGINT)
               AS n_tokens
    FROM isl GROUP BY doc_id, island
)"""

SQL["repeated_span_excision"] = f"""
WITH {_EXCISION_CTES}
SELECT doc_id, span_start, span_end, n_tokens FROM spans
"""

SQL["span_excision_stats"] = f"""
WITH {_EXCISION_CTES},
per_doc AS (
    SELECT doc_id, COUNT(*) AS n_spans, SUM(n_tokens) AS cut_tokens
    FROM spans GROUP BY 1
),
meta AS (
    SELECT doc_id, lang, source, len({_TOKS}) AS n_toks FROM documents
)
SELECT m.lang, m.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN p.n_spans > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_docs_cut,
       CAST(SUM(COALESCE(p.n_spans, 0)) AS BIGINT) AS n_spans,
       CAST(SUM(m.n_toks) AS BIGINT) AS total_tokens,
       CAST(SUM(COALESCE(p.cut_tokens, 0)) AS BIGINT) AS tokens_removed,
       CASE WHEN SUM(m.n_toks) = 0 THEN 0.0
            ELSE ROUND(SUM(COALESCE(p.cut_tokens, 0)) / SUM(m.n_toks), 6)
       END AS removed_share
FROM meta m LEFT JOIN per_doc p USING (doc_id)
GROUP BY 1, 2
"""

# exact KL(source || corpus) over unigram distributions; p_s = 0 terms
# vanish analytically, p_c > 0 for every token the source contains, so
# no smoothing; the fold sums in ascending sorted order (the pagerank
# idiom) to bit-match the Spark aggregate
SQL["token_distribution_drift"] = f"""
WITH st AS (
    SELECT source, tok, COUNT(*) AS c_st FROM (
        SELECT source, unnest({_TOKS}) AS tok FROM documents
    ) GROUP BY 1, 2
),
corpus AS (SELECT tok, SUM(c_st) AS c_t FROM st GROUP BY 1),
totals AS (SELECT source, SUM(c_st) AS n_s FROM st GROUP BY 1),
grand AS (SELECT SUM(n_s) AS n_corpus FROM totals),
terms AS (
    SELECT st.source, t.n_s,
           (st.c_st / t.n_s)
           * ln((st.c_st / t.n_s) / (c.c_t / g.n_corpus)) AS term
    FROM st JOIN corpus c USING (tok) JOIN totals t USING (source), grand g
)
SELECT source,
       CAST(MAX(n_s) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS vocab_size,
       ROUND(list_aggregate(list_sort(list(term)), 'sum'), 6) AS kl_drift
FROM terms GROUP BY 1
"""

# same clusters by construction (both compute connected components of
# the same verified near-dup graph) -- the recursive-CTE twin is shared
SQL["dedup_clusters_bigstar"] = SQL["dedup_clusters"]

SQL["segment_dedup"] = f"""
WITH toksed AS (
    SELECT doc_id, lang, source, {_TOKS} AS toks FROM documents
),
segs AS (
    SELECT doc_id, lang, source,
           md5(array_to_string(
               list_slice(toks, k * {SEGMENT_W} + 1, (k + 1) * {SEGMENT_W}), ' '
           )) AS seg_hash
    FROM toksed, unnest(range(0, len(toks) // {SEGMENT_W})) AS u(k)
    WHERE len(toks) >= {SEGMENT_W}
),
seg_counts AS (SELECT seg_hash, COUNT(*) AS n_occ FROM segs GROUP BY 1),
per_doc AS (
    SELECT doc_id, lang, source, COUNT(*) AS n_segs,
           SUM(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END) AS n_dup_segs
    FROM segs JOIN seg_counts USING (seg_hash)
    GROUP BY 1, 2, 3
)
SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_segs) AS BIGINT) AS total_segments,
       CAST(SUM(n_dup_segs) AS BIGINT) AS dup_segments,
       ROUND(SUM(n_dup_segs) / SUM(n_segs), 6) AS dup_share,
       CAST(SUM(CASE WHEN n_dup_segs * 2 >= n_segs THEN 1 ELSE 0 END) AS BIGINT)
           AS n_boilerplate_docs
FROM per_doc GROUP BY 1, 2
"""

# segment-grain MinHash: same signature/banding formulas as
# _MINHASH_CTES but keyed by sid over segment-class representatives
_SEG_BANDS_UNION = "\n    UNION ALL ".join(
    "SELECT sid, {b} AS band_idx, md5({cat}) AS band_hash FROM rsigs".format(
        b=b,
        cat=" || '|' || ".join(
            f"sig{b * MINHASH_BAND_ROWS + r}" for r in range(MINHASH_BAND_ROWS)
        ),
    )
    for b in range(_N_BANDS)
)

SQL["segment_minhash_dedup"] = f"""
WITH toksed AS (
    SELECT doc_id, lang, source, {_TOKS} AS toks FROM documents
),
dsh AS (
    SELECT doc_id, {_SHINGLES} AS shingles FROM toksed WHERE len(toks) >= 3
),
dshh AS (SELECT doc_id, {_SHINGLES_H} AS shingles FROM dsh),
dsigs AS (SELECT doc_id, {_SIG_COLS} FROM dsh),
dbands AS (
    {_BANDS_UNION.replace("FROM sigs", "FROM dsigs")}
),
dcand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM dbands a JOIN dbands b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
     AND a.doc_id < b.doc_id
),
dver AS (
    SELECT doc_a, doc_b FROM (
        SELECT doc_a, doc_b,
               len(list_intersect(sa.shingles, sb.shingles))
               / len(list_distinct(list_concat(sa.shingles, sb.shingles)))
                   AS jaccard
        FROM dcand
        JOIN dshh sa ON sa.doc_id = doc_a
        JOIN dshh sb ON sb.doc_id = doc_b
    ) WHERE jaccard >= {JACCARD_THRESHOLD}
),
dup_docs AS (
    SELECT DISTINCT doc_id FROM (
        SELECT doc_a AS doc_id FROM dver
        UNION ALL SELECT doc_b AS doc_id FROM dver
    )
),
doc_stats AS (
    SELECT t.lang, t.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN dd.doc_id IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS near_dup_docs,
           ROUND(SUM(CASE WHEN dd.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                 / COUNT(*), 6) AS doc_dup_share
    FROM toksed t LEFT JOIN dup_docs dd ON dd.doc_id = t.doc_id
    GROUP BY 1, 2
),
segs AS (
    SELECT lang, source,
           doc_id * {SEGMENT_SID_MULT} + k AS sid,
           list_slice(toks, k * {SEGMENT_W} + 1, (k + 1) * {SEGMENT_W}) AS toks
    FROM toksed, unnest(range(0, len(toks) // {SEGMENT_W})) AS u(k)
    WHERE len(toks) >= {SEGMENT_W}
),
seghash AS (
    SELECT lang, source, sid,
           md5(array_to_string(toks, ' ')) AS seg_hash,
           {_SHINGLES} AS shingles
    FROM segs
),
classes AS (
    SELECT seg_hash, MIN(sid) AS rep_sid, COUNT(*) AS n_occ
    FROM seghash GROUP BY 1
),
reps AS (
    SELECT c.rep_sid AS sid, s.shingles
    FROM classes c
    JOIN seghash s ON s.seg_hash = c.seg_hash AND s.sid = c.rep_sid
),
repsh AS (SELECT sid, {_SHINGLES_H} AS shingles FROM reps),
rsigs AS (SELECT sid, {_SIG_COLS} FROM reps),
rbands AS (
    {_SEG_BANDS_UNION}
),
rcand AS (
    SELECT DISTINCT a.sid AS sid_a, b.sid AS sid_b
    FROM rbands a JOIN rbands b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
     AND a.sid < b.sid
),
rdrop AS (
    SELECT DISTINCT sid_b AS rep_sid FROM (
        SELECT sid_b,
               len(list_intersect(ra.shingles, rb.shingles))
               / len(list_distinct(list_concat(ra.shingles, rb.shingles)))
                   AS jaccard
        FROM rcand
        JOIN repsh ra ON ra.sid = sid_a
        JOIN repsh rb ON rb.sid = sid_b
    ) WHERE jaccard >= {SEGMENT_JACCARD_THRESHOLD}
),
occ AS (
    SELECT s.lang, s.source,
           CASE WHEN s.sid <> c.rep_sid THEN 1 ELSE 0 END AS exact_drop,
           CASE WHEN s.sid = c.rep_sid AND rd.rep_sid IS NOT NULL
                THEN 1 ELSE 0 END AS near_drop
    FROM seghash s
    JOIN classes c ON c.seg_hash = s.seg_hash
    LEFT JOIN rdrop rd ON rd.rep_sid = c.rep_sid
),
seg_stats AS (
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(exact_drop) AS BIGINT) AS exact_dup_segments,
           CAST(SUM(near_drop) AS BIGINT) AS near_dup_segments,
           ROUND((SUM(exact_drop) + SUM(near_drop)) / COUNT(*), 6)
               AS seg_drop_share
    FROM occ GROUP BY 1, 2
)
SELECT d.lang, d.source, d.n_docs, d.near_dup_docs, d.doc_dup_share,
       COALESCE(s.n_segments, 0) AS n_segments,
       COALESCE(s.exact_dup_segments, 0) AS exact_dup_segments,
       COALESCE(s.near_dup_segments, 0) AS near_dup_segments,
       s.seg_drop_share
FROM doc_stats d LEFT JOIN seg_stats s
  ON s.lang = d.lang AND s.source = d.source
"""

SQL["dedup_incremental"] = f"""{_MINHASH_CTES},
split_bands AS (
    SELECT doc_id, band_idx, band_hash,
           {_duck_md5_pct('CAST(doc_id AS VARCHAR)')} < {INCREMENTAL_EXISTING_PCT}
               AS is_existing
    FROM bands
),
cand AS (
    SELECT DISTINCT n.doc_id AS new_doc, o.doc_id AS existing_doc
    FROM split_bands n JOIN split_bands o
      ON n.band_idx = o.band_idx AND n.band_hash = o.band_hash
    WHERE NOT n.is_existing AND o.is_existing
)
SELECT new_doc, existing_doc, jaccard FROM (
    SELECT new_doc, existing_doc,
           len(list_intersect(a.shingles, b.shingles))
           / CAST(len(list_distinct(list_concat(a.shingles, b.shingles))) AS DOUBLE)
               AS jaccard
    FROM cand
    JOIN shh a ON a.doc_id = new_doc
    JOIN shh b ON b.doc_id = existing_doc
) WHERE jaccard >= {JACCARD_THRESHOLD}
"""

SQL["unigram_logprob_score"] = f"""
WITH tok AS (
    SELECT doc_id, lang, source, unnest({_TOKS}) AS term FROM documents
),
vocab AS (
    SELECT term, COUNT(*) AS cnt FROM tok GROUP BY 1
),
tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS n_total FROM vocab),
per_doc AS (
    SELECT t.doc_id, t.lang, t.source,
           AVG(ln(CAST(v.cnt AS DOUBLE) / tot.n_total)) AS lp
    FROM tok t JOIN vocab v ON t.term = v.term CROSS JOIN tot
    GROUP BY 1, 2, 3
)
SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(lp), 4) AS avg_logprob,
       ROUND(MIN(lp), 4) AS min_logprob
FROM per_doc GROUP BY 1, 2
"""

SQL["corpus_source_mix"] = f"""
WITH s AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len({_TOKS})) AS BIGINT) AS total_tokens
    FROM documents GROUP BY 1
)
SELECT source, n_docs, total_tokens,
       ROUND(CAST(total_tokens AS DOUBLE) / CAST(SUM(total_tokens) OVER () AS DOUBLE), 6)
           AS token_share,
       ROUND(CASE WHEN total_tokens = 0 THEN 1.0
             ELSE LEAST(1.0,
                  (1.0 / COUNT(*) OVER ())
                  / (CAST(total_tokens AS DOUBLE)
                     / CAST(SUM(total_tokens) OVER () AS DOUBLE)))
             END, 6)
           AS sample_weight
FROM s
"""

SQL["vote_key_skew"] = """
WITH pk AS (
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1
),
t AS (
    SELECT CAST(SUM(cnt) AS DOUBLE) AS total,
           CAST(COUNT(*) AS DOUBLE) AS n_keys
    FROM pk
),
r AS (
    SELECT user_id, cnt,
           CAST(row_number() OVER (ORDER BY cnt DESC, user_id ASC) AS INTEGER)
               AS "rank"
    FROM pk
)
SELECT "rank", user_id, cnt,
       ROUND(cnt / t.total, 6) AS share,
       ROUND(cnt * t.n_keys / t.total, 4) AS x_mean_load
FROM r, t WHERE "rank" <= 20
"""

# deliberately the PLAIN unsalted join: the Spark side salts the
# shuffle (functions/skew.py), and matching this SQL's hash proves the
# salt is result-invisible
SQL["hot_key_join_salted"] = """
WITH fact AS (
    SELECT event_id, value,
           CASE WHEN event_type = 'click' THEN 1 ELSE user_id END AS skew_key
    FROM events
)
SELECT c.c_mktsegment AS segment,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT f.skew_key) AS BIGINT) AS n_keys,
       ROUND(sum(f.value), 2) AS total_value
FROM fact f JOIN customer c ON f.skew_key = c.c_custkey
GROUP BY 1
"""

SQL["embedding_quantization_stats"] = """
WITH pv AS (
    SELECT label, embedding,
           list_min(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS vmin,
           list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS vmax,
           len(embedding) AS dim
    FROM embeddings
),
r AS (SELECT label, MIN(vmin) AS lo, MAX(vmax) AS hi FROM pv GROUP BY 1),
wr AS (
    SELECT pv.label, embedding, dim, r.lo, (r.hi - r.lo) / 255.0 AS scale
    FROM pv JOIN r USING (label)
),
pe AS (
    SELECT label, lo, scale,
           CASE WHEN scale = 0 THEN 0.0
                ELSE list_sum(list_transform(embedding, x ->
                    pow(CAST(x AS DOUBLE)
                        - (lo + floor((CAST(x AS DOUBLE) - lo) / scale + 0.5)
                           * scale),
                        2))) / dim
           END AS mse
    FROM wr
)
SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
       ROUND(MIN(lo), 6) AS range_lo,
       ROUND(MAX(lo + scale * 255.0), 6) AS range_hi,
       ROUND(MAX(scale), 8) AS scale,
       ROUND(AVG(mse), 10) AS avg_mse
FROM pe GROUP BY 1
"""

SQL["doc_length_percentile_filter"] = """
WITH cuts AS (
    SELECT lang,
           quantile_cont(n_chars, 0.05) AS lo_cut,
           quantile_cont(n_chars, 0.95) AS hi_cut
    FROM documents GROUP BY 1
)
SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(MAX(c.lo_cut), 4) AS lo_cut,
       ROUND(MAX(c.hi_cut), 4) AS hi_cut,
       CAST(SUM(CASE WHEN d.n_chars >= c.lo_cut AND d.n_chars <= c.hi_cut
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       ROUND(SUM(CASE WHEN d.n_chars >= c.lo_cut AND d.n_chars <= c.hi_cut
                      THEN 1 ELSE 0 END) / COUNT(*), 6) AS kept_share
FROM documents d JOIN cuts c USING (lang)
GROUP BY 1
"""

# ------------------------------------------------------- round 3 ops

_SIG_EQ_SUM = " + ".join(
    f"CASE WHEN sa.sig{i} = sb.sig{i} THEN 1 ELSE 0 END" for i in range(MINHASH_SIGS)
)
SQL["minhash_jaccard_estimate"] = f"""{_MINHASH_CTES},
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
     AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       ROUND(({_SIG_EQ_SUM}) / {MINHASH_SIGS}, 6) AS est_jaccard,
       ROUND(len(list_intersect(ha.shingles, hb.shingles))
             / len(list_distinct(list_concat(ha.shingles, hb.shingles))), 6) AS exact_jaccard,
       ROUND(abs(({_SIG_EQ_SUM}) / {MINHASH_SIGS}
             - len(list_intersect(ha.shingles, hb.shingles))
               / len(list_distinct(list_concat(ha.shingles, hb.shingles)))), 6) AS abs_err
FROM cand
JOIN sigs sa ON sa.doc_id = doc_a
JOIN sigs sb ON sb.doc_id = doc_b
JOIN shh ha ON ha.doc_id = doc_a
JOIN shh hb ON hb.doc_id = doc_b
"""

SQL["near_dup_rate_by_source"] = f"""{_MINHASH_CTES},
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
     AND a.doc_id < b.doc_id
),
ver AS (
    SELECT doc_a, doc_b FROM (
        SELECT doc_a, doc_b,
               len(list_intersect(sa.shingles, sb.shingles))
               / len(list_distinct(list_concat(sa.shingles, sb.shingles))) AS jaccard
        FROM cand
        JOIN shh sa ON sa.doc_id = doc_a
        JOIN shh sb ON sb.doc_id = doc_b
    ) WHERE jaccard >= {JACCARD_THRESHOLD}
),
dup AS (
    SELECT DISTINCT doc_id FROM (
        SELECT doc_a AS doc_id FROM ver
        UNION ALL SELECT doc_b AS doc_id FROM ver
    )
)
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN dup.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_near_dup_docs,
       ROUND(sum(CASE WHEN dup.doc_id IS NOT NULL THEN 1 ELSE 0 END)
             / count(*), 6) AS dup_rate
FROM documents d LEFT JOIN dup ON d.doc_id = dup.doc_id
GROUP BY 1
"""

SQL["doc_chunk_windows"] = f"""
WITH toksed AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
t AS (SELECT doc_id, toks, len(toks) AS n FROM toksed WHERE len(toks) >= 1),
st AS (
    SELECT doc_id, toks, n,
           unnest(range(1, n + 1, {CHUNK_STRIDE})) AS start_pos,
           generate_subscripts(range(1, n + 1, {CHUNK_STRIDE}), 1) AS chunk_idx
    FROM t
)
SELECT doc_id,
       CAST(chunk_idx AS INT) AS chunk_idx,
       CAST(start_pos AS INT) AS start_pos,
       CAST(len(toks[start_pos : start_pos + {CHUNK_W} - 1]) AS INT) AS n_chunk_tokens,
       md5(array_to_string(toks[start_pos : start_pos + {CHUNK_W} - 1], ' ')) AS chunk_hash
FROM st
WHERE start_pos = 1 OR start_pos <= n - {CHUNK_W - CHUNK_STRIDE}
"""

SQL["token_zipf_stats"] = f"""
WITH tok AS (SELECT lang, unnest({_TOKS}) AS term FROM documents),
tc AS (SELECT lang, term, count(*) AS cnt FROM tok GROUP BY 1, 2),
rk AS (
    SELECT lang, cnt,
           row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, term) AS rnk
    FROM tc
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_ranks,
       CAST(sum(cnt) AS BIGINT) AS top_k_tokens,
       ROUND(regr_slope(ln(CAST(cnt AS DOUBLE)), ln(CAST(rnk AS DOUBLE))), 4) AS zipf_slope,
       ROUND(regr_intercept(ln(CAST(cnt AS DOUBLE)), ln(CAST(rnk AS DOUBLE))), 4) AS zipf_intercept,
       ROUND(regr_r2(ln(CAST(cnt AS DOUBLE)), ln(CAST(rnk AS DOUBLE))), 4) AS fit_r2
FROM rk WHERE rnk <= {ZIPF_TOP_K}
GROUP BY 1
"""

SQL["embedding_pca_stats"] = """
WITH x AS (
    SELECT unnest(embedding) AS v, generate_subscripts(embedding, 1) AS i
    FROM embeddings
)
SELECT CAST(i - 1 AS INT) AS dim,
       CAST(count(*) AS BIGINT) AS n_vecs,
       ROUND(avg(CAST(v AS DOUBLE)), 6) AS mean_d,
       ROUND(avg(CAST(v AS DOUBLE) * CAST(v AS DOUBLE))
             - avg(CAST(v AS DOUBLE)) * avg(CAST(v AS DOUBLE)), 6) AS var_d
FROM x GROUP BY i
"""

SQL["source_url_dedup"] = f"""
WITH toksed AS (SELECT source, {_TOKS} AS toks FROM documents),
hs AS (
    SELECT DISTINCT
           list_aggregate(list_transform({_SHINGLES}, s -> md5(s)), 'min') AS fingerprint,
           source
    FROM toksed WHERE len(toks) >= 3
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(count(*) AS BIGINT) AS n_shared_fps,
       min(a.fingerprint) AS min_shared_fp
FROM hs a JOIN hs b ON a.fingerprint = b.fingerprint AND a.source < b.source
GROUP BY 1, 2
"""

_CONT_GRAM = " || ' ' || ".join(
    f"toks[i+{j}]" if j else "toks[i]" for j in range(CONTAINMENT_NGRAM_K)
)
SQL["ngram_containment"] = f"""
WITH toksed AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
g AS (
    SELECT doc_id,
           list_distinct(list_transform(range(1, len(toks) - {CONTAINMENT_NGRAM_K - 2}),
               i -> {_CONT_GRAM})) AS grams
    FROM toksed WHERE len(toks) >= {CONTAINMENT_NGRAM_K}
),
e AS (SELECT doc_id, md5(unnest(grams)) AS gram_hash FROM g),
kept AS (
    SELECT gram_hash FROM e GROUP BY 1
    HAVING count(*) > 1 AND count(*) <= {CONTAINMENT_MAX_DF}
),
ek AS (SELECT e.doc_id, e.gram_hash FROM e JOIN kept USING (gram_hash)),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_inter
    FROM ek a JOIN ek b ON a.gram_hash = b.gram_hash AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
sz AS (SELECT doc_id, len(grams) AS n FROM g),
scored AS (
    SELECT doc_a, doc_b, n_inter,
           ROUND(n_inter / least(na.n, nb.n), 6) AS containment
    FROM inter
    JOIN sz na ON inter.doc_a = na.doc_id
    JOIN sz nb ON inter.doc_b = nb.doc_id
)
SELECT * FROM scored WHERE containment >= {CONTAINMENT_THRESHOLD}
"""

_PQ_IDS = "(" + ", ".join(str(i) for i in PQ_CODEBOOK_IDS) + ")"


def _pq_sq(a_elem: str, b_elem: str) -> str:
    """(a-b)*(a-b) with both sides cast to double -- the multiply
    form, matching the Spark fold exactly (pow may route exp/log)."""
    return f"(CAST({a_elem} AS DOUBLE) - CAST({b_elem} AS DOUBLE)) * (CAST({a_elem} AS DOUBLE) - CAST({b_elem} AS DOUBLE))"


def _pq_adc_term(m: int) -> str:
    return (
        f"list_aggregate(list_transform(range(1, {PQ_SUB_DIM + 1}), "
        f"j -> {_pq_sq(f'q.q_emb[{m * PQ_SUB_DIM} + j]', f'cbl.cbs[e.c{m} + 1][{m * PQ_SUB_DIM} + j]')}), 'sum')"
    )


SQL["ann_pq_topk"] = f"""
WITH cb AS (
    SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS code, embedding
    FROM embeddings WHERE vec_id IN {_PQ_IDS}
),
cbl AS (SELECT list(embedding ORDER BY code) AS cbs FROM cb),
enc0 AS (
    SELECT e.vec_id, m.m, c.code,
           list_aggregate(list_transform(range(1, {PQ_SUB_DIM + 1}),
               j -> {_pq_sq('e.embedding[m.m * ' + str(PQ_SUB_DIM) + ' + j]', 'c.embedding[m.m * ' + str(PQ_SUB_DIM) + ' + j]')}), 'sum') AS dist
    FROM embeddings e
    CROSS JOIN (SELECT unnest(range(0, {PQ_M})) AS m) m
    CROSS JOIN cb c
),
enc AS (
    SELECT vec_id, m, code FROM (
        SELECT vec_id, m, code,
               row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, code) AS rn
        FROM enc0
    ) WHERE rn = 1
),
encw AS (
    SELECT vec_id,
           {", ".join(f"max(CASE WHEN m = {m} THEN code END) AS c{m}" for m in range(PQ_M))}
    FROM enc GROUP BY vec_id
),
q AS (
    SELECT vec_id AS query_id, embedding AS q_emb
    FROM embeddings WHERE vec_id IN {_ANN_IDS}
),
j AS (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           {" + ".join(_pq_adc_term(m) for m in range(PQ_M))} AS adc_dist
    FROM encw e JOIN q ON e.vec_id <> q.query_id CROSS JOIN cbl
),
r AS (
    SELECT query_id, neighbor_id,
           CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY adc_dist, neighbor_id
           ) AS INTEGER) AS "rank",
           adc_dist
    FROM j
)
SELECT query_id, neighbor_id, "rank", ROUND(adc_dist, 6) AS adc_dist
FROM r WHERE "rank" <= {ANN_K}
"""

SQL["voter_retention_cohort"] = f"""
WITH {_EVENTS_CTE},
cohort AS (
    SELECT user_id, date_trunc('month', min(ts)) AS cohort_month
    FROM ev GROUP BY 1
),
active AS (
    SELECT DISTINCT user_id, date_trunc('month', ts) AS activity_month FROM ev
)
SELECT c.cohort_month,
       CAST((year(a.activity_month) - year(c.cohort_month)) * 12
            + (month(a.activity_month) - month(c.cohort_month)) AS INT)
           AS month_offset,
       CAST(count(*) AS BIGINT) AS n_voters
FROM active a JOIN cohort c USING (user_id)
GROUP BY 1, 2
"""

SQL["funnel_conversion"] = f"""
WITH {_EVENTS_CTE},
fv AS (
    SELECT user_id,
           min(CASE WHEN event_type = 'view' THEN ts END) AS first_view
    FROM ev GROUP BY 1
),
fc AS (
    SELECT e.user_id, max(fv.first_view) AS first_view,
           min(CASE WHEN e.event_type = 'click' AND e.ts >= fv.first_view
                    THEN e.ts END) AS first_click
    FROM ev e JOIN fv ON e.user_id = fv.user_id
    GROUP BY 1
),
st AS (
    SELECT e.user_id, max(fc.first_view) AS first_view,
           max(fc.first_click) AS first_click,
           min(CASE WHEN e.event_type = 'purchase' AND e.ts >= fc.first_click
                    THEN e.ts END) AS first_purchase
    FROM ev e JOIN fc ON e.user_id = fc.user_id
    GROUP BY 1
)
SELECT c.c_mktsegment AS segment,
       CAST(count(*) AS BIGINT) AS n_voters,
       CAST(sum(CASE WHEN st.first_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_viewed,
       CAST(sum(CASE WHEN st.first_click IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_clicked_after_view,
       CAST(sum(CASE WHEN st.first_purchase IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_purchased_after_click,
       ROUND(sum(CASE WHEN st.first_purchase IS NOT NULL THEN 1 ELSE 0 END)
             / count(*), 6) AS full_funnel_rate
FROM st JOIN customer c ON st.user_id = c.c_custkey
GROUP BY 1
"""

SQL["votes_anomaly_zscore"] = f"""
WITH {_EVENTS_CTE},
hourly AS (
    SELECT event_type AS candidate_id, date_trunc('hour', ts) AS hour,
           CAST(count(*) AS BIGINT) AS n_votes
    FROM ev GROUP BY 1, 2
),
stats AS (
    SELECT candidate_id, count(*) AS n_hours,
           sum(n_votes) AS s1, sum(n_votes * n_votes) AS s2
    FROM hourly GROUP BY 1
)
SELECT candidate_id, hour, n_votes,
       ROUND(mean, 4) AS hourly_mean,
       ROUND(z, 4) AS z_score
FROM (
    SELECT h.candidate_id, h.hour, h.n_votes,
           CAST(s.s1 AS DOUBLE) / s.n_hours AS mean,
           CAST(s.s2 AS DOUBLE) / s.n_hours
               - (CAST(s.s1 AS DOUBLE) / s.n_hours)
                 * (CAST(s.s1 AS DOUBLE) / s.n_hours) AS var_pop,
           (h.n_votes - CAST(s.s1 AS DOUBLE) / s.n_hours)
           / sqrt(CAST(s.s2 AS DOUBLE) / s.n_hours
                  - (CAST(s.s1 AS DOUBLE) / s.n_hours)
                    * (CAST(s.s1 AS DOUBLE) / s.n_hours)) AS z
    FROM hourly h JOIN stats s ON h.candidate_id = s.candidate_id
)
WHERE var_pop > 0 AND abs(z) >= 2.0
"""

SQL["brand_price_trend"] = """
WITH monthly AS (
    SELECT p.p_brand AS brand,
           date_trunc('month', l.l_shipdate) AS ship_month,
           CAST(count(*) AS BIGINT) AS n_lines,
           ROUND(avg(l.l_extendedprice), 4) AS avg_price
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1, 2
)
SELECT brand, ship_month, n_lines, avg_price,
       ROUND(avg(avg_price) OVER (
           PARTITION BY brand ORDER BY ship_month
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
       ), 4) AS avg_price_3mo
FROM monthly
"""

SQL["embedding_label_cohesion"] = f"""
WITH x AS (
    SELECT label, unnest(embedding) AS v, generate_subscripts(embedding, 1) AS i
    FROM embeddings
),
cm AS (SELECT label, i, avg(CAST(v AS DOUBLE)) AS m FROM x GROUP BY 1, 2),
c AS (SELECT label, list(m ORDER BY i) AS centroid FROM cm GROUP BY 1),
n AS (SELECT label, CAST(count(*) AS BIGINT) AS n_vecs FROM embeddings GROUP BY 1),
j AS (
    SELECT e.label, {_cos('e.embedding', 'c.centroid')} AS cos
    FROM embeddings e JOIN c USING (label)
)
SELECT j.label, max(n.n_vecs) AS n_vecs,
       ROUND(avg(cos), 4) AS avg_cohesion,
       ROUND(min(cos), 4) AS min_cohesion
FROM j JOIN n ON j.label = n.label
GROUP BY 1
"""

SQL["supplier_lead_time"] = """
SELECT n.n_name AS nation,
       CAST(count(*) AS BIGINT) AS n_lines,
       ROUND(avg(datediff('day', CAST(o.o_orderdate AS DATE),
                          CAST(l.l_shipdate AS DATE))), 4) AS avg_lead_days,
       CAST(min(datediff('day', CAST(o.o_orderdate AS DATE),
                         CAST(l.l_shipdate AS DATE))) AS INT) AS min_lead_days,
       CAST(max(datediff('day', CAST(o.o_orderdate AS DATE),
                         CAST(l.l_shipdate AS DATE))) AS INT) AS max_lead_days
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY 1
"""

SQL["vote_value_histogram"] = f"""
WITH {_EVENTS_CTE}
SELECT event_type AS candidate_id,
       CAST(greatest(0, least(9, floor(value / 10.0))) AS INT) AS bucket,
       CAST(greatest(0, least(9, floor(value / 10.0))) AS INT) * 10 AS bucket_lo,
       CAST(count(*) AS BIGINT) AS n_votes
FROM ev
GROUP BY 1, 2, 3
"""

SQL["market_basket_pairs"] = """
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
no AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM items),
pc AS (SELECT l_partkey AS part, CAST(count(*) AS BIGINT) AS n_part
       FROM items GROUP BY 1),
pairs AS (
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           CAST(count(*) AS BIGINT) AS n_both
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
)
SELECT part_a, part_b, n_both,
       ROUND(n_both / no.n_orders, 6) AS support,
       ROUND((n_both * no.n_orders) / (na.n_part * nb.n_part), 6) AS lift
FROM pairs
JOIN pc na ON pairs.part_a = na.part
JOIN pc nb ON pairs.part_b = nb.part
CROSS JOIN no
ORDER BY n_both DESC, part_a, part_b
LIMIT 20
"""

SQL["supplier_concentration"] = """
WITH per_supp AS (
    SELECT p.p_type AS part_type, l.l_suppkey AS supp,
           sum(l.l_quantity) AS qty_s
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1, 2
),
totals AS (
    SELECT part_type, sum(qty_s) AS qty_total,
           CAST(count(*) AS BIGINT) AS n_suppliers
    FROM per_supp GROUP BY 1
)
SELECT s.part_type, max(t.n_suppliers) AS n_suppliers,
       ROUND(sum((s.qty_s / t.qty_total) * (s.qty_s / t.qty_total)), 6) AS hhi
FROM per_supp s JOIN totals t ON s.part_type = t.part_type
GROUP BY 1
"""

SQL["voter_party_loyalty"] = f"""
WITH {_EVENTS_CTE},
pv AS (
    SELECT user_id, count(DISTINCT {_PARTY_CASE}) AS n_parties
    FROM ev GROUP BY 1
)
SELECT c.c_mktsegment AS segment,
       CAST(count(*) AS BIGINT) AS n_voters,
       CAST(sum(CASE WHEN pv.n_parties > 1 THEN 0 ELSE 1 END) AS BIGINT)
           AS n_single_party,
       CAST(sum(CASE WHEN pv.n_parties > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_multi_party,
       ROUND(sum(CASE WHEN pv.n_parties > 1 THEN 1 ELSE 0 END) / count(*), 6)
           AS multi_party_rate
FROM pv JOIN customer c ON pv.user_id = c.c_custkey
GROUP BY 1
"""

SQL["near_dup_graph_degree"] = f"""{_MINHASH_CTES},
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
     AND a.doc_id < b.doc_id
),
ver AS (
    SELECT doc_a, doc_b FROM (
        SELECT doc_a, doc_b,
               len(list_intersect(sa.shingles, sb.shingles))
               / len(list_distinct(list_concat(sa.shingles, sb.shingles))) AS jaccard
        FROM cand
        JOIN shh sa ON sa.doc_id = doc_a
        JOIN shh sb ON sb.doc_id = doc_b
    ) WHERE jaccard >= {JACCARD_THRESHOLD}
),
deg AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS degree FROM (
        SELECT doc_a AS doc_id FROM ver
        UNION ALL SELECT doc_b AS doc_id FROM ver
    ) GROUP BY 1
)
SELECT degree, CAST(count(*) AS BIGINT) AS n_docs, min(doc_id) AS min_doc_id
FROM deg GROUP BY 1
"""


def _ri_edge(name: str, fact: str, fk: str, dim: str, pk: str) -> str:
    return f"""
SELECT '{name}' AS fk_edge,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN d.{pk} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans,
       CASE WHEN count(*) > 0
            THEN ROUND(sum(CASE WHEN d.{pk} IS NULL THEN 1 ELSE 0 END) / count(*), 6)
            ELSE 0.0 END AS orphan_rate
FROM {fact} f LEFT JOIN (SELECT DISTINCT {pk} FROM {dim}) d ON f.{fk} = d.{pk}"""


SQL["referential_integrity_audit"] = "\nUNION ALL\n".join(
    [
        _ri_edge("events.user_id->customer", "events", "user_id", "customer", "c_custkey"),
        _ri_edge("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        _ri_edge("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
        _ri_edge("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        _ri_edge("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ]
)


def _completeness_field(c: str) -> str:
    return f"""
SELECT '{c}' AS field,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(sum(CASE WHEN {c} IS NOT NULL AND trim({c}) = '' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_blank,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct
FROM documents"""


SQL["doc_field_completeness"] = "\nUNION ALL\n".join(
    _completeness_field(c) for c in ["text", "lang", "source"]
)

SQL["repeat_buyers_by_nation"] = """
WITH both_years AS (
    SELECT DISTINCT o_custkey FROM orders
    WHERE o_orderdate >= '1997-01-01' AND o_orderdate < '1998-01-01'
    INTERSECT
    SELECT DISTINCT o_custkey FROM orders
    WHERE o_orderdate >= '1998-01-01' AND o_orderdate < '1999-01-01'
)
SELECT n.n_name AS nation, CAST(count(*) AS BIGINT) AS n_repeat_buyers
FROM both_years b
JOIN customer c ON b.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY 1
"""

SQL["turnout_grouping_sets"] = f"""
WITH {_EVENTS_CTE},
enriched AS (
    SELECT r.r_name AS region, c.c_mktsegment AS segment
    {_VOTE_GEO_JOIN}
    JOIN region r ON n.n_regionkey = r.r_regionkey
)
SELECT region, segment, CAST(count(*) AS BIGINT) AS total_turnout_votes
FROM enriched
GROUP BY GROUPING SETS ((region), (segment), ())
"""

SQL["customer_spend_deciles"] = """
WITH spend AS (
    SELECT o.o_custkey, ROUND(sum(o.o_totalprice), 2) AS total_spend,
           n.n_name AS nation
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1, 3
),
ranked AS (
    SELECT nation, total_spend,
           CAST(least(9, floor(
               percent_rank() OVER (
                   PARTITION BY nation ORDER BY total_spend, o_custkey
               ) * 10)) AS INT) AS decile
    FROM spend
)
SELECT nation, decile,
       CAST(count(*) AS BIGINT) AS n_customers,
       ROUND(min(total_spend), 2) AS min_spend,
       ROUND(max(total_spend), 2) AS max_spend
FROM ranked
GROUP BY 1, 2
"""

SQL["order_fill_rate"] = """
WITH per_order AS (
    SELECT o.o_orderkey, o.o_orderpriority,
           bool_and(datediff('day', CAST(o.o_orderdate AS DATE),
                             CAST(l.l_shipdate AS DATE)) <= 30) AS fully_on_time
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2
)
SELECT o_orderpriority AS order_priority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CASE WHEN fully_on_time THEN 1 ELSE 0 END) AS BIGINT)
           AS n_fully_on_time,
       ROUND(sum(CASE WHEN fully_on_time THEN 1 ELSE 0 END) / count(*), 6)
           AS fill_rate
FROM per_order
GROUP BY 1
"""

# Composed from the three ANN oracles above (subqueries with their
# own CTE stacks): recall@k of each approximate method vs the exact
# brute-force truth set, per query.
SQL["ann_recall_report"] = f"""
WITH bf AS (SELECT query_id, neighbor_id FROM ({SQL["ann_bruteforce_topk"]})),
lsh AS (SELECT query_id, neighbor_id FROM ({SQL["ann_lsh_topk"]})),
ivf AS (SELECT query_id, neighbor_id FROM ({SQL["ann_ivf_topk"]})),
truth_k AS (
    SELECT query_id, CAST(count(*) AS BIGINT) AS k FROM bf GROUP BY 1
),
hits AS (
    SELECT 'lsh' AS method, l.query_id, CAST(count(*) AS BIGINT) AS n_hit
    FROM lsh l JOIN bf USING (query_id, neighbor_id) GROUP BY 2
    UNION ALL
    SELECT 'ivf' AS method, i.query_id, CAST(count(*) AS BIGINT) AS n_hit
    FROM ivf i JOIN bf USING (query_id, neighbor_id) GROUP BY 2
)
SELECT m.method, t.query_id, t.k,
       CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
       ROUND(COALESCE(h.n_hit, 0) / t.k, 6) AS recall
FROM (SELECT 'lsh' AS method UNION ALL SELECT 'ivf') m
CROSS JOIN truth_k t
LEFT JOIN hits h ON h.method = m.method AND h.query_id = t.query_id
"""

# ------------------------------------------------- round 4 cont. ops

SQL["source_temperature_weights"] = f"""
WITH s AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len({_TOKS})) AS BIGINT) AS total_tokens
    FROM documents GROUP BY 1
),
t AS (SELECT CAST(SUM(total_tokens) AS BIGINT) AS tt FROM s),
q AS (
    SELECT source, n_docs, total_tokens,
           CAST(total_tokens AS DOUBLE) / tt AS share,
           sqrt(CAST(total_tokens AS DOUBLE) / tt) AS sq
    FROM s, t
),
d AS (
    -- ascending sorted fold: the one float sum here is
    -- order-independent, mirroring the Spark aggregate(array_sort(..))
    SELECT list_aggregate(list_sort(list(sq)), 'sum') AS denom FROM q
)
SELECT source, n_docs, total_tokens,
       ROUND(share, 6) AS token_share,
       ROUND(sq / denom, 6) AS temp_prob,
       ROUND(CASE WHEN total_tokens = 0 THEN 0.0
             ELSE (sq / denom) / share END, 4) AS mix_boost
FROM q, d
"""

SQL["dedup_threshold_sweep"] = f"""{_MINHASH_CTES},
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
     AND a.doc_id < b.doc_id
),
binned AS (
    SELECT CAST(FLOOR(len(list_intersect(sa.shingles, sb.shingles))
                      * {THRESHOLD_SWEEP_BINS}
                      / len(list_distinct(list_concat(sa.shingles, sb.shingles))))
                AS INT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM cand
    JOIN shh sa ON sa.doc_id = doc_a
    JOIN shh sb ON sb.doc_id = doc_b
    GROUP BY 1
)
SELECT bin,
       ROUND(bin / CAST({THRESHOLD_SWEEP_BINS} AS DOUBLE), 4) AS bin_lo,
       n_pairs,
       CAST(SUM(n_pairs) OVER (ORDER BY bin DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_pairs_at_tau,
       ROUND(CAST(n_pairs AS DOUBLE) / SUM(n_pairs) OVER (), 6) AS pair_share
FROM binned
"""

SQL["doc_length_mad_outliers"] = f"""
WITH med AS (
    SELECT lang, quantile_cont(n_chars, 0.5) AS med
    FROM documents GROUP BY 1
),
dev AS (
    SELECT d.lang, abs(d.n_chars - m.med) AS dev, m.med
    FROM documents d JOIN med m USING (lang)
),
mad AS (
    SELECT lang, quantile_cont(dev, 0.5) AS mad FROM dev GROUP BY 1
)
SELECT dev.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(MAX(dev.med), 4) AS median_chars,
       ROUND(MAX(mad.mad), 4) AS mad_chars,
       CAST(SUM(CASE WHEN dev.dev > {MAD_OUTLIER_K} * mad.mad
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       ROUND(SUM(CASE WHEN dev.dev > {MAD_OUTLIER_K} * mad.mad
                 THEN 1 ELSE 0 END) / COUNT(*), 6) AS outlier_rate
FROM dev JOIN mad USING (lang)
GROUP BY 1
"""

SQL["doc_winnowing_fingerprints"] = f"""
WITH g AS (
    SELECT doc_id, length(text) - {WINNOW_K} + 1 AS npos, pos,
           substr(md5(substr(text, CAST(pos AS INT), {WINNOW_K})), 1, 8) AS h
    FROM documents, UNNEST(range(1, length(text) - {WINNOW_K} + 2)) AS u(pos)
    WHERE length(text) >= {WINNOW_K}
),
fp AS (
    SELECT DISTINCT doc_id, sel.h AS h FROM (
        SELECT doc_id, npos, pos,
               min({{'h': h, 'np': -pos}}) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING
               ) AS sel
        FROM g
    ) WHERE pos <= npos - {WINNOW_W} + 1
),
shared_h AS (
    SELECT h FROM fp GROUP BY h HAVING COUNT(DISTINCT doc_id) > 1
),
per_doc AS (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fp FROM fp GROUP BY 1
),
docs_shared AS (
    SELECT DISTINCT doc_id, 1 AS has_shared FROM fp
    WHERE h IN (SELECT h FROM shared_h)
)
SELECT d.lang, d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(COALESCE(p.n_fp, 0)) AS BIGINT) AS total_fp,
       ROUND(SUM(COALESCE(p.n_fp, 0)) / COUNT(*), 4) AS avg_fp_per_doc,
       CAST(SUM(COALESCE(s.has_shared, 0)) AS BIGINT) AS docs_with_shared_fp,
       ROUND(SUM(COALESCE(s.has_shared, 0)) / COUNT(*), 6) AS shared_doc_share
FROM documents d
LEFT JOIN per_doc p USING (doc_id)
LEFT JOIN docs_shared s USING (doc_id)
GROUP BY 1, 2
"""

SQL["doc_embed_inference"] = """
WITH hs AS (
    SELECT doc_id, lang,
           list_transform(range(0, 16),
               j -> substr(md5(doc_id || ':' || j), 1, 8)) AS h8
    FROM documents
),
em AS (
    SELECT doc_id, lang,
           list_transform(h8, h -> ((((((((0 * 16 + (strpos('0123456789abcdef', substr(h, 1, 1)) - 1)) * 16 + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1)) * 16 + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1)) * 16 + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1)) * 16 + (strpos('0123456789abcdef', substr(h, 5, 1)) - 1)) * 16 + (strpos('0123456789abcdef', substr(h, 6, 1)) - 1)) * 16 + (strpos('0123456789abcdef', substr(h, 7, 1)) - 1)) * 16 + (strpos('0123456789abcdef', substr(h, 8, 1)) - 1)) / 4294967296.0 - 0.5) AS e
    FROM hs
)
SELECT doc_id, lang, CAST(16 AS INT) AS dim,
       ROUND(e[1], 6) AS e_first,
       ROUND(e[16], 6) AS e_last,
       ROUND(sqrt(((((((((((((((((0.0 + e[1] * e[1]) + e[2] * e[2]) + e[3] * e[3]) + e[4] * e[4]) + e[5] * e[5]) + e[6] * e[6]) + e[7] * e[7]) + e[8] * e[8]) + e[9] * e[9]) + e[10] * e[10]) + e[11] * e[11]) + e[12] * e[12]) + e[13] * e[13]) + e[14] * e[14]) + e[15] * e[15]) + e[16] * e[16])), 6) AS norm
FROM em
"""

SQL["near_dup_pagerank"] = f"""{_MINHASH_CTES},
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
     AND a.doc_id < b.doc_id
),
vp AS (
    SELECT doc_a, doc_b FROM (
        SELECT doc_a, doc_b,
               len(list_intersect(sa.shingles, sb.shingles))
               / len(list_distinct(list_concat(sa.shingles, sb.shingles))) AS j
        FROM cand
        JOIN shh sa ON sa.doc_id = doc_a
        JOIN shh sb ON sb.doc_id = doc_b
    ) WHERE j >= {JACCARD_THRESHOLD}
),
edges AS (
    SELECT doc_a AS src, doc_b AS dst FROM vp
    UNION
    SELECT doc_b AS src, doc_a AS dst FROM vp
),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY 1),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM deg),
p0 AS (SELECT src, deg, 1.0 / nn.n_nodes AS pr FROM deg, nn),
s1 AS (
    SELECT e.dst AS src,
           list_aggregate(list_sort(list(p.pr / p.deg)), 'sum') AS s
    FROM edges e JOIN p0 p ON p.src = e.src GROUP BY 1
),
p1 AS (
    SELECT p.src, p.deg,
           (1.0 - 0.85) / nn.n_nodes + 0.85 * COALESCE(s1.s, 0.0) AS pr
    FROM p0 p LEFT JOIN s1 USING (src), nn
),
s2 AS (
    SELECT e.dst AS src,
           list_aggregate(list_sort(list(p.pr / p.deg)), 'sum') AS s
    FROM edges e JOIN p1 p ON p.src = e.src GROUP BY 1
),
p2 AS (
    SELECT p.src, p.deg,
           (1.0 - 0.85) / nn.n_nodes + 0.85 * COALESCE(s2.s, 0.0) AS pr
    FROM p1 p LEFT JOIN s2 USING (src), nn
),
s3 AS (
    SELECT e.dst AS src,
           list_aggregate(list_sort(list(p.pr / p.deg)), 'sum') AS s
    FROM edges e JOIN p2 p ON p.src = e.src GROUP BY 1
),
p3 AS (
    SELECT p.src, p.deg,
           (1.0 - 0.85) / nn.n_nodes + 0.85 * COALESCE(s3.s, 0.0) AS pr
    FROM p2 p LEFT JOIN s3 USING (src), nn
)
SELECT src AS doc_id, deg AS degree, ROUND(pr, 6) AS pagerank FROM p3
"""

from .constants import EPOCH_PREVIEW_N, EPOCH_SEED, QUALITY_TOPK  # noqa: E402

SQL["domain_quality_topk"] = f"""
WITH d AS (SELECT source, doc_id, {_TOKS} AS toks FROM documents),
s AS (
    SELECT source, doc_id,
           CASE WHEN len(toks) > 0 THEN ROUND(
               LEAST(len(toks) / 200.0, 1.0) * 0.5
               + (len(list_filter(toks, w -> list_contains({_STOPLIST}, w)))
                  / len(toks)) * 0.3
               + LEAST((list_aggregate(list_transform(toks, w -> length(w)), 'sum')
                        / len(toks)) / 10.0, 1.0) * 0.2,
               6)
           ELSE 0.0 END AS quality
    FROM d
),
r AS (
    SELECT source, doc_id, quality,
           CAST(row_number() OVER (
               PARTITION BY source ORDER BY quality DESC, doc_id ASC
           ) AS INT) AS quality_rank
    FROM s
)
SELECT source, doc_id, quality, quality_rank FROM r
WHERE quality_rank <= {QUALITY_TOPK}
"""

SQL["corpus_epoch_shuffle"] = f"""
WITH k AS (
    SELECT doc_id,
           md5('epoch{EPOCH_SEED}:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
    FROM documents
),
r AS (
    SELECT CAST(row_number() OVER (ORDER BY shuffle_key, doc_id) AS INT)
               AS epoch_pos,
           doc_id, shuffle_key
    FROM k
)
SELECT epoch_pos, doc_id, shuffle_key FROM r WHERE epoch_pos <= {EPOCH_PREVIEW_N}
"""

SQL["event_transition_matrix"] = f"""
WITH {_EVENTS_CTE},
p AS (
    SELECT user_id, event_type,
           lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS prev_type
    FROM ev
),
c AS (
    SELECT prev_type, event_type AS next_type,
           CAST(COUNT(*) AS BIGINT) AS n_transitions
    FROM p WHERE prev_type IS NOT NULL GROUP BY 1, 2
)
SELECT prev_type, next_type, n_transitions,
       ROUND(n_transitions / SUM(n_transitions) OVER (PARTITION BY prev_type),
             6) AS p_next
FROM c
"""

SQL["votes_sliding_window"] = f"""
WITH {_EVENTS_CTE},
x AS (
    SELECT date_trunc('hour', ts) AS window_start, event_type, value FROM ev
    UNION ALL
    SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS window_start,
           event_type, value FROM ev
)
SELECT window_start, event_type AS candidate_id,
       CAST(COUNT(*) AS BIGINT) AS total_votes,
       ROUND(SUM(value), 2) AS total_weight
FROM x GROUP BY 1, 2
"""

from .constants import BIGRAM_LAMBDA  # noqa: E402

SQL["bigram_logprob_score"] = f"""
WITH d AS (SELECT doc_id, lang, source, {_TOKS} AS toks FROM documents),
pair AS (
    SELECT doc_id, lang, source,
           unnest(list_transform(range(1, len(toks)),
                                 i -> toks[i] || ' ' || toks[i+1])) AS bigram
    FROM d WHERE len(toks) >= 2
),
tok AS (SELECT unnest({_TOKS}) AS term FROM documents),
uni AS (SELECT term, COUNT(*) AS uni_cnt FROM tok GROUP BY 1),
tot AS (SELECT CAST(SUM(uni_cnt) AS DOUBLE) AS n_total FROM uni),
bi AS (SELECT bigram, COUNT(*) AS bi_cnt FROM pair GROUP BY 1),
ctx AS (
    SELECT split_part(bigram, ' ', 1) AS w1, SUM(bi_cnt) AS ctx_cnt
    FROM bi GROUP BY 1
),
scored AS (
    SELECT p.doc_id, p.lang, p.source,
           ln({BIGRAM_LAMBDA} * (CAST(b.bi_cnt AS DOUBLE) / c.ctx_cnt)
              + {1.0 - BIGRAM_LAMBDA} * (CAST(u.uni_cnt AS DOUBLE) / tot.n_total))
               AS logp
    FROM pair p
    JOIN bi b ON p.bigram = b.bigram
    JOIN ctx c ON split_part(p.bigram, ' ', 1) = c.w1
    JOIN uni u ON split_part(p.bigram, ' ', 2) = u.term
    CROSS JOIN tot
),
per_doc AS (
    SELECT doc_id, lang, source, AVG(logp) AS lp
    FROM scored GROUP BY 1, 2, 3
)
SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(lp), 4) AS avg_logprob,
       ROUND(MIN(lp), 4) AS min_logprob
FROM per_doc GROUP BY 1, 2
"""

SQL["near_dup_triangles"] = f"""{_MINHASH_CTES},
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
     AND a.doc_id < b.doc_id
),
ver AS (
    SELECT doc_a, doc_b FROM (
        SELECT doc_a, doc_b,
               len(list_intersect(sa.shingles, sb.shingles))
               / len(list_distinct(list_concat(sa.shingles, sb.shingles))) AS jaccard
        FROM cand
        JOIN shh sa ON sa.doc_id = doc_a
        JOIN shh sb ON sb.doc_id = doc_b
    ) WHERE jaccard >= {JACCARD_THRESHOLD}
),
deg AS (
    SELECT doc_id, COUNT(*) AS deg FROM (
        SELECT doc_a AS doc_id FROM ver
        UNION ALL SELECT doc_b AS doc_id FROM ver
    ) GROUP BY 1
),
vw AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_vertices,
           CAST(SUM(deg * (deg - 1) / 2) AS BIGINT) AS n_wedges
    FROM deg
),
edg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM ver),
tri AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM ver e1
    JOIN ver e2 ON e1.doc_b = e2.doc_a
    JOIN ver e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
)
SELECT n_vertices, n_edges, n_wedges, n_triangles,
       CASE WHEN n_wedges > 0
            THEN ROUND(3.0 * n_triangles / n_wedges, 6)
            ELSE 0.0 END AS global_clustering
FROM vw, edg, tri
"""

SQL["text_entropy_score"] = f"""
WITH tok AS (
    SELECT doc_id, lang, source, unnest({_TOKS}) AS term FROM documents
),
cnt AS (
    SELECT doc_id, lang, source, term, COUNT(*) AS c
    FROM tok GROUP BY 1, 2, 3, 4
),
pd AS (
    SELECT doc_id, lang, source,
           SUM(-(c / tot) * ln(c / tot)) AS entropy
    FROM (SELECT *, SUM(c) OVER (PARTITION BY doc_id) AS tot FROM cnt)
    GROUP BY 1, 2, 3
)
SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(entropy), 4) AS avg_entropy,
       ROUND(MIN(entropy), 4) AS min_entropy,
       ROUND(MAX(entropy), 4) AS max_entropy
FROM pd GROUP BY 1, 2
"""

SQL["voter_stickiness"] = f"""
WITH {_EVENTS_CTE},
daily AS (SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM ev),
dau AS (
    SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM daily GROUP BY 1
),
contrib AS (
    SELECT DISTINCT
           unnest(generate_series(day, day + INTERVAL 6 DAY,
                                  INTERVAL 1 DAY)) AS win_day,
           user_id
    FROM daily
),
wau AS (
    SELECT win_day, CAST(COUNT(*) AS BIGINT) AS wau FROM contrib GROUP BY 1
)
SELECT d.day, d.dau, w.wau, ROUND(d.dau / w.wau, 6) AS stickiness
FROM dau d JOIN wau w ON d.day = w.win_day
"""

from .constants import (  # noqa: E402
    BPE_MERGE_STEPS,
    TOKEN_BUDGET,
)

SQL["token_budget_select"] = f"""
WITH d AS (SELECT doc_id, source, {_TOKS} AS toks FROM documents),
s AS (
    SELECT doc_id, source, len(toks) AS n_tokens,
           CASE WHEN len(toks) > 0 THEN ROUND(
               LEAST(len(toks) / 200.0, 1.0) * 0.5
               + (len(list_filter(toks, w -> list_contains({_STOPLIST}, w)))
                  / len(toks)) * 0.3
               + LEAST((list_aggregate(list_transform(toks, w -> length(w)), 'sum')
                        / len(toks)) / 10.0, 1.0) * 0.2,
               6)
           ELSE 0.0 END AS quality
    FROM d
),
c AS (
    SELECT source, n_tokens, quality,
           SUM(n_tokens) OVER (ORDER BY quality DESC, doc_id ASC
                               ROWS UNBOUNDED PRECEDING) AS cum
    FROM s
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN cum <= {TOKEN_BUDGET} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_kept,
       CAST(SUM(CASE WHEN cum <= {TOKEN_BUDGET} THEN n_tokens ELSE 0 END) AS BIGINT)
           AS kept_tokens,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       MIN(CASE WHEN cum <= {TOKEN_BUDGET} THEN quality END) AS cutoff_quality
FROM c GROUP BY 1
"""

# The Bloom prefilter only prunes; the exact verify join decides.  The
# oracle is therefore IDENTICAL to the exact path's -- asserting the
# physical-strategy swap never changes the answer.
SQL["bloom_decontam"] = SQL["benchmark_decontam"]


def _bpe_step_ctes(i: int) -> str:
    """One unrolled BPE merge step: pair counts from vocab{i-1}, the
    argmax pair, and the merged vocab{i}.  DuckDB's list_reduce with a
    string accumulator is the same greedy left-to-right fold the Spark
    operator runs (operators/text.py bpe_train_merges)."""
    return f"""
pairs{i} AS (
    SELECT p['l'] AS l, p['r'] AS r, SUM(freq) AS cnt
    FROM (
        SELECT freq,
               unnest(list_transform(
                   range(1, len(syms)),
                   j -> {{'l': syms[j], 'r': syms[j+1]}})) AS p
        FROM vocab{i - 1} WHERE len(syms) >= 2
    ) GROUP BY 1, 2
),
best{i} AS (
    SELECT l, r, cnt FROM pairs{i} ORDER BY cnt DESC, l ASC, r ASC LIMIT 1
),
vocab{i} AS (
    -- LEFT JOIN ON TRUE (not CROSS JOIN): when best{i} is empty the
    -- vocab must SURVIVE unmerged, matching the Spark trainer's
    -- 'if not best: break' -- a cross join with an empty frame would
    -- annihilate the chain and break the fertility oracle on corpora
    -- whose vocabulary exhausts before BPE_MERGE_STEPS merges
    SELECT w, freq,
           string_split(
               list_reduce(syms, (acc, s) -> CASE
                   WHEN b.r IS NOT NULL AND s = b.r
                        AND (acc = b.l OR ends_with(acc, chr(31) || b.l))
                   THEN acc || b.r ELSE acc || chr(31) || s END),
               chr(31)) AS syms
    FROM vocab{i - 1} LEFT JOIN best{i} b ON TRUE
)"""


SQL["bpe_train_merges"] = (
    f"""
WITH toks AS (SELECT unnest({_TOKS}) AS w FROM documents),
vocab0 AS (
    SELECT w, CAST(COUNT(*) AS BIGINT) AS freq, string_split(w, '') AS syms
    FROM toks GROUP BY w
),"""
    + ",".join(_bpe_step_ctes(i) for i in range(1, BPE_MERGE_STEPS + 1))
    + f""",
merges AS (
{" UNION ALL ".join(
        f"SELECT {i} AS step, l, r, cnt FROM best{i}"
        for i in range(1, BPE_MERGE_STEPS + 1)
    )}
)
SELECT CAST(step AS INT) AS step, l AS "left", r AS "right",
       CAST(cnt AS BIGINT) AS pair_count, l || r AS new_symbol
FROM merges ORDER BY step
"""
)

from .constants import BPE_BATCH  # noqa: E402


def _bpe_batched_pass_ctes(p: int, take: int) -> str:
    """One unrolled BATCHED BPE pass (operators/text.py
    _bpe_train_batched): pair counts from bvocab{p-1}, ``take``
    greedy symbol-disjoint selections (selection k is an argmax with
    NOT-EXISTS conflict filters against selections 1..k-1 -- the
    exact driver-side filter chain), and ONE rewrite fold applying
    every selection (disjointness makes the single CASE chain exact;
    at most one arm can match a given (acc, s))."""
    ctes = [
        f"""
bpairs{p} AS (
    SELECT q['l'] AS l, q['r'] AS r, SUM(freq) AS cnt
    FROM (
        SELECT freq,
               unnest(list_transform(
                   range(1, len(syms)),
                   j -> {{'l': syms[j], 'r': syms[j+1]}})) AS q
        FROM bvocab{p - 1} WHERE len(syms) >= 2
    ) GROUP BY 1, 2
)"""
    ]
    for k in range(1, take + 1):
        if k == 1:
            ctes.append(
                f"""
bsel{p}_1 AS (
    SELECT l, r, cnt FROM bpairs{p} ORDER BY cnt DESC, l ASC, r ASC LIMIT 1
)"""
            )
        else:
            conflicts = " OR ".join(
                f"""EXISTS (SELECT 1 FROM bsel{p}_{j} s
        WHERE c.l IN (s.l, s.r, s.l || s.r)
           OR c.r IN (s.l, s.r, s.l || s.r)
           OR (c.l || c.r) IN (s.l, s.r, s.l || s.r))"""
                for j in range(1, k)
            )
            ctes.append(
                f"""
bsel{p}_{k} AS (
    SELECT l, r, cnt FROM bpairs{p} c
    WHERE NOT ({conflicts})
    ORDER BY cnt DESC, l ASC, r ASC LIMIT 1
)"""
            )
    cases = "\n                   ".join(
        f"WHEN b{k}.r IS NOT NULL AND s = b{k}.r "
        f"AND (acc = b{k}.l OR ends_with(acc, chr(31) || b{k}.l)) "
        f"THEN acc || b{k}.r"
        for k in range(1, take + 1)
    )
    joins = "\n    ".join(
        f"LEFT JOIN bsel{p}_{k} b{k} ON TRUE" for k in range(1, take + 1)
    )
    ctes.append(
        f"""
bvocab{p} AS (
    SELECT w, freq,
           string_split(
               list_reduce(syms, (acc, s) -> CASE
                   {cases}
                   ELSE acc || chr(31) || s END),
               chr(31)) AS syms
    FROM bvocab{p - 1}
    {joins}
)"""
    )
    return ",".join(ctes)


_BPE_BATCHED_N_PASSES = -(-BPE_MERGE_STEPS // BPE_BATCH)
_BPE_BATCHED_TAKES = [
    min(BPE_BATCH, BPE_MERGE_STEPS - p * BPE_BATCH)
    for p in range(_BPE_BATCHED_N_PASSES)
]

# the shared WITH-body for the batched trainer's merge chain --
# bvocab{_BPE_BATCHED_N_PASSES} is the final trained vocab both the
# merge-table query and the batched fertility report consume
_BPE_BATCHED_CHAIN = (
    f"""btoks AS (SELECT unnest({_TOKS}) AS w FROM documents),
bvocab0 AS (
    SELECT w, CAST(COUNT(*) AS BIGINT) AS freq, string_split(w, '') AS syms
    FROM btoks GROUP BY w
),"""
    + ",".join(
        _bpe_batched_pass_ctes(p + 1, _BPE_BATCHED_TAKES[p])
        for p in range(_BPE_BATCHED_N_PASSES)
    )
)


def _bpe_batched_sql() -> str:
    union = " UNION ALL ".join(
        f"SELECT {p + 1} AS pass, {k} AS k, l, r, cnt FROM bsel{p + 1}_{k}"
        for p in range(_BPE_BATCHED_N_PASSES)
        for k in range(1, _BPE_BATCHED_TAKES[p] + 1)
    )
    return (
        "\nWITH "
        + _BPE_BATCHED_CHAIN
        + f""",
bmerges AS ({union})
SELECT CAST(ROW_NUMBER() OVER (ORDER BY pass, k) AS INT) AS step,
       l AS "left", r AS "right", CAST(cnt AS BIGINT) AS pair_count,
       l || r AS new_symbol
FROM bmerges ORDER BY step
"""
    )


SQL["bpe_train_merges_batched"] = _bpe_batched_sql()

SQL["bpe_fertility_stats_batched"] = (
    "\nWITH "
    + _BPE_BATCHED_CHAIN
    + f""",
blw AS (
    SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT lang, unnest({_TOKS}) AS w FROM documents) GROUP BY 1, 2
),
bj AS (
    SELECT blw.lang, blw.n, length(blw.w) AS wlen, len(v.syms) AS n_syms
    FROM blw JOIN bvocab{_BPE_BATCHED_N_PASSES} v ON blw.w = v.w
)
SELECT lang, CAST(SUM(n) AS BIGINT) AS n_words,
       CAST(SUM(n * wlen) AS BIGINT) AS total_chars,
       CAST(SUM(n * n_syms) AS BIGINT) AS total_symbols,
       ROUND(SUM(n * n_syms) / SUM(n), 6) AS fertility,
       ROUND(SUM(n * wlen) / SUM(n * n_syms), 6) AS chars_per_symbol
FROM bj GROUP BY 1
"""
)

from .constants import (  # noqa: E402
    CMS_DEPTH,
    CMS_WIDTH,
    HH_TOPK,
    SNM_BLOCK_LEN,
    SNM_KEY_LEN,
    SNM_WINDOW,
)


from .constants import SOURCE_TOKEN_CAP  # noqa: E402

SQL["source_capped_selection"] = f"""
WITH d AS (SELECT doc_id, source, {_TOKS} AS toks FROM documents),
s AS (
    SELECT doc_id, source, len(toks) AS n_tokens,
           CASE WHEN len(toks) > 0 THEN ROUND(
               LEAST(len(toks) / 200.0, 1.0) * 0.5
               + (len(list_filter(toks, w -> list_contains({_STOPLIST}, w)))
                  / len(toks)) * 0.3
               + LEAST((list_aggregate(list_transform(toks, w -> length(w)), 'sum')
                        / len(toks)) / 10.0, 1.0) * 0.2,
               6)
           ELSE 0.0 END AS quality
    FROM d
),
c AS (
    SELECT source, n_tokens, quality,
           SUM(n_tokens) OVER (PARTITION BY source
                               ORDER BY quality DESC, doc_id ASC
                               ROWS UNBOUNDED PRECEDING) AS cum
    FROM s
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN cum <= {SOURCE_TOKEN_CAP} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_kept,
       CAST(SUM(CASE WHEN cum <= {SOURCE_TOKEN_CAP} THEN n_tokens ELSE 0 END) AS BIGINT)
           AS kept_tokens,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       MIN(CASE WHEN cum <= {SOURCE_TOKEN_CAP} THEN quality END) AS cutoff_quality
FROM c GROUP BY 1
"""

from .constants import PQ_RERANK_SHORTLIST  # noqa: E402

_PQ_SHORT = SQL["ann_pq_topk"].replace(
    f'WHERE "rank" <= {ANN_K}', f'WHERE "rank" <= {PQ_RERANK_SHORTLIST}'
)
assert _PQ_SHORT != SQL["ann_pq_topk"]

SQL["ann_pq_rerank_topk"] = f"""
WITH short AS ({_PQ_SHORT}),
qr AS (
    SELECT vec_id AS query_id, embedding AS q_emb
    FROM embeddings WHERE vec_id IN {_ANN_IDS}
),
x AS (
    SELECT s.query_id, s.neighbor_id,
           {_cos('qr.q_emb', 'e.embedding')} AS cosine
    FROM short s
    JOIN qr ON qr.query_id = s.query_id
    JOIN embeddings e ON e.vec_id = s.neighbor_id
),
rr AS (
    SELECT query_id, neighbor_id,
           CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
           ) AS INTEGER) AS "rank",
           cosine
    FROM x
)
SELECT query_id, neighbor_id, "rank", ROUND(cosine, 6) AS cosine
FROM rr WHERE "rank" <= {ANN_K}
"""


def _duck_md5_mod(arg_sql: str, m: int) -> str:
    """Twin of columns.md5_mod_bucket over an arbitrary string expr."""
    return (
        "(("
        + " + ".join(
            f"{_duck_hexval(f'md5({arg_sql})', i + 1)} * {16 ** (3 - i)}"
            for i in range(4)
        )
        + f") % {m})"
    )


_CMS_BUCKET = _duck_md5_mod("CAST(d AS VARCHAR) || ':' || term", CMS_WIDTH)

SQL["token_heavy_hitters_cms"] = f"""
WITH terms AS (SELECT unnest({_TOKS}) AS term FROM documents),
exact AS (
    SELECT term, CAST(COUNT(*) AS BIGINT) AS exact_count
    FROM terms GROUP BY 1
    ORDER BY exact_count DESC, term ASC LIMIT {HH_TOPK}
),
upd AS (
    SELECT term, unnest(range(0, {CMS_DEPTH})) AS d FROM terms
),
cms AS (
    SELECT d, {_CMS_BUCKET} AS bucket, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM upd GROUP BY 1, 2
),
cand AS (
    SELECT term, exact_count, unnest(range(0, {CMS_DEPTH})) AS d FROM exact
),
cb AS (
    SELECT term, exact_count, d, {_CMS_BUCKET} AS bucket FROM cand
)
SELECT c.term, c.exact_count,
       CAST(MIN(m.cnt) AS BIGINT) AS cms_estimate,
       ROUND(MIN(m.cnt) / c.exact_count, 6) AS inflation
FROM cb c JOIN cms m USING (d, bucket)
GROUP BY 1, 2
"""

_SNM_LEADS = ", ".join(
    f"lead(doc_id, {lag}) OVER w{k} AS n{k}{lag}"
    for k in (1, 2)
    for lag in range(1, SNM_WINDOW + 1)
)
_SNM_UNNEST = ", ".join(
    f"n{k}{lag}" for k in (1, 2) for lag in range(1, SNM_WINDOW + 1)
)

SQL["dedup_sorted_neighborhood"] = f"""
WITH k AS (
    SELECT doc_id,
           lower(substr(text, 1, {SNM_KEY_LEN})) AS k1,
           lower(substr(reverse(text), 1, {SNM_KEY_LEN})) AS k2
    FROM documents WHERE length(text) >= {CHAR_NGRAM_K}
),
p AS (
    SELECT doc_id, {_SNM_LEADS}
    FROM k
    WINDOW w1 AS (PARTITION BY substr(k1, 1, {SNM_BLOCK_LEN}) ORDER BY k1, doc_id),
           w2 AS (PARTITION BY substr(k2, 1, {SNM_BLOCK_LEN}) ORDER BY k2, doc_id)
),
cand AS (
    SELECT DISTINCT LEAST(doc_id, n) AS doc_a, GREATEST(doc_id, n) AS doc_b
    FROM (SELECT doc_id, unnest([{_SNM_UNNEST}]) AS n FROM p)
    WHERE n IS NOT NULL
),
g AS (
    SELECT doc_id,
           list_distinct(list_transform(
               range(1, length(text) - {CHAR_NGRAM_K - 2}),
               i -> substr(text, i, {CHAR_NGRAM_K}))) AS grams
    FROM documents WHERE length(text) >= {CHAR_NGRAM_K}
)
SELECT doc_a, doc_b, jaccard FROM (
    SELECT c.doc_a, c.doc_b,
           ROUND(len(list_intersect(a.grams, b.grams))
                 / len(list_distinct(a.grams || b.grams)), 6) AS jaccard
    FROM cand c
    JOIN g a ON a.doc_id = c.doc_a
    JOIN g b ON b.doc_id = c.doc_b
) WHERE jaccard >= {NGRAM_JACCARD_THRESHOLD}
"""

SQL["ivf_cell_balance"] = f"""
WITH {_IVF_ASG_CTES},
cells AS (
    SELECT cent_id AS cell, CAST(COUNT(*) AS BIGINT) AS n_vectors
    FROM asg WHERE rn = 1 GROUP BY 1
)
SELECT CAST(cell AS BIGINT) AS cell, n_vectors,
       ROUND(n_vectors / SUM(n_vectors) OVER (), 6) AS share,
       ROUND(n_vectors / AVG(n_vectors) OVER (), 6) AS ratio_to_mean
FROM cells
"""

_WF_GRAM = " || ' ' || ".join(
    "toks[i]" if j == 0 else f"toks[i+{j}]" for j in range(DECONTAM_NGRAM_K)
)

SQL["curation_waterfall"] = f"""
WITH d AS (
    SELECT doc_id, source, md5(text) AS text_hash, {_TOKS} AS toks
    FROM documents WHERE source <> '{EVAL_SOURCE}'
),
ev AS (
    SELECT DISTINCT unnest(list_transform(
        range(1, len(toks) - {DECONTAM_NGRAM_K - 2}), i -> {_WF_GRAM}
    )) AS gram
    FROM (SELECT {_TOKS} AS toks FROM documents WHERE source = '{EVAL_SOURCE}')
    WHERE len(toks) >= {DECONTAM_NGRAM_K}
),
s AS (
    SELECT doc_id, text_hash, len(toks) AS n_tokens, toks,
           len(toks) >= {C4_MIN_TOKENS}
           AND CASE WHEN len(toks) > 0 THEN
                   (list_aggregate(list_transform(toks, w -> length(w)), 'sum') / len(toks))
                       BETWEEN {C4_WORD_LEN_MIN} AND {C4_WORD_LEN_MAX}
               ELSE FALSE END
           AND len(list_filter(toks, w -> list_contains({_STOPLIST}, w))) > 0
               AS c4,
           CASE WHEN len(toks) > 0 THEN ROUND(
               LEAST(len(toks) / 200.0, 1.0) * 0.5
               + (len(list_filter(toks, w -> list_contains({_STOPLIST}, w)))
                  / len(toks)) * 0.3
               + LEAST((list_aggregate(list_transform(toks, w -> length(w)), 'sum')
                        / len(toks)) / 10.0, 1.0) * 0.2,
               6)
           ELSE 0.0 END AS quality
    FROM d
),
hits AS (
    SELECT doc_id, COUNT(*) AS overlap FROM (
        SELECT g.doc_id, g.gram FROM (
            SELECT doc_id,
                   unnest(list_distinct(list_transform(
                       range(1, len(toks) - {DECONTAM_NGRAM_K - 2}),
                       i -> {_WF_GRAM}
                   ))) AS gram
            FROM s WHERE len(toks) >= {DECONTAM_NGRAM_K}
        ) g JOIN ev USING (gram)
    ) GROUP BY 1
),
canon AS (SELECT text_hash, MIN(doc_id) AS keep_doc_id FROM s GROUP BY 1),
flagged AS (
    SELECT s.doc_id, s.n_tokens, s.quality, s.c4,
           s.c4 AND s.doc_id = c.keep_doc_id AS canonical,
           s.c4 AND s.doc_id = c.keep_doc_id
               AND COALESCE(h.overlap, 0) = 0 AS clean
    FROM s JOIN canon c USING (text_hash)
    LEFT JOIN hits h ON h.doc_id = s.doc_id
),
staged AS (
    SELECT *,
           clean AND SUM(CASE WHEN clean THEN n_tokens ELSE 0 END)
               OVER (ORDER BY quality DESC, doc_id ASC
                     ROWS UNBOUNDED PRECEDING) <= {TOKEN_BUDGET} AS budgeted
    FROM flagged
)
SELECT '1_raw' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) AS n_tokens FROM staged
UNION ALL
SELECT '2_quality', CAST(COALESCE(SUM(CASE WHEN c4 THEN 1 ELSE 0 END), 0) AS BIGINT),
       CAST(COALESCE(SUM(CASE WHEN c4 THEN n_tokens ELSE 0 END), 0) AS BIGINT) FROM staged
UNION ALL
SELECT '3_canonical', CAST(COALESCE(SUM(CASE WHEN canonical THEN 1 ELSE 0 END), 0) AS BIGINT),
       CAST(COALESCE(SUM(CASE WHEN canonical THEN n_tokens ELSE 0 END), 0) AS BIGINT) FROM staged
UNION ALL
SELECT '4_decontaminated', CAST(COALESCE(SUM(CASE WHEN clean THEN 1 ELSE 0 END), 0) AS BIGINT),
       CAST(COALESCE(SUM(CASE WHEN clean THEN n_tokens ELSE 0 END), 0) AS BIGINT) FROM staged
UNION ALL
SELECT '5_token_budget', CAST(COALESCE(SUM(CASE WHEN budgeted THEN 1 ELSE 0 END), 0) AS BIGINT),
       CAST(COALESCE(SUM(CASE WHEN budgeted THEN n_tokens ELSE 0 END), 0) AS BIGINT) FROM staged
"""

SQL["bpe_fertility_stats"] = (
    f"""
WITH toks AS (SELECT unnest({_TOKS}) AS w FROM documents),
vocab0 AS (
    SELECT w, CAST(COUNT(*) AS BIGINT) AS freq, string_split(w, '') AS syms
    FROM toks GROUP BY w
),"""
    + ",".join(_bpe_step_ctes(i) for i in range(1, BPE_MERGE_STEPS + 1))
    + f""",
lw AS (
    SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT lang, unnest({_TOKS}) AS w FROM documents) GROUP BY 1, 2
),
j AS (
    SELECT lw.lang, lw.n, length(lw.w) AS wlen, len(v.syms) AS n_syms
    FROM lw JOIN vocab{BPE_MERGE_STEPS} v ON lw.w = v.w
)
SELECT lang, CAST(SUM(n) AS BIGINT) AS n_words,
       CAST(SUM(n * wlen) AS BIGINT) AS total_chars,
       CAST(SUM(n * n_syms) AS BIGINT) AS total_symbols,
       ROUND(SUM(n * n_syms) / SUM(n), 6) AS fertility,
       ROUND(SUM(n * wlen) / SUM(n * n_syms), 6) AS chars_per_symbol
FROM j GROUP BY 1
"""
)

SQL["dedup_soft_weights"] = f"""
WITH d AS (
    SELECT source, md5(text) AS text_hash, len({_TOKS}) AS n_tokens
    FROM documents
),
c AS (
    SELECT source, text_hash, n_tokens,
           COUNT(*) OVER (PARTITION BY text_hash) AS class_size
    FROM d
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT text_hash) AS BIGINT) AS n_classes,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       ROUND(SUM(n_tokens * (1.0 / class_size)), 4) AS effective_tokens,
       ROUND(SUM(1.0 / class_size), 4) AS retained_mass
FROM c GROUP BY 1
"""

_SPAN_CAT = " || ' ' || ".join(
    "toks[pos]" if j == 0 else f"toks[pos+{j}]" for j in range(DECONTAM_NGRAM_K)
)

SQL["contam_span_report"] = f"""
WITH toksed AS (
    SELECT doc_id, source, {_TOKS} AS toks FROM documents
),
sized AS (SELECT * FROM toksed WHERE len(toks) >= {DECONTAM_NGRAM_K}),
pp AS (
    SELECT doc_id, source, toks,
           unnest(range(1, len(toks) - {DECONTAM_NGRAM_K - 2})) AS pos
    FROM sized
),
g AS (SELECT doc_id, source, pos, {_SPAN_CAT} AS gram FROM pp),
eval_g AS (
    SELECT DISTINCT gram FROM g WHERE source = '{EVAL_SOURCE}'
),
hit_pos AS (
    SELECT g.doc_id, g.source, g.pos
    FROM g JOIN eval_g USING (gram) WHERE g.source <> '{EVAL_SOURCE}'
),
runs AS (
    SELECT doc_id, source,
           pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
    FROM hit_pos
),
r2 AS (
    SELECT doc_id, source, grp, COUNT(*) AS run_len
    FROM runs GROUP BY 1, 2, 3
)
SELECT doc_id, source,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(MAX(run_len) AS BIGINT) AS longest_span_grams,
       CAST(SUM(run_len) AS BIGINT) AS n_contam_grams
FROM r2 GROUP BY 1, 2
"""

SQL["cross_source_dup_matrix"] = f"""{_MINHASH_CTES},
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
     AND a.doc_id < b.doc_id
),
ver AS (
    SELECT doc_a, doc_b FROM (
        SELECT doc_a, doc_b,
               len(list_intersect(sa.shingles, sb.shingles))
               / len(list_distinct(list_concat(sa.shingles, sb.shingles))) AS jaccard
        FROM cand
        JOIN shh sa ON sa.doc_id = doc_a
        JOIN shh sb ON sb.doc_id = doc_b
    ) WHERE jaccard >= {JACCARD_THRESHOLD}
),
lab AS (
    SELECT least(da.source, db.source) AS source_a,
           greatest(da.source, db.source) AS source_b
    FROM ver
    JOIN documents da ON da.doc_id = ver.doc_a
    JOIN documents db ON db.doc_id = ver.doc_b
),
cells AS (
    SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM lab GROUP BY 1, 2
)
SELECT source_a, source_b, n_pairs,
       ROUND(n_pairs / (SELECT SUM(n_pairs) FROM cells), 6) AS pair_share
FROM cells
"""

SQL["minhash_band_collision_stats"] = f"""{_MINHASH_CTES},
pb AS (
    SELECT band_idx, band_hash, COUNT(*) AS k FROM bands GROUP BY 1, 2
)
SELECT band_idx,
       CAST(COUNT(*) AS BIGINT) AS n_buckets,
       CAST(SUM(k) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_colliding_buckets,
       CAST(SUM(CAST(k * (k - 1) / 2 AS BIGINT)) AS BIGINT) AS candidate_pairs,
       CAST(MAX(k) AS BIGINT) AS max_bucket
FROM pb GROUP BY 1
"""

SQL["dup_quality_report"] = f"""{_MINHASH_CTES},
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
     AND a.doc_id < b.doc_id
),
ver AS (
    SELECT doc_a, doc_b FROM (
        SELECT doc_a, doc_b,
               len(list_intersect(sa.shingles, sb.shingles))
               / len(list_distinct(list_concat(sa.shingles, sb.shingles))) AS jaccard
        FROM cand
        JOIN shh sa ON sa.doc_id = doc_a
        JOIN shh sb ON sb.doc_id = doc_b
    ) WHERE jaccard >= {JACCARD_THRESHOLD}
),
dup AS (
    SELECT DISTINCT doc_id FROM (
        SELECT doc_a AS doc_id FROM ver
        UNION ALL SELECT doc_b AS doc_id FROM ver
    )
),
q AS (
    SELECT doc_id, source,
           CASE WHEN len(toks) > 0 THEN ROUND(
               LEAST(len(toks) / 200.0, 1.0) * 0.5
               + (len(list_filter(toks, w -> list_contains({_STOPLIST}, w)))
                  / len(toks)) * 0.3
               + LEAST((list_aggregate(list_transform(toks, w -> length(w)), 'sum')
                        / len(toks)) / 10.0, 1.0) * 0.2,
               6)
           ELSE 0.0 END AS quality,
           CASE WHEN doc_id IN (SELECT doc_id FROM dup) THEN 1 ELSE 0 END AS is_dup
    FROM (SELECT doc_id, source, {_TOKS} AS toks FROM documents)
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(is_dup) AS BIGINT) AS n_dup_docs,
       ROUND(AVG(CASE WHEN is_dup = 1 THEN quality END), 4) AS avg_dup_quality,
       ROUND(AVG(CASE WHEN is_dup = 0 THEN quality END), 4) AS avg_clean_quality
FROM q GROUP BY 1
"""

from .constants import DRIFT_BUCKETS  # noqa: E402

SQL["token_bucket_drift"] = f"""
WITH bt AS (
    SELECT source, {_duck_md5_mod('tok', DRIFT_BUCKETS)} AS b
    FROM (SELECT source, unnest({_TOKS}) AS tok FROM documents)
),
sc AS (
    SELECT s.source, r.range AS b, COALESCE(c.k, 0) AS k, s.n_tokens
    FROM (SELECT source, COUNT(*) AS n_tokens FROM bt GROUP BY 1) s
    CROSS JOIN range({DRIFT_BUCKETS}) r
    LEFT JOIN (SELECT source, b, COUNT(*) AS k FROM bt GROUP BY 1, 2) c
      ON c.source = s.source AND c.b = r.range
),
corp AS (
    SELECT b, SUM(k) AS ck FROM sc GROUP BY 1
),
tot AS (SELECT SUM(ck) AS n FROM corp)
SELECT source,
       CAST(MAX(n_tokens) AS BIGINT) AS n_tokens,
       ROUND(0.5 * list_aggregate(
           list(ABS(k / n_tokens - ck / n) ORDER BY b), 'sum'), 6) AS tv_drift
FROM sc JOIN corp USING (b) CROSS JOIN tot
GROUP BY 1
"""

SQL["corpus_span_excised"] = f"""
WITH {_EXCISION_CTES},
cut_pos AS (
    SELECT DISTINCT doc_id, unnest(range(span_start, span_end + 1)) AS tp
    FROM spans
),
cutl AS (SELECT doc_id, list(tp) AS cuts FROM cut_pos GROUP BY 1),
alltoks AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
j AS (
    SELECT a.doc_id, a.toks, COALESCE(c.cuts, CAST([] AS BIGINT[])) AS cuts
    FROM alltoks a LEFT JOIN cutl c USING (doc_id)
),
k AS (
    SELECT doc_id, toks,
           list_filter(list_transform(toks, (x, i) ->
               CASE WHEN list_contains(cuts, i) THEN NULL ELSE x END),
               x -> x IS NOT NULL) AS kept
    FROM j
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens_before,
       CAST(len(kept) AS BIGINT) AS n_tokens_after,
       md5(COALESCE(array_to_string(kept, ' '), '')) AS excised_md5
FROM k
"""

from .constants import WHITEN_EPS  # noqa: E402

SQL["embedding_whitened_norms"] = f"""
WITH x AS (
    SELECT unnest(embedding) AS v, generate_subscripts(embedding, 1) AS i
    FROM embeddings
),
stats AS (
    SELECT i,
           ROUND(avg(CAST(v AS DOUBLE)), 6) AS m,
           ROUND(avg(CAST(v AS DOUBLE) * CAST(v AS DOUBLE))
                 - avg(CAST(v AS DOUBLE)) * avg(CAST(v AS DOUBLE)), 6) AS va
    FROM x GROUP BY i
),
sl AS (
    SELECT list(m ORDER BY i) AS mu, list(va ORDER BY i) AS vv FROM stats
)
SELECT vec_id,
       ROUND(sqrt(list_aggregate(list_transform(embedding,
           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')), 6)
           AS norm_before,
       ROUND(sqrt(list_aggregate(list_transform(
           list_transform(embedding, (x, i) ->
               (CAST(x AS DOUBLE) - mu[i]) / sqrt(vv[i] + {WHITEN_EPS})),
           w -> w * w), 'sum')), 6) AS norm_after
FROM embeddings, sl
"""

SQL["corpus_temperature_sample"] = f"""
WITH s AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len({_TOKS})) AS BIGINT) AS total_tokens
    FROM documents GROUP BY 1
),
t AS (SELECT CAST(SUM(total_tokens) AS BIGINT) AS tt FROM s),
q AS (
    SELECT source, n_docs, total_tokens,
           CAST(total_tokens AS DOUBLE) / tt AS share,
           sqrt(CAST(total_tokens AS DOUBLE) / tt) AS sq
    FROM s, t
),
d AS (SELECT list_aggregate(list_sort(list(sq)), 'sum') AS denom FROM q),
wts AS (
    SELECT source, n_docs,
           ROUND(CASE WHEN total_tokens = 0 THEN 0.0
                 ELSE (sq / denom) / share END, 4) AS boost
    FROM q, d
),
mx AS (SELECT MAX(boost) AS mb FROM wts),
thr AS (
    SELECT source, n_docs,
           CASE WHEN mb > 0 THEN boost / mb ELSE 0.0 END AS rate,
           CAST(FLOOR((CASE WHEN mb > 0 THEN boost / mb ELSE 0.0 END) * 10000)
                AS INT) AS threshold
    FROM wts, mx
),
db AS (
    SELECT source,
           {_duck_md5_mod("'temp:' || CAST(doc_id AS VARCHAR)", 10000)} AS bucket
    FROM documents
),
k AS (
    SELECT db.source, CAST(COUNT(*) AS BIGINT) AS n_kept
    FROM db JOIN thr USING (source) WHERE bucket < threshold GROUP BY 1
)
SELECT thr.source,
       CAST(thr.n_docs AS BIGINT) AS n_docs,
       COALESCE(k.n_kept, 0) AS n_kept,
       ROUND(rate, 6) AS keep_rate_target,
       ROUND(COALESCE(k.n_kept, 0) / thr.n_docs, 6) AS kept_share
FROM thr LEFT JOIN k ON thr.source = k.source
"""

from .constants import IVF_PROBE_SWEEP_MAX  # noqa: E402

_PS_HIT_CTES = ",\n".join(
    f"""j{p} AS (
    SELECT q.query_id, cells.vec_id AS neighbor_id,
           {_cos('q.q_emb', 'cells.embedding')} AS cosine
    FROM cells JOIN (
        SELECT vec_id AS query_id, embedding AS q_emb, cent_id AS probe_cell
        FROM asg WHERE vec_id IN {_ANN_IDS} AND rn <= {p}
    ) q ON cells.cell = q.probe_cell AND cells.vec_id <> q.query_id
),
r{p} AS (
    SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
               ) AS rnk
        FROM j{p}
    ) WHERE rnk <= {ANN_K}
),
h{p} AS (
    SELECT r{p}.query_id, CAST(count(*) AS BIGINT) AS n_hit
    FROM r{p} JOIN bf USING (query_id, neighbor_id) GROUP BY 1
)"""
    for p in range(1, IVF_PROBE_SWEEP_MAX + 1)
)

_PS_ARMS = "\nUNION ALL\n".join(
    f"""SELECT {p} AS nprobe, t.query_id,
       CAST(COALESCE(h{p}.n_hit, 0) AS DOUBLE) / t.k AS recall
FROM truth_k t LEFT JOIN h{p} ON t.query_id = h{p}.query_id"""
    for p in range(1, IVF_PROBE_SWEEP_MAX + 1)
)

SQL["ann_ivf_probe_sweep"] = f"""
WITH {_IVF_ASG_CTES},
cells AS (SELECT vec_id, embedding, cent_id AS cell FROM asg WHERE rn = 1),
bf AS (SELECT query_id, neighbor_id FROM ({SQL["ann_bruteforce_topk"]})),
truth_k AS (SELECT query_id, CAST(count(*) AS BIGINT) AS k FROM bf GROUP BY 1),
{_PS_HIT_CTES},
arms AS ({_PS_ARMS})
SELECT nprobe, CAST(COUNT(*) AS BIGINT) AS n_queries,
       ROUND(list_aggregate(list_sort(list(recall)), 'sum') / COUNT(*), 6)
           AS avg_recall,
       ROUND(MIN(recall), 6) AS min_recall
FROM arms GROUP BY 1
"""

SQL["fuzzy_decontam"] = f"""{_MINHASH_CTES},
sb AS (
    SELECT b.doc_id, b.band_idx, b.band_hash,
           d.source = '{EVAL_SOURCE}' AS is_eval
    FROM bands b JOIN documents d USING (doc_id)
),
cand AS (
    SELECT DISTINCT c.doc_id AS doc_id, e.doc_id AS eval_doc_id
    FROM sb c JOIN sb e
      ON c.band_idx = e.band_idx AND c.band_hash = e.band_hash
    WHERE NOT c.is_eval AND e.is_eval
)
SELECT doc_id, eval_doc_id, jaccard FROM (
    SELECT cand.doc_id, cand.eval_doc_id,
           len(list_intersect(a.shingles, b.shingles))
           / CAST(len(list_distinct(list_concat(a.shingles, b.shingles)))
                  AS DOUBLE) AS jaccard
    FROM cand
    JOIN shh a ON a.doc_id = cand.doc_id
    JOIN shh b ON b.doc_id = cand.eval_doc_id
) WHERE jaccard >= {FUZZY_DECONTAM_THRESHOLD}
"""

_NORM_TEXT = (
    "trim(regexp_replace(regexp_replace(regexp_replace("
    "lower(text), '[\\t\\n\\f\\r ]+', ' ', 'g'),"
    " '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))"
)

SQL["normalized_dedup_gain"] = f"""
WITH h AS (
    SELECT source, md5(text) AS raw_hash, md5({_NORM_TEXT}) AS norm_hash
    FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT raw_hash) AS BIGINT) AS raw_classes,
       CAST(COUNT(DISTINCT norm_hash) AS BIGINT) AS norm_classes,
       CAST(COUNT(DISTINCT raw_hash) - COUNT(DISTINCT norm_hash) AS BIGINT)
           AS extra_dups
FROM h GROUP BY 1
"""

# DSIR importance scores: hashed-bigram buckets via the shared md5
# digit extraction; the log-ratio expression mirrors the Spark
# operator token-for-token (casts, parenthesization, natural log).
from .constants import DSIR_BUCKETS  # noqa: E402

SQL["dsir_importance_score"] = f"""
WITH toksed AS (
    SELECT doc_id, lang, source, {_TOKS} AS toks FROM documents
),
bg AS (
    SELECT doc_id, lang, source,
           {_duck_md5_mod("toks[i] || ' ' || toks[i+1]", DSIR_BUCKETS)} AS b
    FROM toksed, UNNEST(range(1, len(toks))) AS t(i)
    WHERE len(toks) >= 2
),
t_cnt AS (
    SELECT b, COUNT(*) AS t_cnt FROM bg WHERE source = '{EVAL_SOURCE}' GROUP BY b
),
r_cnt AS (
    SELECT b, COUNT(*) AS r_cnt FROM bg WHERE source <> '{EVAL_SOURCE}' GROUP BY b
),
tot AS (
    SELECT (SELECT COALESCE(SUM(t_cnt), 0) FROM t_cnt) AS tt,
           (SELECT COALESCE(SUM(r_cnt), 0) FROM r_cnt) AS rt
),
buckets AS (SELECT i AS b FROM UNNEST(range(0, {DSIR_BUCKETS})) AS t(i)),
lr AS (
    SELECT b,
           ln(CAST(COALESCE(t_cnt, 0) + 1 AS DOUBLE)
              / CAST(tt + {DSIR_BUCKETS} AS DOUBLE))
         - ln(CAST(COALESCE(r_cnt, 0) + 1 AS DOUBLE)
              / CAST(rt + {DSIR_BUCKETS} AS DOUBLE)) AS lr
    FROM buckets LEFT JOIN t_cnt USING (b) LEFT JOIN r_cnt USING (b), tot
)
SELECT doc_id, lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(AVG(lr), 4) AS dsir_logratio
FROM bg JOIN lr USING (b)
WHERE source <> '{EVAL_SOURCE}'
GROUP BY doc_id, lang, source
"""

# DSIR resampling materializer: builds on the dsir_importance_score
# CTE (published 4-rounded weights), exp-normalized keep rates, the
# shared md5 bucket membership -- integer compares both engines.
SQL["corpus_dsir_sample"] = f"""
WITH w AS ({SQL["dsir_importance_score"]}),
mx AS (SELECT MAX(dsir_logratio) AS w_max FROM w),
tagged AS (
    SELECT source,
           exp(dsir_logratio - w_max) AS rate,
           ({_duck_md5_mod("'dsir:' || CAST(doc_id AS VARCHAR)", 10000)}
             < CAST(FLOOR(exp(dsir_logratio - w_max) * 10000) AS INTEGER))
               AS kept
    FROM w, mx
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_scored,
       CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       ROUND(AVG(rate), 6) AS avg_keep_rate,
       ROUND(SUM(CASE WHEN kept THEN 1 ELSE 0 END) / COUNT(*), 6) AS kept_share
FROM tagged GROUP BY source
"""

# Quality classifier (logreg over hashed unigram features): the
# oracle replays the FULL training loop as a generated CTE chain,
# one (margins, residuals, gradients, weights, bias) block per
# gradient step -- both engines compute step t+1 from the identical
# HALF-UP-published step-t model (text._qc_train_weights), so float
# reassociation noise in the gradient sums cannot compound.  The
# all-zero step-0 model makes iteration 1 exact in IEEE (0.0 sums,
# sigmoid(0) = 0.5) with no special-casing.
from .constants import QC_BUCKETS, QC_ITERS, QC_LR, QC_ROUND  # noqa: E402


def _qc_ctes() -> str:
    parts = [
        f"""toksed AS (
    SELECT doc_id, lang, source, {_TOKS} AS toks FROM documents
),
fx AS (
    SELECT doc_id, lang, source,
           CASE WHEN source = '{EVAL_SOURCE}' THEN 1 ELSE 0 END AS y,
           len(toks) AS n_toks,
           {_duck_md5_mod("t.term", QC_BUCKETS)} AS b
    FROM toksed, UNNEST(toks) AS t(term)
    WHERE len(toks) >= 1
),
feats AS (
    SELECT doc_id, lang, source, y, b, COUNT(*) / n_toks AS x
    FROM fx GROUP BY doc_id, lang, source, y, n_toks, b
),
lab AS (SELECT DISTINCT doc_id, y FROM feats),
n AS (SELECT COUNT(*) AS n FROM lab),
buckets AS (SELECT i AS b FROM UNNEST(range(0, {QC_BUCKETS})) AS t(i)),
w0 AS (SELECT b, 0.0 AS w FROM buckets),
b0 AS (SELECT 0.0 AS bias)"""
    ]
    for t in range(1, QC_ITERS + 1):
        parts.append(
            f"""m{t} AS (
    SELECT doc_id, SUM(x * w) AS s
    FROM feats JOIN w{t - 1} USING (b) GROUP BY doc_id
),
r{t} AS (
    SELECT lab.doc_id,
           1.0 / (1.0 + exp(-(b{t - 1}.bias + m{t}.s))) - lab.y AS r
    FROM lab JOIN m{t} USING (doc_id), b{t - 1}
),
g{t} AS (
    SELECT b, SUM(x * r) AS g
    FROM feats JOIN r{t} USING (doc_id) GROUP BY b
),
w{t} AS (
    SELECT b, ROUND(w - {QC_LR} * COALESCE(g, 0.0) / n.n, {QC_ROUND}) AS w
    FROM w{t - 1} LEFT JOIN g{t} USING (b), n
),
b{t} AS (
    SELECT ROUND(bias - {QC_LR} * (SELECT SUM(r) FROM r{t}) / n.n,
                 {QC_ROUND}) AS bias
    FROM b{t - 1}, n
)"""
        )
    return ",\n".join(parts)


_QC_CTES = _qc_ctes()
_QC_T = QC_ITERS

SQL["quality_classifier_train"] = f"""
WITH {_QC_CTES}
SELECT CAST(-1 AS INTEGER) AS feature_id, bias AS weight FROM b{_QC_T}
UNION ALL
SELECT CAST(b AS INTEGER) AS feature_id, w AS weight FROM w{_QC_T}
"""

SQL["quality_classifier_score"] = f"""
WITH {_QC_CTES},
sc AS (
    SELECT doc_id, lang, source, SUM(x * w) AS s
    FROM feats JOIN w{_QC_T} USING (b)
    WHERE y = 0
    GROUP BY doc_id, lang, source
)
SELECT doc_id, lang, source,
       ROUND(1.0 / (1.0 + exp(-(b{_QC_T}.bias + s))), 6) AS quality_prob
FROM sc, b{_QC_T}
"""

# D4-style prototypicality: cosine to the ASSIGNED coarse centroid
# (the rn=1 row of the shared IVF assignment CTE already carries it)
# percentile-ranked within the cell; raw doubles order the window,
# rounding applies only to the published columns.
from .constants import PROTO_TIER_HI, PROTO_TIER_LO  # noqa: E402

SQL["embedding_prototype_score"] = f"""
WITH {_IVF_ASG_CTES},
asg_cos AS (
    SELECT vec_id, cent_id, cos,
           row_number() OVER (
               PARTITION BY vec_id ORDER BY cos DESC, cent_id
           ) AS rn
    FROM scored
),
cells AS (
    SELECT vec_id, CAST(cent_id AS BIGINT) AS cell, cos
    FROM asg_cos WHERE rn = 1
),
p AS (
    SELECT vec_id, cell, cos,
           percent_rank() OVER (
               PARTITION BY cell ORDER BY cos ASC, vec_id ASC
           ) AS pct
    FROM cells
)
SELECT vec_id, cell,
       ROUND(cos, 6) AS proto_cos,
       ROUND(pct, 6) AS cell_pct,
       CASE WHEN pct >= {PROTO_TIER_HI} THEN 'prototype'
            WHEN pct < {PROTO_TIER_LO} THEN 'outlier'
            ELSE 'typical' END AS tier
FROM p
"""

SQL["ann_ivf_hard_negatives"] = f"""
WITH cent AS (
    SELECT * FROM (VALUES
    {_IVF_CENT_VALUES}
    ) AS t(cent_id, c_emb)
),
scored AS (
    SELECT e.vec_id, e.embedding, e.label, c.cent_id,
           {_cos('e.embedding', 'c.c_emb')} AS cos
    FROM embeddings e CROSS JOIN cent c
),
asg AS (
    SELECT vec_id, embedding, label, cent_id,
           row_number() OVER (
               PARTITION BY vec_id ORDER BY cos DESC, cent_id
           ) AS rn
    FROM scored
),
cells AS (SELECT vec_id, embedding, label, cent_id AS cell FROM asg WHERE rn = 1),
q AS (
    SELECT vec_id AS query_id, embedding AS q_emb, label AS query_label,
           cent_id AS probe_cell
    FROM asg WHERE vec_id IN {_ANN_IDS} AND rn <= {IVF_NPROBE}
),
j AS (
    SELECT q.query_id, q.query_label, cells.vec_id AS neighbor_id,
           cells.label AS neighbor_label,
           {_cos('q.q_emb', 'cells.embedding')} AS cosine
    FROM cells JOIN q
      ON cells.cell = q.probe_cell AND cells.label <> q.query_label
),
r AS (
    SELECT query_id, query_label, neighbor_id, neighbor_label,
           CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
           ) AS INTEGER) AS "rank",
           cosine
    FROM j
)
SELECT query_id, query_label, neighbor_id, neighbor_label, "rank",
       ROUND(cosine, 6) AS cosine
FROM r WHERE "rank" <= {ANN_K}
"""

SQL["embedding_centroid_drift"] = f"""
WITH {_IVF_ASG_CTES},
cells AS (SELECT vec_id, embedding, cent_id AS cell FROM asg WHERE rn = 1),
dims AS (
    SELECT cell, i.range AS i, CAST(embedding[i.range] AS DOUBLE) AS v
    FROM cells, range(1, {EMBEDDING_DIM + 1}) i
),
per_dim AS (
    SELECT cell, i, ROUND(AVG(v), 9) AS m, COUNT(*) AS n
    FROM dims GROUP BY 1, 2
),
per_cell AS (
    SELECT cell, list(m ORDER BY i) AS mean_emb, MIN(n) AS n_members
    FROM per_dim GROUP BY 1
),
tot AS (SELECT SUM(n_members) AS n_total FROM per_cell)
SELECT CAST(p.cell AS BIGINT) AS cell,
       CAST(p.n_members AS BIGINT) AS n_members,
       ROUND(p.n_members / t.n_total, 6) AS corpus_share,
       ROUND({_cos('p.mean_emb', 'c.c_emb')}, 6) AS mean_centroid_cos
FROM per_cell p JOIN cent c ON p.cell = c.cent_id CROSS JOIN tot t
"""

def _ivf_retrain_sql() -> str:
    """Closed CTE replay of the fixed-budget Lloyd re-train + recall
    gate (see operators/similarity.ivf_retrain_report): cent{i} is
    iteration i's published (ROUND-at-IVF_RETRAIN_ROUND) centroid
    set, seeded from the frozen artifact; empty cells COALESCE to the
    previous centroid.  The recall arms replay the ann_ivf_topk probe
    path under cent0 (the frozen model -- reused verbatim via the
    registry SQL) and cent{T} (the candidate)."""
    T = IVF_RETRAIN_ITERS
    ctes = [
        f"""cent0 AS (
    SELECT * FROM (VALUES
    {_IVF_CENT_VALUES}
    ) AS t(cent_id, c_emb)
)"""
    ]
    for i in range(1, T + 1):
        p = i - 1
        ctes.append(f"""scored{i} AS (
    SELECT e.vec_id, e.embedding, c.cent_id,
           {_cos('e.embedding', 'c.c_emb')} AS cos
    FROM embeddings e CROSS JOIN cent{p} c
)""")
        ctes.append(f"""asg{i} AS (
    SELECT vec_id, embedding, cent_id,
           row_number() OVER (
               PARTITION BY vec_id ORDER BY cos DESC, cent_id
           ) AS rn
    FROM scored{i}
)""")
        ctes.append(f"""dims{i} AS (
    SELECT cent_id AS cell, i.range AS i, CAST(embedding[i.range] AS DOUBLE) AS v
    FROM (SELECT * FROM asg{i} WHERE rn = 1) a, range(1, {EMBEDDING_DIM + 1}) i
)""")
        ctes.append(f"""per_dim{i} AS (
    SELECT cell, i, ROUND(AVG(v), {IVF_RETRAIN_ROUND}) AS m, COUNT(*) AS n
    FROM dims{i} GROUP BY 1, 2
)""")
        ctes.append(f"""mean{i} AS (
    SELECT cell, list(m ORDER BY i) AS mean_emb, MIN(n) AS n
    FROM per_dim{i} GROUP BY 1
)""")
        ctes.append(f"""cent{i} AS (
    SELECT c.cent_id, COALESCE(m.mean_emb, c.c_emb) AS c_emb,
           COALESCE(m.n, 0) AS n
    FROM cent{p} c LEFT JOIN mean{i} m ON m.cell = c.cent_id
)""")
        ctes.append(f"""iter_move{i} AS (
    SELECT 'iter_move' AS component, CAST({i} AS BIGINT) AS cell,
           CAST(SUM(CASE WHEN b.n > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n,
           ROUND(MIN({_cos('a.c_emb', 'b.c_emb')}), 6) AS value
    FROM cent{p} a JOIN cent{i} b ON a.cent_id = b.cent_id
)""")
    ctes.append(f"""cmove AS (
    SELECT 'centroid_move' AS component, CAST(a.cent_id AS BIGINT) AS cell,
           CAST(b.n AS BIGINT) AS n,
           ROUND({_cos('a.c_emb', 'b.c_emb')}, 6) AS value
    FROM cent0 a JOIN cent{T} b ON a.cent_id = b.cent_id
)""")
    ctes.append(f"""bf AS (
    SELECT query_id, neighbor_id FROM ({SQL["ann_bruteforce_topk"]})
)""")
    ctes.append(f"""ivf_t AS (
    SELECT query_id, neighbor_id FROM ({SQL["ann_ivf_topk"]})
)""")
    ctes.append(f"""scored_r AS (
    SELECT e.vec_id, e.embedding, c.cent_id,
           {_cos('e.embedding', 'c.c_emb')} AS cos
    FROM embeddings e CROSS JOIN cent{T} c
)""")
    ctes.append("""asg_r AS (
    SELECT vec_id, embedding, cent_id,
           row_number() OVER (
               PARTITION BY vec_id ORDER BY cos DESC, cent_id
           ) AS rn
    FROM scored_r
)""")
    ctes.append("cells_r AS (SELECT vec_id, embedding, cent_id AS cell FROM asg_r WHERE rn = 1)")
    ctes.append(f"""q_r AS (
    SELECT vec_id AS query_id, embedding AS q_emb, cent_id AS probe_cell
    FROM asg_r WHERE vec_id IN {_ANN_IDS} AND rn <= {IVF_NPROBE}
)""")
    ctes.append(f"""j_r AS (
    SELECT q.query_id, c.vec_id AS neighbor_id,
           {_cos('q.q_emb', 'c.embedding')} AS cosine
    FROM cells_r c JOIN q_r q
      ON c.cell = q.probe_cell AND c.vec_id <> q.query_id
)""")
    ctes.append("""rr AS (
    SELECT query_id, neighbor_id,
           row_number() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
           ) AS rnk
    FROM j_r
)""")
    ctes.append(f"ivf_r AS (SELECT query_id, neighbor_id FROM rr WHERE rnk <= {ANN_K})")
    ctes.append("""truth_k AS (
    SELECT query_id, CAST(count(*) AS BIGINT) AS k FROM bf GROUP BY 1
)""")
    ctes.append("""hit_t AS (
    SELECT query_id, CAST(count(*) AS BIGINT) AS n_hit
    FROM ivf_t JOIN bf USING (query_id, neighbor_id) GROUP BY 1
)""")
    ctes.append("""hit_r AS (
    SELECT query_id, CAST(count(*) AS BIGINT) AS n_hit
    FROM ivf_r JOIN bf USING (query_id, neighbor_id) GROUP BY 1
)""")
    ctes.append("""arm_t AS (
    SELECT 'recall_trained' AS component, CAST(t.query_id AS BIGINT) AS cell,
           CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n,
           COALESCE(h.n_hit, 0) / t.k AS recall
    FROM truth_k t LEFT JOIN hit_t h USING (query_id)
)""")
    ctes.append("""arm_r AS (
    SELECT 'recall_retrained' AS component, CAST(t.query_id AS BIGINT) AS cell,
           CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n,
           COALESCE(h.n_hit, 0) / t.k AS recall
    FROM truth_k t LEFT JOIN hit_r h USING (query_id)
)""")
    ctes.append("""gate AS (
    SELECT 'gate' AS component, CAST(-1 AS BIGINT) AS cell,
           CAST(CASE WHEN ROUND(r.ar - t.at, 6) >= 0 THEN 1 ELSE 0 END AS BIGINT) AS n,
           ROUND(r.ar - t.at, 6) AS value
    FROM (SELECT AVG(recall) AS ar FROM arm_r) r,
         (SELECT AVG(recall) AS at FROM arm_t) t
)""")
    unions = "\nUNION ALL ".join(
        [f"SELECT * FROM iter_move{i}" for i in range(1, T + 1)]
        + ["SELECT * FROM cmove"]
        + [
            "SELECT component, cell, n, ROUND(recall, 6) AS value FROM arm_t",
            "SELECT component, cell, n, ROUND(recall, 6) AS value FROM arm_r",
            "SELECT * FROM gate",
        ]
    )
    return "WITH " + ",\n".join(ctes) + "\n" + unions


SQL["ivf_retrain_report"] = _ivf_retrain_sql()

# Applied LAST so every entry above -- including late additions -- gets
# the engine-exact half-up rounding rewrite.
SQL = {name: _rewrite_rounds(sql) for name, sql in SQL.items()}
