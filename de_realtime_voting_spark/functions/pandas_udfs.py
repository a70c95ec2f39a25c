"""Arrow-vectorized (Pandas UDF) alternatives to the Catalyst column
helpers.

The rule this engine follows: built-in `pyspark.sql.functions` first
(JVM-side, codegen), Pandas UDFs ONLY when the computation needs a
real numerical library or cannot be said in Catalyst.  These exist to
(a) prove the Arrow batch path end-to-end and (b) serve as drop-in
replacements if an operator ever needs numpy/scipy semantics --
`tests/test_functions.py` pins them to the Catalyst versions.

Row-at-a-time Python UDFs are banned in this codebase: they serialize
per row and run 10-100x slower than either path here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def cosine_pandas(a: pd.Series, b: pd.Series) -> pd.Series:
    """Batch cosine over two array columns: one numpy matmul per
    Arrow batch instead of one expression-tree walk per row."""
    ma = np.stack(a.to_numpy()).astype(np.float64)
    mb = np.stack(b.to_numpy()).astype(np.float64)
    dots = np.einsum("ij,ij->i", ma, mb)
    norms = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
    return pd.Series(dots / norms)


@pandas_udf("double")
def l2_norm_pandas(a: pd.Series) -> pd.Series:
    ma = np.stack(a.to_numpy()).astype(np.float64)
    return pd.Series(np.linalg.norm(ma, axis=1))


def make_cell_assigner(cents: list, nprobe: int):
    """Vectorized nearest-centroid assignment, bit-identical to the
    Catalyst expression it replaces (operators/similarity.py).

    The per-dimension accumulation loop reproduces Catalyst's
    ``aggregate(zip_with(a,b,*), 0.0, +)`` exactly: cast each float
    element to float64 FIRST, multiply in float64, add left-to-right.
    ``einsum``/``dot`` would use pairwise summation and drift in the
    last ulp, which could flip an argmax tie -- so they are NOT used
    here.  Stable argsort over centroid columns pre-sorted by cent_id
    gives the same (neg_cos, cent_id) tie-break as the struct
    array_sort.

    ``cents`` must be sorted ascending by centroid id (as
    ``_collect_centroids`` returns them).
    """
    import math

    cent_ids = np.array([cid for cid, _ in cents], dtype=np.int64)
    cmat = np.array([emb for _, emb in cents], dtype=np.float64)  # K x D
    c_norms = np.array(
        [math.sqrt(sum(x * x for x in emb)) for _, emb in cents], dtype=np.float64
    )

    @pandas_udf("struct<cell:bigint, probes:array<bigint>>")
    def assign(emb: pd.Series) -> pd.DataFrame:
        if len(emb) == 0:
            return pd.DataFrame({"cell": pd.Series(dtype="int64"), "probes": []})
        m = np.stack(emb.to_numpy()).astype(np.float64)  # n x D
        n, d = m.shape
        dots = np.zeros((n, len(cent_ids)), dtype=np.float64)
        vsq = np.zeros(n, dtype=np.float64)
        for i in range(d):  # left-to-right, matching Catalyst aggregate()
            col = m[:, i]
            dots += col[:, None] * cmat[None, :, i]
            vsq += col * col
        neg_cos = -(dots / (np.sqrt(vsq)[:, None] * c_norms[None, :]))
        order = np.argsort(neg_cos, axis=1, kind="stable")
        return pd.DataFrame(
            {
                "cell": cent_ids[order[:, 0]],
                "probes": list(cent_ids[order[:, :nprobe]]),
            }
        )

    return assign


def make_pq_encoder(cb: list):
    """Vectorized product-quantization encoder, bit-identical to the
    Catalyst reference (operators/similarity._pq_codes_catalyst).

    ``cb[m][c]`` is the codeword (list of doubles) for code c of
    subspace m.  Distances accumulate per-dimension left-to-right in
    float64 -- reproducing Catalyst's ``aggregate(zip_with(...))``
    fold exactly (no einsum/pairwise summation, same reasoning as
    make_cell_assigner) -- and np.argmin's first-minimum rule gives
    the same low-code tie-break as the (dist, code) struct sort.
    """
    pq_m = len(cb)
    n_codes = len(cb[0])
    sub_dim = len(cb[0][0])
    cmats = [np.array(cb[m], dtype=np.float64) for m in range(pq_m)]  # C x SD

    @pandas_udf("array<int>")
    def encode(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series(dtype=object)
        m = np.stack(emb.to_numpy()).astype(np.float64)  # n x D
        n = m.shape[0]
        codes = np.zeros((n, pq_m), dtype=np.int32)
        for sub in range(pq_m):
            dists = np.zeros((n, n_codes), dtype=np.float64)
            for j in range(sub_dim):  # left-to-right, matching the fold
                d = m[:, sub * sub_dim + j][:, None] - cmats[sub][None, :, j]
                dists += d * d
            codes[:, sub] = np.argmin(dists, axis=1)
        return pd.Series(list(codes))

    return encode


@pandas_udf("double")
def entropy_pandas(text: pd.Series) -> pd.Series:
    """Token-entropy twin of the Catalyst run-length fold
    (operators/text.py::_entropy_fold_column): same tokenization
    (split on ' ', empties dropped), same per-run term -(c/n)*ln(c/n)
    in float64, terms accumulated LEFT-TO-RIGHT in sorted-token order
    (np.cumsum is a sequential scan; np.sum's pairwise summation
    would reorder the accumulation).  np.unique's lexicographic order
    equals Spark's array_sort order because UTF-8 byte order
    preserves code-point order.  Equality vs the fold is to within
    libm ulps (numpy log vs java Math.log; DuckDB's ln likewise) --
    the op's 4-decimal report rounding is the cross-engine contract
    for transcendental math, pinned in tests/test_functions.py.

    Exists because the Catalyst fold allocates one struct per token
    per doc in the interpreted aggregate path -- measured 4.5 s vs
    ~1 s for this Arrow pass at sf0.1 (the fold stays as the
    semantics reference)."""
    out = np.empty(len(text), dtype=np.float64)
    for i, t in enumerate(text.to_numpy(dtype=object)):
        toks = [w for w in (t or "").split(" ") if w]
        if not toks:
            out[i] = 0.0
            continue
        n = np.float64(len(toks))
        _, counts = np.unique(np.array(toks, dtype=object), return_counts=True)
        p = counts.astype(np.float64) / n
        out[i] = np.cumsum(-(p * np.log(p)))[-1]
    return pd.Series(out)
