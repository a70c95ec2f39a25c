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
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# Module-level decorators use DataType OBJECTS, not type strings:
# parsing a type string requires an active SparkContext, and this
# module must stay importable on executor Python workers (a UDF
# that references a plain module-level helper is pickled by
# REFERENCE, so the worker imports the module; r13).


@pandas_udf(DoubleType())
def cosine_pandas(a: pd.Series, b: pd.Series) -> pd.Series:
    """Batch cosine over two array columns: one numpy matmul per
    Arrow batch instead of one expression-tree walk per row."""
    ma = np.stack(a.to_numpy()).astype(np.float64)
    mb = np.stack(b.to_numpy()).astype(np.float64)
    dots = np.einsum("ij,ij->i", ma, mb)
    norms = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
    return pd.Series(dots / norms)


@pandas_udf(DoubleType())
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


def make_dual_cell_assigner(cents_a: list, cents_b: list, nprobe: int):
    """TWO nearest-centroid assignments (two independent centroid
    sets) in ONE Arrow pass over the corpus -- the ivf_retrain_report
    probe-arm fuse (r13): the trained-vs-retrained recall arms each
    needed their own full corpus scan + assignment; this computes both
    assignments from one scan.

    Bit-identical to running ``make_cell_assigner(cents_a, nprobe)``
    and ``make_cell_assigner(cents_b, nprobe)`` separately (pinned in
    tests): the shared ``vsq`` accumulates the identical left-to-right
    float64 fold, and each set's dots/argsort/tie-break are the
    unchanged single-assigner computation over its own centroid
    matrix.
    """
    import math

    ids_a = np.array([cid for cid, _ in cents_a], dtype=np.int64)
    mat_a = np.array([emb for _, emb in cents_a], dtype=np.float64)
    nrm_a = np.array(
        [math.sqrt(sum(x * x for x in emb)) for _, emb in cents_a], dtype=np.float64
    )
    ids_b = np.array([cid for cid, _ in cents_b], dtype=np.int64)
    mat_b = np.array([emb for _, emb in cents_b], dtype=np.float64)
    nrm_b = np.array(
        [math.sqrt(sum(x * x for x in emb)) for _, emb in cents_b], dtype=np.float64
    )

    @pandas_udf(
        "struct<cell_a:bigint, probes_a:array<bigint>, "
        "cell_b:bigint, probes_b:array<bigint>>"
    )
    def assign2(emb: pd.Series) -> pd.DataFrame:
        if len(emb) == 0:
            return pd.DataFrame(
                {
                    "cell_a": pd.Series(dtype="int64"),
                    "probes_a": [],
                    "cell_b": pd.Series(dtype="int64"),
                    "probes_b": [],
                }
            )
        m = np.stack(emb.to_numpy()).astype(np.float64)  # n x D
        n, d = m.shape
        dots_a = np.zeros((n, len(ids_a)), dtype=np.float64)
        dots_b = np.zeros((n, len(ids_b)), dtype=np.float64)
        vsq = np.zeros(n, dtype=np.float64)
        for i in range(d):  # left-to-right, matching Catalyst aggregate()
            col = m[:, i]
            dots_a += col[:, None] * mat_a[None, :, i]
            dots_b += col[:, None] * mat_b[None, :, i]
            vsq += col * col
        vn = np.sqrt(vsq)[:, None]
        neg_a = -(dots_a / (vn * nrm_a[None, :]))
        neg_b = -(dots_b / (vn * nrm_b[None, :]))
        oa = np.argsort(neg_a, axis=1, kind="stable")
        ob = np.argsort(neg_b, axis=1, kind="stable")
        return pd.DataFrame(
            {
                "cell_a": ids_a[oa[:, 0]],
                "probes_a": list(ids_a[oa[:, :nprobe]]),
                "cell_b": ids_b[ob[:, 0]],
                "probes_b": list(ids_b[ob[:, :nprobe]]),
            }
        )

    return assign2


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


def _fold_rows_like_catalyst(a_vals, b_vals, cosine: bool) -> pd.Series:
    """Row-at-a-time fallback for degenerate batches (null or
    ragged-length arrays), reproducing the Catalyst
    ``aggregate(zip_with(a, b, *))`` null semantics exactly: a null
    ARRAY, a null ELEMENT, or a length mismatch (zip_with pads the
    shorter side with nulls) all null-propagate through the fold to
    SQL NULL (ADVICE r12 -- np.stack would raise / astype would turn
    None into NaN).  The dense fast paths below never take this
    branch."""
    import math

    out = []
    for x, y in zip(a_vals, b_vals):
        if x is None or y is None or len(x) != len(y):
            out.append(None)
            continue
        dot = na = nb = 0.0
        ok = True
        for xi, yi in zip(x, y):
            if xi is None or yi is None:
                ok = False
                break
            xf, yf = float(xi), float(yi)
            dot += xf * yf
            na += xf * xf
            nb += yf * yf
        if not ok:
            out.append(None)
        elif cosine:
            out.append(dot / (math.sqrt(na) * math.sqrt(nb)))
        else:
            out.append(dot)
    return pd.Series(out, dtype="float64")


@pandas_udf(DoubleType())
def dot_product_fold_pandas(a: pd.Series, b: pd.Series) -> pd.Series:
    """BIT-IDENTICAL Arrow twin of functions.columns.dot_product
    (pinned == in tests/test_functions.py): cast each float element
    to float64 FIRST, multiply in float64, accumulate LEFT-TO-RIGHT
    across dimensions -- the make_cell_assigner discipline.  einsum /
    np.dot would use pairwise summation and drift in the last ulp,
    so they are NOT used.  Exists for the pair-verify hot paths
    (dedup_embedding_cosine / semantic_dedup pair cosines), where the
    interpreted aggregate(zip_with(...)) fold walks an expression
    tree per element per PAIR.

    Inputs are dense uniform-length non-null arrays on every current
    consumer; degenerate batches (null array, ragged lengths, null
    elements) fall back to the row-wise Catalyst-semantics fold
    (ADVICE r12) instead of raising or NaN-coercing."""
    if len(a) == 0:
        return pd.Series(dtype="float64")
    av, bv = a.to_numpy(), b.to_numpy()
    try:
        ma = np.stack(av).astype(np.float64)
        mb = np.stack(bv).astype(np.float64)
    except (ValueError, TypeError):  # null or ragged-length arrays
        return _fold_rows_like_catalyst(av, bv, cosine=False)
    if (
        ma.ndim != 2  # a batch of all-null arrays stacks 1-D
        or mb.ndim != 2
        or ma.shape[1] != mb.shape[1]  # uniform-per-side, mismatched widths
        or np.isnan(ma).any()
        or np.isnan(mb).any()  # null elements -> NaN via astype
    ):
        return _fold_rows_like_catalyst(av, bv, cosine=False)
    dots = np.zeros(len(a), dtype=np.float64)
    for i in range(ma.shape[1]):  # left-to-right, matching the fold
        dots += ma[:, i] * mb[:, i]
    return pd.Series(dots)


@pandas_udf(DoubleType())
def cosine_fold_pandas(a: pd.Series, b: pd.Series) -> pd.Series:
    """BIT-IDENTICAL Arrow twin of functions.columns.cosine_similarity
    (pinned == in tests/test_functions.py): three left-to-right
    float64 folds (dot, |a|^2, |b|^2 -- same accumulation order as the
    Catalyst aggregate()), then sqrt and one division in the identical
    expression order dot / (sqrt(na) * sqrt(nb)).  For per-PAIR cosine
    hot paths (ANN top-k verifies) where norms are not precomputed.
    Degenerate batches (null/ragged/null-element arrays) take the
    row-wise Catalyst-semantics fallback, as in the dot twin."""
    if len(a) == 0:
        return pd.Series(dtype="float64")
    av, bv = a.to_numpy(), b.to_numpy()
    try:
        ma = np.stack(av).astype(np.float64)
        mb = np.stack(bv).astype(np.float64)
    except (ValueError, TypeError):  # null or ragged-length arrays
        return _fold_rows_like_catalyst(av, bv, cosine=True)
    if (
        ma.ndim != 2  # a batch of all-null arrays stacks 1-D
        or mb.ndim != 2
        or ma.shape[1] != mb.shape[1]  # uniform-per-side, mismatched widths
        or np.isnan(ma).any()
        or np.isnan(mb).any()  # null elements -> NaN via astype
    ):
        return _fold_rows_like_catalyst(av, bv, cosine=True)
    n = len(a)
    dots = np.zeros(n, dtype=np.float64)
    na = np.zeros(n, dtype=np.float64)
    nb = np.zeros(n, dtype=np.float64)
    for i in range(ma.shape[1]):  # left-to-right, matching the fold
        ca = ma[:, i]
        cb = mb[:, i]
        dots += ca * cb
        na += ca * ca
        nb += cb * cb
    return pd.Series(dots / (np.sqrt(na) * np.sqrt(nb)))


@pandas_udf(DoubleType())
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


@pandas_udf(StructType([StructField(n, IntegerType()) for n in ("b0", "b1", "b2", "b3")]))
def simhash_bands_pandas(dt: pd.Series) -> pd.DataFrame:
    """64-bit SimHash as 4 x 16-bit bands over a DISTINCT-token array
    column -- the Arrow twin of operators/dedup.py::
    _simhash_bands_catalyst (pinned equal in tests/test_functions.py).

    Bit semantics replicated exactly: per token, md5's first 8 bytes;
    band b = bytes [2b, 2b+2) big-endian uint16; bit k of the result
    set when 2*count(k) > n over the doc's distinct tokens (strict,
    same tie rule).  hashlib.md5 == Spark md5 == DuckDB md5 on utf-8
    bytes, and all counts are integers, so the signatures are
    bit-identical cross-path and cross-engine.

    Speed comes from two batch-level effects Catalyst can't express:
    a digest CACHE keyed on the token string (Zipf repetition means
    most lookups hit), and one vectorized row-gather + column-sum per
    doc instead of a 65-buffer hash-aggregate over the exploded
    token stream."""
    import hashlib

    # np.unpackbits yields MSB-first per byte: bit k (LSB-numbered) of
    # band b sits at position 16*b + (15 - k)
    pos = np.arange(64)
    band_of = pos // 16
    weight = (1 << (15 - (pos % 16))).astype(np.int64)

    idx_cache: dict[str, int] = {}
    # one bit per cell: uint8 keeps the per-batch cache 8x smaller;
    # the gather/sum widens to int64 at reduction time
    vocab_mat = np.zeros((1024, 64), dtype=np.uint8)  # grows geometrically
    n_vocab = 0
    out = np.zeros((len(dt), 4), dtype=np.int64)
    for i, toks in enumerate(dt.to_numpy(dtype=object)):
        if toks is None or len(toks) == 0:
            continue
        idxs = []
        for w in toks:
            if w is None:
                # Catalyst twin: md5(null) null-propagates, SUM skips
                # the row but count(lit(1)) still counts it -- so a
                # null token contributes no bits yet stays in n
                continue
            k = idx_cache.get(w)
            if k is None:
                k = n_vocab
                idx_cache[w] = k
                if n_vocab == len(vocab_mat):
                    vocab_mat = np.vstack([vocab_mat, np.zeros_like(vocab_mat)])
                d8 = hashlib.md5(w.encode("utf-8")).digest()[:8]
                vocab_mat[k] = np.unpackbits(
                    np.frombuffer(d8, dtype=np.uint8)
                )
                n_vocab += 1
            idxs.append(k)
        counts = vocab_mat[np.array(idxs, dtype=np.int64)].sum(
            axis=0, dtype=np.int64
        )
        win = (2 * counts) > len(toks)
        out[i] = np.bincount(band_of, weights=win * weight, minlength=4)
    return pd.DataFrame({"b0": out[:, 0], "b1": out[:, 1],
                         "b2": out[:, 2], "b3": out[:, 3]}).astype("int32")


@pandas_udf(ArrayType(StringType()))
def minhash_signature_pandas(shingles: pd.Series) -> pd.Series:
    """MinHash signature over a shingle-array column -- the Arrow
    twin of functions.columns.minhash_signature (pinned equal in
    tests/test_functions.py).

    Exact semantics: sig[i] = min over shingles s of md5(f"{i}:{s}")
    as the 32-char lowercase hex string; the min runs on the 128-bit
    integer value of the digest, which orders identically to the
    fixed-width hex string, and the winner is re-rendered as hex --
    hashlib.md5 == Spark md5 == DuckDB md5 on utf-8 bytes, so
    signatures are bit-identical cross-path.  Null handling matches
    the twin: an empty array yields all-null (array_min of empty);
    a null ELEMENT is skipped (its permuted hash null-propagates and
    array_min ignores nulls).

    Speed (r12, vectorized): digests are computed ONCE per distinct
    shingle per batch (pd.factorize replaces the r5 dict cache), and
    the per-row 128-bit minimum runs as numpy ``minimum.reduceat``
    over the digests' (hi, lo) uint64 halves -- big-endian split, so
    lexicographic (hi, lo) order IS the 128-bit integer order: min hi
    per row segment, then min lo among entries at that hi.  This
    removes the interpreted per-shingle-instance K-compare loop
    (shingle instances outnumber distincts ~10x on Zipf text, so the
    loop dominated the md5 calls; measured 1.6x on sf0.1 corpus
    shingles, par on adversarial all-distinct input where md5 is the
    floor either way)."""
    import hashlib

    from ..constants import MINHASH_SIGS

    K = MINHASH_SIGS
    md5 = hashlib.md5
    vals = shingles.to_numpy(dtype=object)
    n = len(vals)
    counts = np.zeros(n, dtype=np.int64)
    flat: list = []
    for i, toks in enumerate(vals):
        if toks is None or len(toks) == 0:
            continue
        clean = [s for s in toks if s is not None]
        counts[i] = len(clean)
        flat.extend(clean)
    out = np.empty(n, dtype=object)
    if not flat:
        for i in range(n):
            out[i] = [None] * K
        return pd.Series(out)
    codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
    prefs = [("%d:" % i).encode() for i in range(K)]
    buf = bytearray(len(uniques) * K * 16)
    pos = 0
    for u in uniques:
        ub = u.encode("utf-8")
        for p in prefs:
            buf[pos:pos + 16] = md5(p + ub).digest()
            pos += 16
    dmat = np.frombuffer(buf, dtype=">u8").reshape(len(uniques), K, 2)
    hi = np.ascontiguousarray(dmat[:, :, 0])
    lo = np.ascontiguousarray(dmat[:, :, 1])
    nz = counts > 0
    nz_counts = counts[nz]
    starts = np.zeros(len(nz_counts), dtype=np.int64)
    np.cumsum(nz_counts[:-1], out=starts[1:])
    umax = np.uint64(0xFFFFFFFFFFFFFFFF)
    min_h = np.empty((K, len(nz_counts)), dtype=np.uint64)
    min_l = np.empty((K, len(nz_counts)), dtype=np.uint64)
    for k in range(K):
        h = hi[codes, k]
        l = lo[codes, k]
        mh = np.minimum.reduceat(h, starts)
        # min lo among entries tied at the row's min hi (others masked
        # to UINT64_MAX -- at least one unmasked entry always exists)
        ml = np.minimum.reduceat(
            np.where(h == np.repeat(mh, nz_counts), l, umax), starts
        )
        min_h[k] = mh
        min_l[k] = ml
    j = 0
    for i in range(n):
        if not nz[i]:
            out[i] = [None] * K
            continue
        out[i] = [
            format((int(min_h[k, j]) << 64) | int(min_l[k, j]), "032x")
            for k in range(K)
        ]
        j += 1
    return pd.Series(out)
