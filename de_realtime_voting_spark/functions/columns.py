"""Column-expression helpers.

Everything here compiles to Catalyst expressions (higher-order array
functions, builtin hashes) -- no Python UDFs, so the hot path stays
inside whole-stage codegen and scales linearly with executors.

Each helper has an exact DuckDB-SQL mirror in
``de_realtime_voting_spark.oracles`` built from the same constants;
integer/double arithmetic is written so both engines produce
bit-identical results.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..constants import (
    CANDIDATE_PARTY,
    CHAR_NGRAM_K,
    LSH_EXTRA_PLANES,
    LSH_PLANES,
    MINHASH_SIGS,
    SHINGLE_K,
    SIMHASH_BAND_BITS,
    SIMHASH_N_BANDS,
)

_HEX = "0123456789abcdef"


def round_half_up(col: Column, n: int) -> Column:
    """Cross-engine-deterministic rounding: floor(x*10^n + 0.5)/10^n.

    Spark's round() (BigDecimal HALF_UP on the decimal expansion) and
    DuckDB's round() disagree on the SAME input double when x*10^n
    lands exactly on .5 -- e.g. avg of 2-decimal values over a
    power-of-two count.  This formula is plain double arithmetic, so
    identical inputs give identical outputs in any IEEE engine; the
    oracle SQL uses the literal same expression.
    """
    if isinstance(col, str):
        col = F.col(col)
    s = float(10**n)
    return F.floor(col * F.lit(s) + F.lit(0.5)) / F.lit(s)


def rnd_sql(expr: str, n: int) -> str:
    """SQL-string twin of round_half_up: parses to the IDENTICAL
    analyzed expression tree (pinned in tests/test_round13_ops.py).
    1.0E{n} is the exact double 10^n for every grain this repo uses
    (10^k is exactly representable up to 10^22)."""
    s = f"1.0E{n}"
    # no explicit cast on floor: the long/double division makes the
    # analyzer coerce BOTH operands exactly as the py4j form does
    return f"(floor(({expr} * {s}) + 0.5D) / {s})"


def el_sql(col_name: str, i: int) -> str:
    """SQL-string twin of element_at(col, i).cast('double') -- the
    per-dimension accessor of the embedding column aggregates."""
    return f"cast(element_at({col_name}, {i}) as double)"


def dim_avg_cols(
    col_name: str,
    dim: int,
    round_to: int | None = None,
    prefix: str = "m",
) -> list:
    """The per-dimension mean aggregate list
    [avg(element_at(col, i+1) cast double) as {prefix}{i}] -- built as
    ONE SQL string per column instead of ~10 nested py4j constructor
    calls, because DataFrame CONSTRUCTION is driver-side Python and
    the 64-to-129-expression embedding aggregates were spending more
    wall-clock building the plan than executing it (r13: measured
    2.09 s -> 0.49 s for the 129-agg build; analyzed plans are
    bit-identical, pinned by test)."""
    out = []
    for i in range(dim):
        e = f"avg({el_sql(col_name, i + 1)})"
        if round_to is not None:
            e = rnd_sql(e, round_to)
        out.append(F.expr(e).alias(f"{prefix}{i}"))
    return out


def tokens(text: Column) -> Column:
    """Whitespace tokens with empties dropped (split of '' yields [''])."""
    return F.filter(F.split(text, " "), lambda x: x != F.lit(""))


def word_shingles(toks: Column, k: int = SHINGLE_K) -> Column:
    """Distinct k-word shingles: ['a','b','c','d'] -> ['a b c','b c d'].

    Shingles (not raw tokens) keep MinHash selective when the token
    vocabulary is small -- token *sets* converge on long docs.
    Guarded: sequence(1, n) would run DESCENDING for n < 1, so short
    docs short-circuit to an empty array.
    """
    shingled = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (k - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(k)]
            ),
        )
    )
    return F.when(F.size(toks) >= k, shingled).otherwise(
        F.array().cast("array<string>")
    )


def char_ngrams(text: Column, k: int = CHAR_NGRAM_K) -> Column:
    """Distinct character k-grams of a string ('abcd' -> ['abc','bcd']).

    Guarded like word_shingles: texts shorter than k chars yield an
    empty array (sequence would run descending otherwise).
    """
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.length(text) - (k - 1)),
            lambda i: text.substr(i, F.lit(k)),
        )
    )
    return F.when(F.length(text) >= k, grams).otherwise(
        F.array().cast("array<string>")
    )


def minhash_signature(shingles: Column, n_sigs: int = MINHASH_SIGS) -> Column:
    """MinHash signature as an array of md5-permutation minima.

    Permutation i orders shingles by md5(f"{i}:" + s); the min hex
    string is an order-statistic under a pseudo-random permutation,
    which is all MinHash needs.  Pure string ops -> identical in any
    engine with md5.
    """
    def perm(i: int):
        # closure factory: PySpark infers lambda arity from the
        # signature, so the seed must be captured, not a default arg
        return lambda s: F.md5(F.concat(F.lit(f"{i}:"), s))

    return F.array(*[F.array_min(F.transform(shingles, perm(i))) for i in range(n_sigs)])


def _hexval(c: Column) -> Column:
    """Value 0..15 of a single lowercase hex char."""
    return F.instr(F.lit(_HEX), c) - F.lit(1)


def simhash_token_bands(distinct_toks: Column) -> Column:
    """Per-token 64-bit hash as an array of SIMHASH_N_BANDS 16-bit
    ints: band b big-endian-parses hex chars [4b+1, 4b+4] of md5(tok).

    The whole thing is ONE nested-transform expression: the inner
    transform materializes md5(tok)'s 16-char prefix once per token
    (lambda bodies get no common-subexpression elimination, so parsing
    16 digits straight off md5(w) would recompute the md5 16 times);
    the outer transform parses the four band ints off that value.
    Result type: array<array<int>>.
    """
    def parse_band(h: Column, b: int) -> Column:
        # conv parse of the 4-char slice: same big-endian base-16
        # value as the per-digit instr() fold (the oracle's mirror),
        # one expression per band instead of four (r12)
        return F.conv(F.substring(h, 4 * b + 1, 4), 16, 10).cast("int")

    hashed = F.transform(distinct_toks, lambda w: F.substring(F.md5(w), 1, 16))
    return F.transform(
        hashed,
        lambda h: F.array(*[parse_band(h, b) for b in range(SIMHASH_N_BANDS)]),
    )


def simhash_band(token_bands: Column, n: Column, band: int) -> Column:
    """One 16-bit SimHash band over pre-hashed tokens.

    ``token_bands`` must be a MATERIALIZED simhash_token_bands column
    (project it, then repartition, then call this): each band
    references the column in 16 filter lambdas and Catalyst would
    re-inline an unmaterialized expression into every one.  Bit k of
    band b is set when the +1/-1 vote across tokens is positive --
    i.e. when more than half the tokens have that bit set in their
    own hash.
    """
    def bit_pred(band_idx: int, weight: int):
        return lambda a: (
            F.floor(F.element_at(a, band_idx + 1) / F.lit(weight)).cast("int") % 2
        ) == F.lit(1)

    out = F.lit(0)
    for k in range(SIMHASH_BAND_BITS):
        ones = F.size(F.filter(token_bands, bit_pred(band, 2**k)))
        out = out + F.when(ones * 2 > n, F.lit(2**k)).otherwise(F.lit(0))
    return out


def simhash_hex(*bands: Column) -> Column:
    """Canonical 16-hex-char rendering of the 64-bit signature:
    bands concatenated most-significant first.  A string (not a
    BIGINT) because bit 63 would not fit a signed long."""
    return F.concat(
        *[F.lpad(F.lower(F.hex(b)), 4, "0") for b in reversed(bands)]
    )


def md5_mod_bucket(col: Column, m: int) -> Column:
    """Deterministic 0..m-1 bucket from the first 4 hex chars of
    md5(cast(col as string)) -- the stable row hash behind the split
    buckets and the Count-Min rows.  Pure integer arithmetic; the
    oracle mirrors it with instr('0123..f', ...) digit extraction.
    16 bits of hash feed the mod, so m must stay well under 65536.

    Implementation (r12): one conv(hex, 16, 10) parse of the 4-char
    prefix -- numerically identical to the per-digit instr() fold the
    oracle mirrors (big-endian base-16 parse of the same substring),
    but ONE md5 evaluation instead of four.  Lambda bodies and
    interpreted projections get no common-subexpression elimination,
    so the repeated-md5 shape was 4x the hash work in every hot path
    (QC features: per token; DSIR: per bigram)."""
    h = F.md5(col.cast("string"))
    return F.conv(F.substring(h, 1, 4), 16, 10).cast("int") % m


def md5_pct_bucket(col: Column) -> Column:
    """Deterministic 0..99 bucket (md5_mod_bucket at m=100) -- the
    stable hash behind train/val/test splitting."""
    return md5_mod_bucket(col, 100)


def md5_int60(col: Column) -> Column:
    """60-bit integer digest: big-endian integer parse of the first
    15 hex chars of md5(col) -- the compact SET-ELEMENT key the
    MinHash verify joins ship instead of raw shingle strings (r12:
    a word 3-shingle averages ~25 chars + string overhead; the
    bigint is 8 bytes, and primitive arrays pack flat in Tungsten).
    Pure 64-bit integer arithmetic (16^15 = 2^60 < 2^63), digit fold
    identical to md5_mod_bucket's -- the oracle mirrors it with the
    same nested instr() fold, so both engines produce the identical
    bigint for every string.

    Implementation (r12): conv(hex_prefix, 16, 10) -- the same
    big-endian base-16 parse (16^15 = 2^60 < 2^64, so conv's unsigned
    64-bit arithmetic is exact and the cast to signed long lossless),
    but ONE md5 evaluation instead of fifteen.  This expression runs
    inside transform() lambdas (md5_int60_set) where Catalyst does NO
    common-subexpression elimination: the instr-fold shape really
    computed md5(s) 15 times per shingle, per verify-join side."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_int60_set(arr: Column) -> Column:
    """Element-wise md5_int60 over a string array -- computed
    map-side BEFORE a verify join so the shuffle carries 8-byte
    keys; set semantics are preserved because equal strings hash
    equal (duplicates stay duplicates, distinct stays distinct up to
    the 2^60 birthday bound, and both engines agree bit-for-bit
    regardless)."""
    return F.transform(arr, md5_int60)


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot_product(a: Column, b: Column) -> Column:
    """Left-to-right double-precision dot product of two float arrays."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def lsh_bucket(emb: Column) -> Column:
    """Random-hyperplane LSH bucket id (sign pattern over fixed planes).

    Plane weights are deterministic literals from constants.LSH_PLANES
    so the DuckDB oracle uses the exact same planes.
    """
    return _plane_sign_bucket(emb, LSH_PLANES)


def lsh_bucket_extra(emb: Column) -> Column:
    """Sub-bucket id from the SECOND hyperplane family
    (constants.LSH_EXTRA_PLANES, planes p >= LSH_NUM_PLANES of the
    same deterministic generator) -- independent of lsh_bucket.  The
    full LSH_EXTRA_NUM_PLANES-bit pool; dedup_embedding_cosine and
    semantic_dedup mask it to the low k = ceil(log2(n/budget)) bits
    (dedup._split_fanout) to split oversized blocks/cells 2^k ways,
    so sub-block size stays ~budget at every corpus size."""
    return _plane_sign_bucket(emb, LSH_EXTRA_PLANES)


def _plane_sign_bucket(emb: Column, planes: list[list[float]]) -> Column:
    bucket = F.lit(0)
    for p, plane in enumerate(planes):
        dot = dot_product(emb, F.array(*[F.lit(w) for w in plane]))
        bucket = bucket + F.when(dot >= 0, F.lit(2**p)).otherwise(F.lit(0))
    return bucket


def candidate_party(candidate: Column) -> Column:
    """Reference party round-robin (reference main.py:15,81)."""
    mapping = F.lit(None).cast("string")
    expr = None
    for cand, party in CANDIDATE_PARTY.items():
        cond = candidate == F.lit(cand)
        expr = F.when(cond, F.lit(party)) if expr is None else expr.when(cond, F.lit(party))
    return expr.otherwise(mapping)


def normalize_text(text: Column) -> Column:
    """Canonical text normalization for fuzzy-exact dedup: lowercase,
    ASCII whitespace runs (tab/newline/formfeed/CR/space) -> one
    space, strip everything outside [a-z0-9 ], re-collapse the spaces
    punctuation removal opens up, trim.  Whitespace converts BEFORE
    the punctuation strip so a newline separates words instead of
    fusing them.  Deliberately portable constructs only (ASCII lower,
    explicit character classes -- identical semantics in Java regex
    and RE2, the PII-pattern discipline) so the Spark hash and the
    DuckDB oracle hash can never disagree."""
    t = F.lower(text)
    t = F.regexp_replace(t, "[\t\n\f\r ]+", " ")
    t = F.regexp_replace(t, "[^a-z0-9 ]", "")
    t = F.regexp_replace(t, " +", " ")
    return F.trim(t)
