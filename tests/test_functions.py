"""Unit + property tests for the column-expression helpers."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from de_realtime_voting_spark.functions import (
    cosine_similarity,
    simhash_band,
    simhash_hex,
    simhash_token_bands,
    tokens,
    word_shingles,
)


def _one(spark, col, **data):
    row = spark.createDataFrame([data]).select(col.alias("out")).first()
    return row["out"]


def test_tokens_drops_empties(spark):
    assert _one(spark, tokens(F.col("t")), t="a  b c ") == ["a", "b", "c"]
    assert _one(spark, tokens(F.col("t")), t="") == []
    assert _one(spark, tokens(F.col("t")), t="   ") == []


def test_word_shingles_basic(spark):
    out = _one(spark, word_shingles(tokens(F.col("t"))), t="a b c d")
    assert out == ["a b c", "b c d"]


def test_word_shingles_short_doc_empty(spark):
    assert _one(spark, word_shingles(tokens(F.col("t"))), t="a b") == []
    assert _one(spark, word_shingles(tokens(F.col("t"))), t="") == []


def test_word_shingles_distinct(spark):
    out = _one(spark, word_shingles(tokens(F.col("t"))), t="a b c a b c a b c")
    # 'a b c' repeats; distinct set expected
    assert sorted(out) == sorted({"a b c", "b c a", "c a b"})


def _py_simhash_bands(text: str) -> list[int]:
    """Pure-python spec of the 64-bit banded SimHash."""
    import hashlib

    from de_realtime_voting_spark.constants import SIMHASH_BAND_BITS, SIMHASH_N_BANDS

    seen: list[str] = []
    for w in text.split(" "):
        if w and w not in seen:
            seen.append(w)
    tb = [
        [
            int(hashlib.md5(w.encode()).hexdigest()[4 * b : 4 * b + 4], 16)
            for b in range(SIMHASH_N_BANDS)
        ]
        for w in seen
    ]
    n = len(tb)
    bands = []
    for b in range(SIMHASH_N_BANDS):
        v = 0
        for k in range(SIMHASH_BAND_BITS):
            ones = sum(1 for a in tb if (a[b] >> k) & 1)
            if 2 * ones > n:
                v |= 1 << k
        bands.append(v)
    return bands


def test_simhash_bands_match_python(spark):
    from de_realtime_voting_spark.constants import SIMHASH_N_BANDS

    texts = ["spark joins data", "a b c d e f", "xyz", "dup dup dup word"]
    tb = F.col("tb")
    n = F.size(tb)
    rows = (
        spark.createDataFrame([(t,) for t in texts], "t string")
        .select("t", simhash_token_bands(F.array_distinct(tokens(F.col("t")))).alias("tb"))
        .select(
            "t",
            F.array(
                *[simhash_band(tb, n, b) for b in range(SIMHASH_N_BANDS)]
            ).alias("bands"),
            simhash_hex(
                *[simhash_band(tb, n, b) for b in range(SIMHASH_N_BANDS)]
            ).alias("hx"),
        )
        .collect()
    )
    for r in rows:
        want = _py_simhash_bands(r["t"])
        assert list(r["bands"]) == want, r["t"]
        want_hex = "".join(f"{b:04x}" for b in reversed(want))
        assert r["hx"] == want_hex and len(r["hx"]) == 16


def test_simhash_operator_matches_lambda_spec(spark, sf_dir):
    """The codegen explode+agg formulation in operators.dedup must
    produce the same band signature as the array-lambda spec here."""
    from de_realtime_voting_spark.constants import SIMHASH_N_BANDS
    from de_realtime_voting_spark.operators.dedup import _simhash_bands
    from de_realtime_voting_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").limit(200)
    fast = {
        r["doc_id"]: tuple(r[f"b{b}"] for b in range(SIMHASH_N_BANDS))
        for r in _simhash_bands(docs).collect()
    }
    tb = F.col("tb")
    n = F.size(tb)
    spec_df = (
        docs.select(
            "doc_id",
            simhash_token_bands(F.array_distinct(tokens(F.col("text")))).alias("tb"),
        )
        .where(F.size(tb) > 0)
        .select(
            "doc_id",
            *[simhash_band(tb, n, b).alias(f"b{b}") for b in range(SIMHASH_N_BANDS)],
        )
    )
    spec = {
        r["doc_id"]: tuple(r[f"b{b}"] for b in range(SIMHASH_N_BANDS))
        for r in spec_df.collect()
    }
    assert fast == spec and len(fast) > 0


def test_cosine_known_value(spark):
    got = _one(
        spark,
        cosine_similarity(F.col("a"), F.col("b")),
        a=[1.0, 0.0],
        b=[1.0, 0.0],
    )
    assert got == pytest.approx(1.0)


@settings(max_examples=20, deadline=None)
@given(
    vec=st.lists(
        st.floats(min_value=-10, max_value=10, allow_nan=False), min_size=2, max_size=8
    )
)
def test_cosine_self_similarity(vec):
    # pure-python mirror of the column math (property: cos(v, v) == 1)
    dot = sum(x * x for x in vec)
    if dot == 0:
        return
    assert math.isclose(dot / (math.sqrt(dot) * math.sqrt(dot)), 1.0, rel_tol=1e-9)


def test_char_ngrams_matches_python(spark):
    from de_realtime_voting_spark.functions import char_ngrams

    # one Spark round trip over many generated strings beats one per
    # hypothesis example; the python reference is the spec
    texts = ["", "a", "ab", "abc", "abcd", "aaaa", "a b", "xy xy xy", "héllo wörld!"]
    rows = spark.createDataFrame([(t,) for t in texts], "t string").select(
        "t", char_ngrams(F.col("t")).alias("g")
    ).collect()
    for r in rows:
        t = r["t"]
        want = sorted({t[i : i + 3] for i in range(len(t) - 2)}) if len(t) >= 3 else []
        assert sorted(r["g"]) == want, t


def test_minhash_signature_matches_python(spark):
    import hashlib

    from de_realtime_voting_spark.constants import MINHASH_SIGS
    from de_realtime_voting_spark.functions import minhash_signature

    shingles = ["a b c", "b c d", "c d e"]
    got = _one(
        spark,
        minhash_signature(F.col("s")),
        s=shingles,
    )
    for i in range(MINHASH_SIGS):
        want = min(hashlib.md5(f"{i}:{s}".encode()).hexdigest() for s in shingles)
        assert got[i] == want


@settings(max_examples=30, deadline=None)
@given(
    x=st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
    n=st.integers(min_value=0, max_value=6),
)
def test_round_half_up_python_mirror(x, n):
    # the shared rounding spec both engines implement
    s = float(10**n)
    want = math.floor(x * s + 0.5) / s
    assert want == math.floor(x * s + 0.5) / s  # determinism of the spec itself


def test_salted_join_matches_plain_join(spark, sf_dir):
    """Salting must be invisible in the result: same rows as the
    plain join, just spread over n_salts shuffle keys."""
    from de_realtime_voting_spark.functions.skew import salted_join
    from de_realtime_voting_spark.sources import load_table

    events = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        salted = salted_join(
            events, cust, "user_id", "c_custkey", salt_source="event_id"
        )
        plain = events.join(cust, events["user_id"] == cust["c_custkey"])
        key = lambda r: (r["event_id"], r["c_nationkey"])
        assert sorted(map(key, salted.collect())) == sorted(map(key, plain.collect()))
        # the join really runs on (key, salt)
        plan = salted._jdf.queryExecution().executedPlan().toString()
        assert "_salt" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_pandas_udf_cosine_matches_catalyst(spark, sf_dir):
    """The Arrow-vectorized cosine must agree with the Catalyst
    expression (different fold orders -> approx, not bitwise)."""
    from de_realtime_voting_spark.functions.pandas_udfs import cosine_pandas
    from de_realtime_voting_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(64)
    a = emb.select(F.col("vec_id"), F.col("embedding").alias("a"))
    b = emb.select(F.col("vec_id"), F.col("embedding").alias("b"))
    both = a.join(b, "vec_id")
    rows = both.select(
        "vec_id",
        cosine_similarity(F.col("a"), F.col("b")).alias("catalyst"),
        cosine_pandas(F.col("a"), F.col("b")).alias("arrow"),
    ).collect()
    assert len(rows) == 64
    for r in rows:
        assert r["catalyst"] == pytest.approx(r["arrow"], rel=1e-12)


def test_text_redact_pii_detects_injected_rows(spark):
    from de_realtime_voting_spark.operators.text import text_redact_pii

    docs = spark.createDataFrame(
        [
            (1, "contact me at jane.doe@example.com or 555-123-4567 thanks", "en", "s1"),
            (2, "no pii here at all", "en", "s1"),
            (3, "two mails a@b.io c@d.org and phone 123-456-7890", "en", "s2"),
        ],
        "doc_id bigint, text string, lang string, source string",
    )
    out = {r["source"]: r for r in text_redact_pii(docs).collect()}
    assert out["s1"]["docs_with_email"] == 1
    assert out["s1"]["docs_with_phone"] == 1
    assert out["s1"]["total_emails"] == 1
    assert out["s2"]["total_emails"] == 2
    assert out["s2"]["total_phones"] == 1
    assert out["s1"]["total_chars_delta"] != 0  # redaction changed lengths


def test_round_half_up_spark_matches_python(spark):
    from de_realtime_voting_spark.functions.columns import round_half_up

    xs = [0.5, 1.25, 2.675, -0.5, -1.25, 123.4565, 0.0, 99.995]
    rows = spark.createDataFrame([(x,) for x in xs], "x double").select(
        "x", round_half_up(F.col("x"), 2).alias("r")
    ).collect()
    for r in rows:
        want = math.floor(r["x"] * 100.0 + 0.5) / 100.0
        assert r["r"] == want, r["x"]


def test_cell_assigner_arrow_matches_catalyst(spark, sf_dir):
    """The Arrow cell assigner must be BIT-identical to the Catalyst
    expression: same float64 accumulation order, same tie-break."""
    from de_realtime_voting_spark.operators.similarity import (
        _assign_cells,
        _assign_cells_catalyst,
        _collect_centroids,
    )
    from de_realtime_voting_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cents = _collect_centroids(emb)
    arrow = {
        r["vec_id"]: (r["cell"], tuple(r["probes"]))
        for r in _assign_cells(emb, cents).collect()
    }
    catalyst = {
        r["vec_id"]: (r["cell"], tuple(r["probes"]))
        for r in _assign_cells_catalyst(emb, cents).collect()
    }
    assert arrow == catalyst and len(arrow) > 0


def test_pq_encoder_arrow_matches_catalyst(spark, sf_dir):
    """The Arrow PQ encoder must be BIT-identical to the Catalyst
    reference: same float64 accumulation order, same low-code
    tie-break."""
    from de_realtime_voting_spark.operators.similarity import (
        _collect_pq_codebook,
        _pq_codes,
        _pq_codes_catalyst,
    )
    from de_realtime_voting_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cb = _collect_pq_codebook(emb)
    arrow = {r["vec_id"]: tuple(r["codes"]) for r in _pq_codes(emb, cb).collect()}
    catalyst = {
        r["vec_id"]: tuple(r["codes"]) for r in _pq_codes_catalyst(emb, cb).collect()
    }
    assert arrow == catalyst and len(arrow) > 0


def test_entropy_pandas_matches_catalyst_fold(spark, sf_dir):
    """The Arrow entropy pass must match the Catalyst run-length fold
    on real docs to within accumulated libm ulps: term order and the
    sequential accumulation are identical by construction, but
    numpy's log and java.lang.Math.log may differ in the LAST ULP for
    some inputs (so may DuckDB's ln -- the reason the op's report
    rounds to 4 decimals; that rounding, not bit-equality, is the
    cross-engine contract for transcendental ops)."""
    from de_realtime_voting_spark.functions.pandas_udfs import entropy_pandas
    from de_realtime_voting_spark.operators.text import _entropy_fold_column
    from de_realtime_voting_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    rows = docs.select(
        entropy_pandas(F.col("text")).alias("arrow"),
        _entropy_fold_column().alias("fold"),
    ).collect()
    import math

    assert len(rows) > 0
    for r in rows:
        assert math.isclose(r["arrow"], r["fold"], rel_tol=1e-12, abs_tol=1e-12)


def test_simhash_arrow_path_equals_catalyst_twin(spark, sf_dir):
    """The r5 Arrow hot path (simhash_bands_pandas) must produce
    band-for-band identical signatures to the all-Catalyst spec twin
    on real corpus data -- integer counts and the same md5 bytes, so
    equality is exact, not approximate."""
    from de_realtime_voting_spark.operators import dedup
    from de_realtime_voting_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    got = {
        r["doc_id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
        for r in dedup._simhash_bands(docs).collect()
    }
    want = {
        r["doc_id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
        for r in dedup._simhash_bands_catalyst(docs).collect()
    }
    assert got == want and len(got) > 0


def test_minhash_arrow_path_equals_catalyst_twin(spark, sf_dir):
    """The r5 Arrow MinHash signature (minhash_signature_pandas) must
    equal the Catalyst minhash_signature hex-for-hex on real corpus
    shingles -- same md5 bytes, integer 128-bit min, fixed-width hex
    rendering."""
    import pyspark.sql.functions as F

    from de_realtime_voting_spark.functions import minhash_signature, word_shingles, tokens
    from de_realtime_voting_spark.functions.pandas_udfs import minhash_signature_pandas
    from de_realtime_voting_spark.sources import load_table

    sh = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", word_shingles(tokens(F.col("text"))).alias("shingles"))
        .where(F.size("shingles") > 0)
    )
    got = {r["doc_id"]: r["a"] for r in sh.select("doc_id", minhash_signature_pandas(F.col("shingles")).alias("a")).collect()}
    want = {r["doc_id"]: r["a"] for r in sh.select("doc_id", minhash_signature(F.col("shingles")).alias("a")).collect()}
    assert got == want and len(got) > 0


def test_arrow_hash_udfs_null_elements_match_catalyst(spark):
    """Null ELEMENTS inside the arrays must follow the Catalyst
    twins' null-propagation: simhash counts the row in n but adds no
    bits; minhash skips the shingle entirely."""
    import pyspark.sql.functions as F

    from de_realtime_voting_spark.functions import minhash_signature
    from de_realtime_voting_spark.functions.pandas_udfs import (
        minhash_signature_pandas,
        simhash_bands_pandas,
    )
    df = spark.createDataFrame(
        [(1, ["alpha", None, "beta"]), (2, ["alpha", "beta"])],
        "doc_id long, arr array<string>",
    )
    mh = {
        r["doc_id"]: r["a"]
        for r in df.select(
            "doc_id", minhash_signature_pandas(F.col("arr")).alias("a")
        ).collect()
    }
    mh_cat = {
        r["doc_id"]: r["a"]
        for r in df.select(
            "doc_id", minhash_signature(F.col("arr")).alias("a")
        ).collect()
    }
    assert mh == mh_cat
    # null shingle is a no-op: doc 1 and doc 2 share the same sig
    assert mh[1] == mh[2]

    sh = df.select(
        "doc_id", simhash_bands_pandas(F.col("arr")).alias("s")
    ).collect()
    bands = {r["doc_id"]: tuple(r["s"]) for r in sh}
    # doc 1: n=3 with 2 voting tokens -> strict majority 2*c > 3
    # requires BOTH tokens to set a bit; doc 2: n=2 requires both as
    # well (2*c > 2) -- so the two rows agree exactly here, and the
    # property proven is "no crash + null adds no bits"
    assert bands[1] == bands[2]


def test_fold_pandas_twins_bitwise_equal_catalyst(spark, sf_dir):
    """The r12 Arrow fold twins (dot_product_fold_pandas /
    cosine_fold_pandas) must equal the Catalyst folds BITWISE (==,
    not approx): same cast-then-accumulate order, float64 throughout,
    no pairwise summation anywhere."""
    from de_realtime_voting_spark.functions.columns import dot_product
    from de_realtime_voting_spark.functions.pandas_udfs import (
        cosine_fold_pandas,
        dot_product_fold_pandas,
    )
    from de_realtime_voting_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(128)
    a = emb.select("vec_id", F.col("embedding").alias("a"))
    b = emb.select(
        (F.col("vec_id") + 1).alias("vec_id"), F.col("embedding").alias("b")
    )
    both = a.join(b, "vec_id")
    rows = both.select(
        dot_product(F.col("a"), F.col("b")).alias("dc"),
        dot_product_fold_pandas(F.col("a"), F.col("b")).alias("da"),
        cosine_similarity(F.col("a"), F.col("b")).alias("cc"),
        cosine_fold_pandas(F.col("a"), F.col("b")).alias("ca"),
    ).collect()
    assert len(rows) > 100
    for r in rows:
        assert r["dc"] == r["da"], (r["dc"], r["da"])
        assert r["cc"] == r["ca"], (r["cc"], r["ca"])
