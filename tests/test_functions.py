"""Unit + property tests for the column-expression helpers."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from de_realtime_voting_spark.functions import (
    cosine_similarity,
    simhash16,
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


def test_simhash_range_and_determinism(spark):
    col = simhash16(F.array_distinct(tokens(F.col("t"))))
    v1 = _one(spark, col, t="spark joins data")
    v2 = _one(spark, col, t="spark joins data")
    assert v1 == v2
    assert 0 <= v1 < 2**16


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
