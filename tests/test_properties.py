"""Property-based tests (hypothesis) for the expression libraries —
the SURVEY §5.2 invariants, generalized beyond fixture inputs."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mapreduce511_spark.functions.text import normalize_text, tokenize, word_ngrams
from mapreduce511_spark.functions.vectors import cosine_similarity, dot

_SETTINGS = dict(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

texts = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FFF),
    max_size=200,
)


@given(st.lists(texts, min_size=1, max_size=8))
@settings(**_SETTINGS)
def test_tokenize_matches_ascii_whitespace_split(spark, rows):
    """The tokenize contract is Java-regex \\s (ASCII whitespace, same
    as RE2/DuckDB) — NOT Python str.split(), which also breaks on
    Unicode whitespace like U+0085."""
    import re

    df = spark.createDataFrame([(t,) for t in rows], ["text"])
    got = [r[0] for r in df.select(tokenize("text")).collect()]
    for t, toks in zip(rows, got):
        expect = [w for w in re.split("[ \\t\\n\\x0b\\f\\r]+", t) if w]
        assert toks == expect, repr(t)


@given(st.lists(texts, min_size=1, max_size=8), st.integers(2, 4))
@settings(**_SETTINGS)
def test_ngram_count_invariant(spark, rows, n):
    """#ngrams == max(len(tokens) - n + 1, 0) for every row."""
    df = spark.createDataFrame([(t,) for t in rows], ["text"])
    out = df.select(tokenize("text").alias("toks")).select(
        F.size("toks").alias("n_tok"),
        F.size(word_ngrams(F.col("toks"), n)).alias("n_gram"),
    )
    for r in out.collect():
        assert r.n_gram == max(r.n_tok - n + 1, 0)


@given(st.lists(texts, min_size=1, max_size=8))
@settings(**_SETTINGS)
def test_normalize_idempotent(spark, rows):
    df = spark.createDataFrame([(t,) for t in rows], ["text"])
    out = df.select(
        normalize_text("text").alias("a"),
        normalize_text(normalize_text("text")).alias("b"),
    )
    for r in out.collect():
        assert r.a == r.b


vecs = st.lists(
    st.floats(-10, 10, allow_nan=False, width=32), min_size=2, max_size=16
)


@given(st.tuples(vecs, vecs).filter(lambda ab: len(ab[0]) == len(ab[1])))
@settings(**_SETTINGS)
def test_dot_matches_python(spark, ab):
    a, b = ab
    df = spark.createDataFrame([(a, b)], ["a", "b"])
    got = df.select(dot(F.col("a"), F.col("b"))).first()[0]
    import numpy as np

    expect = float(np.dot(np.array(a, dtype=np.float32).astype(float),
                          np.array(b, dtype=np.float32).astype(float)))
    assert math.isclose(got, expect, rel_tol=1e-9, abs_tol=1e-9)


@given(vecs.filter(lambda v: any(x != 0 for x in v)))
@settings(**_SETTINGS)
def test_cosine_self_is_one(spark, v):
    df = spark.createDataFrame([(v, v)], ["a", "b"])
    got = df.select(cosine_similarity(F.col("a"), F.col("b"))).first()[0]
    assert math.isclose(got, 1.0, rel_tol=1e-9)


def test_wordcount_total_equals_token_count(spark):
    """sum(counts) == total tokens (SURVEY §5.2 invariant; the
    reference's Combine in/out counter identity)."""
    from mapreduce511_spark.operators.wordcount import word_count
    from mapreduce511_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    total = word_count(docs).agg(F.sum("cnt")).first()[0]
    tokens = docs.select(F.explode(tokenize("text"))).count()
    assert total == tokens
