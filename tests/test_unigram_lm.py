"""Unigram-LM tokenizer training: the Spark pipeline must match an
INDEPENDENT pure-Python re-derivation exactly (seed ranking, hard-EM
Viterbi counts, prune-halving schedule), and the trained vocab must
satisfy the structural tokenizer contracts."""

from __future__ import annotations

import math
from collections import Counter

import pyspark.sql.functions as F

from mapreduce511_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE

MAXL = 6
SEED = 1024
TARGET = 256
ROUNDS = 2


def _ref_words(spark):
    from mapreduce511_spark.functions.text import tokenize

    docs = load_table(spark, SF_SMOKE, "documents")
    words = Counter()
    for r in (
        docs.select(F.explode(tokenize("text")).alias("w"))
        .groupBy("w")
        .count()
        .collect()
    ):
        words[r.w] = r["count"]
    return words


def _ref_seed(words):
    sub = Counter()
    for w, c in words.items():
        for s in range(len(w)):
            for ln in range(1, min(MAXL, len(w) - s) + 1):
                sub[w[s:s + ln]] += c
    chars = sorted(p for p in sub if len(p) == 1)
    multi = sorted(
        ((p, c) for p, c in sub.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[: max(0, SEED - len(chars))]
    out = {p: sub[p] for p in chars}
    out.update(dict(multi))
    return out


def _ref_viterbi(word, scores):
    n = len(word)
    best = [None] * (n + 1)
    best[0] = (0.0, 0, ())
    for i in range(1, n + 1):
        for ln in range(1, min(MAXL, i) + 1):
            piece = word[i - ln:i]
            s = scores.get(piece)
            if s is None or best[i - ln] is None:
                continue
            prev = best[i - ln]
            cand = (prev[0] - s, prev[1] + 1, prev[2] + (piece,))
            if best[i] is None or cand < best[i]:
                best[i] = cand
    assert best[n] is not None, word
    return list(best[n][2])


def _ref_em(words, counts):
    total = sum(counts.values())
    scores = {p: math.log(c / total) for p, c in counts.items() if c > 0}
    got = Counter()
    for w, c in words.items():
        for piece in _ref_viterbi(w, scores):
            got[piece] += c
    return {
        p: got.get(p, 0) + (1 if len(p) == 1 else 0)
        for p in counts
        if got.get(p, 0) > 0 or len(p) == 1
    }


def _ref_train(words):
    counts = _ref_seed(words)
    for _ in range(ROUNDS):
        counts = _ref_em(words, counts)
    while len(counts) > TARGET:
        keep = max(TARGET, len(counts) // 2)
        chars = {p: c for p, c in counts.items() if len(p) == 1}
        multi = sorted(
            ((p, c) for p, c in counts.items() if len(p) > 1),
            key=lambda pc: (-pc[1], pc[0]),
        )
        counts = dict(multi[: max(0, keep - len(chars))]) | chars
        counts = _ref_em(words, counts)
    return counts


def test_train_matches_independent_reference(spark):
    from mapreduce511_spark.operators.unigram_lm import train_unigram_lm

    docs = load_table(spark, SF_SMOKE, "documents")
    got = train_unigram_lm(docs)
    want = _ref_train(_ref_words(spark))
    assert got == want


def test_vocab_contracts(spark):
    """Every piece <= MAXL chars; every corpus character survives as
    a single-char piece (universal segmentability); vocab is at most
    TARGET + |chars| and every word still segments."""
    from mapreduce511_spark.operators.unigram_lm import (
        _scores_from_counts,
        train_unigram_lm,
        viterbi_segment,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    counts = train_unigram_lm(docs)
    words = _ref_words(spark)
    corpus_chars = {ch for w in words for ch in w}
    assert corpus_chars <= {p for p in counts if len(p) == 1}
    assert all(1 <= len(p) <= MAXL for p in counts)
    scores = _scores_from_counts(counts)
    for w in list(words)[:200]:
        assert "".join(viterbi_segment(w, scores)) == w


def test_encode_census_fertility_bounds(spark):
    """pieces_per_word >= 1000 milli (a word is at least one piece)
    and <= 1000 * max word length; totals consistent."""
    from mapreduce511_spark.queries.text import unigram_lm_encode_census

    rows = unigram_lm_encode_census(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.total_pieces >= r.total_words > 0
        assert 1000 <= r.pieces_per_word_milli <= 6000
