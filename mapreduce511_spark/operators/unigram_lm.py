"""Unigram-LM tokenizer training (SentencePiece-style, Kudo 2018) on
Spark — the probabilistic counterpart to ``operators/bpe.py``'s
greedy merge trainer; together they cover both tokenizer families in
production use.

Algorithm (hard-EM variant, fully deterministic):

1. SEED: every substring (length <= ``max_piece_len``) of every word
   type, weighted by word frequency, top ``seed_size`` by (freq,
   piece) — plus every single character (so any word always has a
   segmentation). The seed enumeration and ranking are DISTRIBUTED
   (substring explode + groupBy), because the substring blowup is
   the one corpus-shaped step.
2. EM ROUNDS: E-step Viterbi-segments every word type under the
   current piece scores (mapInPandas — word-type-bounded Python,
   same Arrow-batch discipline as every other non-expressible kernel
   here); M-step re-estimates piece probabilities from the
   frequency-weighted piece counts (distributed sum, driver holds
   only the vocab-sized table).
3. PRUNE: drop the lowest-count pieces (never single chars) down to
   ``target_size``, re-running one EM round after each prune so
   counts re-home onto survivors (two halvings per call).

Determinism: Viterbi breaks ties by (fewer pieces, lexicographically
smaller piece sequence); piece scores are log(count/total) in float64
computed identically in the executor kernel and the pure-Python
reference (tests/test_unigram_lm.py re-derives the whole pipeline
independently and requires exact equality).

Scale notes: every per-word step runs over WORD TYPES (the
aggregated vocabulary), not the token stream; the piece table rides
a broadcast closure (vocab-sized, a few thousand entries); the only
corpus-sized pass is the initial word count. At 100 TB the seed
explode is bounded by ``max_piece_len`` x corpus characters and
prunes hard at the top-``seed_size`` TakeOrdered.

Reference basis: extension tier — tokenizer-training family
(companion: ``operators/bpe.py``; no analog in /root/reference).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_PIECE_LEN = 6
SEED_SIZE = 1024
TARGET_SIZE = 256
EM_ROUNDS = 2


def word_types(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, cnt): the frequency-weighted vocabulary — the one
    corpus-sized aggregation everything downstream runs over."""
    from mapreduce511_spark.functions.text import tokenize

    return (
        docs.select(F.explode(tokenize(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )


def seed_pieces(
    vocab: DataFrame,
    max_piece_len: int = MAX_PIECE_LEN,
    seed_size: int = SEED_SIZE,
) -> list[tuple[str, int]]:
    """Top substrings by frequency-weighted occurrence count, plus
    every single character. Distributed substring explode: each word
    contributes len*max_piece_len candidate (start, len) slices."""
    subs = vocab.select(
        "cnt",
        F.explode(
            F.expr(
                f"""
                flatten(transform(sequence(1, length(w)), s ->
                    transform(sequence(1, least({max_piece_len},
                                                length(w) - s + 1)),
                              l -> substr(w, s, l))))
                """
            )
        ).alias("piece"),
    )
    counts = subs.groupBy("piece").agg(F.sum("cnt").alias("c"))
    chars = (
        counts.filter(F.length("piece") == 1)
        .orderBy("piece")
        .collect()
    )
    multi = (
        counts.filter(F.length("piece") > 1)
        .orderBy(F.desc("c"), "piece")
        .limit(max(0, seed_size - len(chars)))
        .collect()
    )
    return [(r.piece, int(r.c)) for r in chars] + [
        (r.piece, int(r.c)) for r in multi
    ]


def viterbi_segment(
    word: str, scores: dict[str, float], max_piece_len: int = MAX_PIECE_LEN
) -> list[str]:
    """Best segmentation of ``word`` under per-piece log-prob
    ``scores``: maximize total score, then fewest pieces, then the
    lexicographically smallest piece sequence — a total order, so
    the result is unique. Pure function shared verbatim by the
    executor kernel and (re-derived independently) by the tests."""
    n = len(word)
    # best[i] = (neg_total_score, n_pieces, pieces_tuple) for word[:i]
    best: list[tuple[float, int, tuple[str, ...]] | None] = [None] * (n + 1)
    best[0] = (0.0, 0, ())
    for i in range(1, n + 1):
        for ln in range(1, min(max_piece_len, i) + 1):
            piece = word[i - ln:i]
            s = scores.get(piece)
            if s is None or best[i - ln] is None:
                continue
            prev = best[i - ln]
            cand = (prev[0] - s, prev[1] + 1, prev[2] + (piece,))
            if best[i] is None or cand < best[i]:
                best[i] = cand
    if best[n] is None:
        raise ValueError(f"word {word!r} has no segmentation (chars missing)")
    return list(best[n][2])


def _scores_from_counts(counts: dict[str, int]) -> dict[str, float]:
    total = sum(counts.values())
    return {p: math.log(c / total) for p, c in counts.items() if c > 0}


def _em_round(
    vocab: DataFrame, counts: dict[str, int], max_piece_len: int
) -> dict[str, int]:
    """One hard-EM round: Viterbi-segment every word type under the
    current scores (Arrow-batched), sum frequency-weighted piece
    counts distributed, collect the vocab-sized table."""
    import pandas as pd

    scores = _scores_from_counts(counts)
    alive = set(counts)

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, int] = {}
            for w, c in zip(pdf["w"], pdf["cnt"]):
                for piece in viterbi_segment(str(w), scores, max_piece_len):
                    out[piece] = out.get(piece, 0) + int(c)
            yield pd.DataFrame(
                {"piece": list(out), "c": list(out.values())}
            )

    new = (
        vocab.mapInPandas(kernel, schema="piece string, c long")
        .groupBy("piece")
        .agg(F.sum("c").alias("c"))
        .collect()
    )
    got = {r.piece: int(r.c) for r in new if r.piece in alive}
    # unused single chars stay alive at count 0 + 1 smoothing floor so
    # every word keeps a segmentation after any prune
    return {
        p: got.get(p, 0) + (1 if len(p) == 1 else 0)
        for p in alive
        if got.get(p, 0) > 0 or len(p) == 1
    }


def train_unigram_lm(
    docs: DataFrame,
    text_col: str = "text",
    max_piece_len: int = MAX_PIECE_LEN,
    seed_size: int = SEED_SIZE,
    target_size: int = TARGET_SIZE,
    em_rounds: int = EM_ROUNDS,
) -> dict[str, int]:
    """Full pipeline: seed -> EM -> prune-halve (with one EM re-fit
    per halving) until <= target_size pieces. Returns piece ->
    final frequency-weighted count."""
    vocab = word_types(docs, text_col).localCheckpoint(eager=True)
    counts = dict(seed_pieces(vocab, max_piece_len, seed_size))
    for _ in range(em_rounds):
        counts = _em_round(vocab, counts, max_piece_len)
    while len(counts) > target_size:
        keep = max(target_size, len(counts) // 2)
        chars = {p: c for p, c in counts.items() if len(p) == 1}
        multi = sorted(
            ((p, c) for p, c in counts.items() if len(p) > 1),
            key=lambda pc: (-pc[1], pc[0]),
        )
        counts = dict(multi[: max(0, keep - len(chars))]) | chars
        counts = _em_round(vocab, counts, max_piece_len)
    return counts
