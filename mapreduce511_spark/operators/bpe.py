"""Iterative BPE tokenizer training on Spark.

Each merge iteration is one distributed pair-count over the segmented
VOCABULARY (word types with corpus frequencies — not the token
stream), a driver-side argmax of a single (pair, count) row, and one
distributed re-segmentation pass applying the merge. The corpus is
read once; everything after runs on the vocabulary table, which is
orders of magnitude smaller at any scale (the queries/text.py
``bpe_first_merge`` query is iteration one of exactly this loop).

Driver state per iteration: ONE winning pair (a 2-string row) — the
vocabulary itself never leaves the executors. The merge application
is an ``aggregate`` HOF folding each segment array left-to-right
(interpreted, not codegen — acceptable because it runs over word
types; the reference BPE implementations do the same fold in Python
per word).

Reference basis: extension tier — tokenizer-training primitive for
the LLM data pipeline (no analog in /root/reference)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# left-fold a segment array, merging adjacent (a, b) into a||b.
# greedy left-to-right, matching the classic BPE apply: after
# merging, the new token cannot re-merge with the preceding element
# in the same pass (acc's tail is only consumed when NOT merged).
_MERGE_FOLD = """
aggregate(
  seg,
  CAST(array() AS ARRAY<STRING>),
  (acc, x) -> IF(
     size(acc) > 0 AND element_at(acc, -1) = {a} AND x = {b},
     concat(slice(acc, 1, size(acc) - 1), array(concat({a}, {b}))),
     concat(acc, array(x))
  )
)
"""


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(pair_a, pair_b, freq) over the segmented vocabulary, weighted
    by word frequency; map-combinable aggregate."""
    pairs = vocab.select(
        "cnt",
        F.explode(
            F.when(
                F.size("seg") >= 2,
                F.expr(
                    "transform(slice(seg, 1, size(seg)-1), (x, i) ->"
                    " struct(x AS a, seg[i+1] AS b))"
                ),
            ).otherwise(F.array())
        ).alias("p"),
    )
    return pairs.groupBy(
        F.col("p.a").alias("pair_a"), F.col("p.b").alias("pair_b")
    ).agg(F.sum("cnt").alias("freq"))


def train_bpe(docs: DataFrame, n_merges: int, text_col: str = "text") -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merge rules from the corpus.

    Returns [(left, right, freq_at_merge_time), ...] in merge order.
    Deterministic: ties break on (pair_a, pair_b) lexicographically.
    The vocabulary is localCheckpointed each iteration so the lineage
    (one interpreted fold per merge) never stacks."""
    from mapreduce511_spark.functions.text import tokenize

    vocab = (
        docs.select(F.explode(tokenize(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .select(F.split("w", "").alias("seg"), "cnt")
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.desc("freq"), "pair_a", "pair_b")
            .limit(1)
            .collect()
        )
        if not top or top[0].freq < 1:
            break
        a, b, freq = top[0].pair_a, top[0].pair_b, int(top[0].freq)
        merges.append((a, b, freq))
        fold = _MERGE_FOLD.format(
            a=_sql_str(a), b=_sql_str(b)
        )
        vocab = vocab.select(
            F.expr(fold).alias("seg"), "cnt"
        ).localCheckpoint(eager=True)
    return merges


def _sql_str(s: str) -> str:
    """SQL single-quoted literal (segments come from corpus text)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
