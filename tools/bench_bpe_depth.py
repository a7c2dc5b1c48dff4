"""Merge-depth evidence for the iterative BPE trainer: wall time per
merge across 64 iterations. Each iteration is one pair-count job + one
argmax collect + one fold/localCheckpoint job over the VOCABULARY; the
localCheckpoint truncates lineage every round, so per-merge time must
stay flat — a growing curve would mean lineage (or plan) accumulation
and a ceiling far below real tokenizer depths (30k merges).

Run: python tools/bench_bpe_depth.py [sf_dir] [n_merges]
Prints one JSON line: {"sf": ..., "n_merges": N, "per_merge_sec": [...],
"first_half_mean": s, "second_half_mean": s, "growth_ratio": r}
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    from pyspark.sql import functions as F

    from mapreduce511_spark.functions.text import tokenize
    from mapreduce511_spark.operators.bpe import (
        _MERGE_FOLD,
        _pair_counts,
        _sql_str,
    )
    from mapreduce511_spark.session import get_spark
    from mapreduce511_spark.sources.tables import load_table

    spark = get_spark()
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(tokenize("text")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .select(F.split("w", "").alias("seg"), "cnt")
        .localCheckpoint(eager=True)
    )
    times: list[float] = []
    merges: list[tuple[str, str, int]] = []
    for _ in range(n):
        t0 = time.time()
        top = (
            _pair_counts(vocab)
            .orderBy(F.desc("freq"), "pair_a", "pair_b")
            .limit(1)
            .collect()
        )
        if not top or top[0].freq < 1:
            break
        a, b = top[0].pair_a, top[0].pair_b
        merges.append((a, b, int(top[0].freq)))
        vocab = vocab.select(
            F.expr(_MERGE_FOLD.format(a=_sql_str(a), b=_sql_str(b))).alias(
                "seg"
            ),
            "cnt",
        ).localCheckpoint(eager=True)
        times.append(round(time.time() - t0, 3))
    h = len(times) // 2
    first, second = times[:h], times[h:]
    fm = sum(first) / max(len(first), 1)
    sm = sum(second) / max(len(second), 1)
    print(
        json.dumps(
            {
                "sf": sf_dir,
                "n_merges": len(times),
                "per_merge_sec": times,
                "first_half_mean": round(fm, 3),
                "second_half_mean": round(sm, 3),
                "growth_ratio": round(sm / fm, 3) if fm else None,
                "last_merge": merges[-1] if merges else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
