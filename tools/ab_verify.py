"""Same-session interleaved A/B of the two verify_jaccard shapes over
the near_dup_jaccard_capped candidate set (r12 adjudication scratch —
not part of the driver contract)."""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def verify_old(candidates, shingles, keep_zero=False):
    sizes = shingles.groupBy("doc_id").agg(F.count("*").alias("sz"))
    sa = shingles.select(F.col("doc_id").alias("doc_a"), "sh")
    sb = shingles.select(F.col("doc_id").alias("doc_b"), "sh")
    inter = (
        candidates.join(sa, "doc_a")
        .join(sb, ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("both"))
    )
    if keep_zero:
        inter = candidates.join(inter, ["doc_a", "doc_b"], "left").fillna(
            0, subset=["both"]
        )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    jac = F.col("both") / (F.col("sz_a") + F.col("sz_b") - F.col("both"))
    return (
        inter.join(za, "doc_a")
        .join(zb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from mapreduce511_spark.operators.dedup import doc_shingles, verify_jaccard
    from mapreduce511_spark.session import get_spark
    from mapreduce511_spark.sources.tables import load_table

    spark = get_spark("ab-verify")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    docs = load_table(spark, sf_dir, "documents")
    shingles = doc_shingles(docs).localCheckpoint(eager=True)
    dfreq = shingles.groupBy("sh").agg(F.count("*").alias("dfc"))
    rare = shingles.join(dfreq.filter(F.col("dfc") <= 25), "sh").select(
        "doc_id", "sh"
    )
    a = rare.alias("a")
    b = rare.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    print("candidates:", cand.count(), "shingle rows:", shingles.count())

    def t(df):
        s = time.perf_counter()
        df.count()
        return time.perf_counter() - s

    olds, news = [], []
    for _ in range(5):
        olds.append(t(verify_old(cand, shingles).filter(F.col("jaccard") >= 0.5)))
        news.append(t(verify_jaccard(cand, shingles).filter(F.col("jaccard") >= 0.5)))
    print("old join-stream verify:", [round(x, 2) for x in olds], "min", round(min(olds), 3))
    print("new array-intersect  :", [round(x, 2) for x in news], "min", round(min(news), 3))
    spark.stop()


if __name__ == "__main__":
    main()
