"""Same-session A/B for the tfidf pair family (r12 scratch).

A: capped verify — cand -> wa -> wb stream joins (current) vs per-doc
   weight maps + HOF dot.
B: exact-spec term self-join — sort-merge (current) vs shuffled-hash
   hint.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from mapreduce511_spark.functions.text import tokenize, word_ngrams
    from mapreduce511_spark.queries.similarity import _TFIDF_DF_CAP
    from mapreduce511_spark.session import get_spark
    from mapreduce511_spark.sources.tables import load_table

    spark = get_spark("ab-tfidf")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "doc_id", F.explode(word_ngrams(tokenize("text"), 2)).alias("g")
        )
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)
    )
    dfreq = tf.groupBy("g").agg(F.count("*").alias("df"))
    nd = tf.agg(F.countDistinct("doc_id").alias("n"))
    wts = (
        tf.join(dfreq, "g")
        .crossJoin(F.broadcast(nd))
        .filter(F.col("df") < F.col("n"))
        .select(
            "doc_id",
            "g",
            (
                F.col("tf")
                * F.floor(1000 * F.log(F.col("n").cast("double") / F.col("df")))
            ).alias("wt"),
        )
        .localCheckpoint(eager=True)
    )
    rare = tf.join(dfreq.filter(F.col("df") <= _TFIDF_DF_CAP), "g").select(
        "doc_id", "g"
    )
    a, b = rare.alias("a"), rare.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    print("tfidf cand pairs:", cand.count(), "wts rows:", wts.count())

    def pairs_stream():
        wa = wts.select(F.col("doc_id").alias("doc_a"), "g", F.col("wt").alias("wt_a"))
        wb = wts.select(F.col("doc_id").alias("doc_b"), "g", F.col("wt").alias("wt_b"))
        return (
            cand.join(wa, "doc_a")
            .join(wb, ["doc_b", "g"])
            .groupBy("doc_a", "doc_b")
            .agg(
                F.sum(F.col("wt_a") * F.col("wt_b")).cast("long").alias("dot"),
                F.count("*").alias("n_shared_terms"),
            )
            .filter(F.col("dot") > 0)
        )

    def pairs_maps():
        wmap = wts.groupBy("doc_id").agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("g"), F.col("wt")))
            ).alias("m")
        )
        ma = wmap.select(F.col("doc_id").alias("doc_a"), F.col("m").alias("ma"))
        mb = wmap.select(F.col("doc_id").alias("doc_b"), F.col("m").alias("mb"))
        acc = F.expr(
            "aggregate(map_entries(ma), struct(0L AS dot, 0L AS n), "
            "(acc, e) -> IF(map_contains_key(mb, e.key), "
            "struct(acc.dot + e.value * mb[e.key], acc.n + 1L), acc))"
        )
        return (
            cand.join(ma, "doc_a")
            .join(mb, "doc_b")
            .select("doc_a", "doc_b", acc.alias("r"))
            .select(
                "doc_a",
                "doc_b",
                F.col("r.dot").alias("dot"),
                F.col("r.n").alias("n_shared_terms"),
            )
            .filter(F.col("dot") > 0)
        )

    def t(df):
        s = time.perf_counter()
        df.count()
        return time.perf_counter() - s

    sA, sB = [], []
    for _ in range(4):
        sA.append(t(pairs_stream()))
        sB.append(t(pairs_maps()))
    print("verify stream-joins:", [round(x, 2) for x in sA], "min", round(min(sA), 3))
    print("verify doc-maps    :", [round(x, 2) for x in sB], "min", round(min(sB), 3))

    # equivalence spot check
    ra = sorted(tuple(r) for r in pairs_stream().collect())
    rb = sorted(tuple(r) for r in pairs_maps().collect())
    print("equal:", ra == rb, "rows:", len(ra))

    # B: exact-spec self-join strategy
    wa = wts.alias("a")
    wb = wts.alias("b")

    def spec_join(hint: str | None):
        right = wts.alias("b")
        if hint:
            right = right.hint(hint)
        return (
            wts.alias("a")
            .join(
                right,
                (F.col("a.g") == F.col("b.g"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .agg(
                F.sum(F.col("a.wt") * F.col("b.wt")).cast("long").alias("dot"),
                F.count("*").alias("n_shared_terms"),
            )
        )

    jA, jB = [], []
    for _ in range(4):
        jA.append(t(spec_join(None)))
        jB.append(t(spec_join("shuffle_hash")))
    print("spec self-join SMJ  :", [round(x, 2) for x in jA], "min", round(min(jA), 3))
    print("spec self-join SHJ  :", [round(x, 2) for x in jB], "min", round(min(jB), 3))
    spark.stop()


if __name__ == "__main__":
    main()
