"""One-off diagnostic for tfidf_cosine_pairs_exact_spec (r13):
report the checkpointed tf/wts partition counts, the df distribution
of the bigram vocabulary (skew + Sigma df^2 candidate volume), and the
stage shape of the pair self-join. Read-only; not part of the bench.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import functions as F

from mapreduce511_spark.functions.text import tokenize, word_ngrams
from mapreduce511_spark.session import get_spark
from mapreduce511_spark.sources.tables import load_table

spark = get_spark("probe_tfidf")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()

docs = load_table(spark, sf_dir, "documents")
t0 = time.time()
tf = (
    docs.select(
        "doc_id", F.explode(word_ngrams(tokenize("text"), 2)).alias("g")
    )
    .groupBy("doc_id", "g")
    .agg(F.count("*").alias("tf"))
    .localCheckpoint(eager=True)
)
t1 = time.time()
print(f"tf build: {t1 - t0:.2f}s, partitions={tf.rdd.getNumPartitions()}, rows={tf.count()}")

dfreq = tf.groupBy("g").agg(F.count("*").alias("df"))
nd = tf.agg(F.countDistinct("doc_id").alias("n"))
n_docs = nd.collect()[0][0]
stats = dfreq.agg(
    F.count("*").alias("n_terms"),
    F.max("df").alias("max_df"),
    F.sum(F.col("df") * F.col("df")).alias("sum_df2"),
    F.sum(
        F.when(F.col("df") < n_docs, F.col("df") * (F.col("df") - 1) / 2)
    ).alias("pairs_after_dfn_filter"),
).collect()[0]
print(f"n_docs={n_docs}, n_terms={stats['n_terms']}, max_df={stats['max_df']}, "
      f"sum_df2={stats['sum_df2']}, candidate_pairs={stats['pairs_after_dfn_filter']}")
top = dfreq.orderBy(F.desc("df")).limit(10).collect()
print("top df:", [(r["g"], r["df"]) for r in top])

t2 = time.time()
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
t3 = time.time()
print(f"wts build: {t3 - t2:.2f}s, partitions={wts.rdd.getNumPartitions()}, rows={wts.count()}")

a, b = wts.alias("a"), wts.alias("b")
pairs = (
    a.join(
        b,
        (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    .agg(
        F.sum(F.col("a.wt") * F.col("b.wt")).cast("long").alias("dot"),
        F.count("*").alias("n_shared_terms"),
    )
)
t4 = time.time()
pairs.write.format("noop").mode("overwrite").save()
t5 = time.time()
print(f"pair join + agg (noop): {t5 - t4:.2f}s")
print("=== pair plan ===")
pairs.explain("formatted")
spark.stop()
