"""Same-session A/B: cms_heavy_bigrams with vs without the cnts
checkpoint (r12 adjudication scratch)."""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def build(spark, sf_dir, ckpt: bool):
    from mapreduce511_spark.functions.text import tokenize, word_ngrams
    from mapreduce511_spark.queries.sketches import _CMS_D, _CMS_W, _hex_long
    from mapreduce511_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokenize("text").alias("toks"))
    grams = toks.select(word_ngrams(F.col("toks"), 2).alias("grams"))
    cnts = (
        grams.select(F.explode("grams").alias("g"))
        .groupBy("g")
        .agg(F.count("*").alias("cnt"))
    )
    if ckpt:
        cnts = cnts.localCheckpoint(eager=True)
    salts = F.array(*[F.lit(i) for i in range(_CMS_D)])
    salted = cnts.select("g", "cnt", F.explode(salts).alias("r")).withColumn(
        "bucket",
        _hex_long(
            F.md5(F.concat(F.col("g"), F.lit(":cms"), F.col("r").cast("string"))),
            1,
            8,
        )
        % _CMS_W,
    )
    sketch = salted.groupBy("r", "bucket").agg(F.sum("cnt").alias("bsum"))
    top = cnts.orderBy(F.desc("cnt"), F.asc("g")).limit(20)
    top_salted = salted.join(F.broadcast(top.select("g")), "g")
    return (
        top_salted.join(sketch, ["r", "bucket"])
        .groupBy("g", "cnt")
        .agg(F.min("bsum").alias("cms_est"))
        .select(
            F.col("g").alias("bigram"),
            F.col("cnt").alias("true_cnt"),
            "cms_est",
            (F.col("cms_est") - F.col("cnt")).alias("overestimate"),
        )
        .orderBy(F.desc("true_cnt"), "bigram")
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from mapreduce511_spark.session import get_spark

    spark = get_spark("ab-cms")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def t(ck):
        s = time.perf_counter()
        build(spark, sf_dir, ck).count()
        return time.perf_counter() - s

    no, yes = [], []
    for _ in range(5):
        no.append(t(False))
        yes.append(t(True))
    print("no ckpt :", [round(x, 2) for x in no], "min", round(min(no), 3))
    print("ckpt    :", [round(x, 2) for x in yes], "min", round(min(yes), 3))
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        build(spark, sf_dir, False).explain("formatted")
    plan = buf.getvalue()
    print("no-ckpt plan: Exchanges:", plan.count("Exchange"),
          "ReusedExchange:", plan.count("ReusedExchange"),
          "Scans:", plan.count("Scan parquet"))
    spark.stop()


if __name__ == "__main__":
    main()
