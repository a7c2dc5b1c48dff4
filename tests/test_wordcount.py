from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from mapreduce511_spark.operators.wordcount import word_count
from mapreduce511_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_wordcount_token_invariant(spark):
    """FIXTURES.md F1: sum(cnt) == total token count."""
    docs = load_table(spark, SF_SMOKE, "documents")
    from mapreduce511_spark.functions.text import tokenize

    total_tokens = docs.select(
        F.sum(F.size(tokenize("text"))).alias("n")
    ).collect()[0]["n"]
    counted = word_count(docs).agg(F.sum("cnt").alias("n")).collect()[0]["n"]
    assert counted == total_tokens > 0


def test_wordcount_semantics(spark):
    """StringTokenizer contract: whitespace split, empties dropped,
    case preserved, punctuation kept."""
    docs = spark.createDataFrame(
        [
            Row(text="Hello  world\thello\nWorld!"),
            Row(text="   "),
            Row(text="Hello"),
        ]
    )
    rows = {r["word"]: r["cnt"] for r in word_count(docs).collect()}
    assert rows == {"Hello": 2, "world": 1, "hello": 1, "World!": 1}


def test_wordcount_sorted_sink(spark):
    docs = spark.createDataFrame([Row(text="b a c a")])
    out = word_count(docs, sort=True).collect()
    assert [r["word"] for r in out] == ["a", "b", "c"]
    assert [r["cnt"] for r in out] == [2, 1, 1]
