from mapreduce511_spark.operators.wordcount import word_count, word_count_from_text

__all__ = ["word_count", "word_count_from_text"]
