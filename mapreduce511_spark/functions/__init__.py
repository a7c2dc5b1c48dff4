from mapreduce511_spark.functions.text import (
    char_ngrams,
    normalize_text,
    tokenize,
    word_ngrams,
)
from mapreduce511_spark.functions.vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "char_ngrams",
    "cosine_similarity",
    "dot",
    "l2_norm",
    "normalize_text",
    "tokenize",
    "word_ngrams",
]
