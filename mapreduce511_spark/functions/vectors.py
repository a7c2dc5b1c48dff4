"""Dense-vector math over ``array<float>`` columns — JVM-side only.

Built from ``zip_with`` / ``aggregate`` higher-order functions so
similarity scoring runs inside codegen, Arrow-free and UDF-free. All
math is done in double precision (cast up from float32 storage) so
results agree with any double-precision oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    products = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(products, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
