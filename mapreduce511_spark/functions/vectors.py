"""Dense-vector math over ``array<float>`` columns — JVM-side only.

Built from ``zip_with`` / ``aggregate`` higher-order functions so
similarity scoring runs inside codegen, Arrow-free and UDF-free. All
math is done in double precision (cast up from float32 storage) so
results agree with any double-precision oracle.

r12 optimization note (guide §1.2 "per-task work", measured both
ways): HOF lambdas evaluate on Catalyst's interpreted path, ~9 µs per
64-dim fold, so for an operator that evaluates exactly ONE dot per
row/pair (the BNLJ exact-spec pair kernel, where the norms are
pre-factored per side) a fixed-width unrolled sum of plain
``GetArrayItem``/``Multiply``/``Add`` nodes is ~2x faster — that
variant is ``dot_unrolled64`` below. But an operator that evaluates
MANY dots per row (``_with_best_cell``'s k-centroid argmax, k x 64
terms in one Project) blows the generated method past HotSpot's JIT
HugeMethodLimit: the code compiles to bytecode that never JITs, and
the whole expression runs interpreted — measured ann_ivf_lloyd_topk
5.7 s -> 40.9 s when ``dot`` itself was unrolled globally (r12
session A/B; the r6-era note in queries/similarity.py found the same
3x cliff). So the DEFAULT ``dot`` stays the HOF fold, and the
unrolled kernel is opt-in for single-dot shapes only.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Corpus-contract embedding dimension (every SF ships 64-dim vectors;
# the size guard in dot_unrolled64 makes any drift fall back to the
# generic fold instead of mis-summing).
UNROLL_DIM = 64


def _dot_fold(a: Column, b: Column) -> Column:
    """The generic HOF fold — the semantics reference."""
    products = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(products, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    return _dot_fold(a, b)


def _dot_unrolled(a: Column, b: Column, dim: int) -> Column:
    """Fixed-width unrolled sum with the fold's exact association:
    ((0.0 + p0) + p1) + ... (the leading 0.0 matters only for a -0.0
    first product, where the fold also yields +0.0)."""
    acc: Column = F.lit(0.0)
    for i in range(dim):
        acc = acc + a.getItem(i).cast("double") * b.getItem(i).cast("double")
    return acc


def dot_unrolled64(a: Column, b: Column) -> Column:
    """Codegen-friendly 64-wide dot for single-dot-per-row kernels.
    Bit-identical to ``dot``: same left-to-right association, same
    per-element double casts (IEEE addition is deterministic given
    order); vectors of any OTHER length (or null) fall back to the
    fold via a lazily-evaluated CASE WHEN, preserving the generic
    null / length-mismatch semantics. Use ONLY where one dot runs per
    row — k unrolled copies in one Project exceed the JIT method
    limit and run slower than the fold (see module docstring)."""
    return F.when(
        (F.size(a) == UNROLL_DIM) & (F.size(b) == UNROLL_DIM),
        _dot_unrolled(a, b, UNROLL_DIM),
    ).otherwise(_dot_fold(a, b))


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def lit_doubles(values) -> Column:
    """Literal ``array<double>`` parsed as ONE SQL expression.

    r13 (guide §7.3 — driver-side cost): ``F.array(*[F.lit(x) ...])``
    pays one py4j round trip per element (~0.4 ms each), so a 16x64
    centroid table costs ~0.4 s of pure driver time per construction.
    Formatting the same doubles into one ``array(...)`` SQL string and
    parsing it JVM-side is ~150x faster and yields the IDENTICAL
    literal tree: ``repr`` is the shortest round-trip decimal, and the
    SQL parser's nearest-double conversion returns the same IEEE bits.
    Finite values only (inf/nan have no SQL literal) — every vector
    kernel here operates on finite embeddings by construction.
    """
    import math

    vals = [float(x) for x in values]
    if not all(map(math.isfinite, vals)):
        raise ValueError("lit_doubles requires finite values")
    return F.expr("array(" + ",".join(repr(x) + "D" for x in vals) + ")")


def sql_doubles(values) -> str:
    """The ``array(...)`` SQL text ``lit_doubles`` parses — for
    embedding into larger single-parse expression strings."""
    import math

    vals = [float(x) for x in values]
    if not all(map(math.isfinite, vals)):
        raise ValueError("sql_doubles requires finite values")
    return "array(" + ",".join(repr(x) + "D" for x in vals) + ")"


def lit_doubles_nested(rows) -> Column:
    """Literal ``array<array<double>>`` as one parsed SQL expression
    (see ``lit_doubles``)."""
    return F.expr(
        "array(" + ",".join(sql_doubles(r) for r in rows) + ")"
    )
