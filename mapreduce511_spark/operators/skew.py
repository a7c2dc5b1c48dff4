"""Skew mitigation operators.

The reference's own execution is the canonical skew story: ONE reducer
handles every word at 100MB–1GB (`/root/reference/MapReduceLog/
_100mb_slowstart_0.5/20251128_192422/job_output.log:86`), so the
reduce stage is a single hot partition by design. Spark-side, AQE's
skew-join splitting (enabled in ``session.get_spark``) handles most
cases at runtime; explicit salting remains necessary when one join key
dominates so heavily that even split partitions bottleneck, or on
engines/paths AQE doesn't cover (stream-static joins).

``salted_join`` implements the classic recipe: salt the skewed (big)
side with a deterministic per-row bucket, replicate the small side
once per bucket, join on (key, salt). Deterministic: the salt comes
from hashing stable row-identity columns, not rand().
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_cols: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on column ``on`` with salt-based skew
    spreading.

    - ``salt_cols``: stable columns of ``big`` whose hash spreads each
      hot key's rows across ``n_salts`` buckets (e.g. a unique id).
    - The small side is exploded ``n_salts``× (then broadcast if it
      fits): shuffle keys become (on, salt) so a hot key occupies
      ``n_salts`` reducers instead of one.

    Result equals ``big.join(small, on, how)`` exactly (salt columns
    are internal). Supported ``how``: inner / left."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salt_col = "_salt"
    taken = set(big.columns) | set(small.columns)
    while salt_col in taken:  # never clobber a user column
        salt_col += "_"
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(n_salts))
    big_s = big.withColumn(salt_col, salt.cast("int"))
    small_s = small.withColumn(
        salt_col, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = big_s.join(small_s, [on, salt_col], how)
    return joined.drop(salt_col)
