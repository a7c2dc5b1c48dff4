"""Whale-cap evidence for item_cosine_similarity (r4 VERDICT item 9):
the capped variant matches the uncapped answer where the cap is slack,
and provably bounds candidate volume where a whale would explode it."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pyspark.sql.functions as F
from pyspark.sql.window import Window

from tests.conftest import SF_SMOKE


def test_capped_equals_uncapped_on_real_data(spark):
    """Cap 128 > max basket (105 at sf0.1, 66 at smoke): identical
    top-20 — which is why both variants share one oracle."""
    from mapreduce511_spark.queries.relational import (
        item_cosine_similarity,
        item_cosine_similarity_capped,
    )

    a = item_cosine_similarity(spark, SF_SMOKE).collect()
    b = item_cosine_similarity_capped(spark, SF_SMOKE).collect()
    assert a == b


def _whale_fixture(spark, tmp_path, whale_items: int):
    """Tiny orders/lineitem pair where customer 1 buys whale_items
    distinct parts in one order and 3 normal customers buy 3 parts."""
    orders = [(100 + u, u) for u in range(1, 5)]  # (o_orderkey, o_custkey)
    lines = []
    for k in range(whale_items):
        lines.append((101, k + 1000))  # whale: customer 1
    for u in (2, 3, 4):
        for p in (1000, 1001, 1002):
            lines.append((100 + u, p))
    sf_dir = tmp_path / "whale"
    sf_dir.mkdir()
    ts = pa.array([0] * len(orders), pa.timestamp("us"))
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([o for o, _ in orders], pa.int64()),
                "o_custkey": pa.array([c for _, c in orders], pa.int64()),
                "o_orderstatus": pa.array(["F"] * len(orders)),
                "o_totalprice": pa.array([1.0] * len(orders), pa.float64()),
                "o_orderdate": ts,
                "o_orderpriority": pa.array(["1-URGENT"] * len(orders)),
            }
        ),
        sf_dir / "orders.parquet",
    )
    n = len(lines)
    lts = pa.array([0] * n, pa.timestamp("us"))
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([o for o, _ in lines], pa.int64()),
                "l_partkey": pa.array([p for _, p in lines], pa.int64()),
                "l_suppkey": pa.array([1] * n, pa.int64()),
                "l_linenumber": pa.array(list(range(1, n + 1)), pa.int32()),
                "l_quantity": pa.array([1.0] * n, pa.float64()),
                "l_extendedprice": pa.array([1.0] * n, pa.float64()),
                "l_discount": pa.array([0.0] * n, pa.float64()),
                "l_tax": pa.array([0.0] * n, pa.float64()),
                "l_returnflag": pa.array(["N"] * n),
                "l_linestatus": pa.array(["O"] * n),
                "l_shipdate": lts,
            }
        ),
        sf_dir / "lineitem.parquet",
    )
    return str(sf_dir)


def test_cap_bounds_candidate_volume_on_whale(spark, tmp_path):
    """A 2000-item whale contributes C(2000,2) ~ 2M pairs uncapped;
    with the cap its contribution is at most C(128,2) = 8128. The
    capped pipeline's pair count must respect that bound, and the
    non-whale answers (pairs among parts 1000-1002, support 3) must
    survive capping untouched."""
    from mapreduce511_spark.queries.relational import (
        _ITEM_COS_CAP,
        _item_cosine,
    )

    sf_dir = _whale_fixture(spark, tmp_path, whale_items=2000)

    # reproduce the capped pu stage and count pair candidates
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pu = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(F.col("o_custkey").alias("u"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    w = Window.partitionBy("u").orderBy(
        F.md5(F.concat_ws(":", F.col("u"), F.col("p"))), "p"
    )
    capped = (
        pu.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _ITEM_COS_CAP)
        .drop("rn")
    )
    a, b = capped.alias("a"), capped.alias("b")
    n_pairs = a.join(
        b, (F.col("a.u") == F.col("b.u")) & (F.col("a.p") < F.col("b.p"))
    ).count()
    whale_bound = _ITEM_COS_CAP * (_ITEM_COS_CAP - 1) // 2
    assert n_pairs <= whale_bound + 3 * 3, n_pairs

    # end-to-end: the genuine co-purchase signal survives the cap
    rows = _item_cosine(spark, sf_dir, cap=_ITEM_COS_CAP).collect()
    got = {(r.part_a, r.part_b): r.n_co_buyers for r in rows}
    assert got[(1000, 1001)] >= 3
    assert got[(1000, 1002)] >= 3
    assert got[(1001, 1002)] >= 3
