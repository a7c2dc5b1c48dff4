"""Behavioral tests for the round-4 third/fourth-sweep operators —
properties the DuckDB oracles don't state: skyline correctness vs a
brute-force spec on adversarial data, TWAP invariants, and rolling-HLL
error bounds."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import Row

from tests.conftest import SF_SMOKE


def _write_single_parquet(path, cols: dict, schema: pa.Schema) -> None:
    """One-FILE parquet with exact types (Spark's directory output
    defeats the events footer-peek in sources/tables.py, and
    createDataFrame would infer int64 where the contract says int32)."""
    pq.write_table(pa.table(cols, schema=schema), str(path))


def test_skyline_matches_bruteforce(spark, tmp_path):
    """The O(n log n) prefix-max sweep must equal the O(n^2) dominance
    spec on data with the nasty cases: duplicate prices, duplicate
    (price, size) points, and a strictly increasing chain."""
    import random

    rng = random.Random(7)
    rows = [
        Row(
            p_partkey=i,
            p_name=f"part{i}",
            p_brand="B",
            p_type="T",
            p_size=rng.randint(1, 12),
            p_retailprice=float(rng.choice([10, 10, 20, 20, 30, 40, 50])),
        )
        for i in range(120)
    ]
    # exact duplicate point (both must survive if on the frontier)
    rows.append(Row(**{**rows[0].asDict(), "p_partkey": 999}))
    _write_single_parquet(
        tmp_path / "part.parquet",
        {
            "p_partkey": [r.p_partkey for r in rows],
            "p_name": [r.p_name for r in rows],
            "p_brand": [r.p_brand for r in rows],
            "p_type": [r.p_type for r in rows],
            "p_size": [r.p_size for r in rows],
            "p_retailprice": [r.p_retailprice for r in rows],
        },
        pa.schema(
            [
                ("p_partkey", pa.int64()),
                ("p_name", pa.string()),
                ("p_brand", pa.string()),
                ("p_type", pa.string()),
                ("p_size", pa.int32()),
                ("p_retailprice", pa.float64()),
            ]
        ),
    )

    def dominated(p, q):
        return (q.p_retailprice < p.p_retailprice and q.p_size >= p.p_size) or (
            q.p_retailprice == p.p_retailprice and q.p_size > p.p_size
        )

    expected = sorted(
        r.p_partkey
        for r in rows
        if not any(dominated(r, q) for q in rows)
    )
    from mapreduce511_spark.queries.relational import pareto_frontier_parts

    got = sorted(
        r.p_partkey for r in pareto_frontier_parts(spark, str(tmp_path)).collect()
    )
    assert got == expected


def _write_events(spark, tmp_path, rows):
    _write_single_parquet(
        tmp_path / "events.parquet",
        {
            "event_id": [r.event_id for r in rows],
            "ts": [r.ts for r in rows],
            "user_id": [r.user_id for r in rows],
            "event_type": [r.event_type for r in rows],
            "value": [r.value for r in rows],
            "props": [r.props for r in rows],
        },
        pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("value", pa.float64()),
                ("props", pa.string()),
            ]
        ),
    )


def test_twap_constant_value_is_that_value(spark, tmp_path):
    """Time-weighting cannot change a constant series, whatever the
    (irregular) spacing."""
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        Row(
            event_id=i,
            ts=t0 + datetime.timedelta(seconds=s),
            user_id=1,
            event_type="view",
            value=7.5,
            props="{}",
        )
        for i, s in enumerate([0, 1, 10, 11, 500])
    ]
    _write_events(spark, tmp_path, rows)
    from mapreduce511_spark.queries.events import time_weighted_value_avg

    row = time_weighted_value_avg(spark, str(tmp_path)).first()
    assert row.twap == 7.5
    assert row.n_spans == 4
    assert row.total_us == 500_000_000


def test_twap_weights_by_duration_not_count(spark, tmp_path):
    """A value held 9x longer dominates 9:1 even with one event each:
    value 10 held 90s, value 0 held 10s -> twap 9.0. The plain mean
    (5.0) is exactly the error TWAP exists to fix."""
    t0 = datetime.datetime(2024, 1, 1)
    spans = [(0, 10.0), (90, 0.0), (100, 99.0)]  # last value unweighted
    rows = [
        Row(
            event_id=i,
            ts=t0 + datetime.timedelta(seconds=s),
            user_id=1,
            event_type="view",
            value=v,
            props="{}",
        )
        for i, (s, v) in enumerate(spans)
    ]
    _write_events(spark, tmp_path, rows)
    from mapreduce511_spark.queries.events import time_weighted_value_avg

    row = time_weighted_value_avg(spark, str(tmp_path)).first()
    assert row.twap == 9.0


def test_hll_rolling_windows_within_error_bound(spark):
    """Every rolling window's sketch estimate stays inside the loose
    25% gate vs its exact twin (m=256 -> ~6.5% standard error; the
    bound catches register/merge bugs, not noise)."""
    from mapreduce511_spark.queries.sketches import hll_rolling_7d_users

    rows = hll_rolling_7d_users(spark, SF_SMOKE).collect()
    assert rows, "no windows produced"
    for r in rows:
        rel = abs(r.hll_est - r.n_exact) / max(r.n_exact, 1)
        assert rel < 0.25, f"{r.window_end}: {r.hll_est} vs {r.n_exact}"


def test_incremental_mv_refresh_equals_full_recompute(spark):
    """The base+delta merge must be indistinguishable from a full
    groupBy over the union — checked here directly DataFrame-to-
    DataFrame (the oracle states the same thing against DuckDB)."""
    from pyspark.sql import functions as F

    from mapreduce511_spark.queries.relational import incremental_mv_refresh
    from mapreduce511_spark.sources.tables import load_table

    inc = incremental_mv_refresh(spark, SF_SMOKE)
    full = (
        load_table(spark, SF_SMOKE, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )
    assert inc.exceptAll(full).count() == 0
    assert full.exceptAll(inc).count() == 0


def test_bloom_known_member_and_nonmember(spark, tmp_path):
    """Deterministic micro-case: a 3-key filter answers positive for
    every inserted key (no false negative is structural, not
    statistical)."""
    _write_single_parquet(
        tmp_path / "customer.parquet",
        {
            "c_custkey": [1, 2, 3],
            "c_name": ["c1", "c2", "c3"],
            "c_nationkey": [0, 0, 0],
            "c_acctbal": [0.0, 0.0, 0.0],
            "c_mktsegment": ["M", "M", "M"],
        },
        pa.schema(
            [
                ("c_custkey", pa.int64()),
                ("c_name", pa.string()),
                ("c_nationkey", pa.int32()),
                ("c_acctbal", pa.float64()),
                ("c_mktsegment", pa.string()),
            ]
        ),
    )
    from mapreduce511_spark.queries.sketches import bloom_membership_census

    row = bloom_membership_census(spark, str(tmp_path)).first()
    assert row.n_members == 3
    assert row.n_bloom_positive >= 3  # all members positive


def test_embedding_top_component_matches_numpy(spark):
    """Distributed Gram + power iteration must agree with numpy's
    exact eigendecomposition of the same covariance: same top
    eigenvalue, |cosine| of eigenvectors ~ 1."""
    import numpy as np
    import pyarrow.parquet as pq_  # noqa: N813

    from mapreduce511_spark.queries.similarity import (
        embedding_top_component,
    )

    rows = embedding_top_component(spark, SF_SMOKE).collect()
    v = np.zeros(64)
    for r in rows:
        v[r.dim] = r.loading
    eig = rows[0].eigenvalue

    tbl = pq_.read_table(f"{SF_SMOKE}/embeddings.parquet").to_pandas()
    m = np.stack(tbl["embedding"].to_numpy()).astype(np.float64)
    cov = np.cov(m, rowvar=False, bias=True)
    w, vecs = np.linalg.eigh(cov)
    assert abs(eig - w[-1]) < 1e-4
    cos = abs(float(v @ vecs[:, -1]) / np.linalg.norm(v))
    assert cos > 0.999


def test_common_neighbors_hand_graph(spark, tmp_path):
    """Hand-built co-purchase graph: orders {1,2} x2, {2,3} x2,
    {1,3} x1 -> support-2 edges are 1-2 and 2-3 only; the single
    candidate pair is (1,3) through middle vertex 2 with one common
    neighbor and Jaccard 1/(deg1 + deg3 - 1) = 1.0."""
    import datetime

    baskets = [(1, [1, 2]), (2, [1, 2]), (3, [2, 3]), (4, [2, 3]), (5, [1, 3])]
    rows = []
    for ok, parts in baskets:
        for ln, pk in enumerate(parts):
            rows.append((ok, pk, 1, ln + 1))
    ts = datetime.datetime(2024, 1, 1)
    _write_single_parquet(
        tmp_path / "lineitem.parquet",
        {
            "l_orderkey": [r[0] for r in rows],
            "l_partkey": [r[1] for r in rows],
            "l_suppkey": [r[2] for r in rows],
            "l_linenumber": [r[3] for r in rows],
            "l_quantity": [1.0] * len(rows),
            "l_extendedprice": [1.0] * len(rows),
            "l_discount": [0.0] * len(rows),
            "l_tax": [0.0] * len(rows),
            "l_returnflag": ["N"] * len(rows),
            "l_linestatus": ["O"] * len(rows),
            "l_shipdate": [ts] * len(rows),
        },
        pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("l_partkey", pa.int64()),
                ("l_suppkey", pa.int64()),
                ("l_linenumber", pa.int32()),
                ("l_quantity", pa.float64()),
                ("l_extendedprice", pa.float64()),
                ("l_discount", pa.float64()),
                ("l_tax", pa.float64()),
                ("l_returnflag", pa.string()),
                ("l_linestatus", pa.string()),
                ("l_shipdate", pa.timestamp("us")),
            ]
        ),
    )
    from mapreduce511_spark.queries.relational import (
        copurchase_common_neighbors,
    )

    out = copurchase_common_neighbors(spark, str(tmp_path)).collect()
    assert [(r.part_a, r.part_b, r.common_neighbors, r.jaccard) for r in out] == [
        (1, 3, 1, 1.0)
    ]


def test_approx_percentile_error_within_contract(spark):
    """approx_percentile(accuracy=10000) promises rank error <=
    1/10000; on lineitem's smooth price distribution that is far
    under 1% VALUE error at p50/p99 — the census must show it."""
    from mapreduce511_spark.queries.relational import (
        approx_percentile_error_census,
    )

    rows = approx_percentile_error_census(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.p50_rel_err_pct < 1.0, r
        assert r.p99_rel_err_pct < 1.0, r
