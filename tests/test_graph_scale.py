"""Graph-operator scale behavior: the DOULION sparsified triangle
estimate must track the exact count within sampling-noise bounds, on
both the registered co-purchase graph and random graphs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_CHECK


def test_doulion_tracks_exact_count_at_sf_check(spark):
    """p = 1/2 DOULION estimate vs exact triangle count on the
    co-purchase graph. With T ~ 1.3e5 triangles at sf0.01 the
    relative sampling error is well under 10%; 20% tolerance keeps
    the assertion robust to testdata regeneration."""
    from mapreduce511_spark import queries as suite

    q = suite.all_queries()
    exact = q["copurchase_triangles"](spark, SF_CHECK).collect()[0]
    est = q["copurchase_triangles_approx"](spark, SF_CHECK).collect()[0]
    assert est.n_triangles_est > 0
    rel = abs(est.n_triangles_est - exact.n_triangles) / exact.n_triangles
    assert rel < 0.20, (exact.n_triangles, est.n_triangles_est, rel)
    # the sparsifier keeps ~half the edges (binomial, wide margin)
    frac = est.n_edges_sampled / exact.n_edges
    assert 0.4 < frac < 0.6, frac


def test_doulion_deterministic_across_runs(spark):
    """The md5 coin makes the estimate a pure function of the data —
    two invocations must agree bit for bit (rand()-based sampling
    would not)."""
    from mapreduce511_spark import queries as suite

    q = suite.all_queries()["copurchase_triangles_approx"]
    r1 = q(spark, SF_CHECK).collect()
    r2 = q(spark, SF_CHECK).collect()
    assert r1 == r2


def test_doulion_estimator_on_random_graph(spark):
    """Estimator sanity off the fixture data: an Erdős–Rényi-ish
    graph built from hash-derived edges. The p=1/2 estimate must land
    within 4 standard deviations of the exact count (DOULION variance
    <= T/p^3 for edge-disjoint triangles; 4 sigma of the loose bound
    is a generous, flake-free gate)."""
    from mapreduce511_spark.queries.relational import (
        _oriented_triangles,
    )

    n, avg_deg = 300, 30
    v = spark.range(n * avg_deg // 2).select(
        (F.xxhash64(F.col("id"), F.lit(1)) % n).alias("x"),
        (F.xxhash64(F.col("id"), F.lit(2)) % n).alias("y"),
    )
    edges = (
        v.select(
            F.abs(F.least("x", "y")).alias("u"),
            F.abs(F.greatest("x", "y")).alias("v"),
        )
        .filter(F.col("u") < F.col("v"))
        .distinct()
    )
    exact = _oriented_triangles(edges).count()
    assert exact > 100, "fixture graph too sparse for the test"
    coin = F.substring(
        F.md5(F.concat_ws(":", F.col("u"), F.col("v"))), 1, 1
    )
    sampled = edges.filter(coin.isin(*"01234567"))
    est = _oriented_triangles(sampled).count() * 8
    sigma = (8 * exact) ** 0.5  # sd of 8*Binomial(T, 1/8) upper bound
    assert abs(est - exact) <= 4 * sigma, (exact, est, sigma)


def _py_kcore(edges: list[tuple[int, int]], k: int) -> set[int]:
    """Reference peeling: repeatedly delete vertices with degree < k."""
    from collections import defaultdict

    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    changed = True
    while changed:
        changed = False
        for x in [x for x, nb in adj.items() if len(nb) < k]:
            for y in adj.pop(x):
                adj[y].discard(x)
            changed = True
    return set(adj)


def test_kcore_matches_python_reference(spark):
    """Exact parity of the distributed peel against a pure-Python
    reference on the sf0.001 co-purchase graph, at the query's own k
    and at k=2 (different peeling depths)."""
    import math

    import duckdb

    from mapreduce511_spark.operators.graph import kcore
    from mapreduce511_spark.queries.relational import _copurchase_edges
    from mapreduce511_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    li = load_table(spark, SF_SMOKE, "lineitem")
    edges = _copurchase_edges(li).localCheckpoint(eager=True)
    pairs = [(r.u, r.v) for r in edges.collect()]
    n_vertices = len({x for e in pairs for x in e})
    k_query = max(2, math.ceil(2.0 * len(pairs) / n_vertices))
    for k in (2, k_query, k_query + 4):
        expect = _py_kcore(pairs, k)
        core, rounds = kcore(edges, k)
        got = {r.node for r in core.collect()}
        assert got == expect, f"k={k}: {len(got)} vs {len(expect)}"
        assert rounds >= 1


def test_kcore_census_query_runs(spark):
    from mapreduce511_spark import queries as suite
    from tests.conftest import SF_SMOKE

    row = suite.all_queries()["copurchase_kcore_census"](
        spark, SF_SMOKE
    ).collect()[0]
    assert row.k >= 2
    assert row.n_core_vertices >= 0
    # every core vertex keeps degree >= k inside the core, so a
    # non-empty core needs at least k*n/2 edges
    if row.n_core_vertices:
        assert row.n_core_edges * 2 >= row.k * row.n_core_vertices


def test_label_propagation_invariants(spark):
    """LPA semantics beyond oracle parity: labels are a partition of
    the non-isolated vertex set (member counts sum to |V|), every
    community label IS a vertex id, and the round-3 histogram is
    coarser than the identity labeling (propagation happened)."""
    from pyspark.sql import functions as F

    from mapreduce511_spark.queries import all_queries
    from mapreduce511_spark.queries.relational import _copurchase_edges, _t

    sf = "/root/testdata/sf0.01"
    rows = all_queries()["copurchase_label_propagation"](spark, sf).collect()
    (li,) = _t(spark, sf, "lineitem")
    edges = _copurchase_edges(li)
    verts = (
        edges.select(F.col("u").alias("v"))
        .unionByName(edges.select("v"))
        .distinct()
    )
    n_verts = verts.count()
    vert_ids = {r.v for r in verts.collect()}
    assert sum(r.n_members for r in rows) == n_verts
    assert all(r.community in vert_ids for r in rows)
    assert len(rows) < n_verts
