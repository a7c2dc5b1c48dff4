"""SemDeDup with learned k-means centroids (r4 VERDICT item 5):
structural invariants match the frozen-grid twin, and the learned
clusters are measurably TIGHTER than the grid's."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMOKE


def test_kmeans_census_partitions_and_bounds(spark):
    """Every vector (including the grid twin's reserved first K) is
    assigned to exactly one learned cluster; flagged/pair/keep
    invariants hold cluster by cluster."""
    from mapreduce511_spark.operators.ann import K_CELLS
    from mapreduce511_spark.queries.similarity import (
        semantic_dedup_kmeans_census,
    )
    from mapreduce511_spark.sources.tables import load_table

    n_total = load_table(spark, SF_SMOKE, "embeddings").count()
    rows = semantic_dedup_kmeans_census(spark, SF_SMOKE).collect()
    assert {r.cluster_id for r in rows} <= set(range(K_CELLS))
    assert sum(r.n_members for r in rows) == n_total
    for r in rows:
        assert 0 <= r.n_flagged <= min(r.dup_pairs, r.n_members)
        assert 0 <= r.keep_bp <= 10000
        # HALF-UP like Spark/DuckDB round() (Python round is half-even)
        expect_bp = int(
            (r.n_members - r.n_flagged) * 10000 / r.n_members + 0.5
        )
        assert r.keep_bp == expect_bp


def test_kmeans_clusters_tighter_than_frozen_grid(spark):
    """The point of learning the centroids: mean member-to-assigned-
    centroid cosine must beat the frozen first-K grid's (the cluster
    quality that drives SemDeDup's intra-cluster pair recall). Also
    records the balance profile: the learned clustering must not
    degenerate (no cluster swallows the corpus)."""
    from mapreduce511_spark.operators.ann import train_centroids
    from mapreduce511_spark.queries.similarity import _SEM_K
    from mapreduce511_spark.sources.tables import load_table

    emb_df = load_table(spark, SF_SMOKE, "embeddings")
    learned = np.array(train_centroids(emb_df), dtype=np.float64)

    t = pq.read_table(f"{SF_SMOKE}/embeddings.parquet")
    vid = np.array(t["vec_id"])
    emb = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    emb = emb[np.argsort(vid)]
    unit = emb / np.linalg.norm(emb, axis=1, keepdims=True)

    def tightness(centroids: np.ndarray, members: np.ndarray) -> float:
        c_unit = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
        sims = members @ c_unit.T
        return float(np.max(sims, axis=1).mean())

    grid_tight = tightness(emb[:_SEM_K], unit[_SEM_K:])
    km_tight = tightness(learned, unit)
    assert km_tight > grid_tight, (
        f"learned centroids must tighten clusters: "
        f"kmeans {km_tight:.4f} vs grid {grid_tight:.4f}"
    )

    c_unit = learned / np.linalg.norm(learned, axis=1, keepdims=True)
    assign = np.argmax(unit @ c_unit.T, axis=1)
    sizes = np.bincount(assign, minlength=len(learned))
    assert sizes.max() < 0.8 * len(unit), (
        f"degenerate clustering: max cluster {sizes.max()}/{len(unit)}"
    )


def test_kmeans_census_pairs_are_intra_cluster_bounded(spark):
    """Pair work is bounded by sum of per-cluster n_members^2 — the
    SemDeDup complexity contract (never corpus^2)."""
    from mapreduce511_spark.queries.similarity import (
        semantic_dedup_kmeans_census,
    )

    rows = semantic_dedup_kmeans_census(spark, SF_SMOKE).collect()
    for r in rows:
        max_pairs = r.n_members * (r.n_members - 1) // 2
        assert r.dup_pairs <= max_pairs


def test_lloyd_census_partitions_and_bounds(spark):
    """The ORACLED learned-centroid census (shared unrolled-Lloyd
    trainer): full partition of the corpus, per-cluster invariants —
    plus tests/test_oracle_parity.py holds the whole census to the
    exact DuckDB hash at both parity scales."""
    from mapreduce511_spark.queries.similarity import (
        _LLOYD_K,
        semantic_dedup_lloyd_census,
    )
    from mapreduce511_spark.sources.tables import load_table

    n_total = load_table(spark, SF_SMOKE, "embeddings").count()
    rows = semantic_dedup_lloyd_census(spark, SF_SMOKE).collect()
    assert {r.cluster_id for r in rows} <= set(range(_LLOYD_K))
    assert sum(r.n_members for r in rows) == n_total
    for r in rows:
        assert 0 <= r.n_flagged <= min(r.dup_pairs, r.n_members)
        assert 0 <= r.keep_bp <= 10000
