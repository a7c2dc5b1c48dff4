"""Behavioral tests for the round-4 sixth-sweep operators —
properties the DuckDB oracles don't state: temperature sampling's
rate normalization and monotonicity, and SemDeDup's partition /
bound invariants on the real embedding table.
"""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_temperature_rates_normalized_and_monotone(spark):
    """The rarest language keeps 100% (rate_bp == 10000) and rates
    strictly decrease as language frequency grows (alpha < 1
    upsamples tails); kept counts never exceed doc counts and track
    the rate to within the hash-bucket quantization."""
    from mapreduce511_spark.queries.text import temperature_mixture_sample

    rows = temperature_mixture_sample(spark, SF_SMOKE).collect()
    assert len(rows) >= 2
    by_n = sorted(rows, key=lambda r: r.n_docs)
    assert by_n[0].rate_bp == 10000  # rarest lang: full retention
    for lo, hi in zip(by_n, by_n[1:]):
        if lo.n_docs < hi.n_docs:
            assert lo.rate_bp > hi.rate_bp
    for r in rows:
        assert 0 < r.n_kept <= r.n_docs
        # md5 buckets are near-uniform: kept/docs within 15 points
        # of the target rate on any non-trivial language
        if r.n_docs >= 50:
            assert abs(r.n_kept / r.n_docs - r.rate_bp / 10000) < 0.15


def test_semantic_dedup_census_partitions_and_bounds(spark):
    """Clusters partition the non-centroid vectors exactly; flagged
    counts are bounded by pair counts and members; keep_bp is a
    valid basis-point ratio; at tau=0.35 the smoke embeddings have
    at least one flagged near-dup somewhere."""
    from mapreduce511_spark.queries.similarity import (
        _SEM_K,
        semantic_dedup_census,
    )
    from mapreduce511_spark.sources.tables import load_table

    n_total = load_table(spark, SF_SMOKE, "embeddings").count()
    rows = semantic_dedup_census(spark, SF_SMOKE).collect()
    assert {r.cluster_id for r in rows} <= set(range(_SEM_K))
    assert sum(r.n_members for r in rows) == n_total - _SEM_K
    assert sum(r.dup_pairs for r in rows) > 0
    for r in rows:
        assert 0 <= r.n_flagged <= min(r.dup_pairs, r.n_members)
        assert 0 <= r.keep_bp <= 10000
        expect_bp = round((r.n_members - r.n_flagged) * 10000 / r.n_members)
        assert r.keep_bp == expect_bp


def test_heldout_ppl_bounds_and_split(spark):
    """Cross-entropy is positive and bounded by ln(V+1) (the uniform
    unseen-word floor can't be beaten by less than one observation);
    perplexity is exp(cross_entropy) after rounding; every language
    present in the val shard reports."""
    import math

    from mapreduce511_spark.queries.text import heldout_bigram_ppl

    rows = heldout_bigram_ppl(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.n_val_bigrams > 0
        assert 0 < r.cross_entropy
        assert abs(r.perplexity - round(math.exp(r.cross_entropy), 2)) < 0.02


def test_semantic_dedup_survives_10x_duplication(spark, tmp_path):
    """Scale stress: a 10x-replicated embedding corpus (every vector
    in a 10-way exact-duplicate family). SemDeDup must (a) assign all
    copies of a vector to the SAME cluster (identical vectors,
    deterministic tie-break), (b) flag at least all-but-one member of
    every family (cos=1 pairs within the cluster), and (c) keep the
    output cluster-bounded — pair work grows with cluster size
    squared, never corpus squared."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mapreduce511_spark.queries.similarity import (
        _SEM_K,
        semantic_dedup_census,
    )

    src = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    ids = src.column("vec_id").to_pylist()
    emb = src.column("embedding").to_pylist()
    lab = src.column("label").to_pylist()
    R = 10
    out = {
        "vec_id": [],
        "embedding": [],
        "label": [],
    }
    for k in range(R):
        for i, e, l in zip(ids, emb, lab):
            out["vec_id"].append(i + 10000 * k)
            out["embedding"].append(e)
            out["label"].append(l)
    sf_dir = tmp_path / "dup10"
    sf_dir.mkdir()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(out["vec_id"], pa.int64()),
                "embedding": pa.array(out["embedding"], pa.list_(pa.float32())),
                "label": pa.array(out["label"], pa.int32()),
            }
        ),
        str(sf_dir / "embeddings.parquet"),
    )

    rows = semantic_dedup_census(spark, str(sf_dir)).collect()
    n_total = len(ids) * R
    assert len(rows) <= _SEM_K  # output stays cluster-bounded
    assert sum(r.n_members for r in rows) == n_total - _SEM_K
    # every 10-way family contributes >= 9 flagged copies; families
    # whose base vector is a centroid contribute >= R-1 members all
    # duplicating each other (9 pairs, >= 8 flagged beyond the kept one)
    min_flagged = len(ids) * (R - 1) - _SEM_K
    assert sum(r.n_flagged for r in rows) >= min_flagged
    for r in rows:
        assert r.n_flagged <= r.n_members


def test_aqp_estimator_internal_consistency(spark):
    """HT-estimator semantics beyond oracle parity: the md5 sample
    lands near its 1% design rate, the CI is positive whenever the
    sample is non-empty, the covered flag IS the |est-exact| <= ci
    predicate, and the realized error at sf0.1 sits inside single-
    digit percent (the estimator works, not just runs)."""
    from mapreduce511_spark.queries import all_queries

    rows = all_queries()["aqp_revenue_estimate"](
        spark, "/root/testdata/sf0.1"
    ).collect()
    assert len(rows) == 3
    for r in rows:
        expected = r.n_lines / 100
        assert abs(r.n_sample - expected) < 0.5 * expected
        assert r.ci95_half_cents > 0
        assert r.covered == int(
            abs(r.est_cents - r.exact_cents) <= r.ci95_half_cents
        )
        assert r.rel_err_bp < 1000  # < 10% realized at sf0.1
