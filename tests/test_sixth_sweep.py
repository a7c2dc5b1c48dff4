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
