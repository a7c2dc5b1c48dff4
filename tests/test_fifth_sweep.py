"""Behavioral tests for the round-4 fifth-sweep operators —
properties the DuckDB oracles don't state: clustering coefficients on
a hand graph, Gopher rules on adversarial documents, incremental-MV
merge actually exercising multiple micro-batches, tf-idf cosine on
known-identical docs, and A/B-arm partition invariants.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from tests.conftest import SF_SMOKE


def _docs_parquet(path, texts: list[str], langs: list[str] | None = None):
    n = len(texts)
    langs = langs or ["en"] * n
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
                "source": pa.array(["t"] * n, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(path),
    )


def test_gopher_rules_flag_adversarial_docs(spark, tmp_path):
    """Each named rule fires on a doc built to violate exactly it."""
    from mapreduce511_spark.queries.text import gopher_quality_rules

    good = "the quick brown fox jumps over the lazy dog near town " * 3
    short = "too few words here"
    shouty = ("AAAA BBBB CCCC DDDD " * 6).strip()
    numeric = ("a1234567 b8901234 word here twoz threez " * 6).strip()
    longwords = ("supercalifragilisticexpialidocious " * 25).strip()
    _docs_parquet(
        tmp_path / "documents.parquet",
        [good, short, shouty, numeric, longwords],
    )
    row = gopher_quality_rules(spark, str(tmp_path)).collect()[0]
    assert row.n_docs == 5
    assert row.fail_short == 1  # 'short'
    assert row.fail_caps >= 1  # 'shouty'
    assert row.fail_digit >= 1  # 'numeric'
    assert row.fail_wordlen >= 1  # 'longwords' (mean length 33 > 12)
    assert row.pass_all == 1  # only 'good'


def test_clustering_hand_graph(spark):
    """Triangle {1,2,3} plus pendant 4 attached to 3: wedges = 1+1+3,
    transitivity = 30000·1/5 = 6000 bp; local cc: nodes 1,2 = 1.0,
    node 3 = 1/3, node 4 degree 1 (excluded) ->
    mean = floor((10000+10000+3333)/3)."""
    from mapreduce511_spark.queries.relational import _clustering_census

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "u long, v long"
    )
    row = _clustering_census(edges).collect()[0]
    assert row.n_nodes == 4
    assert row.n_deg_ge2 == 3
    assert row.n_closed == 3
    assert row.n_triangles == 1
    # wedges: node1 C(2,2)=1, node2 1, node3 C(3,2)=3 -> 5
    assert row.n_wedges == 5
    assert row.transitivity_bp == 30000 * 1 // 5
    assert row.mean_local_cc_bp == (10000 + 10000 + 3333) // 3


def test_incremental_mv_merges_multiple_batches(spark):
    """The MV path must see >1 micro-batch (maxFilesPerTrigger=2 over
    8 source files), or the merge loop is untested plumbing."""
    from mapreduce511_spark.queries.streaming_queries import (
        stream_incremental_mv,
    )

    out = stream_incremental_mv(spark, SF_SMOKE)
    rows = out.collect()
    assert len(rows) == 5  # five event types
    assert all(r.n_events > 0 for r in rows)


def test_tfidf_cosine_identical_docs(spark, tmp_path):
    """Two identical docs share every weighted bigram -> cosine 1.0;
    a disjoint-vocabulary doc never pairs with them."""
    from mapreduce511_spark.queries.similarity import (
        tfidf_cosine_pairs_exact_spec,
    )

    a = "alpha beta gamma delta epsilon zeta eta theta " * 4
    b = "one two three four five six seven eight nine ten " * 4
    _docs_parquet(tmp_path / "documents.parquet", [a, a, b])
    rows = tfidf_cosine_pairs_exact_spec(spark, str(tmp_path)).collect()
    pairs = {(r.doc_a, r.doc_b): r.cosine for r in rows}
    assert pairs == {(0, 1): 1.0}


def test_ab_arms_partition_users(spark):
    """Arm sizes must sum to the distinct-user count and the z-score
    must be finite (a degenerate 100% conversion rate would NaN)."""
    import math

    from mapreduce511_spark.queries.events import ab_conversion_ztest
    from mapreduce511_spark.sources.tables import load_table

    row = ab_conversion_ztest(spark, SF_SMOKE).collect()[0]
    n_users = (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert row.n_a + row.n_b == n_users
    assert 0 < row.c_a < row.n_a or 0 < row.c_b < row.n_b
    assert math.isfinite(row.z_score)


def test_table_stats_invariants(spark):
    """NDV <= rows - nulls; min <= max; every profiled column present."""
    from mapreduce511_spark.queries.relational import table_stats_census

    rows = {r.col_name: r for r in table_stats_census(spark, SF_SMOKE).collect()}
    assert set(rows) == {"l_orderkey", "l_partkey", "l_quantity", "l_suppkey"}
    for r in rows.values():
        assert r.ndv <= r.n_rows - r.n_null
        assert r.min_v <= r.max_v


def test_good_turing_bounds(spark):
    """hapax <= vocab, unseen mass in [0, 1e6], dis <= vocab - hapax."""
    from mapreduce511_spark.queries.text import good_turing_unseen_mass

    for r in good_turing_unseen_mass(spark, SF_SMOKE).collect():
        assert 0 <= r.hapax_count <= r.vocab_size
        assert r.dis_count <= r.vocab_size - r.hapax_count
        assert 0 <= r.unseen_mass_ppm <= 1_000_000
