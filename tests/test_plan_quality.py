"""Physical-plan audits: the properties that make queries survive a
100x scale-up (SURVEY.md §4). Plans are compiled, not executed."""

from __future__ import annotations

import pytest

from tests.conftest import SF_CHECK


def _plan(spark, name: str) -> str:
    from mapreduce511_spark import queries as suite

    # other test modules cache base tables; a cached relation replaces
    # the FileScan (hiding ReadSchema/PushedFilters), so audit plans
    # against a clean cache.
    spark.catalog.clearCache()
    df = suite.all_queries()[name](spark, SF_CHECK)
    return df._jdf.queryExecution().executedPlan().toString()


def _all_names():
    from mapreduce511_spark import queries as suite

    return sorted(suite.all_queries())


@pytest.mark.parametrize("name", _all_names())
def test_no_unbounded_cartesian(spark, name):
    """No query may plan a CartesianProduct: every intentional
    cross join must ride a broadcast (BroadcastNestedLoopJoin with a
    provably tiny side), never a full shuffle cartesian."""
    assert "CartesianProduct" not in _plan(spark, name), name


@pytest.mark.parametrize(
    "name,col",
    [
        ("q1_pricing_summary", "l_shipdate"),
        ("q6_forecast_revenue", "l_shipdate"),
    ],
)
def test_filters_reach_parquet_scan(spark, name, col):
    plan = _plan(spark, name)
    assert "PushedFilters: [" in plan, name
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert col in pushed, f"{name}: {col} not pushed ({pushed})"


def test_column_pruning_on_wordcount(spark):
    """WordCount must read ONLY documents.text, not all 5 columns."""
    plan = _plan(spark, "wordcount")
    read = plan.split("ReadSchema: ", 1)[1].split("\n", 1)[0]
    assert "text" in read and "lang" not in read and "n_chars" not in read, read


def test_broadcast_join_on_dimension_tables(spark):
    """q5's region/nation/supplier dims must broadcast, not
    sort-merge: at 100 TB only lineitem/orders may shuffle."""
    plan = _plan(spark, "q5_local_supplier_volume")
    assert "BroadcastHashJoin" in plan
    assert plan.count("SortMergeJoin") <= 1, plan.count("SortMergeJoin")


def test_partial_aggregation_before_shuffle(spark):
    """The WordCount HashAggregate pair (partial -> final) — the
    combiner analog (SURVEY §4.2) — must be present."""
    plan = _plan(spark, "wordcount")
    assert plan.count("HashAggregate") >= 2, plan


def test_simhash_has_no_bit_position_explode(spark):
    """simhash_fingerprint must compute its 60 signed bit sums as one
    wide aggregate, not by exploding 60 rows per (doc, word): exactly
    one Generate (the token explode) and no sequence(0, 59) in the
    plan."""
    plan = _plan(spark, "simhash_fingerprint")
    assert plan.count("Generate") - plan.count("CodeGenerate") <= 1, plan[:2000]
    assert "sequence(0, 59" not in plan


def test_skewed_wordcount_partial_aggregation(spark):
    """The Zipf-skewed corpus must still plan partial -> final
    HashAggregate: map-side combine is what keeps the hot key from
    recreating the reference's single-hot-reducer bottleneck."""
    plan = _plan(spark, "wordcount_skewed")
    assert plan.count("HashAggregate") >= 2, plan
