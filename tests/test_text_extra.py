"""approx_count_distinct error bound vs exact."""

from __future__ import annotations


def test_approx_distinct_within_tolerance(spark):
    from mapreduce511_spark.queries.text import approx_distinct_tokens
    from tests.conftest import SF_CHECK

    row = approx_distinct_tokens(spark, SF_CHECK).first()
    rel_err = abs(row.approx_distinct - row.exact_distinct) / row.exact_distinct
    assert rel_err < 0.05, f"HLL rel err {rel_err}"
    assert row.total_tokens >= row.exact_distinct
