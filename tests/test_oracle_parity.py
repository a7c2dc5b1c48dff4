"""Replicates the driver's t2 gate locally: every query with an oracle
must hash-match DuckDB on the same parquet tables.

Runs at sf0.001 by default (fast); set SPARK_GRAFT_PARITY_SF to the
sf0.01 dir to mirror the driver exactly.
"""

from __future__ import annotations

import os

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_check import compare, run_oracle

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF", SF_SMOKE)


def _suite():
    from mapreduce511_spark import queries as suite

    q = suite.all_queries()
    o = suite.all_oracles()
    return q, o


def test_every_oracle_has_query():
    q, o = _suite()
    assert set(o) <= set(q)


@pytest.mark.parametrize("name", sorted(_suite()[1]))
def test_parity(spark, name):
    q, o = _suite()
    df = q[name](spark, SF_DIR)
    oracle_df = run_oracle(o[name], SF_DIR)
    problems = compare(df, oracle_df)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", sorted(set(_suite()[0]) - set(_suite()[1])))
def test_rows_only_queries_run(spark, name):
    """Queries without an oracle still must run and have a stable schema."""
    q, _ = _suite()
    df = q[name](spark, SF_DIR)
    assert df.columns
    assert df.count() >= 0
