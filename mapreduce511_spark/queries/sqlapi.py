"""SQL-passthrough queries: ONE query text executed by both engines.

For ANSI-dialect queries the Spark side runs the literal oracle
string through ``spark.sql`` over the registered views — the
strongest form of the parity check (no DataFrame/SQL translation at
all, only engine semantics under test)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mapreduce511_spark.queries import register
from mapreduce511_spark.sql import run_sql

_SQL_Q1 = """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                         AS sum_qty,
           round(avg(l_extendedprice), 2)                    AS avg_price,
           count(*)                                          AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
"""

_SQL_TOP_NATIONS = """
    SELECT n_name, count(*) AS n_customers,
           round(sum(c_acctbal), 2) AS total_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_customers DESC, n_name
    LIMIT 10
"""

_SQL_EVENT_HOURS = """
    SELECT date_trunc('hour', ts) AS hr, count(*) AS n
    FROM events
    GROUP BY hr
    ORDER BY n DESC, hr
    LIMIT 5
"""


@register("sql_q1_passthrough", oracle=_SQL_Q1)
def sql_q1_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 slice as literal shared SQL (spark.sql == DuckDB)."""
    return run_sql(spark, sf_dir, _SQL_Q1)


@register("sql_top_nations", oracle=_SQL_TOP_NATIONS)
def sql_top_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + top-k as literal shared SQL."""
    return run_sql(spark, sf_dir, _SQL_TOP_NATIONS)


@register("sql_event_hours", oracle=_SQL_EVENT_HOURS)
def sql_event_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp truncation + ordering as literal shared SQL."""
    return run_sql(spark, sf_dir, _SQL_EVENT_HOURS)


_SQL_GROUPING_SETS = """
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           count(*) AS n,
           round(sum(l_quantity), 2) AS qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    ORDER BY returnflag, linestatus
"""

_SQL_WINDOW_LAG = """
    SELECT user_id, event_id, prev_id
    FROM (
        SELECT user_id, event_id,
               lag(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_id,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS rn
        FROM events
    )
    WHERE rn <= 3 AND user_id < 100
    ORDER BY user_id, rn
"""


@register("sql_grouping_sets", oracle=_SQL_GROUPING_SETS)
def sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS (subtotal lattice) as literal shared SQL — one
    scan expands to the three grouping combinations; partial
    aggregation still applies per set."""
    return run_sql(spark, sf_dir, _SQL_GROUPING_SETS)


@register("sql_window_lag", oracle=_SQL_WINDOW_LAG)
def sql_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() navigation window with a unique tie-broken ordering
    (ts, event_id) — cross-engine window parity needs the total order
    (round-1 lesson: ties first appear at larger SFs)."""
    return run_sql(spark, sf_dir, _SQL_WINDOW_LAG)
