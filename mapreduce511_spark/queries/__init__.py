"""Query suite — the driver-facing registry.

Every implemented operator from SURVEY.md §2 (plus the LLM-pipeline
extensions) registers here as a named query: a Spark callable
``(spark, sf_dir) -> DataFrame`` and, where SQL-expressible, a DuckDB
oracle string computing the same result on the same parquet tables.
Column names/aliases match exactly between both sides (the driver's
compare sorts columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, SparkQuery] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optional DuckDB oracle) to the suite.

    Duplicate names raise: dict assignment would silently shadow the
    earlier query (each module imports once, so a legitimate re-import
    never hits this)."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in _QUERIES:
            raise ValueError(
                f"query {name!r} already registered by "
                f"{_QUERIES[name].__module__}; pick a distinct name"
            )
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


# Names the per-round correctness driver should enumerate first.  The
# driver samples the first 50 dict entries each round, so rounds 2+
# front-load queries with no CORRECTNESS row in ANY prior round, then
# queries newly added this round; already-green rows re-verify last.
# Registration order is otherwise preserved, and the set of names is
# identical either way.
_ENUMERATE_FIRST: list[str] = [
    # --- never driver-checked through r02 (absent from both
    # CORRECTNESS_r01.json and CORRECTNESS_r02.json) ---
    "ann_quantized_topk",
    "near_dup_jaccard_capped",
    "ensemble_near_dup",
    "merge_upsert_orders",
    "q2_min_cost_supplier",
    "q16_parts_supplier_counts",
    "q13_customer_distribution",
    "q17_small_quantity_revenue",
    "q21_waiting_supplier",
    "q22_lapsed_rich_customers",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_profit",
    "q11_value_concentration",
    "q15_top_supplier",
    "q14_promo_revenue",
    "q20_growing_suppliers",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "pivot_event_type_counts",
    "event_value_band_join",
    "sql_grouping_sets",
    "sql_window_lag",
    "rolling_value_sum",
    "order_value_ntile",
    # --- new in round 3 (slots 26-50 if the driver caps at 50) ---
    "median_price_by_flag",
    "order_percentile_bands",
    "copurchase_part_pairs",
    "salted_join_revenue",
    "rollup_region_nation_sales",
    "heavy_hitter_tokens",
    "token_freq_histogram",
    "bigram_novelty_rate",
    "cohort_hourly_retention",
    "embedding_norm_census",
    "unigram_logprob_score",
    "shuffle_shard_census",
    "funnel_ordered_steps",
    "snapshot_diff_census",
    "top_customers_concat_by_nation",
    "data_quality_audit",
    "stream_dedup_admission",
    "event_rate_anomaly",
    "quality_weighted_sample",
    "latest_event_per_user",
    "near_dup_jaccard_prefix",
    "copurchase_triangles",
    "bpe_first_merge",
    "bpe_merge_rules",
    "concurrent_user_spans",
    "char_entropy_by_lang",
    # --- checked green in r01/r02; re-verify in registration order ---
]


def _ordered(d: dict) -> dict:
    first = {n: d[n] for n in _ENUMERATE_FIRST if n in d}
    rest = {n: v for n, v in d.items() if n not in first}
    return {**first, **rest}


def all_queries() -> dict[str, SparkQuery]:
    _load()
    return _ordered(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load()
    return _ordered(_ORACLES)


_LOADED = False


def _load() -> None:
    """Import all query modules (registration side effects)."""
    global _LOADED
    if _LOADED:
        return
    from mapreduce511_spark.queries import (  # noqa: F401
        dedup,
        events,
        logs,
        multimodal,
        relational,
        similarity,
        sqlapi,
        streaming_queries,
        text,
    )

    _LOADED = True
