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
    """Decorator: add a query (and optional DuckDB oracle) to the suite."""

    def deco(fn: SparkQuery) -> SparkQuery:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


# Names the per-round correctness driver should enumerate first.  The
# round-1 driver sampled the first 50 dict entries, leaving the 30
# below (incl. the flagship wordcount) without a CORRECTNESS row, so
# rounds 2+ front-load previously-unchecked and newly-added queries;
# already-green round-1 rows re-verify last.  Registration order is
# otherwise preserved, and the set of names is identical either way.
_ENUMERATE_FIRST: list[str] = [
    # --- round-1 unchecked (the r01 driver sampled only the first 50
    # dict entries; these 30 had no CORRECTNESS row) ---
    "wordcount",
    "wordcount_top20",
    "q4_order_priority",
    "q10_returned_items",
    "q12_shipmode_priority",
    "similarity_topk",
    "embedding_centroids",
    "nearest_neighbor_sample",
    "embedding_near_dup",
    "ann_ivf_topk",
    "near_dup_jaccard",
    "ann_lsh_topk",
    "ann_ivf_kmeans_topk",
    "embedding_near_dup_blocked",
    "sql_q1_passthrough",
    "sql_top_nations",
    "sql_event_hours",
    "token_stats_by_lang",
    "doc_fingerprint",
    "exact_dedup",
    "quality_score",
    "bigram_top20",
    "stopword_ratio",
    "language_id",
    "token_count_bpe",
    "tfidf_top_terms",
    "approx_distinct_tokens",
    "repetition_score",
    "contamination_screen",
    "deterministic_split",
    # --- new in round 2, highest-value first (slots 31-50 if the
    # driver caps at 50) ---
    "dedup_clusters",
    "fuzzy_dedup_survivors",
    "stratified_sample",
    "repeated_span_screen",
    "event_rollup_multires",
    "context_pack_stats",
    "incremental_dedup_admit",
    "dup_class_histogram",
    "source_mixture_weights",
    "funnel_view_to_purchase",
    "embedding_random_projection",
    "unpivot_type_hour_matrix",
    "stream_tumbling_event_counts",
    "stream_dedup_census",
    "stream_closed_sessions",
    "stream_enriched_census",
    "multimodal_decode_stats",
    "wordcount_skewed",
    "log_chart_smoothed_cpu",
    "pipeline_clean_corpus",
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
    # --- round-2 shapes similar to already-green r01 queries (fine to
    # overflow into the next round's sample) ---
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "pivot_event_type_counts",
    "event_value_band_join",
    "sql_grouping_sets",
    "sql_window_lag",
    "rolling_value_sum",
    "order_value_ntile",
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
