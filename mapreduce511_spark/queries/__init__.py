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
#
# _WINDOW_LEDGER_MAX stamps the ledger horizon the window below was
# GENERATED from (r9, VERDICT r8 item 1): the driver drops a new
# CORRECTNESS_r{N}.json into the repo AFTER the builder's session, so
# a guard that re-derives the window from every file on disk goes red
# the moment that drop lands, even though the checked-in window was
# provably correct when generated.  Both tools/gen_enum_first.py and
# tests/test_guards.py honor the stamp: files with a round number
# above it are ignored when recomputing the window.  Regenerating the
# window for a new round must bump the stamp to the newest ledger
# round the generator saw.
_WINDOW_LEDGER_MAX: int = 8

_ENUMERATE_FIRST: list[str] = [
    # ROUND 9 regeneration: `python tools/gen_enum_first.py --restamp`
    # over the ledger through r08 (stamp above).  The three round-9
    # debuts (suffix-array family) front-load per the debut-round
    # guard; the remaining 47 slots are the oldest-stale names, all
    # r03 (min driver row over the registry was r03 after the r8
    # drain).  Queries registered later in round 9 front-load via
    # regeneration before commit (debut-round guard).
    "suffix_array_census",  # new
    "suffix_repeated_phrases",  # new
    "exact_duplicate_span_census",  # new
    "audio_fingerprint_near_dup",  # new
    "video_dhash_near_dup",  # new
    "compression_quality_census",  # new
    "stream_image_dhash_admission",  # new
    "fingerprint_hamming_topk",  # new
    "stream_audio_fp_admission",  # new
    "stream_video_admission",  # new
    "ann_quantized_topk",  # r03
    "bigram_novelty_rate",  # r03
    "bpe_first_merge",  # r03
    "bpe_merge_rules",  # r03
    "cohort_hourly_retention",  # r03
    "concurrent_user_spans",  # r03
    "copurchase_part_pairs",  # r03
    "copurchase_triangles",  # r03
    "data_quality_audit",  # r03
    "embedding_norm_census",  # r03
    "ensemble_near_dup",  # r03
    "event_rate_anomaly",  # r03
    "event_value_band_join",  # r03
    "funnel_ordered_steps",  # r03
    "heavy_hitter_tokens",  # r03
    "latest_event_per_user",  # r03
    "median_price_by_flag",  # r03
    "merge_upsert_orders",  # r03
    "near_dup_jaccard_capped",  # r03
    "near_dup_jaccard_prefix",  # r03
    "order_percentile_bands",  # r03
    "order_value_ntile",  # r03
    "pivot_event_type_counts",  # r03
    "q11_value_concentration",  # r03
    "q13_customer_distribution",  # r03
    "q14_promo_revenue",  # r03
    "q15_top_supplier",  # r03
    "q16_parts_supplier_counts",  # r03
    "q17_small_quantity_revenue",  # r03
    "q18_large_orders",  # r03
    "q19_disjunctive_revenue",  # r03
    "q20_growing_suppliers",  # r03
    "q21_waiting_supplier",  # r03
    "q22_lapsed_rich_customers",  # r03
    "q2_min_cost_supplier",  # r03
    "q7_nation_volume",  # r03
    "q8_market_share",  # r03
    "q9_product_profit",  # r03
    "quality_weighted_sample",  # r03
    "rolling_value_sum",  # r03
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
        catalog_stats,
        dedup,
        events,
        logs,
        multimodal,
        relational,
        retrieval,
        similarity,
        sketches,
        sqlapi,
        streaming_queries,
        suffix,
        text,
    )

    _LOADED = True
