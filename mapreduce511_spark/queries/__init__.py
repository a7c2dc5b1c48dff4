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
    # ROUND 6 rebuild (computed from CORRECTNESS_r01..r05): exactly
    # 50 names.  Order: (1) the 17 queries with no CORRECTNESS row in
    # ANY round — the 5 added after r5's window froze, the r6 rename
    # + the 11 new r6 queries — this re-empties the never-checked
    # backlog; (2) staleness rotation: the 33 alphabetically-first of
    # the 48 queries whose newest green row is r01 (the remaining 15
    # front-load r7).  Everything re-verifies in
    # tests/test_oracle_parity.py each session regardless.
    # --- (1) never driver-checked ---
    "contrastive_triplet_export",
    "bitext_margin_mining",
    "histogram_quantile_census",
    "stream_session_window_native",
    "quality_calibration_census",
    "ann_ivf_label_baseline",  # r6 rename of ann_ivf_topk (r01 green)
    "ann_ivf_indexed_topk",  # rows-only (persisted IVF index, r6)
    "ann_ivf_pq_residual_topk",  # rows-only (IVFADC residual PQ, r6)
    "multimodal_jpeg420_stats",  # 4:2:0 chroma subsampling (r6)
    "multimodal_jpeg_progressive_stats",  # SOF2 multi-scan decode (r6)
    "kmv_set_ops_census",  # KMV sketch union/intersection (r6)
    "priority_sample_census",  # DLT weighted sampling estimator (r6)
    "sql_exact_dedup",
    "sql_token_census",
    "sql_region_rollup",
    "sql_order_deciles",
    "sql_order_price_delta",
    # --- (2) staleness rotation (newest green row is r01) ---
    "anti_join_customers",
    "asof_last_signup",
    "cube_order_stats",
    "distinct_part_types",
    "event_value_quantiles",
    "json_props_stats",
    "latest_event_per_user_type",
    "log_averaged_cpu_series",
    "log_averaged_mem_series",
    "log_chart_prep_cpu",
    "log_job_counters",
    "log_monitor_timeseries",
    "log_phase_cpu",
    "log_progress_series",
    "log_report_cpu_wide",
    "log_report_map_wide",
    "log_report_overlap_wide",
    "log_report_reduce_wide",
    "log_report_shuffle_wide",
    "log_report_time_wide",
    "log_result_raw",
    "log_run_inventory",
    "log_shuffle_invariants",
    "log_shuffle_rate",
    "log_stage_metrics",
    "minhash_band_candidates",
    "minhash_near_dup",
    "minhash_signatures",
    "multimodal_features",
    "part_revenue_topk",
    "pivot_order_status",
    "q1_pricing_summary",
    "q3_shipping_priority",
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
        retrieval,
        similarity,
        sketches,
        sqlapi,
        streaming_queries,
        text,
    )

    _LOADED = True
