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


def norm0(col):
    """Normalize IEEE -0.0 to +0.0 on a rounded float column.

    Adding +0.0 is the identity on every double except -0.0 (IEEE
    754 round-to-nearest: -0.0 + 0.0 = +0.0; NaN + 0.0 = NaN), so
    wrapping a final rounded projection costs nothing and removes the
    one value class whose bit pattern differs while comparing equal.
    The driver's hash distinguishes signed zeros (r10: heaps_law_fit
    went red because DuckDB rounded fp-cancellation noise to -0.0
    where Spark gave +0.0), so every rounded output whose TRUE value
    can be a tiny signed epsilon — slopes, z-scores, correlations,
    entropy differences, variance ratios — must pass through this on
    the Spark side and add ``+ 0.0`` in the oracle SQL."""
    from pyspark.sql import functions as F

    return col + F.lit(0.0)


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
_WINDOW_LEDGER_MAX: int = 10

_ENUMERATE_FIRST: list[str] = [
    # ROUND 11 regeneration (second pass): `python tools/
    # gen_enum_first.py` over the ledger through r10 (stamp above).
    # All eleven round-11 debuts front-load per the debut-round guard
    # (three from the first r11 pass, six from the statistical-testing
    # / lexical-diversity pass, one TIFF codec); the next slots drain the remaining
    # r04-stale names alphabetically; the rest are the oldest r05
    # names.
    "corpus_health_census",  # new
    "t_closeness_census",  # new
    "dp_noisy_count_release",  # new
    "ks_two_sample_census",  # new
    "mann_whitney_census",  # new
    "cusum_changepoint_census",  # new
    "mutual_information_census",  # new
    "lexical_diversity_census",  # new
    "rake_keywords",  # new
    "multimodal_tiff_stats",  # new
    "mann_whitney_fdr_census",  # new
    "mad_value_anomaly",  # r04
    "multimodal_frame_sample",  # r04
    "multimodal_png_stats",  # r04
    "near_dup_containment",  # r04
    "padding_waste_by_bucket",  # r04
    "pareto_frontier_parts",  # r04
    "pii_screen_census",  # r04
    "price_quantity_regression",  # r04
    "rolling_7d_active_users",  # r04
    "stream_click_attribution",  # r04
    "stream_late_drop_census",  # r04
    "stream_sliding_event_counts",  # r04
    "stream_topk_per_window",  # r04
    "stream_user_running_stats",  # r04
    "time_weighted_value_avg",  # r04
    "token_kl_by_lang",  # r04
    "user_type_scd2",  # r04
    "vocab_coverage_curve",  # r04
    "weighted_reservoir_sample",  # r04
    "winnowing_fingerprints",  # r04
    "winsorized_price_stats",  # r04
    "zorder_cell_census",  # r04
    "ab_conversion_ztest",  # r05
    "ann_ivf_lloyd_topk",  # r05
    "ann_ivf_pq_topk",  # r05
    "ann_lsh_topk",  # r05
    "ann_pq_topk",  # r05
    "approx_percentile_error_census",  # r05
    "asof_next_purchase_census",  # r05
    "bpe_encode_census",  # r05
    "bpe_merge_rules_batched",  # r05
    "bucketed_join_revenue",  # r05
    "collocation_pmi_top20",  # r05
    "copurchase_clustering",  # r05
    "curriculum_order_manifest",  # r05
    "doc_quality_features",  # r05
    "dup_cluster_canonical",  # r05
    "duplicate_span_removal",  # r05
    "embedding_top_component",  # r05
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
