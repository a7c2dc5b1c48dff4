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
    # ROUND 4 rebuild (from CORRECTNESS_r01..r03): exactly 50 names —
    # the r3 list was 51 long and the 51st (char_entropy_by_lang)
    # never sampled. Order: never-driver-checked, oracled-after-last-
    # check, new/changed this round (both sweeps), then staleness
    # rotation (queries whose newest green row is r01). The r02/r03
    # greens displaced by the second sweep's new queries re-verify in
    # later rounds' rotations (and in tests/test_oracle_parity.py
    # every session).
    # --- never checked / oracle added after last check ---
    "char_entropy_by_lang",
    "multimodal_frame_sample",
    # --- new in round 4 ---
    "stream_late_drop_census",
    "multimodal_png_stats",
    "copurchase_triangles_approx",
    "padding_waste_by_bucket",
    "doc_chunk_census",
    "vocab_coverage_curve",
    "doc_chunks_expanded",
    "bigram_logprob_score",
    "join_key_skew_census",
    "pii_screen_census",
    "stream_click_attribution",
    # --- new in round 4, second sweep ---
    "bm25_top_docs",
    "copurchase_pagerank",
    "gap_filled_minute_counts",
    "user_type_scd2",
    "decayed_user_engagement",
    "customer_name_er",
    "zorder_cell_census",
    "stream_sliding_event_counts",
    "stream_user_running_stats",
    "embedding_dim_stats",
    "winsorized_price_stats",
    "mad_value_anomaly",
    "hybrid_rrf_top_docs",
    "rolling_7d_active_users",
    "near_dup_containment",
    "weighted_reservoir_sample",
    "event_transition_matrix",
    "price_quantity_regression",
    "copurchase_kcore_census",
    # --- new in round 4, third sweep (sketches + info-theory +
    #     skyline/link-prediction + telemetry + streaming top-k) ---
    "hll_distinct_trigrams",
    "cms_heavy_bigrams",
    "bloom_membership_census",
    "winnowing_fingerprints",
    "token_kl_by_lang",
    "chi2_distinctive_terms",
    "pareto_frontier_parts",
    "copurchase_common_neighbors",
    "incremental_mv_refresh",
    "benford_price_census",
    "time_weighted_value_avg",
    "hourly_count_autocorr",
    "stream_topk_per_window",
    # --- new in round 4, fourth sweep ---
    "hll_rolling_7d_users",
    "customer_rfm_segments",
    "hour_of_day_profile",
    "funnel_time_to_convert",
    "bigram_entropy_rate",
    # The window is exactly 50 never-driver-checked round-4 names.
    # ROUND-5 ROTATION QUEUE (front-load these next round, in order):
    # 1. round-4 names added after the window filled (never driver-
    #    checked): minhash_jaccard_estimate, lsh_recall_curve,
    #    winnow_near_dup_candidates, embedding_top_component,
    #    item_cosine_similarity, theil_sen_price_slope,
    #    asof_next_purchase_census, variant_props_quantiles,
    #    stream_hourly_hll_users, collocation_pmi_top20,
    #    scd2_purchase_enrichment,
    #    approx_percentile_error_census (rows-only),
    #    and the fifth sweep: good_turing_unseen_mass,
    #    gopher_quality_rules, user_first_path_census,
    #    ab_conversion_ztest, table_stats_census,
    #    copurchase_clustering, stream_incremental_mv,
    #    tfidf_cosine_pairs;
    #    and the sixth sweep: temperature_mixture_sample,
    #    semantic_dedup_census, bucketed_join_revenue,
    #    stream_click_attribution_outer, heldout_bigram_ppl,
    #    doc_quality_features,
    #    bpe_encode_census (rows-only — merge table is
    #    data-dependent; parity in tests/test_bpe.py);
    # 2. round-4 implementation changes with existing green rows:
    #    copurchase_triangles, concurrent_user_spans, bpe_merge_rules;
    # 3. the r01 staleness rotation (minhash_*, simhash_*, tumbling/
    #    sessionize/asof/quantile/session-window, q1/q3/q5,
    #    dedup_clusters).
    # All of these re-verify in tests/test_oracle_parity.py every
    # session meanwhile.
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
