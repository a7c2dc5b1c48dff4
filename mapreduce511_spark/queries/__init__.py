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
_WINDOW_LEDGER_MAX: int = 9

_ENUMERATE_FIRST: list[str] = [
    # ROUND 10 regeneration: `python tools/gen_enum_first.py --restamp`
    # over the ledger through r09 (stamp above).  The twelve round-10
    # debuts front-load per the debut-round guard; the next 10 slots
    # drain the LAST r03-stale names (min driver row over the registry
    # is r04 after the r10 drop); the remaining 28 are the oldest r04
    # names alphabetically.
    "gif_animation_census",  # new
    "cross_modal_dup_census",  # new
    "exact_duplicate_span_removal",  # new
    "copurchase_hits",  # new
    "textrank_keywords",  # new
    "ffd_packing_census",  # new
    "zipf_slope_census",  # new
    "token_burstiness_census",  # new
    "multimodal_flac_depth_stats",  # new
    "k_anonymity_census",  # new
    "copurchase_assortativity",  # new
    "heaps_law_fit",  # new
    "rollup_region_nation_sales",  # r03
    "salted_join_revenue",  # r03
    "shuffle_shard_census",  # r03
    "snapshot_diff_census",  # r03
    "sql_grouping_sets",  # r03
    "sql_window_lag",  # r03
    "stream_dedup_admission",  # r03
    "token_freq_histogram",  # r03
    "top_customers_concat_by_nation",  # r03
    "unigram_logprob_score",  # r03
    "benford_price_census",  # r04
    "bigram_entropy_rate",  # r04
    "bigram_logprob_score",  # r04
    "bloom_membership_census",  # r04
    "bm25_top_docs",  # r04
    "char_entropy_by_lang",  # r04
    "chi2_distinctive_terms",  # r04
    "cms_heavy_bigrams",  # r04
    "copurchase_common_neighbors",  # r04
    "copurchase_kcore_census",  # r04
    "copurchase_pagerank",  # r04
    "copurchase_triangles_approx",  # r04
    "customer_name_er",  # r04
    "customer_rfm_segments",  # r04
    "decayed_user_engagement",  # r04
    "doc_chunk_census",  # r04
    "doc_chunks_expanded",  # r04
    "embedding_dim_stats",  # r04
    "event_transition_matrix",  # r04
    "funnel_time_to_convert",  # r04
    "gap_filled_minute_counts",  # r04
    "hll_distinct_trigrams",  # r04
    "hll_rolling_7d_users",  # r04
    "hour_of_day_profile",  # r04
    "hourly_count_autocorr",  # r04
    "hybrid_rrf_top_docs",  # r04
    "incremental_mv_refresh",  # r04
    "join_key_skew_census",  # r04
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
