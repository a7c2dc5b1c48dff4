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
    # ROUND 7 rebuild (computed from CORRECTNESS_r01..r06): exactly
    # 50 names.  Order: (1) the 17 queries with no CORRECTNESS row in
    # ANY round — the r7 rename + the 16 new r7 queries; (2) oldest-
    # first staleness rotation (r6 VERDICT item 5): the 15 queries
    # whose newest green row is r01, then the 18 alphabetically-first
    # of the 47 whose newest is r02 (the remaining 29 r02s front-load
    # r8; 17 window slots necessarily go to new queries this round,
    # so the backlog drains over two rounds).  embedding_near_dup
    # (plan swapped to the blocked GEMM in r7) and near_dup_jaccard
    # (broadcast hints dropped in r7) both sit inside the r02 slice,
    # so the changed implementations re-verify externally this round.
    # Everything re-verifies in tests/test_oracle_parity.py each
    # session regardless.
    # --- (1) never driver-checked (new/renamed in r7) ---
    "tfidf_cosine_pairs_capped",  # df-capped scale twin (r6 item 2)
    "embedding_near_dup_exact_spec",  # r7 rename of the BNLJ spec
    "kll_quantile_census",  # hash-derandomized KLL sampler (r7)
    "ann_ivf_lloyd_indexed_topk",  # rows-only (persisted Lloyd index)
    "semantic_dedup_lloyd_indexed",  # rows-only (persisted assignment)
    "sql_sessionize",
    "sql_histogram_quantile",
    "sql_copurchase_degree",
    "sql_mixture_weights",
    "sql_frame_geometry",
    "multimodal_flac_stats",  # lossless FLAC decode under the exact oracle (r7)
    "bitext_margin_mining_ivf",  # IVF-bounded margin mining, oracled (r7)
    "multimodal_flac_stereo_stats",  # all 4 stereo assignments, oracled (r7)
    "stream_kll_quantiles",  # the r7 rank sketch under stream execution
    "decontamination_census",  # train-vs-eval n-gram overlap screen (r7)
    "multimodal_gif_stats",  # GIF/LZW decode under the exact oracle (r7)
    "kll_compactor_quantile_census",  # full KLL, rows-only + error columns (r7)
    # --- (2a) staleness rotation: newest green row is r01 ---
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "rollup_orders",
    "running_revenue",
    "semi_join_customers",
    "session_window_stats",
    "sessionize_events",
    "set_ops_customers",
    "simhash_fingerprint",
    "simhash_near_dup",
    "sliding_event_counts",
    "sweep_shuffle_partitions",
    "top_customers",
    "tumbling_event_counts",
    "window_order_rank",
    # --- (2b) staleness rotation: newest green row is r02 ---
    "ann_ivf_kmeans_topk",
    "approx_distinct_tokens",
    "bigram_top20",
    "contamination_screen",
    "context_pack_stats",
    "dedup_clusters",
    "deterministic_split",
    "doc_fingerprint",
    "dup_class_histogram",
    "embedding_centroids",
    "embedding_near_dup",  # r7 plan swap: blocked GEMM under the plain name
    "embedding_random_projection",
    "event_rollup_multires",
    "exact_dedup",
    "funnel_view_to_purchase",
    "fuzzy_dedup_survivors",
    "incremental_dedup_admit",
    "near_dup_jaccard",  # r7: unhinted size joins
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
