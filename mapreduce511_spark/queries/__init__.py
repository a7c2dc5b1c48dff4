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
    # ROUND 5 rebuild (computed from CORRECTNESS_r01..r04): exactly
    # 50 names.  Order: (1) the 27 queries with no CORRECTNESS row in
    # ANY round — 24 oracled + 3 rows-only-by-design — this empties
    # the never-driver-checked backlog; (2) queries added or changed
    # in round 5; (3) staleness rotation (newest green row is r01).
    # Everything re-verifies in tests/test_oracle_parity.py each
    # session regardless.
    # --- (1) never driver-checked, rounds 1-4 ---
    "minhash_jaccard_estimate",
    "lsh_recall_curve",
    "asof_next_purchase_census",
    "variant_props_quantiles",
    "scd2_purchase_enrichment",
    "user_first_path_census",
    "ab_conversion_ztest",
    "item_cosine_similarity",
    "theil_sen_price_slope",
    "approx_percentile_error_census",  # rows-only by design
    "table_stats_census",
    "copurchase_clustering",
    "bucketed_join_revenue",
    "embedding_top_component",  # rows-only by design
    "tfidf_cosine_pairs",
    "semantic_dedup_census",
    "winnow_near_dup_candidates",
    "stream_hourly_hll_users",
    "stream_incremental_mv",
    "stream_click_attribution_outer",
    "collocation_pmi_top20",
    "good_turing_unseen_mass",
    "gopher_quality_rules",
    "temperature_mixture_sample",
    "bpe_encode_census",  # rows-only by design
    "heldout_bigram_ppl",
    "doc_quality_features",
    # --- (2) new or changed in round 5 ---
    "ann_lsh_topk",  # multi-probe rewrite this round
    "item_cosine_similarity_capped",
    "semantic_dedup_kmeans_census",  # rows-only (learned centroids)
    "stream_state_metrics_census",  # rows-only (StreamingQueryProgress)
    "bpe_merge_rules_batched",  # rows-only (batched trainer)
    "multimodal_jpeg_stats",
    "quality_classifier_score",
    "token_fertility_census",
    "source_mixture_census",
    "ann_pq_topk",  # rows-only (learned codebooks)
    "curriculum_order_manifest",
    "unigram_lm_vocab",  # rows-only (EM-trained)
    "unigram_lm_encode_census",  # rows-only (EM-trained)
    "ann_ivf_pq_topk",  # rows-only (composed trained index)
    "ann_ivf_lloyd_topk",  # oracled learned-centroid IVF
    "quality_classifier_train",  # rows-only (iterative IRLS)
    "duplicate_span_removal",
    "semantic_dedup_lloyd_census",  # oracled learned-cluster dedup
    "stream_click_attribution_full",
    "dup_cluster_canonical",
    "mixture_epochs_plan",
    "wordpiece_first_merge",
    "wordpiece_merge_rules",  # rows-only (iterative trainer)
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
