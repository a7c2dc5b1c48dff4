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
    # ROUND 8 rebuild — now GENERATED: `python tools/gen_enum_first.py`
    # recomputes this window from the cumulative CORRECTNESS ledger
    # (policy: every never-driver-checked query first — debut-round
    # checking is guard-enforced in tests/test_guards.py — then
    # oldest-first staleness, alphabetical within a round, exactly
    # 50 names).  This instance: the queries new in r8 (incl. the
    # tfidf rename), all 29 remaining r02-stale names (finishing the
    # two-round drain plan — after r8 no registered query's newest
    # driver row is older than r03), and r03 fills.
    "tfidf_cosine_pairs_exact_spec",  # new
    "bitext_margin_mining_ivf_indexed",  # new
    "ann_admission_census",  # new
    "stream_ingest_pipeline",  # new
    "decontamination_span_removal",  # new
    "multimodal_jpeg_arith_stats",  # new
    "retrieval_quality_census",  # new
    "stream_ann_admission_census",  # new
    "ann_admission_drift_census",  # new
    "ann_index_compaction_census",  # new
    "doremi_domain_reweighting",  # new
    "cbo_stats_census",  # new
    "heldout_kneser_ney_ppl",  # new
    "aqp_revenue_estimate",  # new
    "copurchase_label_propagation",  # new
    "image_dhash_near_dup",  # new
    "zonemap_skipping_census",  # new
    "hilbert_cell_census",  # new
    "dsir_importance_resample",  # new
    "multimodal_png_deflate_stats",  # new
    "stream_dsir_admission",  # new
    "language_id",  # r02
    "log_chart_smoothed_cpu",  # r02
    "multimodal_decode_stats",  # r02
    "nearest_neighbor_sample",  # r02
    "pipeline_clean_corpus",  # r02
    "q10_returned_items",  # r02
    "q12_shipmode_priority",  # r02
    "q4_order_priority",  # r02
    "quality_score",  # r02
    "repeated_span_screen",  # r02
    "repetition_score",  # r02
    "similarity_topk",  # r02
    "source_mixture_weights",  # r02
    "sql_event_hours",  # r02
    "sql_q1_passthrough",  # r02
    "sql_top_nations",  # r02
    "stopword_ratio",  # r02
    "stratified_sample",  # r02
    "stream_closed_sessions",  # r02
    "stream_dedup_census",  # r02
    "stream_enriched_census",  # r02
    "stream_tumbling_event_counts",  # r02
    "tfidf_top_terms",  # r02
    "token_count_bpe",  # r02
    "token_stats_by_lang",  # r02
    "unpivot_type_hour_matrix",  # r02
    "wordcount",  # r02
    "wordcount_skewed",  # r02
    "wordcount_top20",  # r02
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
        text,
    )

    _LOADED = True
