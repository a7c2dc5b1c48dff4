"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Each query is forced with a count() (materializes the whole plan
without driver-side result transfer).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# the 30 queries BENCH_r01.json timed — kept for a comparable subtotal.
# "ann_ivf_label_baseline" is r01's "ann_ivf_topk" renamed in r6 (the
# identical computation, so the subtotal stays apples-to-apples).
_R01_HEADLINE = frozenset([
    "wordcount", "wordcount_top20", "q1_pricing_summary",
    "q3_shipping_priority", "q5_local_supplier_volume", "top_customers",
    "window_order_rank", "sessionize_events", "tumbling_event_counts",
    "asof_last_signup", "similarity_topk", "nearest_neighbor_sample",
    "near_dup_jaccard", "exact_dedup", "quality_score",
    "minhash_near_dup", "simhash_near_dup", "ann_ivf_label_baseline",
    "ann_lsh_topk", "language_id", "token_count_bpe", "tfidf_top_terms",
    "multimodal_features", "q6_forecast_revenue", "q10_returned_items",
    "cube_order_stats", "session_window_stats", "sliding_event_counts",
    "sql_q1_passthrough", "log_result_raw",
])

# FROZEN canary (r6 VERDICT item 4): a fixed 20-query set measured
# min-of-3 in the SAME session, every round, forever. The r01-subset
# steady total drifted 15->17->21 s across rounds and each time was
# hand-adjudicated as inter-session noise (PROFILE.md's min-of-5
# method); the canary makes that adjudication automatic — min-of-N in
# one session is the plan cost, so round-over-round movement of
# `canary_min3_s` is signal, not session luck. DO NOT add/remove
# names; a renamed query keeps its slot under the new name only if
# the computation is identical (the ann_ivf_label_baseline precedent).
_CANARY = (
    "wordcount",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "top_customers",
    "window_order_rank",
    "sessionize_events",
    "tumbling_event_counts",
    "asof_last_signup",
    "similarity_topk",
    "near_dup_jaccard",
    "exact_dedup",
    "quality_score",
    "minhash_near_dup",
    "simhash_near_dup",
    "ann_lsh_topk",
    "language_id",
    "token_count_bpe",
    "tfidf_top_terms",
    "cube_order_stats",
)

# SPEC TIER (r8, r7 VERDICT item 7): deliberately-definitional queries
# kept for their oracles, not as production paths — every *_exact_spec
# name (mechanically tagged; tests/test_guards.py forces the suffix on
# any EXACT SPEC self-declaration) plus the oracled in-query twins of
# persisted-index queries (they retrain Lloyd per invocation BY DESIGN
# so DuckDB can restate them) and the exact bitext kernel. Reported as
# `spec_tier_s` so production-path totals compare cleanly round over
# round; the canary is unchanged.
_SPEC_TIER_TWINS = frozenset([
    "ann_ivf_lloyd_topk",
    "semantic_dedup_lloyd_census",
    "bitext_margin_mining_ivf",
    "bitext_margin_mining",
])


def _is_spec_tier(name: str) -> bool:
    return name.endswith("_exact_spec") or name in _SPEC_TIER_TWINS


HEADLINE = [
    "wordcount",
    "wordcount_top20",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "top_customers",
    "window_order_rank",
    "sessionize_events",
    "tumbling_event_counts",
    "asof_last_signup",
    "similarity_topk",
    "nearest_neighbor_sample",
    "near_dup_jaccard",
    "exact_dedup",
    "quality_score",
    "minhash_near_dup",
    "simhash_near_dup",
    "ann_ivf_label_baseline",
    "ann_lsh_topk",
    "language_id",
    "token_count_bpe",
    "tfidf_top_terms",
    "multimodal_features",
    "q6_forecast_revenue",
    "q10_returned_items",
    "cube_order_stats",
    "session_window_stats",
    "sliding_event_counts",
    "sql_q1_passthrough",
    "log_result_raw",
    "wordcount_skewed",
    "multimodal_decode_stats",
    "pipeline_clean_corpus",
    "ann_quantized_topk",
    "dedup_clusters",
    "repeated_span_screen",
    "context_pack_stats",
    "event_rollup_multires",
    # round 3
    "median_price_by_flag",
    "copurchase_part_pairs",
    "salted_join_revenue",
    "rollup_region_nation_sales",
    "heavy_hitter_tokens",
    "bigram_novelty_rate",
    "cohort_hourly_retention",
    "embedding_norm_census",
    "unigram_logprob_score",
    "snapshot_diff_census",
    "funnel_ordered_steps",
    "data_quality_audit",
    "event_rate_anomaly",
    "quality_weighted_sample",
    "near_dup_jaccard_prefix",
    "latest_event_per_user",
    "json_props_stats",
    "copurchase_triangles",
    "bpe_first_merge",
    # round 4
    "copurchase_triangles_approx",
    "multimodal_png_stats",
    "padding_waste_by_bucket",
    "doc_chunk_census",
    "doc_chunks_expanded",
    "vocab_coverage_curve",
    "bigram_logprob_score",
    "join_key_skew_census",
    "pii_screen_census",
    # round 4, second sweep
    "bm25_top_docs",
    "copurchase_pagerank",
    "hybrid_rrf_top_docs",
    "rolling_7d_active_users",
    "gap_filled_minute_counts",
    "user_type_scd2",
    "decayed_user_engagement",
    "customer_name_er",
    "zorder_cell_census",
    "embedding_dim_stats",
    "winsorized_price_stats",
    "mad_value_anomaly",
    "near_dup_containment",
    "weighted_reservoir_sample",
    "event_transition_matrix",
    "price_quantity_regression",
    "copurchase_kcore_census",
    # round 4, third sweep
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
    "hll_rolling_7d_users",
    "customer_rfm_segments",
    "hour_of_day_profile",
    "funnel_time_to_convert",
    "bigram_entropy_rate",
    "minhash_jaccard_estimate",
    "lsh_recall_curve",
    "winnow_near_dup_candidates",
    "embedding_top_component",
    "item_cosine_similarity",
    "theil_sen_price_slope",
    "asof_next_purchase_census",
    "variant_props_quantiles",
    "approx_percentile_error_census",
    "collocation_pmi_top20",
    "scd2_purchase_enrichment",
    # round 4, sixth sweep
    "temperature_mixture_sample",
    "semantic_dedup_census",
    "bpe_encode_census",
    "bucketed_join_revenue",
    "stream_click_attribution_outer",
    "heldout_bigram_ppl",
    "doc_quality_features",
    # round 5
    "item_cosine_similarity_capped",
    "semantic_dedup_kmeans_census",
    "bpe_merge_rules_batched",
    "multimodal_jpeg_stats",
    "stream_state_metrics_census",
    "quality_classifier_score",
    "token_fertility_census",
    "source_mixture_census",
    "ann_pq_topk",
    "curriculum_order_manifest",
    "unigram_lm_vocab",
    "unigram_lm_encode_census",
    "ann_ivf_pq_topk",
    "ann_ivf_lloyd_topk",
    "quality_classifier_train",
    "duplicate_span_removal",
    "semantic_dedup_lloyd_census",
    "stream_click_attribution_full",
    "dup_cluster_canonical",
    "mixture_epochs_plan",
    "wordpiece_first_merge",
    "wordpiece_merge_rules",
    "quality_calibration_census",
    "stream_session_window_native",
    "bitext_margin_mining",
    "contrastive_triplet_export",
    "histogram_quantile_census",
]


def _full_headline(registry) -> list[str]:
    """EVERY registered query is timed (r5 VERDICT item 4: 107 of 252
    were invisible to the 2x gate). The explicit HEADLINE list above
    keeps its historical ordering for round-over-round comparability;
    this appends the rest of the registry so a new registration can
    never be silently untimed — n_queries == registry size by
    construction."""
    ordered = [n for n in HEADLINE if n in registry]
    seen = set(ordered)
    ordered += [n for n in registry if n not in seen]
    return ordered


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from mapreduce511_spark import queries as suite
    from mapreduce511_spark.session import get_spark

    spark = get_spark("mapreduce511-bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry = suite.all_queries()

    # JVM/codegen warmup so per-query numbers reflect steady state,
    # not first-stage JIT + session bring-up.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from mapreduce511_spark.sources.tables import load_table

    load_table(spark, sf_dir, "documents").count()

    timings: dict[str, float] = {}
    steady_times: dict[str, float] = {}
    for name in _full_headline(registry):
        fn = registry.get(name)
        if fn is None:
            continue
        start = time.perf_counter()
        fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - start, 3)
    # second pass: steady-state per-query times. First-run numbers
    # carry one-off whole-stage-codegen JIT (up to ~8 s for the
    # widest aggregate plans); the steady pass is the number that
    # extrapolates to a long-running cluster, where code compiles
    # once and runs for hours. Min of two runs: this host shows
    # sporadic multi-second stalls (hypervisor CPU steal — measured:
    # identical plans, no GC/JIT delta, 5 s -> 20+ s outliers), and
    # the min is the plan's actual cost.
    for name in timings:
        best = float("inf")
        for _ in range(2):
            start = time.perf_counter()
            registry[name](spark, sf_dir).count()
            best = min(best, time.perf_counter() - start)
        steady_times[name] = round(best, 3)

    # canary pass: min-of-3 same-session timings over the frozen
    # 20-query set (all already JIT-warm from the two passes above).
    canary_times: dict[str, float] = {}
    for name in _CANARY:
        best = float("inf")
        for _ in range(3):
            start = time.perf_counter()
            registry[name](spark, sf_dir).count()
            best = min(best, time.perf_counter() - start)
        canary_times[name] = round(best, 3)

    # derived throughput for the BASELINE.md comparison: the reference
    # does 16.2M tokens in 129.39 s (~125k tokens/s cluster-wide,
    # README.md:270-272 + job_output.log:98) — report ours on the same
    # axis using the measured wordcount wall time.
    import pyspark.sql.functions as F

    from mapreduce511_spark.functions.text import tokenize

    n_tokens = (
        load_table(spark, sf_dir, "documents")
        .select(F.sum(F.size(tokenize("text"))))
        .first()[0]
    )
    # steady-state wordcount run (the suite's first-run number carries
    # one-off codegen/Python-worker spin-up that dwarfs tiny corpora).
    # Min-of-3 (r9, VERDICT r8 item 4): single-shot derived steadies
    # whipsawed on hypervisor stalls (r8's 0.45 -> 1.068 false alarm)
    # — same canary discipline here so headline throughput is the
    # plan's cost, not session luck.
    def _min3(name: str) -> float:
        best = float("inf")
        for _ in range(3):
            start = time.perf_counter()
            registry[name](spark, sf_dir).count()
            best = min(best, time.perf_counter() - start)
        return best

    steady = _min3("wordcount")
    # skew resilience: same measurement over the Zipf-amplified corpus
    # (one token ~99x hotter than anything organic). Map-side combine
    # should keep tokens/s in the same ballpark — the reference's hot
    # reducer is the number this exists to contrast with.
    skew_extra = (
        load_table(spark, sf_dir, "documents")
        .select(F.sum(F.col("doc_id") % 199 + 7))
        .first()[0]
    )
    skew_steady = _min3("wordcount_skewed")
    # ANN quality tracked round-over-round, not just asserted: exact
    # cosine top-k for the standard probe set, then recall@k for each
    # approximate variant. ann_ivf_kmeans_topk is the one query family
    # without a SQL oracle (learned centroids), so this measured
    # recall is its primary quality evidence.
    from pyspark.sql.window import Window

    from mapreduce511_spark.functions.vectors import cosine_similarity
    from mapreduce511_spark.queries.similarity import _IVF_TOPK, _N_PROBES

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < _N_PROBES).select(
        F.col("vec_id").alias("pid"), F.col("embedding").alias("pv")
    )
    w = Window.partitionBy("pid").orderBy(F.desc("s"), F.asc("vec_id"))
    exact: dict[int, set[int]] = {}
    for r in (
        emb.join(F.broadcast(probes), F.col("vec_id") != F.col("pid"))
        .withColumn("s", cosine_similarity(F.col("pv"), F.col("embedding")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _IVF_TOPK)
        .select("pid", "vec_id")
        .collect()
    ):
        exact.setdefault(r.pid, set()).add(r.vec_id)
    recalls = {}
    for ann_name in (
        "ann_ivf_kmeans_topk",
        "ann_lsh_topk",
        "ann_ivf_label_baseline",  # r01-r05 key: ann_ivf_topk_recall_at_5
        "ann_ivf_lloyd_topk",
        "ann_ivf_pq_topk",
        "ann_ivf_pq_residual_topk",  # r6: IVFADC residual encoding
    ):
        got: dict[int, set[int]] = {}
        for r in registry[ann_name](spark, sf_dir).collect():
            got.setdefault(r.probe_id, set()).add(r.vec_id)
        per_probe = [
            len(got.get(pid, set()) & found) / len(found)
            for pid, found in exact.items()
        ]
        recalls[f"{ann_name}_recall_at_{_IVF_TOPK}"] = round(
            sum(per_probe) / len(per_probe), 3
        )
    derived = {
        **recalls,
        "corpus_tokens": int(n_tokens),
        "wordcount_steady_s": round(steady, 3),
        "wordcount_tokens_per_s": int(n_tokens / steady),
        "reference_tokens_per_s": 125_000,
        "skewed_corpus_tokens": int(n_tokens + skew_extra),
        "wordcount_skewed_steady_s": round(skew_steady, 3),
        "wordcount_skewed_tokens_per_s": int((n_tokens + skew_extra) / skew_steady),
        # round-over-round comparability: the sum over the EXACT query
        # set BENCH_r01.json timed (30 names), so the per-round totals
        # compare apples-to-apples as the headline list grows.
        "r01_subset_total_s": round(
            sum(t for n, t in timings.items() if n in _R01_HEADLINE), 3
        ),
        "steady_total_s": round(sum(steady_times.values()), 3),
        "steady_r01_subset_total_s": round(
            sum(t for n, t in steady_times.items() if n in _R01_HEADLINE), 3
        ),
        # the self-adjudicating round-over-round comparator: min-of-3
        # same-session over the frozen _CANARY set.
        "canary_min3_s": round(sum(canary_times.values()), 3),
        # spec-tier breakout (r8): definitional queries' steady cost,
        # and the production-path remainder that should be compared
        # round over round.
        "spec_tier_s": round(
            sum(t for n, t in steady_times.items() if _is_spec_tier(n)), 3
        ),
        "steady_production_total_s": round(
            sum(t for n, t in steady_times.items() if not _is_spec_tier(n)),
            3,
        ),
    }

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    detail = {
        "metric": "headline_suite_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "steady": steady_times,
        "canary": canary_times,
        "derived": derived,
        "sf": sf_val,
    }
    # Full per-query detail: first output line + a file. The driver
    # captures only the last ~2000 chars of output, so the detail
    # must NOT be the final line (BENCH_r03/r04 had parsed:null when
    # the single line outgrew the tail window).
    print(json.dumps(detail))
    Path(REPO, "bench_detail.json").write_text(json.dumps(detail, indent=1))
    # FINAL line: compact summary guaranteed to fit the tail capture.
    # Keep the slowest queries' steady times and drop from the back
    # until the serialized line is comfortably under the window.
    slowest = sorted(steady_times, key=steady_times.get, reverse=True)
    compact = {
        "metric": "headline_suite_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "sf": sf_val,
        "n_queries": len(timings),
        "derived": derived,
        "detail_file": "bench_detail.json",
        "queries": {},
    }
    keep = 20
    while keep >= 0:
        compact["queries"] = {n: steady_times[n] for n in slowest[:keep]}
        line = json.dumps(compact)
        if len(line) <= 1500:
            break
        keep -= 4
    if len(line) > 1500:
        # the unbounded 'derived' map alone can outgrow the window as
        # it accrues keys (r5 ADVICE) — it is fully present in
        # bench_detail.json, so drop it rather than risk parsed:null.
        compact.pop("derived", None)
        line = json.dumps(compact)
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
