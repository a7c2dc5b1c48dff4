"""Generate SCALING.md: measured wall time of representative queries
at sf0.001 / sf0.01 / sf0.1 (100x data range), with the scaling factor
between the extremes.

Sub-linear factors mean fixed overhead dominates (fine); near-linear
factors mean the operator tracks data volume (expected for scans and
shuffles); super-linear factors flag designs that would NOT survive a
further 1000x to 100 TB and must be justified or fixed.

Run: python tools/gen_scaling.py   (writes SCALING.md at repo root)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SFS = ["sf0.001", "sf0.01", "sf0.1"]

# name -> one-line scaling rationale (what SHOULD happen at 1000x)
PICKS = {
    "wordcount": "linear scan + shuffle of distinct words; partial agg bounds shuffle",
    "exact_dedup": "linear; one hash shuffle on md5 fingerprint",
    "minhash_near_dup": "linear in corpus; candidate verify ~ #near-dup pairs",
    "dedup_clusters": "minhash cost + CC rounds ~ component diameter (constant)",
    "repeated_span_screen": "linear per-token window hashing; content-anchored int64 shuffles",
    "near_dup_jaccard": "inverted index; cost ~ sum of shingle-bucket squares (capped variant bounds it)",
    "context_pack_stats": "linear; per-stratum window prefix sum",
    "event_rollup_multires": "linear fact scan; day grain re-aggs hourly output",
    "similarity_topk": "linear corpus scan x broadcast probes",
    "ann_lsh_topk": "bucketed candidates only; linear index build",
    "q1_pricing_summary": "linear pruned scan + tiny agg",
    "q9_product_profit": "fact shuffle joins; dims broadcast",
    "stratified_sample": "two linear passes (rate agg + filtered count)",
    "heavy_hitter_tokens": "two linear map-combinable aggs; output bounded by 1% pigeonhole",
    "copurchase_part_pairs": "self-join fan-out bounded by basket size (<=7 lines/order)",
    "bigram_novelty_rate": "linear bigram generation; docfreq agg on bigram hash",
    "unigram_logprob_score": "linear token stream; freq join keyed on token",
    "cohort_hourly_retention": "distinct (user,hour) then key-colocated self-join",
    "snapshot_diff_census": "linear digest computation; id-keyed full-outer join",
    "copurchase_triangles": "wedge volume ~ sum of out-deg^2 (degree-ordered; graph density, not corpus size)",
    "near_dup_jaccard_prefix": "prefix postings ~ half the shingle volume; verify ~ candidates",
    "bpe_first_merge": "pair count over the vocabulary, not the token stream",
    "copurchase_triangles_approx": "DOULION p=1/2 edge sample; wedge volume ~p^2 of exact",
    "padding_waste_by_bucket": "linear token count; ~60-group aggregate",
    "doc_chunks_expanded": "narrow sequence+explode; no shuffle",
    "vocab_coverage_curve": "word count (combinable) + window over tiny count-of-counts histogram",
    "bigram_logprob_score": "one bigram pass; freq join keyed on bigram hash",
    "bm25_top_docs": "postings filtered to query terms before the tf shuffle; top-k heap",
    "copurchase_pagerank": "3 x (vertex-keyed join + combinable sum) over the checkpointed edge set",
    "user_type_scd2": "one user_id shuffle reused by all three window passes",
    "customer_name_er": "in-block pairs only: cost ~ sum of block sizes squared",
    "decayed_user_engagement": "linear scan; 1-row reference broadcast; user-keyed combinable agg",
    "zorder_cell_census": "linear scan; 256-cell aggregate; integer bit math in codegen",
    "gap_filled_minute_counts": "spine ~ calendar span (data-independent); day-parallel ffill",
    "embedding_dim_stats": "posexplode x dims; dim-keyed combinable agg (uniform 64 groups)",
    "winsorized_price_stats": "exact-percentile pass + clipped agg pass (both linear)",
    "mad_value_anomaly": "two exact-median passes; medians broadcast; fact shuffles once",
    "hybrid_rrf_top_docs": "RRF over two 100-candidate lists; rank windows bounded at 100 rows",
    "rolling_7d_active_users": "windowed-distinct via <=7x explode; two uniform-key shuffles",
    "near_dup_containment": "same inverted-index candidates as the Jaccard family; asymmetric verify",
    "weighted_reservoir_sample": "one pass; per-partition top-k heaps (TakeOrdered), no global sort",
    "event_transition_matrix": "one user-keyed window pass; |types|^2 matrix normalization",
    "price_quantity_regression": "single-pass combinable regression moments; 3-group shuffle",
    "copurchase_kcore_census": "peel rounds ~ degeneracy depth; per-round vertex-keyed semi-joins",
    "hll_distinct_trigrams": "sketch state fixed at 256 registers/group; shuffle ~ distinct grams pre-agg, constant post",
    "cms_heavy_bigrams": "sketch is d*w integer cells; bucket sums map-side combine; top-k join broadcast",
    "bloom_membership_census": "filter build ~ keys; probe join against <=m distinct bits (broadcast)",
    "winnowing_fingerprints": "per-doc window min; selected fingerprints ~2/(w+1) of token stream",
    "token_kl_by_lang": "one vocab-sized count shuffle; margins broadcast back",
    "chi2_distinctive_terms": "same single count shuffle; ranking window over vocab-sized groups",
    "pareto_frontier_parts": "sweep over deduped price grid (domain-bounded), broadcast back to facts",
    "copurchase_common_neighbors": "wedge volume ~ sum deg^2 over support-filtered edges",
    "incremental_mv_refresh": "O(delta) + grouped-key join; base never recomputed",
    "benford_price_census": "linear map-combinable digit count; scalar total broadcast",
    "time_weighted_value_avg": "one user-partitioned window + combinable agg (sessionization shape)",
    "hourly_count_autocorr": "collapses to hour grid before joins; grid-sized thereafter",
    "hll_rolling_7d_users": "daily register rollup once; window merge is O(days x 256), traffic-independent",
    "customer_rfm_segments": "customer-grain aggregate then ntile over |customers| rows",
    "funnel_time_to_convert": "two min() reductions + user-grain quantiles",
    "bigram_entropy_rate": "two vocab-keyed count shuffles; per-lang entropy reduce",
    "winnow_near_dup_candidates": "df-capped fingerprint postings bound the pair join",
    "embedding_top_component": "one Arrow-batched Gram pass; driver holds only 64x64 partial merges",
    "item_cosine_similarity": "customer-keyed inverted index; pair volume ~ basket size squared",
    "theil_sen_price_slope": "one ordered pass, disjoint pairs; partition-local pairing at scale",
    "asof_next_purchase_census": "one user-keyed window pass; no correlated probe",
    "variant_props_quantiles": "single variant shred per row; typed binary field access",
    "temperature_mixture_sample": "two lang-dimension aggs broadcast; map-side md5 admission; one corpus scan",
    "semantic_dedup_census": "broadcast-centroid argmax; pair join equi-keyed on cluster id, work ~ cluster size (K grows with corpus)",
    "bpe_encode_census": "16-merge train loop over the vocabulary + one fused encode of word TYPES; stream totals via word-keyed join",
    "bucketed_join_revenue": "write-time shuffle only: bucketed scans feed the merge join pre-partitioned (zero join-input Exchange)",
    "heldout_bigram_ppl": "train counts collapse to vocabulary size map-side; val stream left-joins on vocab keys",
    "item_cosine_similarity_capped": "cap^2 pair bound per customer regardless of whale size",
    "semantic_dedup_kmeans_census": "k-means adds iters x (scan + k-dim broadcast argmax); census cost as frozen twin",
    "quality_classifier_score": "zero-shuffle scoring scan; |langs| output rows",
    "token_fertility_census": "map-side length/count sums; |langs| rows",
    "source_mixture_census": "map-side token count; 1-row total broadcast",
    "multimodal_jpeg_stats": "per-doc encode+decode in Arrow batches; embarrassingly parallel",
    "ann_ivf_lloyd_topk": "2 Lloyd iters: map-only fold assignment + k*dim mean shuffle; search ~ nprobe/k of corpus",
    "quality_classifier_train": "8 Newton iters, each one scan reduced to 30 driver ints; features checkpointed once",
    "duplicate_span_removal": "linear span hashing; dup table + removal join keyed on int64 h; islands = 2 window passes",
    "semantic_dedup_lloyd_census": "lloyd train (2 map scans + k*dim shuffles) + cluster-id-bounded pair join",
    "stream_click_attribution_full": "same state bound as inner join; outer emits are eviction-time work both sides",
    "dup_cluster_canonical": "minhash+CC cost + one combinable merge per cluster; sources set bounded",
    "mixture_epochs_plan": "map-side token count; |sources| rows; two 1-row broadcast totals",
    "wordpiece_first_merge": "vocab-sized pair/unigram counts map-side; char-keyed score join; top-20 heap",
    "quality_calibration_census": "one map-only scoring scan into 16 buckets",
    "stream_session_window_native": "state ~ open sessions x watermark horizon; user-keyed shuffle",
    "bitext_margin_mining": "in-block exact kernel: |A| x |B| pair scoring (IVF-bounded at scale)",
    "contrastive_triplet_export": "dedup-pipeline cost + map-side hash negatives; rows ~ mined pairs",
    "histogram_quantile_census": "two scans (min/max + histogram); sketch state fixed at 1024 cells",
    # round 6
    "ann_pq_topk": "index build amortized (persisted parquet, content-keyed); query = codes-only ADC scan + bounded re-rank",
    "ann_ivf_pq_topk": "persisted cell-partitioned index: PartitionFilters reads nprobe/k of codes; re-rank bounded",
    "ann_ivf_indexed_topk": "persisted IVF parquet: partition-pruned scan ~ nprobe/k of corpus per probe batch",
    "ann_ivf_pq_residual_topk": "residual codes buy recall at the same m*k budget; scan/prune identical to IVF-PQ",
    "concurrent_user_spans": "hour-bucket equi-join, one bucket per pair (no distinct); cost ~ fan-out + output pairs",
    "ensemble_near_dup": "blocked-GEMM candidates (bounded task memory) + token verify on candidate ids only",
    "sql_region_rollup": "literal shared SQL: ROLLUP Expand over one fact scan; dims broadcast",
    "sql_token_census": "literal shared SQL: linear length arithmetic; |langs| output rows",
    "multimodal_jpeg420_stats": "per-doc 4:2:0 encode+decode in Arrow batches; embarrassingly parallel",
    "multimodal_jpeg_progressive_stats": "per-doc multi-scan SOF2 encode+decode in Arrow batches; embarrassingly parallel",
    "kmv_set_ops_census": "sketch state fixed at 3 x 64 longs; per-side dedup is the only data-sized shuffle",
    "priority_sample_census": "sample fixed at k+1 = 33 rows via combinable TakeOrdered; map-side exact-total agg",
    # round 7
    "embedding_near_dup": "blocked GEMM under the plain name (r7 swap): shuffle ~ n_blocks x corpus, task memory bounded",
    "tfidf_cosine_pairs_capped": "df-capped postings bound the candidate join; verify ~ candidates x doc terms",
    "kll_quantile_census": "level histogram fixed at <=49 rows; survivors <= k; one conditional-count readout scan",
    "ann_ivf_lloyd_indexed_topk": "build-once persisted index; steady = partition-pruned candidates only",
    "semantic_dedup_lloyd_indexed": "persisted assignment scan + cluster-id-bounded pair join",
    "multimodal_flac_stats": "fixed 400-asset fixture corpus; Arrow-batched decode, no pixel/sample shuffle",
    "sql_sessionize": "per-user windows; shuffle keyed on user_id, one pass",
    "multimodal_flac_stereo_stats": "fixed 400-asset fixture; all 4 stereo assignments decoded in Arrow batches",
    "bitext_margin_mining_ivf": "Lloyd-cell-bounded candidates: |src| x (nprobe/k) x |tgt| expected pair volume",
    "stream_kll_quantiles": "windowed state = 49 level counts + height-floored survivors; readout over <= k rows/window",
    "decontamination_census": "train gram volume + matches; eval side broadcasts at scale",
    "multimodal_gif_stats": "fixed 400-asset fixture; LZW decode in Arrow batches",
    "kll_compactor_quantile_census": "per-partition O(k) sketches; driver merge independent of n",
    # round 8
    "bitext_margin_mining_ivf_indexed": "persisted-index steady path: candidates only, training amortized into the build",
    "ann_admission_census": "steady = one pruned artifact scan; build+admit amortized per content snapshot",
    "decontamination_span_removal": "train gram volume + matches; eval gram set broadcasts; islands = 2 windows/doc",
    "stream_ingest_pipeline": "micro-batch machinery dominates at toy scale; per-batch work is map-only + broadcast joins",
    "multimodal_jpeg_arith_stats": "fixed 400-asset fixture; QM decode in Arrow batches, no pixel shuffle",
    "retrieval_quality_census": "BM25 candidate scoring + two TakeOrdered top-10 lists; 1-row metric aggregate",
    "stream_ann_admission_census": "steady = one partition-aware census scan; train + stream-admit amortized per snapshot",
    "ann_index_compaction_census": "steady = census over the compacted layout; rewrite amortized per snapshot",
    "ann_admission_drift_census": "artifact scan + 16-row broadcast join; 2-group integer aggregate",
    "doremi_domain_reweighting": "one K-key map-combined agg; T EG iterations on K driver rows, n-independent",
    "cbo_stats_census": "ANALYZE passes linear, amortized by snapshot-keyed CTAS memo; census reads catalog metadata only",
    "heldout_kneser_ney_ppl": "type counts collapse map-side before shuffle; val stream = vocabulary-keyed left joins",
    "aqp_revenue_estimate": "one map-combinable scan; 3-group shuffle; production reads only the 1% sample table",
    "copurchase_label_propagation": "3 x (vertex-keyed join + two hash aggs) over the checkpointed edge set; state = |V| labels",
    "dsir_importance_resample": "two linear gram passes; 512-row model broadcast; TakeOrdered top-k",
    "zonemap_skipping_census": "two range-partitioned sorts; everything after the zone stats is envelope-sized",
    "hilbert_cell_census": "linear integer codegen; 1-row bounds broadcast; 256-cell output",
    "image_dhash_near_dup": "linear Arrow decode+hash; banded join bounded by bucket sizes",
    "multimodal_png_deflate_stats": "linear per-asset encode/decode where the bytes live",
    "stream_dsir_admission": "stateless per-row score; only the per-source census is stateful",
    # round 9
    "suffix_array_census": "SA build (log(max doc len) prefix-doubling hash-shuffle rounds, ~31 s at sf0.1) amortized per corpus snapshot AND per session via the r10 durable parquet artifact; census = one grouped scan of the array",
    "suffix_repeated_phrases": "adjacent-LCP gather is a max_lcp-bounded pos+i equi-join; top-k via TakeOrdered",
    "exact_duplicate_span_census": "per-position LCP maxima + doc-partitioned islands windows; all work ~ corpus positions",
    "audio_fingerprint_near_dup": "fixed 400-asset fixture; linear Arrow decode+fingerprint; banded join bounded by bucket sizes",
    "video_dhash_near_dup": "fixed 128-asset fixture; linear frame decode+hash; frame-index join bounded by frame-bucket sizes",
    "compression_quality_census": "one linear Arrow encode pass over the text; |langs|-group map-combinable rollup",
    "stream_image_dhash_admission": "fixed 400-asset fixture; per-batch banded gate vs the static index; zero streaming state",
    "fingerprint_hamming_topk": "K-bounded probe broadcast x one corpus scan; per-probe rank window over probe-keyed candidates",
    "stream_audio_fp_admission": "fixed 400-asset fixture; per-batch banded gate vs the static index; zero streaming state",
    "stream_video_admission": "fixed 128-asset fixture; per-batch frame-index join + per-video containment count; zero streaming state",
    # round 10
    "exact_duplicate_span_removal": "islands + sequence-explode of covered offsets (linear in covered tokens) + per-doc kept-text digest, all off the durable SA artifact",
    "gif_animation_census": "fixed 400-asset fixture; linear Arrow multi-frame decode+composition; one tiny aggregate per frame",
    "cross_modal_dup_census": "fixed 128-asset fixture; four bounded candidate joins (token postings, 2x banded fingerprints, frame index) + doc_id-keyed flag joins",
    # r10 second wave
    "textrank_keywords": "co-occurrence equi-join linear in token positions; iterations shuffle vocab-sized edge/rank relations (Heaps-sublinear)",
    "copurchase_hits": "linear distinct over lineitem; per half-step one vertex-keyed join + combinable sum",
    "ffd_packing_census": "per-shard greedy fold, embarrassingly parallel across (lang, shard); shard count is the scale lever",
    "zipf_slope_census": "linear token agg; per-lang vocab ranking (Heaps-sublinear) + 5-sum reduce",
    "token_burstiness_census": "two linear map-combinable aggs; df floor prunes the hapax tail before TakeOrdered",
    "multimodal_flac_depth_stats": "fixed 400-asset fixture; linear Arrow decode at cycling bit depths; one tiny per-asset aggregate",
    "k_anonymity_census": "linear QI aggregation (map-side combinable); rollup over |QI-classes| rows",
    "corpus_health_census": "linear token-stream aggregations collapsing to vocabulary size; both OLS fits reduce 5 sums per language",
    "t_closeness_census": "one checkpointed orders-keyed rollup; everything after is n_classes x <=10 rows",
    "dp_noisy_count_release": "one count shuffle; noise is per-group scalar arithmetic",
    "heaps_law_fit": "one (lang, token) min-shuffle + 5-row grid broadcasts; OLS over 5 points per lang",
    "copurchase_assortativity": "wedge-shaped degree joins linear in edges; one 4-sum reduce",
    # round 11 second wave
    "ks_two_sample_census": "collapses to |distinct values| x |types| grid before the pair join; cumulative counts via the two-pass grouped_prefix_sum (no one-task-per-type window), never quadratic in events",
    "mann_whitney_census": "same ECDF grid as the KS census; U and tie moments are combinable integer sums per pair",
    "cusum_changepoint_census": "collapses to the hour x type grid before windows; argmax via per-type row_number over grid-sized input",
    "mutual_information_census": "one alphabet-sized contingency aggregation; margins + 1-row total broadcast back",
    "lexical_diversity_census": "one vocab-keyed count shuffle; four statistics from 4 integer moments per lang",
    "rake_keywords": "one doc-keyed window pass for islands; degree/freq aggregates are vocabulary-sized",
    "multimodal_tiff_stats": "fixed 400-asset fixture; linear Arrow TIFF decode (both endians, PackBits); one tiny per-asset aggregate",
}


def main() -> None:
    from mapreduce511_spark import queries as suite
    from mapreduce511_spark.session import get_spark

    spark = get_spark("gen-scaling")
    q = suite.all_queries()
    rows = []
    for name, why in PICKS.items():
        times = []
        for sf in SFS:
            sf_dir = f"/root/testdata/{sf}"
            q[name](spark, sf_dir).count()  # warm (JIT/codegen/file listing)
            t0 = time.time()
            q[name](spark, sf_dir).count()
            times.append(time.time() - t0)
        factor = times[-1] / max(times[0], 1e-9)
        rows.append((name, times, factor, why))
        print(f"{name}: {['%.2f' % t for t in times]} factor={factor:.1f}x")

    lines = [
        "# SCALING — measured wall time across 100x data (warm runs)",
        "",
        "Generated by `python tools/gen_scaling.py` on local[32].",
        "Columns are seconds at each scale factor; `100x factor` is",
        "sf0.1 / sf0.001 time. Data grows 100x across the range, so a",
        "factor well under 100 means fixed overhead still dominates at",
        "sf0.1; the rationale column says why the trend holds to 100 TB.",
        "",
        "| query | sf0.001 s | sf0.01 s | sf0.1 s | 100x factor | why it scales |",
        "|---|---|---|---|---|---|",
    ]
    for name, times, factor, why in rows:
        t = " | ".join(f"{x:.2f}" for x in times)
        lines.append(f"| {name} | {t} | {factor:.1f}x | {why} |")
    lines.append("")
    # preserve hand-measured evidence sections (## ...) appended after
    # the generated table in previous runs
    out_path = Path(REPO, "SCALING.md")
    epilogue = ""
    if out_path.exists():
        old = out_path.read_text()
        cut = old.find("\n## ")
        if cut != -1:
            epilogue = old[cut:]
    out_path.write_text("\n".join(lines) + epilogue)
    print("wrote SCALING.md")


if __name__ == "__main__":
    main()
