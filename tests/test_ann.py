"""ANN quality: approximate methods vs the exact cosine baseline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mapreduce511_spark.functions.vectors import cosine_similarity
from mapreduce511_spark.sources.tables import load_table
from tests.conftest import SF_CHECK

TOPK = 5
N_PROBES = 10


@pytest.fixture(scope="module")
def exact_topk(spark):
    emb = load_table(spark, SF_CHECK, "embeddings")
    probes = emb.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("pid"), F.col("embedding").alias("pv")
    )
    w = Window.partitionBy("pid").orderBy(F.desc("s"), F.asc("vec_id"))
    rows = (
        emb.join(F.broadcast(probes), F.col("vec_id") != F.col("pid"))
        .withColumn("s", cosine_similarity(F.col("pv"), F.col("embedding")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOPK)
        .select("pid", "vec_id")
        .collect()
    )
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r.pid, set()).add(r.vec_id)
    return out


def _recall(got_rows, exact):
    got: dict[int, set[int]] = {}
    for r in got_rows:
        got.setdefault(r.probe_id, set()).add(r.vec_id)
    per_probe = [
        len(got.get(pid, set()) & found) / len(found)
        for pid, found in exact.items()
    ]
    return sum(per_probe) / len(per_probe)


def test_ann_lsh_recall(spark, exact_topk):
    """Multi-probe (flip subsets of the 2 lowest-margin bits per
    band) must clear the r4 VERDICT bar: recall@5 >= 0.7 (the
    single-bucket index measured 0.32)."""
    from mapreduce511_spark.queries.similarity import ann_lsh_topk

    recall = _recall(ann_lsh_topk(spark, SF_CHECK).collect(), exact_topk)
    assert recall >= 0.7, f"multi-probe sign-LSH recall@{TOPK} = {recall}"


def test_ann_ivf_label_cells_beat_random_scan(spark, exact_topk):
    """The label-cell IVF demo (``ann_ivf_label_baseline`` — renamed
    from ``ann_ivf_topk`` in r6 so the plain name no longer points at
    the weakest index) scans nprobe/k of the corpus; the testdata's
    labels are NOT geometric clusters (~8% of true NNs share their
    probe's label), so absolute recall is bounded — the meaningful
    assertion is that it still beats a random same-size subset scan
    (recall = fraction scanned)."""
    from mapreduce511_spark.queries.similarity import (
        _IVF_NPROBE,
        ann_ivf_label_baseline,
    )
    from mapreduce511_spark.sources.tables import load_table

    k_cells = (
        load_table(spark, SF_CHECK, "embeddings").select("label").distinct().count()
    )
    recall = _recall(ann_ivf_label_baseline(spark, SF_CHECK).collect(), exact_topk)
    assert recall >= _IVF_NPROBE / k_cells, f"label-IVF recall@{TOPK} = {recall}"


def test_ann_ivf_lloyd_recall(spark, exact_topk):
    """The CANONICAL IVF (oracled learned centroids: two unrolled
    Lloyd rounds, integer-micro quantized means) must hold the r5
    VERDICT bar for a canonical index — recall@5 >= 0.9 (measured
    0.92 at sf0.01, 1.0 at sf0.1) — while tests/test_oracle_parity.py
    holds it to the exact DuckDB hash."""
    from mapreduce511_spark.queries.similarity import ann_ivf_lloyd_topk

    recall = _recall(ann_ivf_lloyd_topk(spark, SF_CHECK).collect(), exact_topk)
    assert recall >= 0.9, f"lloyd-IVF recall@{TOPK} = {recall}"


def test_ann_ivf_kmeans_recall(spark, exact_topk):
    """Learned centroids (the real IVF build) must recover most true
    neighbors while scanning ~nprobe/k of the corpus (measured 0.88
    at nprobe=4, k=16 on this data)."""
    from mapreduce511_spark.queries.similarity import ann_ivf_kmeans_topk

    recall = _recall(ann_ivf_kmeans_topk(spark, SF_CHECK).collect(), exact_topk)
    assert recall >= 0.6, f"kmeans-IVF recall@{TOPK} = {recall}"


def test_ann_lsh_is_sublinear_candidates(spark):
    """The MULTI-PROBE LSH candidate set must stay well below
    probes x corpus (measured ~0.58 on this geometry — the frontier
    note on ``ann_lsh_topk`` documents why it can't be tiny here),
    and the probe side must carry exactly 4 bucket entries per
    (probe, band): exact + flip(f1) + flip(f2) + flip(both)."""
    from mapreduce511_spark.queries import similarity as S

    emb = load_table(spark, SF_CHECK, "embeddings")
    n = emb.count()
    banded = S._lsh_corpus_bands(emb)
    probes = S._lsh_probe_bands(emb, N_PROBES)
    per_band = (
        probes.groupBy("pid", "band").count().agg(F.max("count")).first()[0]
    )
    assert per_band == 1 << S._LSH_FLIPS, per_band
    cand = (
        banded.join(probes, ["band", "bits"])
        .filter(F.col("vec_id") != F.col("pid"))
        .select("pid", "vec_id")
        .distinct()
        .count()
    )
    assert cand < 0.8 * N_PROBES * n, f"{cand} candidates of {N_PROBES * n} possible"


def test_blocked_pairs_match_exact(spark):
    """GEMM-blocked all-pairs == expression-based exact pairs (modulo
    pairs within 1e-9 of the threshold, where float association may
    differ — none exist in this data)."""
    from mapreduce511_spark.queries.similarity import (
        embedding_near_dup,
        embedding_near_dup_exact_spec,
    )

    exact = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in embedding_near_dup_exact_spec(spark, SF_CHECK).collect()
    }
    blocked = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in embedding_near_dup(spark, SF_CHECK).collect()
    }
    assert set(exact) == set(blocked)
    for k in exact:
        assert abs(exact[k] - blocked[k]) <= 1e-4, k


def test_broadcast_pairs_match_blocked(spark):
    """The corpus_fits_driver fast path and the both-sides-blocked
    shuffle path emit the identical pair set."""
    from mapreduce511_spark.operators.ann import (
        cosine_pairs_blocked,
        cosine_pairs_broadcast,
    )
    from mapreduce511_spark.queries.similarity import _COS_DUP_T

    emb = load_table(spark, SF_CHECK, "embeddings")
    blocked = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in cosine_pairs_blocked(emb, _COS_DUP_T).collect()
    }
    bcast = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in cosine_pairs_broadcast(emb, _COS_DUP_T).collect()
    }
    assert blocked == bcast
    assert blocked  # non-degenerate at this SF


def test_blocked_pairs_scale_10x_no_collect(spark):
    """10× the corpus through the blocked path: no driver collect of
    the corpus (plan has no broadcast of emb), per-task group size is
    bounded by 2·N/n_blocks, and self-duplicated vectors all pair."""
    emb = load_table(spark, SF_CHECK, "embeddings")
    n = emb.count()
    # replicate 10× with distinct ids; copies of the same vector are
    # exact duplicates (cos == 1) so expected pair count is known
    reps = F.explode(F.array(*[F.lit(i) for i in range(10)])).alias("rep")
    big = emb.select("vec_id", "embedding", reps).select(
        (F.col("vec_id") + F.col("rep") * F.lit(10_000_000)).alias("vec_id"),
        "embedding",
    )
    from mapreduce511_spark.operators.ann import cosine_pairs_blocked

    pairs = cosine_pairs_blocked(big, 0.999999, n_blocks=8)
    # every original vector yields C(10,2)=45 self-pairs (plus any
    # true distinct near-identical vectors, which this data lacks)
    assert pairs.filter(F.col("cos_sim") >= 0.9999).count() >= 45 * n


def test_quantized_topk_rank_quality(spark):
    """int8-style quantized ranking must largely agree with exact
    cosine: >= 70% overlap between quantized top-20 and exact top-20
    for the same probe (scalar quantization distorts but preserves
    neighborhoods)."""
    from mapreduce511_spark.queries.similarity import (
        ann_quantized_topk,
        similarity_topk,
    )

    exact = {r.vec_id for r in similarity_topk(spark, SF_CHECK).collect()}
    quant = {r.vec_id for r in ann_quantized_topk(spark, SF_CHECK).collect()}
    assert len(quant) == 20
    overlap = len(exact & quant) / len(exact)
    assert overlap >= 0.7, f"quantized/exact top-20 overlap {overlap}"


def test_ivf_partitioned_index_prunes_and_matches(spark, tmp_path):
    """The cell-partitioned IVF index must (a) partition-prune the
    scan to the probed cells — PartitionFilters with cell IN (...) and
    fewer partition dirs read than exist — and (b) return exactly the
    in-memory ivf_search result."""
    from mapreduce511_spark.operators.ann import (
        ivf_search,
        ivf_search_pruned,
        ivf_write_partitioned,
        train_centroids,
    )

    emb = load_table(spark, SF_CHECK, "embeddings")
    centroids = train_centroids(emb)
    path = str(tmp_path / "ivf_index")
    ivf_write_partitioned(emb, centroids, path)

    probes = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("pid"), F.col("embedding").alias("pv")
    )
    pruned = ivf_search_pruned(
        spark, path, probes, centroids, nprobe=2, topk=5
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan.split(
        "PartitionFilters", 1
    )[1][:200]
    mem = {
        (r.probe_id, r.rank): (r.vec_id, r.cos_sim)
        for r in ivf_search(emb, probes, centroids, nprobe=2, topk=5).collect()
    }
    got = {
        (r.probe_id, r.rank): (r.vec_id, r.cos_sim) for r in pruned.collect()
    }
    assert got == mem and got


def test_ann_pq_recall(spark, exact_topk):
    """PQ + exact re-rank must recover most true neighbors (ADC is a
    coarse ranker; the 4x re-rank pool absorbs its error)."""
    from mapreduce511_spark.queries.similarity import ann_pq_topk

    recall = _recall(ann_pq_topk(spark, SF_CHECK).collect(), exact_topk)
    assert recall >= 0.7, f"PQ recall@{TOPK} = {recall}"


def test_pq_codes_compress_and_adc_stage_is_codes_only(spark):
    """Codes are m nibbles per vector (32x vs 64 floats); every code
    is a valid centroid index; the encode output is one row per
    corpus vector."""
    from mapreduce511_spark.operators.ann import (
        PQ_K,
        PQ_M,
        pq_encode,
        train_pq_codebooks,
    )

    emb = load_table(spark, SF_CHECK, "embeddings")
    books = train_pq_codebooks(emb)
    assert len(books) == PQ_M and all(len(b) == PQ_K for b in books)
    coded = pq_encode(emb, books).select("vec_id", "codes")
    rows = coded.collect()
    assert len(rows) == emb.count()
    for r in rows:
        assert len(r.codes) == PQ_M
        assert all(0 <= c < PQ_K for c in r.codes)


def test_pq_reconstruction_beats_random_codebook(spark):
    """Trained codebooks must reconstruct unit vectors with lower
    squared error than the untrained init-only codebook run for zero
    iterations — the k-means actually has to learn something."""
    import numpy as np

    from mapreduce511_spark.operators.ann import (
        pq_encode,
        train_pq_codebooks,
    )

    emb = load_table(spark, SF_CHECK, "embeddings")
    trained = train_pq_codebooks(emb)
    init_only = train_pq_codebooks(emb, iters=0)

    import pyarrow.parquet as pq_

    t = pq_.read_table(f"{SF_CHECK}/embeddings.parquet")
    vid = np.array(t["vec_id"])
    vecs = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    vecs = vecs[np.argsort(vid)]
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)

    def mse(books):
        codes = {
            r.vec_id: list(r.codes)
            for r in pq_encode(emb, books).select("vec_id", "codes").collect()
        }
        err = 0.0
        for i, v in enumerate(unit):
            rec = np.concatenate([books[s][codes[i][s]] for s in range(8)])
            err += float(((v - rec) ** 2).sum())
        return err / len(unit)

    assert mse(trained) < mse(init_only)


def test_pq_indexed_matches_inquery(spark):
    """The persisted-index PQ query path (ensure_pq_index +
    pq_search_indexed — what ann_pq_topk serves since r6) must emit
    exactly the in-query pq_search result: persistence changes cost
    attribution, never answers."""
    from mapreduce511_spark.operators.ann import (
        ensure_pq_index,
        pq_search,
        pq_search_indexed,
        train_pq_codebooks,
    )

    emb = load_table(spark, SF_CHECK, "embeddings")
    probes = emb.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("pid"), F.col("embedding").alias("pv")
    )
    path, books, _ = ensure_pq_index(emb)
    assert books == train_pq_codebooks(emb)  # same cached codebooks
    mem = {
        (r.probe_id, r.rank): (r.vec_id, r.cos_sim)
        for r in pq_search(emb, probes, books, topk=TOPK).collect()
    }
    idx = {
        (r.probe_id, r.rank): (r.vec_id, r.cos_sim)
        for r in pq_search_indexed(
            spark, path, probes, books, topk=TOPK
        ).collect()
    }
    assert idx == mem and idx


def test_ivf_pq_indexed_matches_and_prunes(spark):
    """The persisted cell-partitioned IVF-PQ index must (a) partition-
    prune the ADC scan to the probed cells (PartitionFilters on cell)
    and (b) emit exactly the in-query ivf_pq_search result."""
    from mapreduce511_spark.operators.ann import (
        ensure_pq_index,
        ivf_pq_search,
        ivf_pq_search_indexed,
    )

    emb = load_table(spark, SF_CHECK, "embeddings")
    probes = emb.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("pid"), F.col("embedding").alias("pv")
    )
    path, books, centroids = ensure_pq_index(emb, with_cells=True)
    indexed = ivf_pq_search_indexed(
        spark, path, probes, centroids, books, nprobe=4, topk=TOPK
    )
    plan = indexed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan.split(
        "PartitionFilters", 1
    )[1][:200]
    mem = {
        (r.probe_id, r.rank): (r.vec_id, r.cos_sim)
        for r in ivf_pq_search(
            emb, probes, centroids, books, nprobe=4, topk=TOPK
        ).collect()
    }
    idx = {
        (r.probe_id, r.rank): (r.vec_id, r.cos_sim)
        for r in indexed.collect()
    }
    assert idx == mem and idx


def test_ann_ivf_indexed_matches_kmeans_twin(spark):
    """The registered on-disk IVF query must return exactly the
    in-memory kmeans twin's result set (same trained centroids via
    the content-keyed cache, same exact-cosine scoring)."""
    from mapreduce511_spark.queries.similarity import (
        ann_ivf_indexed_topk,
        ann_ivf_kmeans_topk,
    )

    mem = {
        (r.probe_id, r.rank): (r.vec_id, r.cos_sim)
        for r in ann_ivf_kmeans_topk(spark, SF_CHECK).collect()
    }
    idx = {
        (r.probe_id, r.rank): (r.vec_id, r.cos_sim)
        for r in ann_ivf_indexed_topk(spark, SF_CHECK).collect()
    }
    assert idx == mem and idx


def test_ann_ivf_pq_recall(spark, exact_topk):
    """Cell pruning (recall ceiling ~ the kmeans-IVF 0.88-0.96) and
    ADC ranking compose: the combined index must still recover most
    true neighbors."""
    from mapreduce511_spark.queries.similarity import ann_ivf_pq_topk

    recall = _recall(ann_ivf_pq_topk(spark, SF_CHECK).collect(), exact_topk)
    assert recall >= 0.75, f"IVF-PQ recall@{TOPK} = {recall}"


def test_ann_ivf_pq_residual_at_least_matches_raw(spark, exact_topk):
    """Residual encoding exists to BUY recall at the same code
    budget: IVFADC recall@5 must be at least the raw-vector IVF-PQ's
    on this corpus (and clear the same 0.75 floor)."""
    from mapreduce511_spark.queries.similarity import (
        ann_ivf_pq_residual_topk,
        ann_ivf_pq_topk,
    )

    raw = _recall(ann_ivf_pq_topk(spark, SF_CHECK).collect(), exact_topk)
    res = _recall(
        ann_ivf_pq_residual_topk(spark, SF_CHECK).collect(), exact_topk
    )
    assert res >= 0.75, f"IVFADC recall@{TOPK} = {res}"
    assert res >= raw - 1e-9, f"residual {res} < raw {raw}"


def test_residual_adc_beats_raw_at_tight_rerank(spark, exact_topk):
    """The residual edge is in the ADC ordering itself, visible when
    the re-rank pool is tight (at rerank=32 both saturate the
    nprobe-bounded ceiling and the test above only proves parity).
    Measured at rerank=2: residual 0.56 vs raw 0.42 — assert the gap
    survives, not the exact values."""
    from mapreduce511_spark.operators.ann import (
        ensure_pq_index,
        ensure_pq_residual_index,
        ivf_pq_residual_search_indexed,
        ivf_pq_search_indexed,
    )
    from mapreduce511_spark.sources.tables import load_table

    emb = load_table(spark, SF_CHECK, "embeddings")
    probes = emb.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("pid"), F.col("embedding").alias("pv")
    )
    path_r, books_r, cents_r = ensure_pq_residual_index(emb)
    path_p, books_p, cents_p = ensure_pq_index(emb, with_cells=True)
    raw = _recall(
        ivf_pq_search_indexed(
            spark, path_p, probes, cents_p, books_p,
            nprobe=4, topk=TOPK, rerank=2,
        ).collect(),
        exact_topk,
    )
    res = _recall(
        ivf_pq_residual_search_indexed(
            spark, path_r, probes, cents_r, books_r,
            nprobe=4, topk=TOPK, rerank=2,
        ).collect(),
        exact_topk,
    )
    assert res >= raw + 0.05, f"residual ADC {res} vs raw {raw}"


def test_ann_ivf_lloyd_indexed_matches_oracled_twin(spark):
    """The persisted-Lloyd-index query must return EXACTLY the oracled
    in-query twin's result set — the index stores the twin's own
    ``_lloyd_assign`` cell tags and the centroids round-trip as IEEE
    doubles, so this equality is bitwise, not approximate. Also
    asserts the plan partition-prunes on the probed cells."""
    from mapreduce511_spark.queries.similarity import (
        ann_ivf_lloyd_indexed_topk,
        ann_ivf_lloyd_topk,
    )

    indexed = ann_ivf_lloyd_indexed_topk(spark, SF_CHECK)
    plan = indexed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan.split(
        "PartitionFilters", 1
    )[1][:200]
    mem = {
        (r.probe_id, r.rank): (r.vec_id, r.cos_sim)
        for r in ann_ivf_lloyd_topk(spark, SF_CHECK).collect()
    }
    idx = {
        (r.probe_id, r.rank): (r.vec_id, r.cos_sim)
        for r in indexed.collect()
    }
    assert idx == mem and idx


def test_semantic_dedup_lloyd_indexed_matches_oracled_twin(spark):
    """The persisted-assignment SemDeDup census must equal the oracled
    in-query twin row-for-row (the index IS the twin's assignment,
    materialized)."""
    from mapreduce511_spark.queries.similarity import (
        semantic_dedup_lloyd_census,
        semantic_dedup_lloyd_indexed,
    )

    twin = {
        tuple(r) for r in semantic_dedup_lloyd_census(spark, SF_CHECK).collect()
    }
    idx = {
        tuple(r) for r in semantic_dedup_lloyd_indexed(spark, SF_CHECK).collect()
    }
    assert idx == twin and idx


def test_fingerprint_memo_invalidates_on_rewrite(spark, tmp_path):
    """r7 memoizes the ANN content fingerprint per (logical plan,
    file-stat signature). An in-place parquet rewrite with different
    content MUST produce a different cache key (the failure mode the
    r5 inputFiles key had) — i.e. the memo can never serve a stale
    fingerprint for changed bytes."""
    import time as _time

    from mapreduce511_spark.operators.ann import _cache_key

    p = str(tmp_path / "emb")
    spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(50)], ["vec_id", "embedding"]
    ).coalesce(1).write.mode("overwrite").parquet(p)
    df1 = spark.read.parquet(p)
    k1 = _cache_key(df1, "t", 1)
    k1_again = _cache_key(spark.read.parquet(p), "t", 1)
    assert k1 == k1_again  # memo hit: same plan shape, same files
    _time.sleep(0.05)  # ensure mtime_ns moves even on coarse clocks
    spark.createDataFrame(
        [(i, [float(-i), 2.0]) for i in range(50)], ["vec_id", "embedding"]
    ).coalesce(1).write.mode("overwrite").parquet(p)
    k2 = _cache_key(spark.read.parquet(p), "t", 1)
    assert k2 != k1, "rewritten parquet must invalidate the fingerprint"
    # and a transformation on the same files is a different key too
    k3 = _cache_key(
        spark.read.parquet(p).filter("vec_id < 10"), "t", 1
    )
    assert k3 != k2


def test_bitext_ivf_candidates_are_cell_bounded(spark):
    """The IVF-bounded margin miner's candidate volume must be a real
    cut of the exact kernel's |src| x |tgt| block — the scale claim,
    measured: candidates = sum over sources of the target mass in
    their nprobe probed cells."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from mapreduce511_spark.queries import similarity as S

    emb = load_table(spark, SF_CHECK, "embeddings")
    e = emb.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    ev = e.select("vec_id", "v")
    cent = S._lloyd_centroids(ev)
    af = S._lloyd_assign(ev, cent)
    src = e.filter(F.col("label") == S._BITEXT_SRC_LABEL).select(
        F.col("vec_id").alias("src_id"), F.col("v").alias("va")
    )
    w_cell = Window.partitionBy("src_id").orderBy(F.desc("csim"), F.asc("cell"))
    probe_cells = (
        src.join(F.broadcast(cent))
        .withColumn(
            "csim",
            S.cosine_similarity(F.col("va"), F.col("cv")),
        )
        .withColumn("rn", F.row_number().over(w_cell))
        .filter(F.col("rn") <= S._IVF_NPROBE)
        .select("src_id", "cell")
    )
    tgt_cells = af.join(
        e.filter(F.col("label") == S._BITEXT_TGT_LABEL).select("vec_id"),
        "vec_id",
    ).select("cell")
    n_src = src.count()
    n_tgt = tgt_cells.count()
    n_cand = probe_cells.join(
        tgt_cells.groupBy("cell").agg(F.count("*").alias("m")), "cell"
    ).agg(F.sum("m")).first()[0]
    # nprobe=4 of k=16 cells: expect ~25% of the full block; 60% is
    # the loose bar a broken cell assignment blows through
    assert n_cand < 0.6 * n_src * n_tgt, (n_cand, n_src * n_tgt)


def test_fingerprint_memo_skips_unstatable_uris(spark, tmp_path, monkeypatch):
    """r8 (r7 ADVICE): when an input file can't be stat()ed (remote
    URIs — hdfs://, s3a://), the stat signature can't observe
    rewrites, so _cache_key must SKIP memoization and re-fingerprint
    every call rather than memoize under a sentinel that would serve
    a stale trained index forever."""
    import os as _os

    from mapreduce511_spark.operators import ann as _ann

    p = str(tmp_path / "emb_unstat")
    spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(20)], ["vec_id", "embedding"]
    ).coalesce(1).write.mode("overwrite").parquet(p)
    df = spark.read.parquet(p)
    real_stat = _os.stat

    def deny(path, *a, **kw):
        if "emb_unstat" in str(path):
            raise OSError("simulated remote URI: stat unavailable")
        return real_stat(path, *a, **kw)

    before = dict(_ann._FP_MEMO)
    monkeypatch.setattr(_os, "stat", deny)
    try:
        k1 = _ann._cache_key(df, "t", 1)
    finally:
        monkeypatch.setattr(_os, "stat", real_stat)
    assert _ann._FP_MEMO == before, (
        "unstat-able inputs must not be memoized"
    )
    assert k1 == _ann._cache_key(spark.read.parquet(p), "t", 1)


def test_fingerprint_memo_bounded_per_plan(spark, tmp_path):
    """r8 (r7 ADVICE): _FP_MEMO keeps only the LATEST snapshot per
    logical plan — rewriting the same corpus N times must not grow
    the memo by N entries."""
    import time as _time

    from mapreduce511_spark.operators import ann as _ann

    p = str(tmp_path / "emb_bounded")
    sizes = []
    for gen in range(3):
        spark.createDataFrame(
            [(i, [float(i * (gen + 1)), 1.0]) for i in range(20)],
            ["vec_id", "embedding"],
        ).coalesce(1).write.mode("overwrite").parquet(p)
        _time.sleep(0.05)
        _ann._cache_key(spark.read.parquet(p), "t", 1)
        sizes.append(len(_ann._FP_MEMO))
    assert sizes[0] == sizes[1] == sizes[2], (
        f"memo grew across rewrites of one plan: {sizes}"
    )


def test_bitext_ivf_indexed_matches_oracled_twin(spark):
    """r8 (r7 VERDICT item 2): the persisted-index bitext mining pass
    must equal the ORACLED in-query twin row-for-row (same centroids
    via the driver IEEE-double round-trip, same cell tags — the index
    stores the twin's own ``_lloyd_assign`` output), and its plan
    must partition-prune the target scan on the probed cells."""
    from mapreduce511_spark.queries.similarity import (
        bitext_margin_mining_ivf,
        bitext_margin_mining_ivf_indexed,
    )

    indexed = bitext_margin_mining_ivf_indexed(spark, SF_CHECK)
    plan = indexed._jdf.queryExecution().executedPlan().toString()
    # the INDEX scan (not the unpartitioned embeddings scans, whose
    # PartitionFilters are empty) must carry a non-empty cell filter
    idx_lines = [
        ln for ln in plan.splitlines() if "ann_index" in ln and "FileScan" in ln
    ]
    assert idx_lines and all(
        "PartitionFilters: [cell" in ln for ln in idx_lines
    ), idx_lines or plan[:500]
    twin = {
        tuple(r) for r in bitext_margin_mining_ivf(spark, SF_CHECK).collect()
    }
    idx = {tuple(r) for r in indexed.collect()}
    assert idx == twin and idx


def test_admitted_lloyd_index_equals_assignment_rebuild(spark):
    """r8 (r7 VERDICT item 4): the artifact written by build-base +
    admit-batch must be ROW-IDENTICAL to an assignment-only rebuild
    over the full corpus with the same frozen centroids — i.e.
    admission changed where rows entered the index, not what it
    contains — and therefore any search over the two is equal."""
    from mapreduce511_spark.queries.similarity import (
        _ensure_admitted_lloyd_index,
        _lloyd_assign,
    )
    from mapreduce511_spark.sources.tables import (
        load_table,
        read_parquet_checked,
    )

    emb = load_table(spark, SF_CHECK, "embeddings")
    path, cent_rows = _ensure_admitted_lloyd_index(emb)
    admitted = {
        (r.vec_id, tuple(r.v), int(r.cell))
        for r in read_parquet_checked(spark, path).collect()
    }
    e = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cent_df = spark.createDataFrame(cent_rows, ["cell", "cv"])
    rebuilt = {
        (r.vec_id, tuple(r.v), int(r.cell))
        for r in _lloyd_assign(e, cent_df)
        .select("vec_id", "v", "cell")
        .collect()
    }
    assert admitted == rebuilt and admitted
    # and the admitted slice is really in there (not an empty append)
    assert any(v % 10 == 0 for v, _, _ in admitted)


def test_admit_batch_pq_codes_equal_full_encode(spark, tmp_path):
    """PQ admission: codes appended for a new batch with FROZEN
    codebooks must equal what a full re-encode assigns those rows."""
    from mapreduce511_spark.operators.ann import (
        admit_batch_pq,
        pq_encode,
        train_pq_codebooks,
    )
    from mapreduce511_spark.sources.tables import load_table

    emb = load_table(spark, SF_CHECK, "embeddings")
    base = emb.filter(F.col("vec_id") % 10 != 0).select("vec_id", "embedding")
    batch = emb.filter(F.col("vec_id") % 10 == 0).select("vec_id", "embedding")
    books = train_pq_codebooks(base)
    path = str(tmp_path / "pq_admit")
    pq_encode(base, books).write.mode("overwrite").parquet(path)
    admit_batch_pq(spark, path, books, batch)
    got = {
        (r.vec_id, tuple(r.codes))
        for r in spark.read.parquet(path).select("vec_id", "codes").collect()
    }
    want = {
        (r.vec_id, tuple(r.codes))
        for r in pq_encode(
            emb.select("vec_id", "embedding"), books
        ).collect()
    }
    assert got == want and any(v % 10 == 0 for v, _ in got)


def test_stream_admitted_artifact_equals_batch_admitted(spark):
    """r8: however the arriving slice splits into micro-batches, the
    stream-admitted artifact must be ROW-IDENTICAL (vec_id, v, cell)
    to the one-shot batch admission — same frozen centroids, same
    per-row assignment — and its layout must carry the per-batch
    partition level (base at ingest_batch=-1, arrivals at >= 0)."""
    from mapreduce511_spark.operators.ann import _INDEX_CACHE, _cache_key
    from mapreduce511_spark.queries.similarity import (
        _LLOYD_ITERS,
        _LLOYD_K,
        _ensure_admitted_lloyd_index,
    )
    from mapreduce511_spark.queries.streaming_queries import (
        stream_ann_admission_census,
    )
    from mapreduce511_spark.sources.tables import (
        load_table,
        read_parquet_checked,
    )

    stream_ann_admission_census(spark, SF_CHECK).collect()
    emb = load_table(spark, SF_CHECK, "embeddings")
    key = _cache_key(emb, "lloyd_stream_admitted", _LLOYD_K, _LLOYD_ITERS)
    spath, _ = _INDEX_CACHE[key]
    bpath, _ = _ensure_admitted_lloyd_index(emb)
    streamed = read_parquet_checked(spark, spath)
    batches = {
        int(r.ingest_batch)
        for r in streamed.select("ingest_batch").distinct().collect()
    }
    assert -1 in batches and len(batches) >= 3, batches
    got = {
        (r.vec_id, tuple(r.v), int(r.cell))
        for r in streamed.select("vec_id", "v", "cell").collect()
    }
    want = {
        (r.vec_id, tuple(r.v), int(r.cell))
        for r in read_parquet_checked(spark, bpath).collect()
    }
    assert got == want and got


def test_batch_dir_overwrite_is_redelivery_idempotent(spark, tmp_path):
    """The foreachBatch admission sink's exactly-once mechanism:
    re-writing the SAME ingest_batch dir (a redelivered batchId)
    replaces rather than double-admits."""
    path = str(tmp_path / "idx")
    df = spark.createDataFrame(
        [(i, [float(i)], i % 3) for i in range(30)], ["vec_id", "v", "cell"]
    )
    for _ in range(2):  # deliver batch 0 twice
        df.coalesce(1).write.mode("overwrite").partitionBy("cell").parquet(
            f"{path}/ingest_batch=0"
        )
    assert spark.read.parquet(path).count() == 30


def test_compacted_index_preserves_rows_and_reduces_files(spark):
    """r8: compaction must move bytes, not meaning — row equality
    (vec_id, v, cell, ingest_batch) with the stream-admitted
    artifact, strictly fewer leaf parquet files, and cell partition
    dirs preserved for pruning."""
    import glob

    from mapreduce511_spark.operators.ann import _INDEX_CACHE, _cache_key
    from mapreduce511_spark.queries.similarity import _LLOYD_ITERS, _LLOYD_K
    from mapreduce511_spark.queries.streaming_queries import (
        ann_index_compaction_census,
        ensure_stream_admitted_lloyd_index,
    )
    from mapreduce511_spark.sources.tables import (
        load_table,
        read_parquet_checked,
    )

    ann_index_compaction_census(spark, SF_CHECK).collect()
    emb = load_table(spark, SF_CHECK, "embeddings")
    spath, _ = ensure_stream_admitted_lloyd_index(emb)
    cpath, _ = _INDEX_CACHE[
        _cache_key(emb, "lloyd_compacted", _LLOYD_K, _LLOYD_ITERS)
    ]
    cols = ["vec_id", "v", "cell", "ingest_batch"]
    got = {
        (r.vec_id, tuple(r.v), int(r.cell), int(r.ingest_batch))
        for r in read_parquet_checked(spark, cpath).select(cols).collect()
    }
    want = {
        (r.vec_id, tuple(r.v), int(r.cell), int(r.ingest_batch))
        for r in read_parquet_checked(spark, spath).select(cols).collect()
    }
    assert got == want and got
    n_in = len(glob.glob(f"{spath}/**/*.parquet", recursive=True))
    n_out = len(glob.glob(f"{cpath}/**/*.parquet", recursive=True))
    assert n_out < n_in, (n_in, n_out)
    # the compacted layout keeps cell=<id> dirs (pruning survives)
    assert glob.glob(f"{cpath}/cell=*"), "cell partition level lost"


def test_index_artifacts_reused_across_processes(spark):
    """A fresh process (simulated by clearing the in-process cache)
    finding a COMPLETE artifact for the same content fingerprint must
    reuse it — identical model, identical part files — instead of
    retraining and REWRITING in place (mode 'overwrite' deletes part
    files under any concurrent reader; this is the race a parallel
    session hit). The sidecar is written last + atomically, so its
    presence implies the artifact is complete."""
    import glob

    from mapreduce511_spark.operators.ann import _INDEX_CACHE, ensure_ivf_index
    from mapreduce511_spark.queries.similarity import _ensure_lloyd_index
    from mapreduce511_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    for build in (ensure_ivf_index, _ensure_lloyd_index):
        path, model1 = build(emb)
        files1 = sorted(glob.glob(f"{path}/**/*.parquet", recursive=True))
        assert files1, path
        # simulate a brand-new process: in-memory cache gone
        stale = [k for k in _INDEX_CACHE if _INDEX_CACHE[k][0] == path]
        for k in stale:
            del _INDEX_CACHE[k]
        path2, model2 = build(emb)
        assert path2 == path
        assert model2 == model1  # JSON round-trips IEEE doubles exactly
        files2 = sorted(glob.glob(f"{path}/**/*.parquet", recursive=True))
        assert files2 == files1  # no rewrite: same part files, untouched


def test_retain_latest_artifact_scopes_prefix_and_source(tmp_path):
    """r11 retention helper semantics: only siblings of the SAME
    prefix family AND the same declared source are retired; longer
    prefix families sharing the stem (lloyd vs lloyd_admit), other
    sources, legacy sidecars without a source, and the keep dir
    itself all survive; an empty source (in-memory frame) is a
    no-op."""
    import os

    from mapreduce511_spark.operators.ann import (
        retain_latest_artifact,
        write_model_sidecar,
    )

    root = tmp_path / "ann_index"
    root.mkdir()

    def mk(name, model):
        d = root / name
        d.mkdir()
        write_model_sidecar(str(d), model)
        return d

    keep = mk("lloyd_" + "a" * 16, {"source": "S"})
    stale = mk("lloyd_" + "b" * 16, {"source": "S"})
    other_src = mk("lloyd_" + "c" * 16, {"source": "T"})
    other_family = mk("lloyd_admit_" + "d" * 16, {"source": "S"})
    legacy = mk("lloyd_" + "e" * 16, {"cent_rows": []})
    retain_latest_artifact(str(keep), "S")
    assert keep.exists()
    assert not stale.exists()
    assert other_src.exists()
    assert other_family.exists()
    assert legacy.exists()
    # the admit family retires ITS stale twin without touching lloyd_
    keep2 = mk("lloyd_admit_" + "f" * 16, {"source": "S"})
    retain_latest_artifact(str(keep2), "S")
    assert not other_family.exists()
    assert keep.exists() and keep2.exists()
    before = sorted(os.listdir(root))
    retain_latest_artifact(str(keep), "")
    assert sorted(os.listdir(root)) == before  # empty source: no-op
    # legacy-format sidecars (r11 pre-review: plain joined files, no
    # plan/params) retire when passed as the legacy group — the
    # one-session-old format must not leak orphan dirs forever
    old_fmt = mk("lloyd_" + "9" * 16, {"source": "file:/e.parquet"})
    retain_latest_artifact(str(keep), "S", legacy="file:/e.parquet")
    assert not old_fmt.exists() and keep.exists()


def test_retention_evicts_stale_index_cache_entries(tmp_path):
    """r11 review: a session cache entry pointing at a retired dir
    must be evicted — a byte-for-byte data revert re-produces the old
    cache key, and serving the deleted path would crash the read
    instead of rebuilding."""
    from mapreduce511_spark.operators.ann import (
        _INDEX_CACHE,
        retain_latest_artifact,
        write_model_sidecar,
    )

    root = tmp_path / "ann_index"
    root.mkdir()
    keep = root / ("ivf_" + "a" * 16)
    stale = root / ("ivf_" + "b" * 16)
    for d in (keep, stale):
        d.mkdir()
        write_model_sidecar(str(d), {"source": "S"})
    sentinel = ("fake-key-r11-eviction",)
    _INDEX_CACHE[sentinel] = (str(stale), ["model"])
    try:
        retain_latest_artifact(str(keep), "S")
        assert not stale.exists()
        assert sentinel not in _INDEX_CACHE
    finally:
        _INDEX_CACHE.pop(sentinel, None)


def test_ivf_index_retention_retires_stale_snapshot(spark):
    """r11 wiring: rebuilding the IVF index after a (simulated)
    corpus rewrite retires the prior snapshot's artifact — the disk
    mirror of the in-process keep-latest memos."""
    import os
    import shutil

    from mapreduce511_spark.operators.ann import (
        _INDEX_CACHE,
        K_CELLS,
        KMEANS_ITERS,
        _cache_key,
        artifact_source,
        ensure_ivf_index,
        write_model_sidecar,
    )
    from mapreduce511_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    path, _ = ensure_ivf_index(emb)
    root = os.path.dirname(path)
    src = artifact_source(
        emb, _cache_key(emb, "ivf_index", K_CELLS, KMEANS_ITERS)
    )
    assert src  # parquet-backed: retention applies
    stale = os.path.join(root, "ivf_" + "0" * 16)
    os.makedirs(stale, exist_ok=True)
    write_model_sidecar(stale, {"centroids": [], "source": src})
    try:
        shutil.rmtree(path)  # force a fresh publish
        for k in [k for k, v in _INDEX_CACHE.items() if v[0] == path]:
            del _INDEX_CACHE[k]
        path2, _ = ensure_ivf_index(emb)
        assert path2 == path and os.path.exists(path)
        assert not os.path.exists(stale), "stale snapshot kept"
    finally:
        shutil.rmtree(stale, ignore_errors=True)


def test_artifact_group_distinguishes_params_plans_and_memory(spark):
    """r11 review: the retention group must include the cache key's
    non-content tail and the normalized plan — a k=8 index must never
    retire the k=16 one, a filtered frame must never retire the full
    frame's index (both keys stay producible within one snapshot),
    and in-memory frames opt out entirely."""
    from pyspark.sql import functions as F

    from mapreduce511_spark.operators.ann import _cache_key, artifact_source
    from mapreduce511_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    k8 = artifact_source(emb, _cache_key(emb, "ivf_index", 8, 3))
    k16 = artifact_source(emb, _cache_key(emb, "ivf_index", 16, 3))
    assert k8 and k16 and k8 != k16
    assert k8 == artifact_source(emb, _cache_key(emb, "ivf_index", 8, 3))
    filt = emb.filter(F.col("vec_id") % 2 == 0)
    assert artifact_source(filt, _cache_key(filt, "ivf_index", 8, 3)) != k8
    mem = spark.createDataFrame([(1, [0.0])], ["vec_id", "embedding"])
    assert artifact_source(mem, _cache_key(mem, "ivf_index", 8, 3)) == ""
