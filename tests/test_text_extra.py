"""approx_count_distinct error bound vs exact."""

from __future__ import annotations


def test_approx_distinct_within_tolerance(spark):
    from mapreduce511_spark.queries.text import approx_distinct_tokens
    from tests.conftest import SF_CHECK

    row = approx_distinct_tokens(spark, SF_CHECK).first()
    rel_err = abs(row.approx_distinct - row.exact_distinct) / row.exact_distinct
    assert rel_err < 0.05, f"HLL rel err {rel_err}"
    assert row.total_tokens >= row.exact_distinct


def test_context_pack_invariants(spark):
    """Packing semantics beyond oracle parity: per language, pack ids
    are contiguous from 0, every pack except possibly the last spans
    at least the 2048-token budget when the next pack exists (a doc
    starts a new pack only because the budget boundary was crossed),
    and total tokens are conserved."""
    from pyspark.sql import functions as F

    from mapreduce511_spark.functions.text import tokenize
    from mapreduce511_spark.queries import all_queries
    from mapreduce511_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    rows = all_queries()["context_pack_stats"](spark, sf).collect()
    docs = load_table(spark, sf, "documents")
    totals = {
        r["lang"]: r["t"]
        for r in docs.groupBy("lang")
        .agg(F.sum(F.size(tokenize("text"))).alias("t"))
        .collect()
    }

    by_lang: dict[str, dict[int, int]] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], {})[r["pack_id"]] = r["n_tokens"]
    assert set(by_lang) == set(totals)
    for lang, packs in by_lang.items():
        ids = sorted(packs)
        assert ids == list(range(len(ids))), lang  # contiguous from 0
        assert sum(packs.values()) == totals[lang], lang  # conservation
        # cumulative token count must cross each successive pack
        # boundary: pack k exists only if cum tokens exceed 2048*k
        cum = 0
        for k in ids:
            if k > 0:
                assert cum > 2048 * k - max(packs.values()), lang
            cum += packs[k]


def test_padding_buckets_bound_waste(spark):
    """Power-of-two bucketing caps per-bucket padding waste below 50%
    by construction (a doc of length n sits in bucket < 2n), i.e.
    efficiency > 5000 bp everywhere — the property the
    padding_waste_by_bucket census exists to verify for a batching
    scheme."""
    from mapreduce511_spark import queries as suite
    from tests.conftest import SF_CHECK

    rows = suite.all_queries()["padding_waste_by_bucket"](
        spark, SF_CHECK
    ).collect()
    assert rows, "no buckets"
    for r in rows:
        assert r.padded_tokens == r.bucket * r.n_docs
        assert r.wasted_tokens == r.padded_tokens - r.real_tokens
        assert r.efficiency_bp > 5000, (r.bucket, r.efficiency_bp)


def test_chunk_census_consistency(spark):
    """total_chunks and overlap_tokens must satisfy the closed-form
    identities (every chunk after a doc's first adds exactly one
    stride and one 128-token overlap)."""
    from mapreduce511_spark import queries as suite
    from tests.conftest import SF_CHECK

    r = suite.all_queries()["doc_chunk_census"](spark, SF_CHECK).collect()[0]
    assert r.total_chunks >= r.n_docs
    assert r.overlap_tokens == (r.total_chunks - r.n_docs) * 128
    assert r.max_chunks_per_doc >= 1


def test_pii_screen_detects_injected_shapes(spark, tmp_path):
    """The synthetic corpus is PII-free (the census asserts zeros via
    its oracle), so detection power needs an adversarial fixture:
    inject each PII shape into a scratch documents table and check
    per-flag counts — including a clean control doc and a
    multi-shape doc counted once in docs_flagged."""
    import os

    from mapreduce511_spark import queries as suite

    rows = [
        (1, "contact me at alice.smith+spam@example.co.uk today", "en"),
        (2, "server at 192.168.001.1 responded", "en"),
        (3, "leaked d41d8cd98f00b204e9800998ecf8427e0123456789abcdef", "en"),
        (4, "ssn 123-45-6789 on file", "en"),
        (5, "a perfectly clean document", "en"),
        (6, "bob@corp.io from 10.0.0.7", "en"),
    ]
    df = spark.createDataFrame(
        [(i, t, lg, "test", len(t)) for i, t, lg in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf_dir = str(tmp_path / "pii_sf")
    os.makedirs(sf_dir, exist_ok=True)
    df.toPandas().to_parquet(f"{sf_dir}/documents.parquet", index=False)
    out = suite.all_queries()["pii_screen_census"](spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert (
        r.docs_with_email,
        r.docs_with_ipv4,
        r.docs_with_long_hex,
        r.docs_with_ssn_shape,
        r.docs_flagged,
    ) == (2, 2, 1, 1, 5), r


def test_decontamination_span_removal_islands(spark, tmp_path):
    """Deterministic island semantics beyond oracle parity: a 10-token
    eval run leaked into a train doc yields THREE matched 8-gram
    positions merging into ONE island of width 10; an isolated single
    8-gram match yields width 8; clean train docs are absent."""
    import os

    from mapreduce511_spark.queries import all_queries

    leak = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"
    iso = "kilo lima mike november oscar papa quebec romeo"
    # doc_id 20 hashes to md5 bucket 0 -> the EVAL split; 0/1/2 are train
    rows = [
        (20, leak + " " + iso, "en"),  # eval doc holding both runs
        (0, "pad1 pad2 " + leak + " pad3 pad4", "en"),  # 10-token leak
        (1, "x1 x2 x3 " + iso + " x4", "en"),  # isolated 8-gram
        (2, "clean words only here nothing shared at all today", "en"),
    ]
    df = spark.createDataFrame(
        [(i, t, lg, "test", len(t)) for i, t, lg in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf_dir = str(tmp_path / "decon_sf")
    os.makedirs(sf_dir, exist_ok=True)
    df.toPandas().to_parquet(f"{sf_dir}/documents.parquet", index=False)
    out = {
        r.doc_id: r
        for r in all_queries()["decontamination_span_removal"](
            spark, sf_dir
        ).collect()
    }
    assert set(out) == {0, 1}
    assert (out[0].removed_occurrences, out[0].tokens_removed) == (3, 10)
    assert out[0].n_tokens == 14 and out[0].tokens_kept == 4
    assert (out[1].removed_occurrences, out[1].tokens_removed) == (1, 8)
    assert out[1].n_tokens == 12 and out[1].tokens_kept == 4


def test_retrieval_quality_census_invariants(spark):
    """Metric-definition invariants beyond oracle parity: DCG never
    exceeds IDCG (so ndcg_ppm <= 1e6), MRR is 1e6/first-relevant-rank
    or 0, precision is n_rel/n_ranked in basis points, and the
    editorial grades make the census discriminative (ndcg < 1e6 at
    this SF — the saturation the matched-terms variant suffered)."""
    from mapreduce511_spark.queries import all_queries

    r = all_queries()["retrieval_quality_census"](
        spark, "/root/testdata/sf0.01"
    ).first()
    assert r.n_ranked <= 10 and r.n_matching >= r.n_ranked
    assert 0 <= r.dcg_scaled <= r.idcg_scaled
    assert r.ndcg_ppm == 1000000 * r.dcg_scaled // r.idcg_scaled
    assert 0 < r.ndcg_ppm < 1000000
    assert r.mrr_ppm in (0,) or 1000000 % max(r.mrr_ppm, 1) in range(
        0, 1000000
    )
    assert 0 <= r.precision_at10_bp <= 10000


def test_doremi_reweighting_invariants(spark):
    """EG-update semantics beyond oracle parity: weights are a proper
    distribution, every domain keeps at least the uniform-smoothing
    floor c/K, the hardest (highest base-loss) domain ends above
    uniform and the easiest below, and equilibration holds — the loss
    decay 1/(1+cum) keeps the max weight well below the argmax
    collapse a plain multiplicative-weights run would produce."""
    from mapreduce511_spark.queries import all_queries
    from mapreduce511_spark.queries.text import _DOREMI_C

    rows = all_queries()["doremi_domain_reweighting"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    k = len(rows)
    assert k >= 2
    total = sum(r.w_final for r in rows)
    assert abs(total - 1.0) < 1e-9
    floor = _DOREMI_C / k
    assert all(r.w_final >= floor - 1e-12 for r in rows)
    hardest = max(rows, key=lambda r: r.base_loss)
    easiest = min(rows, key=lambda r: r.base_loss)
    assert hardest.w_final > 1.0 / k > easiest.w_final
    assert max(r.w_final for r in rows) < 0.5


def test_kneser_ney_vs_laplace_same_split(spark):
    """The KN and Laplace heldout estimators share the md5 split, so
    they must score the SAME validation bigram multiset (equal
    n_val_bigrams per language) while producing different — finite,
    positive — perplexities; and every language present in one is
    present in the other."""
    from mapreduce511_spark.queries import all_queries

    sf = "/root/testdata/sf0.01"
    q = all_queries()
    kn = {r.lang: r for r in q["heldout_kneser_ney_ppl"](spark, sf).collect()}
    lp = {r.lang: r for r in q["heldout_bigram_ppl"](spark, sf).collect()}
    assert set(kn) == set(lp) and kn
    for lang in kn:
        assert kn[lang].n_val_bigrams == lp[lang].n_val_bigrams
        assert 1.0 < kn[lang].perplexity < 1e6
        assert kn[lang].cross_entropy > 0
        assert kn[lang].perplexity != lp[lang].perplexity


def test_heaps_fit_is_non_degenerate(spark):
    """r11 (r10 driver-red postmortem): the geometric-from-one cutoff
    grid must sample the vocabulary-GROWTH region, not just the
    saturated plateau — at both parity scale factors at least one
    language must fit a strictly positive Heaps beta, and every beta
    must round-trip as +0.0-normalized (no negative zero survives the
    shared OLS tail). The r10 even-fraction grid put every cutoff
    past saturation, so the true slope was exactly 0 and fp
    cancellation noise rounded to -0.0 on one engine — a fit that
    measured nothing."""
    import math

    from mapreduce511_spark.queries import all_queries

    q = all_queries()["heaps_law_fit"]
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rows = q(spark, sf).collect()
        assert rows, sf
        assert any(r.heaps_beta > 0 for r in rows), sf
        for r in rows:
            for v in (r.heaps_beta, r.heaps_logk):
                assert not (v == 0.0 and math.copysign(1.0, v) < 0), (
                    f"negative zero leaked at {sf}: {r}"
                )
