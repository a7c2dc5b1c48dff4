"""Fuzzy-dedup semantics beyond oracle parity: LSH recall against the
exact Jaccard baseline, banding soundness, SimHash hamming bounds."""

from __future__ import annotations

import pytest

from mapreduce511_spark.operators.dedup import (
    SIMHASH_MAX_HAMMING,
    band_candidates,
    doc_shingles,
    minhash_bands,
    minhash_signatures_wide,
    simhash_candidates,
    simhash_fingerprints,
)
from mapreduce511_spark.sources.tables import load_table
from tests.conftest import SF_CHECK


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_CHECK, "documents").cache()


def _exact_pairs(spark, threshold: float) -> set[tuple[int, int]]:
    from mapreduce511_spark.queries.similarity import near_dup_jaccard

    rows = (
        near_dup_jaccard(spark, SF_CHECK)
        .filter(f"jaccard >= {threshold}")
        .collect()
    )
    return {(r.doc_a, r.doc_b) for r in rows}


def test_minhash_lsh_recall_on_strong_dups(spark, docs):
    """Banded MinHash (4 bands x 4 rows) must catch essentially every
    high-similarity pair: P[caught | s=0.8] ~ 0.985 per pair."""
    strong = _exact_pairs(spark, 0.8)
    cand = band_candidates(minhash_bands(minhash_signatures_wide(doc_shingles(docs))))
    got = {(r.doc_a, r.doc_b) for r in cand.collect()}
    if strong:
        recall = len(strong & got) / len(strong)
        assert recall >= 0.9, f"LSH recall {recall} on {len(strong)} strong pairs"


def test_minhash_candidates_share_a_shingle(spark, docs):
    """Soundness: every band-bucket pair really collides on all 4
    minhash rows of some band => both docs have shingles; spot-check
    candidates are plausible (non-empty shingle sets both sides)."""
    shingles = doc_shingles(docs)
    with_sh = {r.doc_id for r in shingles.select("doc_id").distinct().collect()}
    cand = band_candidates(minhash_bands(minhash_signatures_wide(shingles)))
    for r in cand.collect():
        assert r.doc_a in with_sh and r.doc_b in with_sh


def test_simhash_near_dup_hamming_bound(spark, docs):
    fps = simhash_fingerprints(docs)
    pairs = simhash_candidates(fps).collect()
    for r in pairs:
        assert 0 <= r.hamming <= SIMHASH_MAX_HAMMING


def test_simhash_identical_docs_identical_fingerprint(spark, docs):
    """Docs with identical text must get identical SimHash (it's a
    deterministic function of term frequencies)."""
    from pyspark.sql import functions as F

    fps = simhash_fingerprints(docs)
    joined = docs.select("doc_id", "text").join(fps, "doc_id")
    groups = (
        joined.groupBy("text")
        .agg(F.countDistinct("simhash").alias("n_fp"), F.count("*").alias("n"))
        .filter("n > 1")
    )
    bad = groups.filter("n_fp > 1").count()
    assert bad == 0


def test_hot_bucket_cap_bounds_candidates(spark, docs):
    """A synthetic 1000-way duplicate class: uncapped banding would
    emit C(1000,2) ≈ 500k pairs; with max_bucket=20 the class costs
    at most C(20,2) per band, while pairs among normal (sub-cap)
    buckets are exactly the pairs the uncapped path finds."""
    from pyspark.sql import functions as F

    from mapreduce511_spark.operators.dedup import (
        band_bucket_stats,
        band_candidates,
        doc_shingles,
        minhash_bands,
        minhash_signatures_wide,
    )

    clones = spark.range(1000).select(
        (F.col("id") + 5_000_000).alias("doc_id"),
        F.lit(
            "the quick brown fox jumps over the lazy dog again and again "
            "every single day of the verification week"
        ).alias("text"),
    )
    base = docs.select("doc_id", "text")
    bands = minhash_bands(
        minhash_signatures_wide(doc_shingles(base.unionByName(clones)))
    )

    cap = 20
    capped = band_candidates(bands, max_bucket=cap)
    clone_pairs = capped.filter(F.col("doc_a") >= 5_000_000)
    n_bands = 4
    assert clone_pairs.count() <= n_bands * cap * (cap - 1) // 2
    # normal pairs (both below the synthetic range) are unchanged:
    # every uncapped pair among sub-cap buckets survives capping
    uncapped_normal = {
        (r.doc_a, r.doc_b)
        for r in band_candidates(bands).filter(F.col("doc_b") < 5_000_000).collect()
    }
    capped_normal = {
        (r.doc_a, r.doc_b)
        for r in capped.filter(F.col("doc_b") < 5_000_000).collect()
    }
    assert uncapped_normal == capped_normal
    stats = band_bucket_stats(bands, cap)
    assert stats.filter("capped").count() >= n_bands  # the clone bucket per band


def test_df_cap_bounds_candidate_generation(spark, docs):
    """A boilerplate shingle shared by 200 docs: uncapped candidate
    gen pays O(200²) pairs for it; the DF-capped path skips it while
    still finding genuinely similar pairs via their rare shingles."""
    from pyspark.sql import functions as F

    from mapreduce511_spark.operators.dedup import doc_shingles

    # 200 docs sharing one boilerplate trigram + a unique tail
    boiler = spark.range(200).select(
        (F.col("id") + 7_000_000).alias("doc_id"),
        F.concat(
            F.lit("all rights reserved "),
            F.col("id").cast("string"),
            F.lit(" unique"),
            F.col("id").cast("string"),
            F.lit(" tail"),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    shingles = doc_shingles(boiler)
    dfreq = shingles.groupBy("sh").agg(F.count("*").alias("dfc"))
    hot = dfreq.filter(F.col("dfc") > 25).count()
    assert hot >= 1  # 'all rights reserved' is shared by all 200
    rare = shingles.join(dfreq.filter(F.col("dfc") <= 25), "sh")
    a, b = rare.alias("a"), rare.alias("b")
    capped_pairs = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )
    assert capped_pairs == 0  # unique tails share nothing rare
    # uncapped would have paid C(200,2) pairs for the boilerplate alone
    full = doc_shingles(boiler)
    fa, fb = full.alias("a"), full.alias("b")
    uncapped_pairs = (
        fa.join(
            fb,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )
    assert uncapped_pairs == 200 * 199 // 2


# ---- connected components (pair -> cluster) ----


def test_connected_components_chain_and_islands(spark):
    """A 4-node chain, a 2-node edge, and a triangle resolve to three
    components labeled by their minimum node ids."""
    from mapreduce511_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (22, 20)],
        ["src", "dst"],
    )
    got = {
        (r["node"], r["component"])
        for r in connected_components(edges).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }


def test_connected_components_unconverged_raises(spark):
    """A chain longer than max_iter rounds must fail loudly, never
    return a partial labeling."""
    import pytest

    from mapreduce511_spark.operators.graph import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], ["src", "dst"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=2)


def test_dedup_clusters_cover_near_dup_pairs(spark):
    """Every verified near-dup pair lands in the same cluster, and
    every cluster_id is the minimum doc_id of its members."""
    from mapreduce511_spark.queries import all_queries

    sf = "/root/testdata/sf0.001"
    q = all_queries()
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in q["minhash_near_dup"](spark, sf).collect()
    }
    clusters = q["dedup_clusters"](spark, sf).collect()
    label = {r["doc_id"]: r["cluster_id"] for r in clusters}
    for a, b in pairs:
        assert label[a] == label[b]
    by_cluster: dict[int, list[int]] = {}
    for r in clusters:
        by_cluster.setdefault(r["cluster_id"], []).append(r["doc_id"])
    for cid, members in by_cluster.items():
        assert cid == min(members)
        sizes = {
            r["cluster_size"] for r in clusters if r["cluster_id"] == cid
        }
        assert sizes == {len(members)}


def test_connected_components_random_graph_at_scale(spark):
    """30k random edges over 20k nodes (giant component + islands):
    distributed min-label propagation must agree with a driver-side
    union-find exactly, across the multi-round convergence path."""
    import numpy as np

    from mapreduce511_spark.operators.graph import connected_components

    rng = np.random.default_rng(0)
    edges = [
        (int(a), int(b))
        for a, b in rng.integers(0, 20_000, size=(30_000, 2))
    ]
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    roots: dict[int, int] = {}
    expected: dict[int, int] = {}
    nodes = {n for e in edges for n in e}
    for n in sorted(nodes):
        r = find(n)
        roots.setdefault(r, n)
        expected[n] = roots[r]

    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, max_iter=60).collect()
    }
    assert got == expected


def test_duplicate_span_removal_synthetic(spark, tmp_path):
    """Controlled corpus: doc 1 repeats doc 0's 10-token prefix (two
    8-token spans starting at positions 0 and 1 -> ONE merged island
    of 9 tokens removed from doc 1, none from keeper doc 0); doc 2 is
    all-unique. Exact accounting, keeper-kept, island merging."""
    from mapreduce511_spark.queries.text import duplicate_span_removal

    shared = " ".join(f"s{i}" for i in range(10))
    rows = [
        (0, shared + " " + " ".join(f"a{i}" for i in range(30)), "en", "t", 0),
        (1, shared + " " + " ".join(f"b{i}" for i in range(30)), "en", "t", 0),
        (2, " ".join(f"c{i}" for i in range(40)), "en", "t", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        r.doc_id: r for r in duplicate_span_removal(spark, str(tmp_path)).collect()
    }
    # only doc 1 is affected: doc 0 is the keeper, doc 2 shares nothing
    assert set(got) == {1}
    r = got[1]
    # spans at p=0..2 are shared (8-token windows inside the 10-token
    # prefix): 3 occurrences merging to one island covering p=0..9
    assert r.removed_occurrences == 3
    assert r.tokens_removed == 10
    assert r.n_tokens == 40
    assert r.tokens_kept == 30


def test_duplicate_span_removal_invariants(spark):
    """On real data: every affected doc removes between one window
    and everything; merged islands never double-count (removed <=
    8 * occurrences); kept + removed == total."""
    from mapreduce511_spark.queries.text import duplicate_span_removal
    from tests.conftest import SF_SMOKE

    rows = duplicate_span_removal(spark, SF_SMOKE).collect()
    assert rows, "sf0.001 corpus has duplicated spans"
    for r in rows:
        assert 8 <= r.tokens_removed <= r.n_tokens
        assert r.tokens_removed <= 8 * r.removed_occurrences
        assert r.tokens_kept == r.n_tokens - r.tokens_removed
        assert r.removed_occurrences >= 1
