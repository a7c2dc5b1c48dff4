"""Distributed suffix array (operators/suffix_array.py): exact parity
vs a pure-Python construction on the real corpus, plus the ordering
primitives it builds on."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_global_row_number_is_a_permutation(spark):
    from mapreduce511_spark.operators.order import global_row_number
    from mapreduce511_spark.sources.tables import load_table

    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_linenumber"
    )
    out = global_row_number(li, ["l_orderkey", "l_linenumber"])
    rows = out.collect()
    # 1..n exactly once, and numbering follows the total order
    assert sorted(r.rn for r in rows) == list(range(1, len(rows) + 1))
    by_rn = sorted(rows, key=lambda r: r.rn)
    keys = [(r.l_orderkey, r.l_linenumber) for r in by_rn]
    assert keys == sorted(keys)


def test_global_row_number_partitions_scale_with_input(spark):
    """r10 (VERDICT r9 'What's wrong' #2): the two-pass primitive must
    size its range shuffle to the INPUT, not a hardcoded 16 — at 100 TB
    a fixed count means each executor range-sorts 1/16 of the fact
    table. A wide input (64 partitions) must produce >= 64 range
    partitions; a narrow input keeps the 16-partition floor; an
    explicit count still wins."""
    from pyspark.sql import functions as F

    from mapreduce511_spark.operators.order import (
        _MIN_RANGE_PARTITIONS,
        _sized_partitions,
        global_row_number,
    )

    wide = spark.range(0, 1000, 1, 64).withColumn("v", F.col("id") % 97)
    assert _sized_partitions(wide, None) == 64
    narrow = spark.range(0, 100, 1, 2)
    assert _sized_partitions(narrow, None) == _MIN_RANGE_PARTITIONS
    assert _sized_partitions(wide, 5) == 5
    # the sizing actually reaches the plan: the materialized numbering
    # frame carries one partition id per range partition (empty ranges
    # may collapse, so >= half the requested width is the robust bound)
    out = global_row_number(wide, ["v", "id"])
    n_pids = out.select(F.spark_partition_id()).distinct().count()
    assert n_pids >= 32, n_pids
    rows = out.collect()
    assert sorted(r.rn for r in rows) == list(range(1, 1001))


def test_dense_rank_global_matches_python(spark):
    from mapreduce511_spark.operators.order import dense_rank_global
    from mapreduce511_spark.sources.tables import load_table

    ev = load_table(spark, SF_SMOKE, "events").select("event_type")
    out = dense_rank_global(ev, ["event_type"]).collect()
    types = sorted({r.event_type for r in out})
    expect = {t: i for i, t in enumerate(types)}
    assert all(r.rank == expect[r.event_type] for r in out)


def test_global_ntile_matches_sql_ntile(spark):
    """The closed-form remainder rule must reproduce SQL ntile
    EXACTLY — including the part the naive floor(rn*k/n) formula gets
    wrong: the first n mod k buckets take ceil(n/k) rows, the rest
    floor(n/k). Checked against Spark's own F.ntile (the ground
    truth the r9 retrofits replaced) across remainder shapes and a
    descending order."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from mapreduce511_spark.operators.order import global_ntile

    for n, k in [(10, 4), (12, 4), (13, 5), (7, 3), (3, 5), (1, 4)]:
        df = spark.range(n).withColumn("v", (F.col("id") * 7) % n)
        want = {
            (r.id, r.tile)
            for r in df.select(
                "id",
                F.ntile(k)
                .over(Window.orderBy(F.desc("v"), F.asc("id")))
                .alias("tile"),
            ).collect()
        }
        got = {
            (r.id, r.tile)
            for r in global_ntile(
                df, [F.col("v").desc(), F.col("id").asc()], k
            ).collect()
        }
        assert got == want, (n, k)


def _python_suffix_array(tokens: list[str]) -> list[int]:
    return sorted(range(len(tokens)), key=lambda i: tokens[i:])


def test_suffix_array_matches_python_on_real_corpus(spark):
    """Full construction parity on a real slice of the documents
    table: the prefix-doubling ranks must order suffixes exactly as a
    pure-Python suffix sort of the same token stream (string order is
    code-point order in both engines for the UTF-8 corpus)."""
    from pyspark.sql import functions as F

    from mapreduce511_spark.operators.suffix_array import (
        build_suffix_array,
        corpus_positions,
    )
    from mapreduce511_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents").filter(
        F.col("doc_id") < 60
    )
    pos = corpus_positions(docs).localCheckpoint(eager=True)
    sa = build_suffix_array(pos)
    got = [r.pos - 1 for r in sa.orderBy("sa").collect()]  # pos is 1-based
    toks = [r.token for r in sorted(pos.collect(), key=lambda r: r.pos)]
    assert got == _python_suffix_array(toks)


def test_suffix_array_never_crosses_documents(spark):
    """Per-document sentinels must make every rank distinct (the
    construction would raise otherwise) and keep each document's
    final suffix a single sentinel token — no suffix logically
    extends into the next document."""
    from pyspark.sql import functions as F

    from mapreduce511_spark.operators.suffix_array import (
        build_suffix_array,
        corpus_positions,
    )
    from mapreduce511_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents").filter(
        F.col("doc_id") < 30
    )
    pos = corpus_positions(docs).localCheckpoint(eager=True)
    sa = build_suffix_array(pos)  # raises if ranks don't converge
    n = pos.count()
    assert sa.select("sa").distinct().count() == n
    # sentinels are unique: one per doc, token starts with \x01
    sent = pos.filter(F.col("token").startswith("\x01"))
    assert sent.count() == docs.count()
    assert sent.select("token").distinct().count() == docs.count()


def test_repeated_phrases_finds_planted_duplicate(spark):
    """Plant an 8-word phrase in three synthetic documents: it must
    surface as the top repeated phrase with LCP >= 8 (capped at the
    max_lcp window), found via suffix-array adjacency."""
    from mapreduce511_spark.operators.suffix_array import (
        build_suffix_array,
        corpus_positions,
        repeated_phrases,
    )

    phrase = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, f"one two {phrase} three four"),
        (1, f"five {phrase} six seven eight"),
        (2, f"{phrase} nine ten"),
        (3, "unrelated words only here nothing repeats much"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pos = corpus_positions(docs).localCheckpoint(eager=True)
    sa = build_suffix_array(pos)
    top = repeated_phrases(pos, sa, max_lcp=8, topk=3).collect()
    assert top[0].lcp == 8
    assert top[0].head.startswith("alpha beta gamma")


def test_dense_rank_global_keeps_null_keys(spark):
    """r9 ADVICE: the rank join-back is null-safe — rows with NULL
    key values keep a rank (NULLS FIRST order) instead of vanishing
    through plain equi-join NULL != NULL semantics."""
    from mapreduce511_spark.operators.order import dense_rank_global

    df = spark.createDataFrame(
        [("b",), (None,), ("a",), (None,), ("b",)], "k string"
    )
    out = dense_rank_global(df, ["k"]).collect()
    assert len(out) == 5  # no row dropped
    by_key = {r.k: r.rank for r in out}
    assert by_key[None] == 0  # NULLS FIRST, dense from 0
    assert by_key["a"] == 1 and by_key["b"] == 2


def test_suffix_array_artifact_durable_across_processes(spark):
    """r10 (VERDICT r9 item 1): the finished (positions, sa) must be a
    cross-session parquet artifact with the ANN sidecar discipline — a
    fresh process (simulated by clearing the in-process memo) finding
    sidecar + _SUCCESS markers RELOADS the artifact (same part files,
    no rewrite, no rebuild) instead of repaying the multi-round build
    and racing concurrent readers. The memo itself is bounded: one
    entry per (documents path, SparkSession), latest snapshot only."""
    import glob
    import os

    from pyspark.sql import functions as F

    from mapreduce511_spark.queries import suffix

    pos1, sa1 = suffix._corpus_sa(spark, SF_SMOKE)
    checks1 = sa1.agg(
        F.count("*").alias("n"),
        F.sum(F.col("sa") * F.col("pos")).alias("x"),
    ).first()
    path = os.path.abspath(os.path.join(SF_SMOKE, "documents.parquet"))
    st = os.stat(path)
    art = suffix._sa_artifact_path(
        spark, (path, st.st_mtime_ns, st.st_size)
    )
    assert suffix._sa_artifact_complete(art)
    files1 = sorted(glob.glob(f"{art}/**/*.parquet", recursive=True))
    assert files1
    mtimes1 = [os.stat(f).st_mtime_ns for f in files1]
    # memo bounded: exactly one entry for this (path, app) regardless
    # of how many times the family has run
    suffix._corpus_sa(spark, SF_SMOKE)
    keys = [k for k in suffix._SA_MEMO if k[0] == path]
    assert len(keys) == 1 and keys[0][1] == spark.sparkContext.applicationId
    # simulate a brand-new process: in-memory memo gone
    suffix._SA_MEMO.clear()
    pos2, sa2 = suffix._corpus_sa(spark, SF_SMOKE)
    files2 = sorted(glob.glob(f"{art}/**/*.parquet", recursive=True))
    assert files2 == files1  # reused, not rewritten...
    assert [os.stat(f).st_mtime_ns for f in files2] == mtimes1  # ...untouched
    checks2 = sa2.agg(
        F.count("*").alias("n"),
        F.sum(F.col("sa") * F.col("pos")).alias("x"),
    ).first()
    assert (checks2.n, checks2.x) == (checks1.n, checks1.x)
    assert pos2.count() == pos1.count()


def test_sa_artifact_retention_keeps_latest_per_corpus(spark):
    """r11 (VERDICT r10 item 6): each corpus rewrite used to mint a
    new content-fingerprinted ``sa_<tag>`` dir forever. The build
    path now retires sibling artifacts whose sidecar declares the
    SAME source corpus — and only those: artifacts of other corpora
    and pre-r11 artifacts without a source field are untouched."""
    import os
    import shutil

    from mapreduce511_spark.operators.ann import write_model_sidecar
    from mapreduce511_spark.queries import suffix

    suffix._corpus_sa(spark, SF_SMOKE)  # current artifact exists
    path = os.path.abspath(os.path.join(SF_SMOKE, "documents.parquet"))
    st = os.stat(path)
    art = suffix._sa_artifact_path(
        spark, (path, st.st_mtime_ns, st.st_size)
    )
    root = os.path.dirname(art)
    stale = os.path.join(root, "sa_" + "0" * 16)
    other = os.path.join(root, "sa_" + "1" * 16)
    legacy = os.path.join(root, "sa_" + "2" * 16)
    for d, model in (
        (stale, {"n_positions": 1, "source": path}),
        (other, {"n_positions": 1, "source": "/elsewhere/documents.parquet"}),
        (legacy, {"n_positions": 1}),
    ):
        os.makedirs(d, exist_ok=True)
        write_model_sidecar(d, model)
    try:
        # force the BUILD path (retention runs after a fresh publish)
        shutil.rmtree(art)
        suffix._SA_MEMO.clear()
        suffix._corpus_sa(spark, SF_SMOKE)
        assert suffix._sa_artifact_complete(art)
        assert not os.path.exists(stale), "same-corpus stale kept"
        assert os.path.exists(other), "other corpus retired"
        assert os.path.exists(legacy), "pre-r11 artifact retired"
    finally:
        shutil.rmtree(other, ignore_errors=True)
        shutil.rmtree(legacy, ignore_errors=True)
        shutil.rmtree(stale, ignore_errors=True)
