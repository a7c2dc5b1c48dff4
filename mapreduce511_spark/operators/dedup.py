"""Fuzzy-dedup operator family: MinHash + banded LSH, SimHash.

These are the scale paths for near-duplicate detection over the
``documents`` table (north-star extension, SURVEY.md §7 M7): the exact
n-gram-Jaccard op (``queries/similarity.py:near_dup_jaccard``) is the
correctness baseline; MinHash banding bounds the candidate set when
all-pairs-sharing-a-shingle is itself too big (hot shingles at 100 TB).

Everything is deterministic and JVM-side:

- Shingle/token hashing uses the first 15 hex chars of ``md5`` (60
  bits, fits a signed int64) so a SQL oracle (DuckDB) reproduces the
  exact same integers.
- MinHash permutations are ``(a_i * h + b_i) mod P`` with ``P =
  2^31-1`` and fixed (a_i, b_i) generated below — inlined as literals
  into both the Spark plan and the oracle SQL. ``a*h < 2^62`` so the
  arithmetic never overflows int64 in either engine.
- All signature computation is a single hash-partitioned groupBy with
  mergeable partial aggregates (one shuffle per stage, no UDFs, no
  driver collects).

100 TB posture: the band-bucket self-join shuffles only (doc_id,
band, sig) rows — 4 small rows per document — and hot buckets (all
docs sharing a band signature) are real duplicates by construction, so
bucket skew == duplicate skew. Pathological thousand-way duplicate
classes are handled by ``band_candidates(max_bucket=...)``: each
bucket keeps its ``max_bucket`` lowest doc_ids before pairing
(O(cap²) pairs per bucket), with ``band_bucket_stats`` reporting how
many buckets were capped.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mapreduce511_spark.functions.text import tokenize, word_ngrams

# MinHash parameters. P is the classic Mersenne prime 2^31-1; the
# permutation constants are fixed multiplicative-hash style values —
# arbitrary but frozen, shared verbatim by the DuckDB oracles.
MINHASH_P = 2_147_483_647
N_PERMS = 16
N_BANDS = 4
ROWS_PER_BAND = N_PERMS // N_BANDS
PERMS: list[tuple[int, int]] = [
    (
        (2_654_435_761 * (i + 1)) % MINHASH_P or 1,
        (40_503 * (i + 1) * (i + 1) + 17) % MINHASH_P,
    )
    for i in range(N_PERMS)
]

SHINGLE_WIDTH = 3  # word-trigram shingles, same as near_dup_jaccard
SIMHASH_BITS = 60  # md5-prefix hash width (fits signed int64)
SIMHASH_CHUNKS = 4  # 4 x 15-bit chunks for hamming-banded candidates
SIMHASH_CHUNK_BITS = SIMHASH_BITS // SIMHASH_CHUNKS
SIMHASH_MAX_HAMMING = 3


def hash60(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative int64 (oracle twin:
    ``CAST('0x' || substr(md5(x),1,15) AS BIGINT)``)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def doc_shingles(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct word-trigram shingles per document: (doc_id, sh).

    Tokens are bound to a projected column BEFORE the n-gram transform:
    a HOF lambda that references the raw ``tokenize()`` expression
    would re-run the whole split per array position (O(len²) per doc);
    against an attribute each slice is O(n)."""
    toks = docs.select("doc_id", tokenize(text_col).alias("toks"))
    return toks.select(
        "doc_id",
        F.explode(word_ngrams(F.col("toks"), SHINGLE_WIDTH)).alias("sh"),
    ).distinct()


def minhash_signatures_wide(shingles: DataFrame) -> DataFrame:
    """(doc_id, mh0..mh{K-1}): all K min-aggregates in ONE groupBy —
    partial aggregation happens map-side, one shuffle total."""
    h = (F.col("h60") % MINHASH_P).alias("h")
    hashed = shingles.select("doc_id", hash60(F.col("sh")).alias("h60")).select(
        "doc_id", h
    )
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % MINHASH_P).alias(f"mh{i}")
        for i, (a, b) in enumerate(PERMS)
    ]
    return hashed.groupBy("doc_id").agg(*aggs)


def minhash_signatures_long(shingles: DataFrame) -> DataFrame:
    """(doc_id, perm, minhash) — wide signatures unpivoted via stack
    (post-aggregation, so the explode touches K rows per doc, not K
    rows per shingle)."""
    wide = minhash_signatures_wide(shingles)
    stack = ", ".join(f"{i}, mh{i}" for i in range(N_PERMS))
    return wide.selectExpr(
        "doc_id", f"stack({N_PERMS}, {stack}) AS (perm, minhash)"
    )


def minhash_bands(signatures_wide: DataFrame) -> DataFrame:
    """(doc_id, band, sig): each band's signature is the '-'-joined
    run of its ROWS_PER_BAND minhash values."""
    bands = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                F.concat_ws(
                    "-",
                    *[
                        F.col(f"mh{j * ROWS_PER_BAND + r}").cast("string")
                        for r in range(ROWS_PER_BAND)
                    ],
                ).alias("sig"),
            )
            for j in range(N_BANDS)
        ]
    )
    return signatures_wide.select(
        "doc_id", F.explode(bands).alias("bs")
    ).select("doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))


def band_bucket_stats(bands: DataFrame, max_bucket: int) -> DataFrame:
    """Per-(band, sig) bucket sizes with a ``capped`` flag — the
    observability companion to ``band_candidates(max_bucket=...)``:
    ``df.filter("capped").count()`` is the capped-buckets metric, and
    the size histogram tells you whether a corpus has pathological
    duplicate classes before you pay for pairing."""
    return bands.groupBy("band", "sig").agg(
        F.count("*").alias("n_docs"),
        (F.count("*") > max_bucket).alias("capped"),
    )


def band_candidates(bands: DataFrame, max_bucket: int | None = None) -> DataFrame:
    """Distinct (doc_a, doc_b) pairs sharing >=1 band signature — the
    LSH candidate set. Self-equi-join on (band, sig); never a cross
    join.

    ``max_bucket`` caps hot buckets: every bucket keeps only its
    ``max_bucket`` lowest doc_ids (deterministic survivors) before
    pairing, so a thousand-way duplicate class costs O(max_bucket²)
    candidate pairs instead of O(n²). The cost is RECALL, not just
    precision: a doc dropped from a bucket forms no pairs from that
    bucket, and exact/near-exact duplicate classes share ALL their
    band signatures, so over-cap members are capped identically in
    every band and vanish from the candidate graph entirely —
    connected components cannot recover what never appears as a pair
    (see tools/stress_dup.py, which measures exactly this). Run exact
    dedup FIRST to collapse verbatim classes below the cap, then LSH
    for the fuzzy tail; buckets at or under the cap are untouched.
    Use ``band_bucket_stats`` for the capped-buckets metric."""
    if max_bucket is not None:
        from pyspark.sql.window import Window

        w = Window.partitionBy("band", "sig").orderBy("doc_id")
        bands = (
            bands.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= max_bucket)
            .drop("_rn")
        )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def verify_jaccard(
    candidates: DataFrame, shingles: DataFrame, keep_zero: bool = False
) -> DataFrame:
    """Exact Jaccard for candidate pairs only: join each side's shingle
    set, count intersections, divide by union. Cost is proportional to
    the candidate set, not to all pairs.

    ``keep_zero=True`` keeps candidates with an EMPTY intersection
    (jaccard 0.0) — needed by accuracy censuses that want LSH false
    positives visible; the default drops them (a near-dup filter
    discards them anyway).

    r12 (guide §2.2): the verify is one row PER CANDIDATE, not per
    (candidate x shingle). The old shape joined each pair through the
    exploded (doc_id, sh) stream — an intermediate of |cand| x
    |doc shingles| rows shuffled on (doc_b, sh) — before counting.
    Now each doc's distinct shingle set rides as ONE array row
    (collect_set of the already-distinct stream), the two doc-keyed
    equi-joins attach both sides' arrays, and the intersection is a
    map-side ``array_intersect`` — same integer |A∩B|, |A|, |B|, so
    bit-identical jaccard. Zero-intersection candidates are filtered
    (the old inner join on sh never produced them); ``keep_zero``
    keeps them, matching the old left-join + fillna path. The shuffle
    carries one array row per doc — the same bytes as the exploded
    stream in fewer, combine-free rows."""
    sets_ = shingles.groupBy("doc_id").agg(F.collect_set("sh").alias("shs"))
    sa = sets_.select(F.col("doc_id").alias("doc_a"), F.col("shs").alias("sh_a"))
    sb = sets_.select(F.col("doc_id").alias("doc_b"), F.col("shs").alias("sh_b"))
    both = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    # sets_ is one row per document — corpus-linear, so no broadcast
    # hint (hints are honored regardless of size; AQE broadcasts when
    # the side is actually small).
    scored = (
        candidates.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            both.alias("both"),
            F.size("sh_a").alias("sz_a"),
            F.size("sh_b").alias("sz_b"),
        )
    )
    if not keep_zero:
        scored = scored.filter(F.col("both") > 0)
    jac = F.col("both") / (F.col("sz_a") + F.col("sz_b") - F.col("both"))
    return scored.select("doc_a", "doc_b", jac.alias("jaccard"))


def simhash_fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """60-bit SimHash per document from term-frequency-weighted token
    hashes: bit i is set iff sum over terms of cnt * (+-1 per hash
    bit i) is positive.

    Plan shape: tokenize/explode -> per-(doc, word) counts (shuffle 1)
    -> ONE groupBy(doc_id) computing all 60 signed bit sums as
    separate conditional-sum aggregates (shuffle 2), then the 60-bit
    reassembly as a row-local expression. No bit-position explode: the
    old shape shipped 60 rows per (doc, word) through an extra
    shuffle; here the shuffle rows are fixed-width (60 longs per doc,
    map-side partially aggregated) — the same single-shuffle trick as
    ``minhash_signatures_wide``.
    """
    wc = (
        docs.select("doc_id", F.explode(tokenize(text_col)).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("cnt"))
        .select("doc_id", "cnt", hash60(F.col("w")).alias("h"))
    )
    # branch-free contribution: (2*bit - 1) * cnt — generates far less
    # bytecode than a CASE per aggregate (60 of these compile in one
    # whole-stage-codegen method; keeping each tiny matters)
    bit_sums = [
        F.sum(F.expr(f"(shiftright(h, {i}) % 2 * 2 - 1) * cnt")).alias(f"s{i}")
        for i in range(SIMHASH_BITS)
    ]
    sums_wide = wc.groupBy("doc_id").agg(*bit_sums)
    fingerprint = reduce(
        lambda acc, i: acc + F.expr(f"shiftleft(CAST(s{i} > 0 AS BIGINT), {i})"),
        range(1, SIMHASH_BITS),
        F.expr("CAST(s0 > 0 AS BIGINT)"),
    )
    return sums_wide.select("doc_id", fingerprint.alias("simhash"))


def simhash_candidates(fingerprints: DataFrame) -> DataFrame:
    """Near-dup pairs by hamming distance: band the 60-bit fingerprint
    into 4 x 15-bit chunks (pigeonhole: hamming <= 3 => some chunk is
    identical), equi-join on (chunk index, chunk value), verify with
    bit_count(xor) <= 3."""
    chunks = F.array(
        *[
            F.struct(
                F.lit(j).alias("chunk"),
                F.expr(
                    f"shiftright(simhash, {j * SIMHASH_CHUNK_BITS}) % "
                    f"{1 << SIMHASH_CHUNK_BITS}"
                ).alias("cv"),
            )
            for j in range(SIMHASH_CHUNKS)
        ]
    )
    banded = fingerprints.select(
        "doc_id", "simhash", F.explode(chunks).alias("c")
    ).select("doc_id", "simhash", F.col("c.chunk").alias("chunk"), F.col("c.cv").alias("cv"))
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.expr("bit_count(sh_a ^ sh_b)")
    return pairs.select(
        "doc_a", "doc_b", hamming.cast("int").alias("hamming")
    ).filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)


def compression_ratio(docs, text_col: str = "text", carry: tuple = ()):
    """Per-document DEFLATE compression ratio in exact integer parts
    per thousand — the corpus-quality signal production pipelines cut
    on (highly compressible text = repetitive/templated/low-entropy;
    e.g. the Gopher/RefinedWeb-family "compression ratio" rule):
    ratio_milli = 1000 * compressed_bytes / raw_bytes, computed with
    the engine's own native DEFLATE encoder (multimodal/deflate.py,
    dynamic-Huffman) inside Arrow batches where the text lives. The
    encoder is deterministic (greedy LZ77 + canonical codes), so the
    column is stable across partitionings and sessions — unlike
    linking against whatever zlib level a cluster image ships.

    Returns (doc_id, *carry, raw_bytes, comp_bytes, ratio_milli).
    Empty text reports ratio_milli = 1000 (incompressible by
    convention rather than a divide-by-zero).

    ``carry`` names extra ``docs`` columns to pass THROUGH the Arrow
    batch unchanged (r12, guide §2.3/§8: a consumer that needs e.g.
    ``lang`` next to the ratio previously re-joined the corpus on
    doc_id — a corpus-wide shuffle to re-attach bytes that were
    already in the scanned row). Carried columns must be cheap scalars
    (they ride every batch); string columns are emitted as pandas
    object dtype, matching the declared schema.

    Reference basis: extension tier — text-quality family beside
    repetition_score / gopher_quality_rules (SURVEY.md §2
    extensions)."""
    from pyspark.sql import functions as F  # noqa: F811

    carry = tuple(carry)
    carry_schema = "".join(
        f", {c} {docs.schema[c].dataType.simpleString()}" for c in carry
    )

    def batches(it):
        import pandas as pd

        from mapreduce511_spark.multimodal.deflate import deflate_dynamic

        for pdf in it:
            raw = [str(t).encode("utf-8") for t in pdf[text_col]]
            comp = [len(deflate_dynamic(b)) for b in raw]
            cols = {"doc_id": pdf["doc_id"].astype("int64")}
            for c in carry:
                cols[c] = pdf[c]
            cols["raw_bytes"] = [len(b) for b in raw]
            cols["comp_bytes"] = comp
            yield pd.DataFrame(cols)

    out = docs.select("doc_id", *carry, text_col).mapInPandas(
        batches,
        schema=f"doc_id long{carry_schema}, raw_bytes long, comp_bytes long",
    )
    ratio = F.when(F.col("raw_bytes") == 0, F.lit(1000)).otherwise(
        (1000 * F.col("comp_bytes")).cast("long") / F.col("raw_bytes")
    )
    return out.select(
        "doc_id",
        *carry,
        "raw_bytes",
        "comp_bytes",
        F.floor(ratio).cast("long").alias("ratio_milli"),
    )
