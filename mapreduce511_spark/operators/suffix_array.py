"""Distributed word-level suffix array via PREFIX DOUBLING — the
exact-substring-duplication primitive (Manber–Myers 1990; the
construction Lee et al. 2022's "Deduplicating Training Data Makes
Language Models Better" builds its suffix-array pipeline on).

The engine's ``duplicate_span_removal`` finds repeated spans through
fixed-width hashes; a suffix array is the EXACT, width-free
primitive: after construction, every maximal repeated phrase in the
corpus is a neighborhood of adjacent suffixes sharing a long common
prefix. Prefix doubling is the classic distributed construction —
O(log n) rounds, each round a pos+2^k self-equi-join plus a dense
re-rank, all hash-shuffle primitives:

    rank_0[p]   = dense rank of token[p]
    rank_{k+1}[p] = dense rank of (rank_k[p], rank_k[p + 2^k])

Ranks converge to a permutation (the suffix array) once all values
are distinct; per-document UNIQUE SENTINEL tokens terminate every
document so suffixes never compare across document boundaries, which
also bounds convergence at ~log2(max doc length) rounds rather than
log2(corpus length).

Dense re-ranking uses ``operators.order.dense_rank_global`` (distinct
keys -> two-pass range-partitioned row numbers -> hash-join back):
nothing in the construction sorts globally in one partition, holds
more than one round's ranks, or keeps driver state beyond the <=P-row
offset lists — the same recipe at 1000 executors is the published
large-scale SA construction. Per-round ``localCheckpoint`` truncates
lineage exactly like the connected-components / PageRank loops.

Reference basis: extension tier — dedup family primitive (SURVEY.md
§2 extensions); no analog in /root/reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduce511_spark.operators.order import dense_rank_global, global_row_number


def corpus_positions(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(pos, doc_id, off, token) for the concatenated corpus: tokens
    in (doc_id, offset) order, one UNIQUE sentinel token appended per
    document (chr(1) + doc_id — compares below every real token and
    equals no other sentinel), positions globally dense via the
    two-pass row-number recipe."""
    from mapreduce511_spark.functions.text import tokenize

    toks = docs.select(
        "doc_id",
        F.concat(
            tokenize(text_col),
            F.array(F.concat(F.lit("\x01"), F.col("doc_id").cast("string"))),
        ).alias("toks"),
    ).select(
        "doc_id", F.posexplode("toks").alias("off", "token")
    )
    return global_row_number(
        toks, ["doc_id", "off"], out_col="pos"
    ).select("pos", "doc_id", "off", "token")


def build_suffix_array(
    positions: DataFrame, max_rounds: int = 20
) -> DataFrame:
    """Prefix-doubling construction over ``corpus_positions`` output.
    Returns (sa, pos, doc_id, off): ``sa`` is the 0-based rank of the
    suffix starting at ``pos`` in lexicographic token order — i.e.
    ordering by ``sa`` gives the suffix array. Raises loudly if ranks
    fail to become distinct within ``max_rounds`` doublings (cannot
    happen with per-document sentinels and max_rounds >= log2 of the
    longest document)."""
    n = positions.count()
    ranks = (
        dense_rank_global(
            positions.select("pos", "token"), ["token"], out_col="rank"
        )
        .select("pos", "rank")
        .localCheckpoint(eager=True)
    )
    k = 1
    for _ in range(max_rounds):
        n_distinct = ranks.agg(
            F.countDistinct("rank").alias("d")
        ).first()["d"]
        if n_distinct == n:
            break
        shifted = ranks.select(
            (F.col("pos") - k).alias("pos"), F.col("rank").alias("nrank")
        )
        keyed = (
            ranks.join(shifted, "pos", "left")
            .fillna(-1, subset=["nrank"])
        )
        ranks = (
            dense_rank_global(keyed, ["rank", "nrank"], out_col="nr")
            .select("pos", F.col("nr").alias("rank"))
            .localCheckpoint(eager=True)
        )
        k *= 2
    else:
        raise RuntimeError(
            f"suffix-array ranks not distinct after {max_rounds} "
            "doublings — input lacks unique terminators?"
        )
    return (
        positions.join(ranks, "pos")
        .select(F.col("rank").alias("sa"), "pos", "doc_id", "off")
    )


def adjacent_lcp(
    positions: DataFrame, sa: DataFrame, max_lcp: int = 12
) -> DataFrame:
    """LCP (longest common prefix, in tokens, capped at ``max_lcp``)
    of every ADJACENT suffix pair in suffix-array order — the kernel
    both ``repeated_phrases`` and the exact duplicate-span census
    share. Returns (pos, pos_b, lcp, pref): the two suffix start
    positions, their capped LCP, and the first suffix's token window.

    Adjacency is sufficient: a suffix's longest common prefix with
    ANY other suffix is achieved by one of its suffix-array
    neighbors, so per-position maxima over these pairs give the exact
    (capped) repeat lengths. The cap keeps the gather an equi-join of
    ``max_lcp`` fan-out rather than a full-suffix comparison; unique
    per-document sentinels mean true LCPs never cross a document, so
    any cap >= the span threshold of interest loses nothing."""
    # first max_lcp tokens of the suffix at each pos, gathered through
    # an EQUI-join (pos+i fan-out), never a range join: a non-equi
    # pos-window join would plan BroadcastNestedLoopJoin over the
    # whole corpus
    expanded = (
        sa.select("sa", "pos")
        .select(
            "sa",
            "pos",
            F.explode(F.sequence(F.lit(0), F.lit(max_lcp - 1))).alias("i"),
        )
        .withColumn("tp", F.col("pos") + F.col("i"))
        .join(
            positions.select(
                F.col("pos").alias("tp"), F.col("token").alias("t")
            ),
            "tp",
        )
        .groupBy("sa", "pos")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("i", "t"))
            ).alias("pref")
        )
        .select("sa", "pos", F.col("pref.t").alias("pref"))
    )
    nxt = expanded.select(
        (F.col("sa") - 1).alias("sa"),
        F.col("pos").alias("pos_b"),
        F.col("pref").alias("pref_b"),
    )
    pairs = expanded.join(nxt, "sa")
    # LCP = index of first mismatch in the zipped prefix arrays
    # (zip_with pads the shorter array with nulls; null <=> token is
    # false, so the pad is a mismatch — exactly suffix comparison).
    # array_position returns 0 when there is NO mismatch: both
    # prefixes agree over the whole window -> LCP = shorter length.
    first_false = F.expr(
        "array_position(zip_with(pref, pref_b, (a, b) -> a <=> b), false)"
    )
    lcp = F.when(
        first_false == 0,
        F.least(F.size("pref"), F.size("pref_b")).cast("long"),
    ).otherwise(first_false - 1)
    return pairs.select("pos", "pos_b", lcp.alias("lcp"), "pref")


def repeated_phrases(
    positions: DataFrame,
    sa: DataFrame,
    max_lcp: int = 12,
    topk: int = 20,
    al: DataFrame | None = None,
) -> DataFrame:
    """Top-k longest repeated word sequences: adjacent suffixes in
    suffix-array order share their longest common prefix with some
    OTHER corpus position by construction, so the corpus-wide longest
    repeats are exactly the largest adjacent-pair LCPs (capped at
    ``max_lcp``). Top-k via TakeOrdered (orderBy+limit)."""
    if al is None:
        al = adjacent_lcp(positions, sa, max_lcp=max_lcp)
    return (
        al
        .select(
            "pos",
            "pos_b",
            "lcp",
            F.array_join(F.slice("pref", 1, 6), " ").alias("head"),
        )
        .filter(F.col("lcp") >= 2)
        .orderBy(F.desc("lcp"), F.asc("pos"))
        .limit(topk)
    )
