"""Connected components over an edge list — duplicate-cluster formation.

Near-dup detection (MinHash/SimHash/Jaccard, ``operators/dedup.py``)
emits *pairs*; a real cleaning pipeline needs *clusters* (keep one
canonical document per duplicate class, drop the rest).  Pair→cluster
is connected components on the pair graph.  The reference has no graph
operator at all (its analytics are pandas groupbys over log tables,
``/root/reference/analyze/common_utils.py``); this is part of the
100 TB LLM-pipeline extension tier (SURVEY.md §7 M7).

Algorithm: iterative min-label propagation entirely in DataFrame ops —
each round every node takes the minimum label among itself and its
neighbors (one equi-join + one groupBy = two hash shuffles per round),
converging in graph-diameter rounds.  Near-dup components are band
buckets / mutually-similar groups, i.e. near-cliques with tiny
diameters (2–4), so the round count is small and independent of corpus
size; lineage is truncated every round with ``localCheckpoint`` so
plans stay flat.  For adversarial long-chain graphs at 100 TB swap the
propagation body for the large-star/small-star rounds of
Kiveris et al., "Connected Components in MapReduce and Beyond"
(SoCC'14) — O(log n) rounds on arbitrary graphs, same join/groupBy
primitives; near-dup graphs never need it.

No driver-side graph state: the driver sees only per-round convergence
counters (one scalar per iteration), never nodes or edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label each node of the undirected edge list with the minimum
    node id reachable from it.

    Returns ``DataFrame[node, component]`` covering every node that
    appears in ``edges`` (isolated nodes are the caller's concern —
    they are their own components by definition).

    Raises ``RuntimeError`` if the propagation has not converged after
    ``max_iter`` rounds: an unconverged labeling is silently wrong, so
    fail loudly instead.
    """
    # Checkpoint the raw edges FIRST: the symmetric union below reads
    # its input twice, and without this the (possibly expensive)
    # upstream plan that produced the pairs would execute once per
    # union branch.
    e0 = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    e0 = e0.localCheckpoint(eager=True)
    n_edges = e0.count()  # free: counts the checkpointed blocks
    sym = e0.union(e0.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    # Near-dup pair sets are usually tiny relative to the corpus;
    # collapse small graphs to few partitions so each propagation
    # round pays a handful of tasks, not a full shuffle fan-out.
    # Large edge lists keep their parallelism.
    target_parts = min(sym.rdd.getNumPartitions(), n_edges // 100_000 + 1)
    sym = sym.coalesce(max(1, target_parts)).localCheckpoint(eager=True)

    labels = sym.select(F.col("u").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    # Labels are monotone non-increasing per node, so sum(component)
    # strictly decreases iff any label changed — convergence costs one
    # tiny aggregate per round instead of a join against the previous
    # labeling.
    prev_sum = labels.agg(F.sum("component")).collect()[0][0]

    for _ in range(max_iter):
        # Neighbor labels: node u hears the current label of each
        # neighbor v.  Keeping the self-label via union (not an outer
        # join) preserves monotone non-increasing labels.
        neighbor = sym.join(
            labels, sym["v"] == labels["node"], "inner"
        ).select(F.col("u").alias("node"), "component")
        proposed = (
            labels.select("node", "component")
            .union(neighbor)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        # non-eager: the sum aggregate below materializes the
        # checkpoint and computes convergence in ONE job per round
        proposed = proposed.localCheckpoint(eager=False)
        new_sum = proposed.agg(F.sum("component")).collect()[0][0]
        labels = proposed
        if new_sum == prev_sum:
            return labels
        prev_sum = new_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "graph diameter exceeds the near-dup assumption — use a "
        "large-star/small-star variant for this input"
    )


def kcore(
    edges: DataFrame,
    k: int,
    src: str = "u",
    dst: str = "v",
    max_iter: int = 40,
) -> tuple[DataFrame, int]:
    """Vertices of the k-core (maximal subgraph where every vertex has
    degree >= k), by iterative peeling: drop all vertices of degree
    < k, recompute degrees on the surviving subgraph, repeat to
    fixpoint. Returns ``(DataFrame[node], rounds_used)``.

    Each round is one degree aggregate plus two hash semi-joins
    against the survivor set — all keyed on vertex id — and the edge
    relation re-checkpoints per round so lineage stays flat (the CC
    discipline above). Rounds needed = peeling depth, bounded by the
    graph's degeneracy ordering length; dense product graphs converge
    in a handful. The driver sees one scalar per round (survivor
    count), never vertices or edges.

    Raises ``RuntimeError`` on non-convergence: a partially peeled
    set is silently wrong, so fail loudly (same contract as
    ``connected_components``).
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    e = e.localCheckpoint(eager=True)
    prev_n = None
    for rounds in range(1, max_iter + 1):
        deg = (
            e.select(F.col("u").alias("x"))
            .unionAll(e.select(F.col("v").alias("x")))
            .groupBy("x")
            .agg(F.count("*").alias("d"))
        )
        keep = deg.filter(F.col("d") >= k).select("x")
        keep = keep.localCheckpoint(eager=True)
        n_keep = keep.count()  # free: counts the checkpointed blocks
        if n_keep == 0:
            return keep.select(F.col("x").alias("node")), rounds
        if prev_n is not None and n_keep == prev_n:
            return keep.select(F.col("x").alias("node")), rounds
        prev_n = n_keep
        ku = keep.select(F.col("x").alias("u"))
        kv = keep.select(F.col("x").alias("v"))
        e = (
            e.join(ku, "u", "left_semi")
            .join(kv, "v", "left_semi")
            .localCheckpoint(eager=True)
        )
    raise RuntimeError(
        f"kcore(k={k}) did not converge in {max_iter} rounds; "
        "raise max_iter for deeper peeling chains"
    )
