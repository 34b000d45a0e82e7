"""Connected components — the clustering stage of fuzzy dedup.

Pairwise near-duplicate detectors (``text_dedup.minhash_near_duplicates``,
``simhash_near_duplicates``, the embedding-cosine pairs) emit EDGES; a
production dedup pipeline must then group transitively-connected docs and
keep one representative per group.  The reference has no analog (its only
dedup is the keyed keep-last upsert, reference ``lambda.py:179-181``);
this is part of the LLM-pipeline extension surface.

Algorithm: alternating **large-star / small-star** (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — the standard
shuffle-based CC algorithm:

- *large-star*: every node points its LARGER neighbors at its smallest
  known neighbor (or itself);
- *small-star*: every node points its smaller-or-equal neighbors at its
  smallest neighbor.

Each round is two hash shuffles over the edge set; edges shrink toward
star graphs centered on each component's minimum id, converging in
O(log n) rounds on real graphs (vs O(diameter) for naive label
propagation).  All state stays distributed — no driver-side union-find;
the only driver traffic is one count per round for the convergence
check, and lineage is cut with ``localCheckpoint`` each round so plans
don't grow exponentially.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .materialize import materialize


def _canonical_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected edge list → canonical (u < v) pairs, self-loops and
    duplicates dropped."""
    e = edges.select(
        F.least(F.col(src), F.col(dst)).alias("u"),
        F.greatest(F.col(src), F.col(dst)).alias("v"),
    )
    return e.filter(F.col("u") != F.col("v")).distinct()


def _large_star(e: DataFrame) -> DataFrame:
    # Neighborhood of each node including itself; larger neighbors
    # re-point at the minimum.
    nbrs = e.select(F.col("u").alias("a"), F.col("v").alias("b")).unionAll(
        e.select(F.col("v").alias("a"), F.col("u").alias("b"))
    )
    m = nbrs.groupBy("a").agg(F.min("b").alias("mn"))
    m = m.withColumn("mn", F.least("a", "mn"))
    joined = nbrs.join(m, "a")
    return (
        joined.filter(F.col("b") > F.col("a"))
        .select(F.col("mn").alias("u"), F.col("b").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    # Orient edges toward the smaller endpoint, then point all
    # smaller-or-equal neighbors at the minimum.
    oriented = e.select(
        F.greatest("u", "v").alias("a"), F.least("u", "v").alias("b")
    )
    m = oriented.groupBy("a").agg(F.min("b").alias("mn"))
    joined = oriented.join(m, "a")
    out = joined.select(
        F.col("mn").alias("u"), F.col("b").alias("v")
    ).unionAll(joined.select(F.col("mn").alias("u"), F.col("a").alias("v")))
    return out.filter(F.col("u") != F.col("v")).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Resolve an undirected edge list into components.

    Returns ``(node, component)`` where ``component`` is the smallest
    node id in the node's component.  Isolated nodes (absent from the
    edge list) are the caller's to union in — this operator only sees
    edges.
    """
    def _sig(df):
        # One-job set signature: (count, XOR of per-edge hashes) —
        # order-independent, overflow-free (xor, unlike sum, can't trip
        # ANSI arithmetic).  Equal signatures on distinct sets ⇒ equal
        # sets up to a 2^-64 hash collision — replaces a full exceptAll
        # anti-join per round.
        r = df.agg(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64("u", "v")).alias("h"),
        ).first()
        return (r["n"], r["h"])

    e = materialize(_canonical_edges(edges, src, dst))
    sig = _sig(e)
    for _ in range(max_iter):
        e2 = materialize(_small_star(_large_star(e)))
        # Converged when the edge set is stable: every edge then links a
        # node directly to its component minimum (a star graph).
        sig2 = _sig(e2)
        e = e2
        if sig2 == sig:
            break
        sig = sig2
    else:
        # Exiting on round count without a stable edge set would
        # silently project HALF-contracted stars: one component's nodes
        # map to several non-minimum "component" ids, and a dedup
        # caller keeps multiple representatives of one duplicate
        # cluster.  Star contraction converges in O(log n) rounds, so
        # hitting this means the ceiling is simply too low for the
        # graph — raise with the knob instead of returning wrong ids.
        raise ValueError(
            f"connected_components did not converge within "
            f"{max_iter} rounds; raise max_iter"
        )
    comp = e.select(F.col("v").alias("node"), F.col("u").alias("component"))
    roots = e.select(F.col("u").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    return comp.unionByName(roots).groupBy("node").agg(
        F.min("component").alias("component")
    )


def dedup_groups_from_pairs(
    pairs: DataFrame,
    all_ids: DataFrame,
    id_col: str,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Full dedup grouping: near-dup pairs + the id universe →
    ``(id, group_id, is_representative)``.  Representative = smallest id
    in the component; singletons are their own group."""
    comp = connected_components(pairs, src=src, dst=dst)
    out = all_ids.select(F.col(id_col).alias("node")).join(
        comp, "node", "left"
    )
    return out.select(
        F.col("node").alias(id_col),
        F.coalesce("component", "node").alias("group_id"),
        (F.coalesce("component", "node") == F.col("node")).alias(
            "is_representative"
        ),
    )


#: Session conf: largest node count for which the per-iteration rank
#: table is BROADCAST into the contribution join.  Sizing is for the
#: RETAINED set, not one relation: every checkpoint segment (4
#: iterations by default) nests ~2 broadcasts per iteration (ranks in,
#: sums out), all live on the driver and every executor until the
#: segment's job completes — so the budget is ~8 simultaneous
#: HashedRelations of ~50-100 B/node each.  The 500k default keeps
#: that worst case in the low hundreds of MB (the §3.1 "few hundred
#: MB is fine" band); graphs past it fall back to the shuffle-join
#: loop, which scales to any node count.  Raise it on executors with
#: room — the knob trades memory for never shuffling the edge
#: relation.
PAGERANK_BROADCAST_NODES_KEY = "spark.graft.pagerank.broadcastNodes"
PAGERANK_BROADCAST_NODES_DEFAULT = 500_000


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Fixed-iteration PageRank over an undirected edge list — the
    iterative-dataflow workload (Page et al. '99; the canonical Pregel/
    GraphX example) expressed as a loop of join + hash-aggregate plans.

    Per iteration: every node sends rank/degree to each neighbor,
    contributions hash-agg per receiver (map-side combined), and rank
    becomes ``(1-d)/N + d * Σ contribs``.  On the edge-induced
    undirected graph every node has degree >= 1, so no rank mass
    dangles.  Loop-invariant state is computed ONCE: the neighbor
    relation and the degree table are materialized before the loop
    (previously ``deg`` — and ``N`` twice — were re-derived from
    ``nbrs`` inside every iteration's plan: ~3 extra hash-agg
    exchanges per round), and N folds into the rank literals off the
    same count that sizes the join-strategy decision.

    Join strategy (the round-13 rework): the rank table is
    node-sized — orders of magnitude smaller than the edge relation —
    so while ``count(nodes)`` ≤ ``spark.graft.pagerank.broadcastNodes``
    (default 500k — sized for the ~8 HashedRelations a checkpoint
    segment retains at once, see the constant's comment) each
    iteration BROADCASTS ranks into
    the contribution join and the contribution sums back into the
    degree join.  The edge relation is then never shuffled or sorted
    after its one materialization: an iteration costs one map-side
    broadcast-hash probe over the checkpointed ``nbrs`` plus a single
    node-sized exchange for the receiver aggregate (measured at
    sf0.1/local[32]: 9.5 s → ~2 s steady-state; the old loop paid a
    full SortMergeJoin — re-shuffle + re-sort of the checkpointed,
    partitioning-blind ``nbrs`` — every round).  Past the threshold
    the loop degrades to exactly the old shuffle-join formulation, so
    billion-node graphs keep working; the knob is a session conf, not
    a constant tuned to this box.

    Lineage is cut with :func:`materialize` every ``checkpoint_every``
    iterations (same policy as :func:`connected_components`): plans
    stay iteration-depth bounded, and the durable-checkpoint session
    switch applies for executor-loss recovery on real clusters.

    Returns (node, deg, rank)."""
    e = _canonical_edges(edges, src, dst)
    # Materialize the neighbor relation ONCE: every iteration (and
    # every checkpoint-separated job) then reads the materialized
    # partitions instead of re-executing the upstream edge derivation
    # (often a distinct + self-join) per round — the difference
    # between O(iters) edge rebuilds and one.
    nbrs = materialize(
        e.select(F.col("u").alias("a"), F.col("v").alias("b"))
        .unionAll(e.select(F.col("v").alias("a"), F.col("u").alias("b")))
        .repartition("a")
    )
    # Loop-invariant degree table, pinned once (node-sized).
    deg = materialize(nbrs.groupBy("a").agg(F.count("*").alias("deg")))
    # One count over the pinned degree table serves both the
    # (1-d)/N rank literal and the broadcast-vs-shuffle decision.
    # This is a metadata-sized driver scalar (a count, not data).
    n_nodes = deg.count()
    spark = edges.sparkSession
    bc_max = int(
        spark.conf.get(
            PAGERANK_BROADCAST_NODES_KEY,
            str(PAGERANK_BROADCAST_NODES_DEFAULT),
        )
    )
    small = 0 < n_nodes <= bc_max
    # Same double arithmetic as the old broadcast-N form — division by
    # the double node count, constant-folded by catalyst (a reciprocal
    # multiply could differ in the last ulp).
    n_dbl = F.lit(float(n_nodes)) if n_nodes else F.lit(1.0)
    ranks = deg.select(
        "a", "deg", (F.lit(1.0) / n_dbl).alias("rank")
    )
    for i in range(n_iter):
        contrib = nbrs.join(
            F.broadcast(ranks) if small else ranks, "a"
        ).select(F.col("b"), (F.col("rank") / F.col("deg")).alias("_c"))
        s = contrib.groupBy("b").agg(F.sum("_c").alias("_m"))
        ranks = (
            deg.join(
                F.broadcast(s) if small else s,
                deg["a"] == s["b"],
                "left",
            )
            .select(
                "a",
                "deg",
                (
                    F.lit(1.0 - damping) / n_dbl
                    + F.lit(damping) * F.coalesce(F.col("_m"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < n_iter:
            ranks = materialize(ranks)
    return ranks.select(F.col("a").alias("node"), "deg", "rank")
