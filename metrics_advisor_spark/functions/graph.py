"""Graph analytics over dedup pair graphs.

The near-dup producers (LSH bands, pigeonhole blocks, SRP buckets —
functions/dedup.py, functions/similarity.py) emit canonical (doc_a <
doc_b) pair sets.  These operators treat that pair set as a graph:
`triangle_count` (functions/dedup.py) audits its cohesion, and
`pagerank` here ranks nodes by dup-graph centrality — a useful keeper-
selection signal (keep the most-connected representative of a dup
cluster, drop satellites).

Iterative DataFrame loops MUST cut lineage per round with
localCheckpoint (ROUND_NOTES round-4: Catalyst re-analysis of a
nesting plan goes superlinear even on tiny data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    pairs: DataFrame,
    damping: float = 0.85,
    iterations: int = 10,
    checkpoint_interval: int = 2,
) -> DataFrame:
    """PageRank over an undirected canonical pair graph.

    The (doc_a < doc_b) pairs are symmetrized into directed edges both
    ways; each node's rank splits evenly across its neighbours
    (undirected random walk with damping).  Fixed iteration count —
    deterministic output, no convergence RNG.

    Scale: per round, ONE join (ranks × out-edges, both keyed on the
    node id) and one aggregate — the classic message-passing shape.
    Degree skew is inherited from the pair producer, which caps bucket
    sizes upstream; `localCheckpoint` per round keeps round N's plan
    O(1) instead of O(N) (measured superlinear otherwise).

    Not oracle-expressible (aggregation inside recursion); covered by a
    numpy power-iteration golden in tests.
    """
    edges = (
        pairs.select(
            F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
        )
        .unionByName(
            pairs.select(
                F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
            )
        )
        .distinct()
        .persist()
    )
    degrees = edges.groupBy("src").agg(F.count("*").alias("deg"))
    nodes = degrees.select(F.col("src").alias("node"), "deg").persist()
    n_nodes = nodes.count()  # also materializes edges/nodes
    if n_nodes == 0:
        return nodes.select(
            "node", F.lit(0.0).alias("rank")
        )

    ranks = nodes.select(
        "node", (F.lit(1.0) / n_nodes).alias("rank")
    ).localCheckpoint(eager=True)
    base = (1.0 - damping) / n_nodes
    for it in range(iterations):
        contribs = (
            edges.join(
                ranks.withColumnRenamed("node", "src"), "src"
            )
            .join(nodes.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("deg")).alias("contrib"),
            )
        )
        ranks = (
            nodes.select("node")
            .join(
                contribs.groupBy("node").agg(
                    F.sum("contrib").alias("in_rank")
                ),
                "node",
                "left",
            )
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce("in_rank", F.lit(0.0))
                ).alias("rank"),
            )
        )
        # cut lineage every `checkpoint_interval` rounds (and on the
        # last): plan depth stays O(interval), materializations halve
        if (it + 1) % checkpoint_interval == 0 or it == iterations - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", F.round("rank", 6).alias("rank"))


def adamic_adar(pairs: DataFrame) -> DataFrame:
    """Adamic–Adar link prediction over an undirected pair graph:
    for every NON-adjacent pair (a, b) sharing ≥1 neighbor,
    AA(a,b) = Σ_{z ∈ N(a)∩N(b)} 1/ln(deg z) — rare shared neighbors
    count more.  On a dedup graph this surfaces "probably the same
    cluster, edge missed by the verifier" candidates.

    Plan: two joins through the shared neighbor z (adjacency is
    edge-shaped, never a node cross-product), one degree aggregate
    broadcast-joined on z, an anti-join to drop existing edges.  A
    common neighbor has degree ≥2 by construction, so ln(deg) > 0.
    Hub nodes are the skew risk (a degree-d hub contributes d² candidate
    pairs) — cap or drop top-degree nodes upstream for hub-heavy graphs.
    """
    edges = pairs.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    )
    adj = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()
    deg = adj.groupBy("v").agg(F.count("*").alias("deg"))
    cand = (
        adj.select(F.col("u").alias("a"), F.col("v").alias("z"))
        .join(
            adj.select(F.col("u").alias("z"), F.col("v").alias("b")),
            "z",
        )
        .where(F.col("a") < F.col("b"))
    )
    scored = (
        cand.join(F.broadcast(deg.select(F.col("v").alias("z"), "deg")), "z")
        .groupBy("a", "b")
        .agg(
            F.count("*").cast("long").alias("n_common"),
            F.round(F.sum(1.0 / F.log(F.col("deg"))), 6).alias("aa_score"),
        )
    )
    return (
        scored.join(
            edges.select(
                F.col("u").alias("a"), F.col("v").alias("b")
            ),
            ["a", "b"],
            "left_anti",
        )
        .select(
            F.col("a").alias("doc_a"), F.col("b").alias("doc_b"),
            "n_common", "aa_score",
        )
    )
