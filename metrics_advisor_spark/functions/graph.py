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

    Oracled since round 6: DuckDB's recursive CTEs allow aggregation
    over the recursive reference, so the oracle mirrors the exact
    per-iteration expression tree; for that to hash-match, the per-node
    in-rank here is a SORTED fold over (src, contrib) (deterministic at
    any parallelism — the `dim_covariance` pattern) and the final snap
    is floor-form 6dp.  The numpy power-iteration golden in tests
    remains as an independent semantic check.
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

    # Small graphs (dup graphs are pair-shaped, usually ≪ the corpus)
    # inherit the session's 32-way shuffle partitioning, so every
    # per-round join/aggregate pays ~100 task launches for a few
    # hundred rows — scheduling overhead dominated the sf0.1 bench
    # (11.1 s, ~4 s of it the edge producer).  Coalesce the iteration
    # state to a handful of partitions when the graph is small; big
    # graphs keep their natural partitioning.
    if n_nodes < 100_000:
        edges = edges.coalesce(4)
        nodes = nodes.coalesce(4)
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
                "src",
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("deg")).alias("contrib"),
            )
        )
        # deterministic in-rank: fold contributions in src order
        # ((src, dst) is unique after the edge distinct, so the sort
        # key is total) — engine-order-invariant IEEE tree
        in_rank = (
            contribs.groupBy("node")
            .agg(
                F.sort_array(
                    F.collect_list(F.struct("src", "contrib"))
                ).alias("cs")
            )
            .select(
                "node",
                F.aggregate(
                    "cs", F.lit(0.0), lambda acc, v: acc + v.contrib
                ).alias("in_rank"),
            )
        )
        ranks = (
            nodes.select("node")
            .join(
                in_rank,
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
    return ranks.select(
        "node",
        (
            F.floor(F.col("rank") * F.lit(1000000.0) + F.lit(0.5))
            / F.lit(1000000.0)
        ).alias("rank"),
    )


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

    The pair producer feeds FIVE legs (two wedge-join sides, the degree
    aggregate, edge materialization, the anti-join) — persist the edge
    and adjacency sets once or the whole upstream producer plan (for
    the contract query: explode → vocab unions → SymSpell variant
    self-join, ~12 exchanges) replays per leg (r15: 84 planned scans /
    64 exchanges collapsed to one producer pass each; same idiom as
    `triangle_count` / `clustering_coeff`).
    """
    from metrics_advisor_spark.functions.cacheutil import attach_cached

    edges = pairs.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).persist()
    adj = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct().persist()
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
    return attach_cached(
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
        ),
        edges,
        adj,
    )


def clustering_coeff(pairs: DataFrame) -> DataFrame:
    """Global clustering coefficient of a canonical (doc_a < doc_b)
    pair graph: C = 3·triangles / wedges — "when two things share a
    neighbor, how often are they directly linked"; near 1 for clean
    dup cliques, near 0 for star/chain artifacts of a bad threshold.

    Triangles via the oriented wedge join (each a<b<c counted once);
    wedges as Σ deg·(deg−1)/2 from one degree aggregate.  The pair set
    feeds three join legs — persisted once, same contract as
    `dedup.triangle_count`.
    """
    e = pairs.select("doc_a", "doc_b").persist()
    wedge = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.doc_b") == F.col("e2.doc_a"))
        .select(
            F.col("e1.doc_a").alias("a"),
            F.col("e2.doc_b").alias("c"),
        )
    )
    tri = wedge.join(
        e.alias("e3"),
        (F.col("a") == F.col("e3.doc_a")) & (F.col("c") == F.col("e3.doc_b")),
    ).agg(F.count("*").alias("n_triangles"))
    adj = e.unionByName(
        e.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    )
    deg = adj.groupBy("doc_a").agg(F.count("*").alias("deg"))
    stats = deg.agg(
        F.count("*").cast("long").alias("n_nodes"),
        F.sum(F.col("deg") * (F.col("deg") - 1) / 2)
        .cast("long")
        .alias("n_wedges"),
    )
    return (
        tri.crossJoin(e.agg(F.count("*").cast("long").alias("n_edges")))
        .crossJoin(stats)
        .select(
            "n_nodes",
            "n_edges",
            F.col("n_triangles").cast("long").alias("n_triangles"),
            "n_wedges",
            F.round(
                F.try_divide(3.0 * F.col("n_triangles"), F.col("n_wedges")),
                6,
            ).alias("global_coeff"),
        )
    )
