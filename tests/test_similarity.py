"""Embedding similarity search: brute-force exactness + LSH behavior."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from metrics_advisor_spark.functions.similarity import (
    brute_force_topk,
    embedding_near_dup_pairs,
    lsh_topk,
    srp_buckets,
)

DIM = 16
N = 60


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(42)
    base = rng.normal(0, 1, (N, DIM)).astype(np.float32)
    base[1] = base[0] + rng.normal(0, 0.01, DIM).astype(np.float32)  # near dup of 0
    rows = [(i, [float(x) for x in base[i]]) for i in range(N)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df.cache(), base


def test_brute_force_matches_numpy(vectors):
    df, base = vectors
    q = df.filter(F.col("vec_id") == 0)
    got = brute_force_topk(q, df, k=5).orderBy("rank").collect()
    norm = base / np.linalg.norm(base, axis=1, keepdims=True)
    sims = norm @ norm[0]
    sims[0] = -np.inf  # self excluded
    want = np.argsort(-sims)[:5]
    assert [r["vec_id"] for r in got] == list(want)
    assert abs(got[0]["cosine"] - sims[want[0]]) < 1e-5
    assert got[0]["vec_id"] == 1  # the planted near-dup


def test_srp_buckets_deterministic_and_neardup_collide(vectors):
    df, _ = vectors
    b1 = {(r["vec_id"], r["table_id"]): r["bucket"]
          for r in srp_buckets(df, n_tables=2).collect()}
    b2 = {(r["vec_id"], r["table_id"]): r["bucket"]
          for r in srp_buckets(df, n_tables=2).collect()}
    assert b1 == b2
    for t in (0, 1):  # nearly-identical vectors share all plane signs
        assert b1[(0, t)] == b1[(1, t)]
    assert all(0 <= v < 2**8 for v in b1.values())


def test_lsh_topk_finds_planted_neighbor(vectors):
    df, _ = vectors
    q = df.filter(F.col("vec_id") == 0)
    got = lsh_topk(q, df, k=3).orderBy("rank").collect()
    assert got and got[0]["vec_id"] == 1


def test_embedding_near_dup_pairs(vectors):
    df, _ = vectors
    pairs = {(r["vec_a"], r["vec_b"]): r["cosine"]
             for r in embedding_near_dup_pairs(df, threshold=0.95).collect()}
    assert (0, 1) in pairs
    assert pairs[(0, 1)] > 0.99


def test_embedding_near_dup_split_route_matches_exact(vectors):
    """r11 auto-route (VERDICT r10 item 4): forcing every bucket
    through the cluster-then-cap split path (bucket_split_above=2,
    i.e. any bucket with >2 vectors is k-means-split) must recover the
    same pair set as the exact gram path on this corpus — the planted
    near-dup pair survives the sub-cell split because multi-probe
    membership keeps near-identical vectors together, and emitted
    cosines are bit-identical since the authoritative SQL re-check is
    shared.  Deterministic: fixed k-means seed over id-sorted input."""
    df, _ = vectors
    exact = {(r["vec_a"], r["vec_b"]): r["cosine"]
             for r in embedding_near_dup_pairs(df, threshold=0.95).collect()}
    split = {(r["vec_a"], r["vec_b"]): r["cosine"]
             for r in embedding_near_dup_pairs(
                 df, threshold=0.95, bucket_split_above=2,
                 sub_cell_target=4,
             ).collect()}
    assert split == exact


def test_lsh_recall_vs_bruteforce(vectors):
    """Multi-table SRP recall on top-3: approximate, but with 8 tables ×
    4 bits a meaningful fraction of true neighbors must surface even on
    structureless gaussian data (the hardest case for LSH)."""
    df, _ = vectors
    queries = df.filter(F.col("vec_id") < 20)
    bf = brute_force_topk(queries, df, k=3)
    ann = lsh_topk(queries, df, k=3, n_bits=4, n_tables=8)
    bf_set = {(r["query_id"], r["vec_id"]) for r in bf.collect()}
    ann_set = {(r["query_id"], r["vec_id"]) for r in ann.collect()}
    recall = len(bf_set & ann_set) / len(bf_set)
    assert recall > 0.5, f"LSH recall {recall} suspiciously low"


def test_ivf_topk_recall_against_brute_force(spark):
    """IVF with full probing (n_probe == n_lists) is exact; partial
    probing still recovers most of the brute-force top-k."""
    from metrics_advisor_spark.functions.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter("vec_id < 3")
    exact = {
        (r["query_id"], r["vec_id"])
        for r in brute_force_topk(queries, emb, k=5).collect()
    }
    full = {
        (r["query_id"], r["vec_id"])
        for r in ivf_topk(queries, emb, k=5, n_lists=8, n_probe=8).collect()
    }
    assert full == exact  # probing every cell == brute force
    partial = {
        (r["query_id"], r["vec_id"])
        for r in ivf_topk(queries, emb, k=5, n_lists=8, n_probe=4).collect()
    }
    recall = len(partial & exact) / len(exact)
    assert recall >= 0.5, f"recall {recall}"
    # the MLlib-KMeans quantizer stays available behind quantizer=
    # 'kmeans' (engine-specific RNG → not oracle-expressible, but its
    # multi-iteration Lloyd cells remain the production recall option);
    # full probing is exact regardless of quantizer
    kfull = {
        (r["query_id"], r["vec_id"])
        for r in ivf_topk(
            queries, emb, k=5, n_lists=8, n_probe=8, quantizer="kmeans"
        ).collect()
    }
    assert kfull == exact


def test_blocked_knn_graph_vs_exact(vectors):
    """The SRP-blocked k-NN graph (the 100 TB path) agrees with the exact
    graph on everything the blocking admits: every planted near-dup is
    recovered as the rank-1 neighbor, every reported cosine equals the
    exact cosine for that pair, and overall recall@3 against the exact
    graph clears a floor (deterministic planes → deterministic recall)."""
    df, base = vectors
    nodes = df.filter(F.col("vec_id") % 5 == 0)
    # 4 bits × 6 tables: on STRUCTURELESS gaussian data (worst case for
    # LSH — every "neighbor" sits near cosine 0) this measures 0.53
    # recall deterministically; real corpora with actual near-neighbor
    # structure do far better (the planted dup is always recovered)
    approx = lsh_topk(nodes, df, k=3, n_bits=4, n_tables=6).collect()
    exact = brute_force_topk(nodes, df, k=3).collect()

    # planted near-dup (0, 1): identical-signs collision guarantees recovery
    got0 = sorted((r for r in approx if r["query_id"] == 0),
                  key=lambda r: r["rank"])
    assert got0 and got0[0]["vec_id"] == 1

    # reported cosines are EXACT for the admitted pairs
    exact_cos = {
        (r["query_id"], r["vec_id"]): r["cosine"]
        for r in brute_force_topk(nodes, df, k=N).collect()
    }
    for r in approx:
        assert abs(r["cosine"] - exact_cos[(r["query_id"], r["vec_id"])]) < 1e-9

    # deterministic recall floor of the approximate graph
    approx_edges = {(r["query_id"], r["vec_id"]) for r in approx}
    exact_edges = {(r["query_id"], r["vec_id"]) for r in exact}
    recall = len(approx_edges & exact_edges) / len(exact_edges)
    assert recall >= 0.4, f"recall collapsed: {recall}"


def test_embedding_norms_matches_numpy(vectors):
    from metrics_advisor_spark.functions.similarity import embedding_norms

    df, base = vectors
    got = {r["shard"]: r for r in embedding_norms(df, shards=4).collect()}
    norms = np.linalg.norm(base.astype(np.float64), axis=1)
    for shard in range(4):
        mask = (np.arange(N) % 4) == shard
        assert got[shard]["n_vecs"] == int(mask.sum())
        assert abs(got[shard]["avg_norm"] - norms[mask].mean()) < 1e-5
        assert abs(got[shard]["max_norm"] - norms[mask].max()) < 1e-5


def test_semdedup_recovers_planted_dups(spark):
    from metrics_advisor_spark.functions.similarity import semdedup

    rng = np.random.default_rng(7)
    base = rng.normal(0, 1, (40, DIM)).astype(np.float32)
    rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
    # plant: exact copies of 0..4 (ids 100..104) and a light perturbation
    # of 5 (id 105, cosine ~0.999) — all must be dropped; an orthogonal-ish
    # random vector (id 106) must survive
    for i in range(5):
        rows.append((100 + i, [float(x) for x in base[i]]))
    pert = base[5] + rng.normal(0, 0.01, DIM).astype(np.float32)
    rows.append((105, [float(x) for x in pert]))
    rows.append((106, [float(x) for x in rng.normal(0, 1, DIM)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    kept = sorted(
        r["vec_id"] for r in semdedup(df, threshold=0.9, n_lists=4).collect()
    )
    assert kept == sorted(list(range(40)) + [106])

    # keeper is the component min id: drop the ORIGINAL ids' copies, not
    # the originals themselves
    assert all(i in kept for i in range(6))
