"""Graph analytics layer tests: motifs, aggregateMessages, PageRank,
connected components — on tiny hand-checkable graphs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mbai_gdb_spark.ops.graph import (
    aggregate_messages,
    connected_components,
    motif_chain,
    pagerank,
)


def test_motif_chain_two_hops(spark):
    e1 = spark.createDataFrame([(1, 10), (2, 10), (3, 20)], "c long, n long")
    e2 = spark.createDataFrame([(10, 100), (10, 200), (20, 300)], "n long, s long")
    paths = motif_chain([(e1, "c", "n"), (e2, "n", "s")], start_alias="c")
    # customers 1,2 reach suppliers 100,200 via nation 10; customer 3 → 300
    got = {(r.v0, r.v2) for r in paths.collect()}
    assert got == {(1, 100), (1, 200), (2, 100), (2, 200), (3, 300)}


def test_aggregate_messages_in_degree_weighted(spark):
    vertices = spark.createDataFrame([(1, 2.0), (2, 3.0), (3, 5.0)], "id long, w double")
    edges = spark.createDataFrame([(1, 3), (2, 3), (3, 1)], "src long, dst long")
    got = {
        r.id: r.agg_msg
        for r in aggregate_messages(
            vertices, edges, msg=F.col("w"), agg=F.sum
        ).collect()
    }
    # vertex 3 receives w(1)+w(2)=5; vertex 1 receives w(3)=5
    assert got == {3: 5.0, 1: 5.0}


def test_pagerank_star(spark):
    # star: 1..4 all point to 0; 0 points nowhere (dangling)
    vertices = spark.createDataFrame([(i,) for i in range(5)], "id long")
    edges = spark.createDataFrame([(i, 0) for i in range(1, 5)], "src long, dst long")
    pr = {r.id: r.pagerank for r in pagerank(vertices, edges, n_iter=20).collect()}
    assert pr[0] == max(pr.values())
    leaves = [pr[i] for i in range(1, 5)]
    assert max(leaves) - min(leaves) < 1e-9  # symmetric leaves equal
    assert sum(pr.values()) == pytest.approx(5.0, rel=1e-6)  # mass conserved


def test_connected_components_two_islands(spark):
    vertices = spark.createDataFrame([(i,) for i in [1, 2, 3, 7, 8, 9]], "id long")
    edges = spark.createDataFrame([(1, 2), (2, 3), (7, 8), (8, 9)], "src long, dst long")
    comp = {r.id: r.component for r in connected_components(vertices, edges).collect()}
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[7] == comp[8] == comp[9] == 7


def test_connected_components_long_chain_converges(spark):
    """A 60-vertex transitive chain has diameter 59 > max_iter=20: plain
    neighbour-min label propagation would return NON-converged labels
    here; pointer doubling must close it in O(log d) rounds."""
    n = 60
    vertices = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    comp = {r.id: r.component for r in connected_components(vertices, edges).collect()}
    assert set(comp.values()) == {0}
    assert len(comp) == n


def test_ivf_recall_against_brute_force(spark):
    """IVF probing half the lists must beat the probed fraction on
    recall@5 (the fixture embeddings are unclustered random vectors, so
    this is a wiring/recall-dial sanity check, not an ANN benchmark —
    real corpora cluster and recall rises accordingly)."""
    from mbai_gdb_spark.io import read_table
    from mbai_gdb_spark.ops.similarity import cosine_topk, ivf_topk
    from pyspark.sql import functions as F2

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F2.col("vec_id") < 5)
    truth = {
        (r.query_id, r.vec_id)
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.vec_id)
        for r in ivf_topk(emb, queries, k=5, n_probe=5, centroid_stride=50).collect()
    }
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.5, recall


def test_bfs_hop_counts(spark):
    from mbai_gdb_spark.ops.graph import bfs

    vertices = spark.createDataFrame([(i,) for i in range(7)], "id long")
    # chain 0→1→2→3, branch 1→4, island 5→6
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (1, 4), (5, 6)], "src long, dst long"
    )
    got = {r.id: r.hops for r in bfs(vertices, edges, sources=[0]).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 4: 2, 3: 3}
    undirected = {
        r.id: r.hops
        for r in bfs(vertices, edges, sources=[3], directed=False).collect()
    }
    assert undirected == {3: 0, 2: 1, 1: 2, 0: 3, 4: 3}


def test_triangle_count_known_graph(spark):
    from mbai_gdb_spark.ops.graph import triangle_count

    # K4 on {0,1,2,3} (4 triangles, each vertex in 3) plus a pendant
    # edge 3-4 and an isolated edge 5-6 (no triangles).
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4), (5, 6)],
        "src long, dst long",
    )
    got = {r.vertex: r.n_triangles for r in triangle_count(edges).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_count_direction_and_dup_invariant(spark):
    from mbai_gdb_spark.ops.graph import triangle_count

    # Same triangle presented with mixed directions, duplicates and a
    # self-loop — canonicalization must absorb all of it.
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 2), (1, 3), (3, 1), (2, 2)], "src long, dst long"
    )
    got = {r.vertex: r.n_triangles for r in triangle_count(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangle_count_star_hub_has_none(spark):
    from mbai_gdb_spark.ops.graph import triangle_count

    # Skew shape: hub 0 connected to 50 spokes, no spoke-spoke edges →
    # zero triangles despite the hub's degree.
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 51)], "src long, dst long"
    )
    assert triangle_count(edges).count() == 0


def test_kcore_closed_form_graphs(spark):
    from mbai_gdb_spark.ops.graph import kcore

    # K5 (every vertex degree 4) + a tail 4-5-6 chain.
    k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    edges = spark.createDataFrame(k5 + [(4, 10), (10, 11)], "src long, dst long")
    # 3-core = exactly the K5 (tail peels away), in-core degree 4 each.
    got = {r.vertex: r.core_degree for r in kcore(edges, 3).collect()}
    assert got == {v: 4 for v in range(5)}
    # 5-core of K5 is empty (max degree 4).
    assert kcore(edges, 5).count() == 0
    # 1-core keeps everything.
    assert kcore(edges, 1).count() == 7


def test_kcore_cascade_peel(spark):
    from mbai_gdb_spark.ops.graph import kcore

    # A chain: every 2-core peel cascades from the endpoints inward
    # until nothing is left — the multi-round worst case.
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(20)], "src long, dst long"
    )
    assert kcore(edges, 2).count() == 0
    # Close the chain into a cycle: the 2-core is the whole cycle.
    cyc = spark.createDataFrame(
        [(i, (i + 1) % 20) for i in range(20)], "src long, dst long"
    )
    got = {r.vertex: r.core_degree for r in kcore(cyc, 2).collect()}
    assert got == {v: 2 for v in range(20)}


def test_kcore_reliable_checkpoint_matches_local(spark, tmp_path):
    """ops.lineage.truncate flips localCheckpoint → reliable checkpoint
    when a checkpoint dir is registered; the iterative peel/propagate
    results must be bit-identical under either mechanism (durability
    changes, values never do)."""
    from mbai_gdb_spark.ops.graph import kcore, pagerank_integer
    from mbai_gdb_spark.ops.lineage import reliable_dir

    k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    edges = spark.createDataFrame(k5 + [(4, 10), (10, 11)], "src long, dst long")
    local_kcore = {r.vertex: r.core_degree for r in kcore(edges, 3).collect()}
    vertices = spark.createDataFrame(
        [(v,) for v in range(5)] + [(10,), (11,)], "id long"
    )
    local_pr = {
        r.id: r["rank"]
        for r in pagerank_integer(
            vertices, edges, n_iter=6, checkpoint_every=2
        ).collect()
    }

    assert reliable_dir(spark) is None
    sc = spark.sparkContext
    sc.setCheckpointDir(str(tmp_path / "ckpt"))
    try:
        assert reliable_dir(spark) is not None
        rel_kcore = {r.vertex: r.core_degree for r in kcore(edges, 3).collect()}
        rel_pr = {
            r.id: r["rank"]
            for r in pagerank_integer(
                vertices, edges, n_iter=6, checkpoint_every=2
            ).collect()
        }
    finally:
        # De-register so the session-scoped fixture's later tests keep
        # exercising the localCheckpoint path.
        sc._jsc.sc().setCheckpointDir(None)
    assert reliable_dir(spark) is None
    assert rel_kcore == local_kcore == {v: 4 for v in range(5)}
    assert rel_pr == local_pr
    # The reliable run actually wrote RDD checkpoint files.
    import glob

    assert glob.glob(str(tmp_path / "ckpt" / "*" / "rdd-*"))


def _py_kcore(edge_set: set[tuple[int, int]], k: int) -> dict[int, int]:
    """Reference peel in pure Python: repeatedly drop vertices with
    degree < k; return {vertex: within-core degree}."""
    adj: dict[int, set[int]] = {}
    for u, v in edge_set:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    changed = True
    while changed:
        changed = False
        for v in [x for x, nb in adj.items() if len(nb) < k]:
            for n in adj.pop(v):
                adj[n].discard(v)
            changed = True
    return {v: len(nb) for v, nb in adj.items()}


def test_kcore_property_vs_pure_python(spark):
    """Delta-peel kcore == reference Python peel on seeded random
    graphs across several densities and k values (the round-7 rewrite's
    highest-assurance check: the k-core is unique, so any divergence is
    a bug, not an ordering artifact)."""
    from mbai_gdb_spark.ops.graph import kcore

    for seed in (7, 41, 1303):
        for n, m in ((12, 20), (25, 70), (40, 200)):
            x = seed
            edges = set()
            while len(edges) < m:
                x = (x * 48271 + 11) % 2_147_483_647
                u = x % n
                x = (x * 48271 + 11) % 2_147_483_647
                v = x % n
                if u != v:
                    edges.add((min(u, v), max(u, v)))
            df = spark.createDataFrame(sorted(edges), "src long, dst long")
            for k in (2, 3, 4):
                want = _py_kcore(edges, k)
                got = {
                    r.vertex: r.core_degree for r in kcore(df, k).collect()
                }
                assert got == want, (seed, n, m, k)
