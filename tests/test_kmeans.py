"""Distributed k-means: recovers planted blobs, inertia is monotone
non-increasing over iterations, and results are partitioning-invariant."""

from __future__ import annotations

import random

from mbai_gdb_spark.ops.kmeans import inertia, kmeans_assign, kmeans_fit


def _blobs(n_per: int = 30, dims: int = 8, seed: int = 5):
    rng = random.Random(seed)
    centers = [[10.0 * c] * dims for c in range(3)]
    rows, vid = [], 0
    for label, c in enumerate(centers):
        for _ in range(n_per):
            rows.append((vid, [x + rng.gauss(0, 0.5) for x in c], label))
            vid += 1
    return rows


def test_kmeans_recovers_blobs(spark):
    rows = _blobs()
    df = spark.createDataFrame(
        [(i, v) for i, v, _ in rows], "vec_id long, embedding array<double>"
    )
    cents = kmeans_fit(df, k=3, n_iter=8)
    assigned = {r.vec_id: r.centroid_id for r in kmeans_assign(df, cents).collect()}
    # All members of a true blob land in the same learned cluster, and
    # different blobs land in different clusters.
    by_true: dict[int, set] = {}
    for i, _, label in rows:
        by_true.setdefault(label, set()).add(assigned[i])
    assert all(len(s) == 1 for s in by_true.values())
    assert len({next(iter(s)) for s in by_true.values()}) == 3


def test_kmeans_inertia_monotone(spark):
    rows = _blobs(seed=11)
    df = spark.createDataFrame(
        [(i, v) for i, v, _ in rows], "vec_id long, embedding array<double>"
    )
    vals = []
    for it in (1, 3, 8):
        cents = kmeans_fit(df, k=3, n_iter=it)
        vals.append(inertia(kmeans_assign(df, cents)))
    assert vals[0] >= vals[1] >= vals[2]


def test_kmeans_partitioning_invariant(spark):
    rows = _blobs(seed=23)
    df = spark.createDataFrame(
        [(i, v) for i, v, _ in rows], "vec_id long, embedding array<double>"
    )
    a = {r.centroid_id: r.embedding for r in kmeans_fit(df, 3, 4).collect()}
    b = {
        r.centroid_id: r.embedding
        for r in kmeans_fit(df.repartition(7), 3, 4).collect()
    }
    assert set(a) == set(b)
    for cid in a:
        assert all(abs(x - y) < 1e-9 for x, y in zip(a[cid], b[cid]))


def test_kmeans_init_sparse_offset_ids(spark):
    """Init must yield exactly k centroids for ANY id distribution —
    the old stride init (`id % stride == 0`) matched nothing on e.g.
    all-odd snowflake-style ids."""
    rows = _blobs(seed=31)
    df = spark.createDataFrame(
        [(1_000_001 + 2 * i, v) for i, (_, v, _) in enumerate(rows)],
        "vec_id long, embedding array<double>",
    )
    cents = kmeans_fit(df, k=3, n_iter=6)
    got = cents.collect()
    assert sorted(r.centroid_id for r in got) == [0, 1, 2]
    assigned = kmeans_assign(df, cents)
    assert assigned.count() == df.count()
    assert inertia(assigned) is not None
