"""Fixed-point class centroids: the order-free determinism claim (the
whole point of integer sums) plus classification sanity."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mbai_gdb_spark.ops.kmeans import (
    centroid_classify,
    class_centroid_components,
    class_centroids,
)


def _vecs(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )


def test_components_bit_identical_across_partitionings(spark):
    # 200 vectors with awkward float tails — plain avg(double) gives
    # partition-order-dependent low bits; fixed-point sums must not.
    rows = [
        (i, i % 3, [((i * 37 + d * 11) % 97) / 9.7 - 5.0 + 1e-7 * i for d in range(8)])
        for i in range(200)
    ]
    a = {
        (r["label"], r["dim"]): r["centroid_val"]
        for r in class_centroid_components(_vecs(spark, rows).repartition(1)).collect()
    }
    b = {
        (r["label"], r["dim"]): r["centroid_val"]
        for r in class_centroid_components(
            _vecs(spark, rows).repartition(13, "vec_id")
        ).collect()
    }
    assert a == b  # exact ==, not isclose: the sums are integers


def test_components_match_plain_mean_within_quantization(spark):
    rows = [(i, 0, [float(i), float(-i)]) for i in range(10)]
    comp = {
        r["dim"]: r for r in class_centroid_components(_vecs(spark, rows)).collect()
    }
    assert comp[0]["n_vecs"] == 10
    assert math.isclose(comp[0]["centroid_val"], 4.5, abs_tol=1e-6)
    assert math.isclose(comp[1]["centroid_val"], -4.5, abs_tol=1e-6)


def test_class_centroids_assembles_dim_order(spark):
    rows = [(1, 7, [1.0, 2.0, 3.0]), (2, 7, [3.0, 4.0, 5.0])]
    out = class_centroids(_vecs(spark, rows)).collect()
    assert len(out) == 1 and out[0]["n_vecs"] == 2
    got = out[0]["centroid"]
    for g, want in zip(got, [2.0, 3.0, 4.0]):
        assert math.isclose(g, want, abs_tol=1e-6)


def test_centroid_classify_separable_clusters(spark):
    # Two well-separated clusters: nearest-centroid is perfect.
    rows = [(i, 0, [10.0 + (i % 3), 0.1]) for i in range(30)] + [
        (100 + i, 1, [0.1, 10.0 + (i % 3)]) for i in range(20)
    ]
    out = {r["label"]: r for r in centroid_classify(_vecs(spark, rows)).collect()}
    assert out[0]["n_vecs"] == 30 and out[0]["n_correct"] == 30
    assert out[1]["n_vecs"] == 20 and out[1]["accuracy"] == 1.0


def test_centroid_classify_counts_misassignments(spark):
    # One mislabeled point sitting in the other cluster drags accuracy.
    rows = [(i, 0, [10.0, 0.0]) for i in range(9)] + [
        (9, 0, [0.0, 10.0])  # labeled 0, lives with class 1
    ] + [(10 + i, 1, [0.0, 10.0]) for i in range(10)]
    out = {r["label"]: r for r in centroid_classify(_vecs(spark, rows)).collect()}
    assert out[0]["n_vecs"] == 10 and out[0]["n_correct"] == 9
    assert math.isclose(out[0]["accuracy"], 0.9)
    assert out[1]["n_correct"] == 10


def test_classify_plan_broadcasts_centroids(spark):
    rows = [(i, i % 2, [float(i), 1.0]) for i in range(20)]
    plan = (
        centroid_classify(_vecs(spark, rows))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
