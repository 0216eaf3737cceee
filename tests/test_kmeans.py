"""K-Means: blob recovery, replica equality, partitioning invariance."""

import numpy as np
import pyarrow as pa

from graph_data_science_ray.algos.kmeans import kmeans


def _points_table(pts: np.ndarray, ids: np.ndarray | None = None) -> pa.Table:
    n, _ = pts.shape
    if ids is None:
        ids = np.arange(n, dtype=np.int64)
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([row.tolist() for row in pts], pa.list_(pa.float64())),
        }
    )


def _blobs(seed=7, per=40, d=4):
    rng = np.random.default_rng(seed)
    centers = np.array(
        [[10.0] * d, [-10.0] * d, [10.0] * (d // 2) + [-10.0] * (d - d // 2)]
    )
    pts = np.vstack([c + rng.normal(0, 0.5, size=(per, d)) for c in centers])
    return pts, np.repeat(np.arange(3), per)


def test_blob_recovery():
    import ray.data

    pts, truth = _blobs()
    res = kmeans(ray.data.from_arrow(_points_table(pts)), k=3, max_iterations=10)
    t = res.to_table()
    got = dict(zip(t.column("vec_id").to_pylist(), t.column("cluster").to_pylist()))
    # every true blob maps to exactly one k-means cluster
    for b in range(3):
        members = {got[i] for i in np.where(truth == b)[0]}
        assert len(members) == 1, f"blob {b} split: {members}"
    # and distinct blobs map to distinct clusters
    reps = {got[int(np.where(truth == b)[0][0])] for b in range(3)}
    assert len(reps) == 3
    assert res.iterations <= 10
    assert res.centroids.shape == (3, 4)


def test_matches_numpy_replica_centroids():
    import ray.data

    pts, _ = _blobs(seed=3, per=25)
    res = kmeans(
        ray.data.from_arrow(_points_table(pts)), k=3, max_iterations=5,
        delta_threshold=0.0,
    )
    # replica: identical init + 5 full Lloyd passes
    cents = pts[[0]]
    ids = np.arange(pts.shape[0])
    for _ in range(2):
        d2 = ((pts[:, None, :] - cents[None]) ** 2).sum(-1).min(axis=1)
        best = np.lexsort((ids, -d2))[0]
        cents = np.vstack([cents, pts[[best]]])
    for _ in range(res.iterations):
        d2 = ((pts[:, None, :] - cents[None]) ** 2).sum(-1)
        a = d2.argmin(axis=1)
        new = cents.copy()
        for c in range(3):
            if (a == c).any():
                new[c] = pts[a == c].mean(axis=0)
        cents = new
    assert np.allclose(np.sort(res.centroids, axis=0), np.sort(cents, axis=0), atol=1e-9)


def test_partitioning_invariance():
    import ray.data

    pts, _ = _blobs(seed=11, per=30)
    t = _points_table(pts)
    r1 = kmeans(ray.data.from_arrow(t).repartition(1), k=4, max_iterations=6)
    r8 = kmeans(ray.data.from_arrow(t).repartition(8), k=4, max_iterations=6)
    t1, t8 = r1.to_table(), r8.to_table()
    a1 = dict(zip(t1.column("vec_id").to_pylist(), t1.column("cluster").to_pylist()))
    a8 = dict(zip(t8.column("vec_id").to_pylist(), t8.column("cluster").to_pylist()))
    assert a1 == a8
    assert np.allclose(r1.centroids, r8.centroids)


def test_k_exceeds_distinct_points():
    import ray.data

    pts = np.array([[0.0, 0.0], [1.0, 1.0], [0.0, 0.0]])
    res = kmeans(ray.data.from_arrow(_points_table(pts)), k=5, max_iterations=3)
    assert res.centroids.shape[0] == 2  # only 2 distinct points
    t = res.to_table()
    assert t.num_rows == 3
    got = dict(zip(t.column("vec_id").to_pylist(), t.column("cluster").to_pylist()))
    assert got[0] == got[2] != got[1]


def test_empty_input():
    import ray.data

    t = _points_table(np.empty((0, 3)))
    res = kmeans(ray.data.from_arrow(t), k=3)
    assert res.to_table().num_rows == 0
    assert res.converged


def test_seed_centroids_and_restarts():
    import ray.data

    pts, truth = _blobs()
    ds = ray.data.from_arrow(_points_table(pts))

    # seedCentroids: exact blob centers -> perfect recovery, no init scans
    seeds = np.array([[10.0] * 4, [-10.0] * 4, [10.0, 10.0, -10.0, -10.0]])
    res = kmeans(ds, k=3, max_iterations=5, seed_centroids=seeds)
    t = res.to_table()
    got = dict(zip(t.column("vec_id").to_pylist(), t.column("cluster").to_pylist()))
    for b in range(3):
        members = {got[i] for i in np.where(truth == b)[0]}
        assert len(members) == 1

    # numberOfRestarts: never worse than the single deterministic run
    base_cost = [m for m in kmeans(ds, k=3, max_iterations=10).metrics if "cost" in m][0]["cost"]
    multi = kmeans(ds, k=3, max_iterations=10, number_of_restarts=3)
    multi_cost = min(m["cost"] for m in multi.metrics if "cost" in m)
    assert multi_cost <= base_cost + 1e-9

    # bad seed matrix rejected
    import pytest

    with pytest.raises(ValueError):
        kmeans(ds, k=3, seed_centroids=np.zeros((2, 4)))
