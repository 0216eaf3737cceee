"""HDBSCAN: blob recovery, noise labeling, candidate-set equivalence,
partitioning invariance."""

import numpy as np
import pyarrow as pa

from graph_data_science_ray.algos.hdbscan import hdbscan


def _tbl(pts, ids=None):
    n = pts.shape[0]
    if ids is None:
        ids = np.arange(n, dtype=np.int64)
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([r.tolist() for r in pts], pa.list_(pa.float64())),
        }
    )


def _blobs_with_noise(seed=3, per=40, d=3, n_noise=12):
    rng = np.random.default_rng(seed)
    centers = np.array([[20.0] * d, [-20.0] * d, [20.0] * (d // 2) + [-20.0] * (d - d // 2)])
    pts = np.vstack(
        [c + rng.normal(0, 0.6, size=(per, d)) for c in centers]
        + [rng.uniform(-200, 200, size=(n_noise, d))]
    )
    truth = np.concatenate([np.repeat(np.arange(3), per), np.full(n_noise, -1)])
    return pts, truth


def test_blob_recovery_with_noise():
    import ray.data

    pts, truth = _blobs_with_noise()
    res = hdbscan(ray.data.from_arrow(_tbl(pts)), min_cluster_size=8)
    t = res.to_table()
    got = dict(zip(t.column("vec_id").to_pylist(), t.column("cluster").to_pylist()))
    # every true blob maps into exactly one found cluster, all distinct
    reps = []
    for b in range(3):
        members = {got[i] for i in np.where(truth == b)[0]}
        assert len(members) == 1 and -1 not in members, f"blob {b}: {members}"
        reps.append(members.pop())
    assert len(set(reps)) == 3
    assert res.n_clusters == 3
    # far-flung uniform noise: the bulk must be labeled -1
    noise_ids = np.where(truth == -1)[0]
    noise_labels = [got[i] for i in noise_ids]
    assert sum(1 for x in noise_labels if x == -1) >= len(noise_ids) - 3


def test_exact_matches_all_pairs_and_big_knn():
    import ray.data

    pts, _ = _blobs_with_noise(seed=9, per=25, n_noise=6)
    a = hdbscan(ray.data.from_arrow(_tbl(pts)), min_cluster_size=6, candidate="exact")
    b = hdbscan(ray.data.from_arrow(_tbl(pts)), min_cluster_size=6, candidate="all_pairs")
    c = hdbscan(ray.data.from_arrow(_tbl(pts)), min_cluster_size=6, candidate="knn", knn_k=80)
    assert a.to_table().equals(b.to_table())
    # knn candidates with k > cluster sizes include the true MST edges
    assert a.to_table().equals(c.to_table())


def test_partitioning_invariance():
    import ray.data

    pts, _ = _blobs_with_noise(seed=17)
    t = _tbl(pts)
    r1 = hdbscan(ray.data.from_arrow(t).repartition(1), min_cluster_size=8)
    r6 = hdbscan(ray.data.from_arrow(t).repartition(6), min_cluster_size=8)
    assert r1.to_table().equals(r6.to_table())


def test_two_far_blobs_two_clusters():
    import ray.data

    rng = np.random.default_rng(5)
    pts = np.vstack(
        [np.full(2, 50.0) + rng.normal(0, 0.3, (20, 2)),
         np.full(2, -50.0) + rng.normal(0, 0.3, (20, 2))]
    )
    res = hdbscan(ray.data.from_arrow(_tbl(pts)), min_cluster_size=5)
    t = res.to_table()
    lab = np.array(t.column("cluster").to_pylist())
    ids = np.array(t.column("vec_id").to_pylist())
    order = np.argsort(ids)
    lab = lab[order]
    assert res.n_clusters == 2
    assert len(set(lab[:20])) == 1 and len(set(lab[20:])) == 1
    assert lab[0] != lab[20]
    assert (lab >= 0).all()


def test_small_input_all_noise():
    import ray.data

    pts = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    res = hdbscan(ray.data.from_arrow(_tbl(pts)), min_cluster_size=5)
    t = res.to_table()
    assert t.num_rows == 3
    assert set(t.column("cluster").to_pylist()) == {-1}
    assert res.n_clusters == 0
