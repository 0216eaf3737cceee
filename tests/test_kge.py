"""KGE link scoring (gds.ml.kge.predict): exact parity vs a dense numpy
oracle, nonzero relations, self-exclusion, partition invariance."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from graph_data_science_ray.algos.kge import kge_predict


def _emb_ds(n=120, d=8, seed=3):
    rng = np.random.default_rng(seed)
    X = rng.normal(0, 1, (n, d))
    t = pa.table(
        {"node_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
         "embedding": pa.array([r.tolist() for r in X], pa.list_(pa.float64()))}
    )
    return ray.data.from_arrow(t), X


def _oracle(X, srcs, rel, k, fn):
    out = []
    for s in srcs:
        if fn == "transe":
            sc = -np.linalg.norm(X[s] + rel - X, axis=1)
        else:
            sc = ((X[s] * rel) * X).sum(axis=1)
        sc[s] = -np.inf
        order = np.lexsort((np.arange(X.shape[0]), -sc))[:k]
        out.extend((s, int(t), sc[t], r + 1) for r, t in enumerate(order))
    return out


@pytest.mark.parametrize("fn", ["transe", "distmult"])
def test_kge_matches_dense_oracle(fn):
    ds, X = _emb_ds()
    rng = np.random.default_rng(9)
    rel = rng.normal(0, 0.5, X.shape[1])
    srcs = np.array([0, 7, 55], np.int64)
    got = kge_predict(ds, srcs, rel, top_k=5, scoring_function=fn)
    want = _oracle(X, srcs, rel, 5, fn)
    gs = got.column("source_id").to_pylist()
    gt = got.column("target_id").to_pylist()
    gsc = got.column("score").to_pylist()
    gr = got.column("rank").to_pylist()
    assert len(want) == len(gs)
    for (ws, wt, wsc, wr), s, t, sc, r in zip(want, gs, gt, gsc, gr):
        assert (ws, wt, wr) == (s, t, r)
        assert abs(wsc - sc) < 1e-9
    # a source never scores itself
    assert all(s != t for s, t in zip(gs, gt))


def test_kge_partition_invariant():
    ds, X = _emb_ds(n=200)
    rel = np.full(X.shape[1], 0.25)
    srcs = np.array([1, 2, 3], np.int64)
    a = kge_predict(ds, srcs, rel, top_k=7, scoring_function="transe")
    b = kge_predict(ds.repartition(11), srcs, rel, top_k=7, scoring_function="transe")
    assert a.equals(b)


def test_kge_validates_inputs():
    ds, X = _emb_ds(n=20)
    with pytest.raises(ValueError, match="scoring_function"):
        kge_predict(ds, [0], np.zeros(X.shape[1]), scoring_function="rotate")
    with pytest.raises(ValueError, match="relation dim"):
        kge_predict(ds, [0], np.zeros(X.shape[1] + 1))
    with pytest.raises(ValueError, match="missing embeddings"):
        kge_predict(ds, [9999], np.zeros(X.shape[1]))


def test_kge_single_row_returns_empty():
    t = pa.table({"node_id": pa.array([5], pa.int64()),
                  "embedding": pa.array([[1.0, 2.0]], pa.list_(pa.float64()))})
    ds = ray.data.from_arrow(t)
    got = kge_predict(ds, [5], np.zeros(2), top_k=3)
    assert got.num_rows == 0
    assert got.column_names == ["source_id", "target_id", "score", "rank"]


def test_kge_duplicate_embeddings_tie_by_target_id():
    # 4 identical vectors: every score ties — top-k must pick smallest ids
    X = np.tile(np.array([1.0, 1.0, 0.0]), (5, 1))
    X[4] = [0.0, 0.0, 1.0]
    t = pa.table({"node_id": pa.array([10, 20, 30, 40, 50], pa.int64()),
                  "embedding": pa.array([r.tolist() for r in X], pa.list_(pa.float64()))})
    ds = ray.data.from_arrow(t).repartition(3)
    got = kge_predict(ds, [10], np.zeros(3), top_k=2, scoring_function="transe")
    assert got.column("target_id").to_pylist() == [20, 30]
    assert got.column("rank").to_pylist() == [1, 2]
