"""ML pipelines: logistic regression units + node-classification and
link-prediction pipelines on structured synthetic graphs."""

import numpy as np
import pyarrow as pa

import ray.data

from graph_data_science_ray.ml.logreg import (
    LogisticRegression, accuracy, auc_roc, macro_f1,
)
from graph_data_science_ray.ml.linreg import LinearRegression, r2, rmse
from graph_data_science_ray.pipelines.ml import (
    link_prediction_pipeline, node_classification, node_regression,
)
from graph_data_science_ray.sources.edges import from_arrow


def test_logreg_separable_and_deterministic():
    rng = np.random.default_rng(3)
    X = np.vstack([rng.normal(-2, 0.3, (50, 4)), rng.normal(2, 0.3, (50, 4))])
    y = np.r_[np.zeros(50, np.int64), np.ones(50, np.int64)]
    m1 = LogisticRegression(max_iter=300).fit(X, y)
    m2 = LogisticRegression(max_iter=300).fit(X, y)
    assert accuracy(y, m1.predict(X)) == 1.0
    assert np.array_equal(m1.W, m2.W) and np.array_equal(m1.b, m2.b)
    # three classes
    X3 = np.vstack([X, rng.normal((4, -4, 4, -4), 0.3, (50, 4))])
    y3 = np.r_[y, np.full(50, 2, np.int64)]
    m3 = LogisticRegression(max_iter=300).fit(X3, y3)
    assert accuracy(y3, m3.predict(X3)) > 0.98


def test_metric_helpers():
    assert macro_f1([0, 0, 1, 1], [0, 0, 1, 1]) == 1.0
    assert auc_roc([0, 0, 1, 1], [0.1, 0.2, 0.8, 0.9]) == 1.0
    assert auc_roc([1, 0], [0.2, 0.8]) == 0.0
    assert abs(auc_roc([0, 1], [0.5, 0.5]) - 0.5) < 1e-12


def _blob_features(n_per, d, seed):
    rng = np.random.default_rng(seed)
    a = rng.normal(-1.5, 0.4, (n_per, d))
    b = rng.normal(1.5, 0.4, (n_per, d))
    X = np.vstack([a, b])
    ids = np.arange(2 * n_per, dtype=np.int64)
    return pa.table(
        {"node_id": pa.array(ids, pa.int64()),
         "embedding": pa.array([r.tolist() for r in X], pa.list_(pa.float64()))}
    )


def test_node_classification_pipeline():
    ft = _blob_features(60, 6, seed=5)
    feats = ray.data.from_arrow(ft)
    # label half the nodes
    lab_ids = np.r_[np.arange(0, 30), np.arange(60, 90)].astype(np.int64)
    labels = pa.table(
        {"node_id": pa.array(lab_ids, pa.int64()),
         "label": pa.array((lab_ids >= 60).astype(np.int64), pa.int64())}
    )
    metrics, preds = node_classification(feats, labels, seed=11)
    assert metrics["n_train"] + metrics["n_test"] == 60
    assert metrics["test_accuracy"] == 1.0
    pt = preds.to_arrow_refs()
    got = pa.concat_tables([ray.get(r) for r in pt])
    assert got.num_rows == 120
    nid = np.array(got.column("node_id").to_pylist())
    pl = np.array(got.column("predicted_label").to_pylist())
    assert (pl[nid < 60] == 0).all() and (pl[nid >= 60] == 1).all()
    # deterministic
    m2, _ = node_classification(feats, labels, seed=11)
    assert m2 == metrics


def test_linreg_exact_ols():
    rng = np.random.default_rng(7)
    X = rng.normal(0, 2, (200, 3))
    beta = np.array([1.5, -2.0, 0.25])
    y = X @ beta + 4.0 + rng.normal(0, 0.01, 200)
    m = LinearRegression(penalty=0.0).fit(X, y)
    # exact OLS: matches lstsq on the augmented design
    A = np.c_[np.ones(200), X]
    ref, *_ = np.linalg.lstsq(A, y, rcond=None)
    assert np.allclose(m.intercept_, ref[0], atol=1e-9)
    assert np.allclose(m.coef_, ref[1:], atol=1e-9)
    assert rmse(y, m.predict(X)) < 0.02
    assert r2(y, m.predict(X)) > 0.999
    # ridge shrinks coefficients
    mr = LinearRegression(penalty=10.0).fit(X, y)
    assert np.abs(mr.coef_).sum() < np.abs(m.coef_).sum()


def test_node_regression_pipeline():
    rng = np.random.default_rng(13)
    n = 150
    X = rng.normal(0, 1, (n, 4))
    y = X @ np.array([2.0, -1.0, 0.5, 0.0]) + 3.0
    ids = np.arange(n, dtype=np.int64)
    feats = ray.data.from_arrow(pa.table(
        {"node_id": pa.array(ids, pa.int64()),
         "embedding": pa.array([r.tolist() for r in X], pa.list_(pa.float64()))}
    ))
    targets = pa.table({"node_id": pa.array(ids[:100], pa.int64()),
                        "target": pa.array(y[:100], pa.float64())})
    metrics, preds = node_regression(feats, targets, seed=21)
    assert metrics["n_train"] + metrics["n_test"] == 100
    assert metrics["test_rmse"] < 1e-8  # noiseless linear target
    got = pa.concat_tables([ray.get(r) for r in preds.to_arrow_refs()])
    assert got.num_rows == n
    nid = np.array(got.column("node_id").to_pylist())
    p = np.array(got.column("prediction").to_pylist())
    assert np.allclose(p, y[nid], atol=1e-8)
    m2, _ = node_regression(feats, targets, seed=21)
    assert m2 == metrics


def _two_clique_edges(k):
    src, dst = [], []
    for base in (0, k):
        for a in range(k):
            for b in range(a + 1, k):
                src.append(base + a)
                dst.append(base + b)
    src.append(0)
    dst.append(k)
    return pa.table({"src_id": pa.array(src, pa.int64()),
                     "dst_id": pa.array(dst, pa.int64())})


def test_link_prediction_pipeline():
    k = 12
    t = _two_clique_edges(k)
    # embeddings that reflect the cluster structure + noise dims
    rng = np.random.default_rng(9)
    E = np.vstack([rng.normal(-1, 0.3, (k, 8)), rng.normal(1, 0.3, (k, 8))])
    emb = pa.table(
        {"node_id": pa.array(np.arange(2 * k, dtype=np.int64), pa.int64()),
         "embedding": pa.array([r.tolist() for r in E], pa.list_(pa.float64()))}
    )
    edges = from_arrow(t)
    embeds = ray.data.from_arrow(emb)
    metrics, model = link_prediction_pipeline(
        edges, embeds, combiner="hadamard", seed=3, max_iter=300)
    assert metrics["n_positive"] > 100
    assert metrics["test_auc"] > 0.8
    # scoring: within-clique candidate should beat cross-clique
    cand = pa.table({"node1": pa.array([1, 1], pa.int64()),
                     "node2": pa.array([5, k + 5], pa.int64())})
    scored = model.predict_pairs(ray.data.from_arrow(cand), embeds)
    got = {(r["node1"], r["node2"]): r["probability"] for r in scored.take_all()}
    assert got[(1, 5)] > got[(1, k + 5)]
    # determinism of the whole pipeline
    m2, _ = link_prediction_pipeline(
        edges, embeds, combiner="hadamard", seed=3, max_iter=300)
    assert m2 == metrics
