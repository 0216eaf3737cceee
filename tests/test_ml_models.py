"""Model catalog (randomForest / mlp): unit determinism + accuracy, and
pipeline integration with distributed from-params scoring parity."""

import numpy as np
import pyarrow as pa

import ray.data

from graph_data_science_ray.ml import classifier_proba, regressor_predict
from graph_data_science_ray.ml.mlp import MLPClassifier
from graph_data_science_ray.ml.tree import (
    DecisionTree,
    RandomForestClassifier,
    RandomForestRegressor,
)
from graph_data_science_ray.pipelines.ml import (
    link_prediction_pipeline,
    node_classification,
    node_regression,
)


def _blobs(n_per=80, d=5, seed=11, classes=2):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 3, (classes, d))
    X = np.vstack([rng.normal(centers[c], 0.5, (n_per, d)) for c in range(classes)])
    y = np.repeat(np.arange(classes, dtype=np.int64), n_per)
    return X, y


def test_decision_tree_xor_and_tie_breaks():
    # XOR needs interaction splits — depth>=2, full feature view; exact
    # 0/1 corners make every level's best split unambiguous
    X = np.array([[0, 0], [0, 1], [1, 0], [1, 1]] * 30, float)
    y = (X[:, 0] != X[:, 1]).astype(np.int64)
    t = DecisionTree("classification", max_depth=4, max_features_ratio=1.0).fit(X, y)
    leaf = DecisionTree._descend(t.feature_, t.threshold_, t.left_, t.right_, X)
    pred = t.classes_[np.argmax(t.value_[leaf], axis=1)]
    assert (pred == y).all()
    # leaves mark feature -1 and internal nodes have both children
    internal = t.feature_ >= 0
    assert (t.left_[internal] >= 0).all() and (t.right_[internal] >= 0).all()
    assert (t.left_[~internal] == -1).all()


def test_random_forest_classifier_deterministic_and_separable():
    X, y = _blobs(classes=3)
    m1 = RandomForestClassifier(n_trees=12, max_depth=8, seed=9).fit(X, y)
    m2 = RandomForestClassifier(n_trees=12, max_depth=8, seed=9).fit(X, y)
    p1, p2 = m1.predict_proba(X), m2.predict_proba(X)
    assert np.array_equal(p1, p2)  # bit-identical refits
    assert (m1.predict(X) == y).mean() > 0.97
    # different seed -> different forest (bootstrap actually varies)
    m3 = RandomForestClassifier(n_trees=12, max_depth=8, seed=10).fit(X, y)
    assert not np.array_equal(p1, m3.predict_proba(X))
    # from-params dispatch == in-object scoring
    assert np.array_equal(classifier_proba(m1.params(), X), p1)


def test_random_forest_regressor_beats_mean_and_dispatches():
    rng = np.random.default_rng(4)
    X = rng.normal(0, 1, (400, 4))
    y = 3 * X[:, 0] - 2 * X[:, 1] * X[:, 2] + rng.normal(0, 0.05, 400)
    m = RandomForestRegressor(n_trees=15, max_depth=9, seed=2).fit(X, y)
    pred = m.predict(X)
    sse = ((pred - y) ** 2).mean()
    base = ((y - y.mean()) ** 2).mean()
    assert sse < 0.2 * base
    assert np.array_equal(regressor_predict(m.params(), X), pred)


def test_mlp_deterministic_and_separable():
    X, y = _blobs(classes=2)
    m1 = MLPClassifier(hidden_layer_sizes=(16,), max_epochs=150, seed=5).fit(X, y)
    m2 = MLPClassifier(hidden_layer_sizes=(16,), max_epochs=150, seed=5).fit(X, y)
    assert np.array_equal(m1.predict_proba(X), m2.predict_proba(X))
    assert (m1.predict(X) == y).mean() > 0.97
    assert np.array_equal(classifier_proba(m1.params(), X), m1.predict_proba(X))


def _feature_ds(X):
    ids = np.arange(X.shape[0], dtype=np.int64)
    return ray.data.from_arrow(pa.table(
        {"node_id": pa.array(ids, pa.int64()),
         "embedding": pa.array([r.tolist() for r in X], pa.list_(pa.float64()))}
    )), ids


def test_node_classification_rf_and_mlp_pipeline():
    X, y = _blobs(n_per=60, d=4, seed=21)
    feats, ids = _feature_ds(X)
    labels = pa.table({"node_id": pa.array(ids, pa.int64()),
                       "label": pa.array(y, pa.int64())})
    for model, cfg in [("randomForest", {"n_trees": 10, "max_depth": 8}),
                       ("mlp", {"max_epochs": 120})]:
        metrics, preds = node_classification(
            feats, labels, model=model, model_config=cfg, seed=7)
        assert metrics["test_accuracy"] > 0.9, (model, metrics)
        got = preds.take_all()
        assert len(got) == X.shape[0]
        # distributed scoring agrees with a driver-side refit prediction
        by_id = {r["node_id"]: r["predicted_label"] for r in got}
        agree = np.mean([by_id[i] == y[i] for i in ids])
        assert agree > 0.9


def test_node_regression_rf_pipeline():
    rng = np.random.default_rng(31)
    X = rng.normal(0, 1, (150, 4))
    t = 2 * X[:, 0] + np.abs(X[:, 1])
    feats, ids = _feature_ds(X)
    targets = pa.table({"node_id": pa.array(ids, pa.int64()),
                        "target": pa.array(t, pa.float64())})
    metrics, preds = node_regression(
        feats, targets, model="randomForest",
        model_config={"n_trees": 12, "max_depth": 8}, seed=3)
    assert metrics["test_r2"] > 0.6, metrics
    assert len(preds.take_all()) == 150


def test_link_prediction_rf_pipeline():
    # two dense clusters, edges only within a cluster -> hadamard features split
    rng = np.random.default_rng(8)
    n = 16
    emb = np.vstack([rng.normal(-2, 0.3, (n, 4)), rng.normal(2, 0.3, (n, 4))])
    feats, ids = _feature_ds(emb)
    # complete within-cluster graphs: sampled negatives are (almost all)
    # cross-cluster, so hadamard features separate the classes
    pairs = []
    for c in range(2):
        base = c * n
        for i in range(n):
            for j in range(i + 1, n):
                pairs.append((base + i, base + j))
    et = pa.table({"src_id": pa.array([p[0] for p in pairs], pa.int64()),
                   "dst_id": pa.array([p[1] for p in pairs], pa.int64())})
    edges = ray.data.from_arrow(et)
    metrics, model = link_prediction_pipeline(
        edges, feats, combiner="hadamard", model="randomForest",
        model_config={"n_trees": 10, "max_depth": 6}, seed=5)
    assert metrics["test_auc"] > 0.8, metrics
    # distributed pair scoring runs and emits probabilities in [0, 1]
    q = ray.data.from_arrow(pa.table(
        {"node1": pa.array([0, 0], pa.int64()),
         "node2": pa.array([1, n + 1], pa.int64())}))
    scored = {(r["node1"], r["node2"]): r["probability"]
              for r in model.predict_pairs(q, feats).take_all()}
    assert 0.0 <= min(scored.values()) and max(scored.values()) <= 1.0
    # same-cluster pair scores at least as high as cross-cluster
    assert scored[(0, 1)] >= scored[(0, n + 1)]


def test_model_candidate_selection_classification():
    # XOR labels: logistic regression cannot separate, a tree forest can
    rng = np.random.default_rng(17)
    X = np.array([[0, 0], [0, 1], [1, 0], [1, 1]] * 50, float) + rng.normal(0, 0.05, (200, 2))
    y = (X[:, 0].round() != X[:, 1].round()).astype(np.int64)
    feats, ids = _feature_ds(X)
    labels = pa.table({"node_id": pa.array(ids, pa.int64()),
                       "label": pa.array(y, pa.int64())})
    cands = [{"model": "logisticRegression"},
             {"model": "randomForest", "n_trees": 8, "max_depth": 6,
              "max_features_ratio": 1.0}]
    metrics, _ = node_classification(feats, labels, seed=5,
                                     model_candidates=cands)
    assert metrics["selected_model"] == "randomForest", metrics
    assert metrics["candidate_scores"][1] > metrics["candidate_scores"][0]
    assert metrics["test_accuracy"] > 0.9
    # deterministic selection
    m2, _ = node_classification(feats, labels, seed=5, model_candidates=cands)
    assert m2["candidate_scores"] == metrics["candidate_scores"]


def test_model_candidate_selection_regression():
    # pure linear target: OLS beats a depth-2 forest
    rng = np.random.default_rng(23)
    X = rng.normal(0, 1, (200, 3))
    t = 3 * X[:, 0] - 2 * X[:, 1] + 0.5 * X[:, 2]
    feats, ids = _feature_ds(X)
    targets = pa.table({"node_id": pa.array(ids, pa.int64()),
                        "target": pa.array(t, pa.float64())})
    cands = [{"model": "randomForest", "n_trees": 4, "max_depth": 2},
             {"model": "linearRegression"}]
    metrics, _ = node_regression(feats, targets, seed=9,
                                 model_candidates=cands)
    assert metrics["selected_model"] == "linearRegression", metrics
    assert metrics["test_r2"] > 0.99
