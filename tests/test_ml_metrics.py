"""ml/metrics.py — GDS train-mode metric + autotuning parity.

Hand-computed expectations throughout (no sklearn in the sandbox);
pipeline integration checks ride the session Ray fixture.
"""

import numpy as np
import pyarrow as pa
import pytest

from graph_data_science_ray.ml.metrics import (
    aucpr,
    classification_report,
    classification_scorer,
    expand_candidates,
    f1_class,
    f1_weighted,
    mae,
    mse,
    out_of_bag_error,
    precision_class,
    r2,
    recall_class,
    regression_scorer,
    rmse,
)


def test_per_class_precision_recall_f1():
    y = np.array([0, 0, 1, 1, 1, 2])
    p = np.array([0, 1, 1, 1, 0, 2])
    # class 1: tp=2, fp=1, fn=1
    assert precision_class(y, p, 1) == pytest.approx(2 / 3)
    assert recall_class(y, p, 1) == pytest.approx(2 / 3)
    assert f1_class(y, p, 1) == pytest.approx(2 / 3)
    # class 2: perfect
    assert f1_class(y, p, 2) == 1.0
    # absent class scores 0, no crash
    assert f1_class(y, p, 9) == 0.0


def test_f1_weighted_vs_macro():
    y = np.array([0, 0, 0, 0, 1])
    p = np.array([0, 0, 0, 0, 0])
    # class 0: P=4/5, R=1, F1=8/9; class 1: F1=0
    w = f1_weighted(y, p)
    assert w == pytest.approx((8 / 9 * 4 + 0 * 1) / 5)


def test_aucpr_perfect_and_random():
    y = np.array([0, 0, 1, 1])
    # perfect ranking → area 1
    assert aucpr(y, np.array([0.1, 0.2, 0.8, 0.9])) == pytest.approx(1.0)
    # inverted ranking: points (r,p) = (0,0),(0,0),(0,0),(.5,1/3),(1,.5)
    v = aucpr(y, np.array([0.9, 0.8, 0.2, 0.1]))
    assert 0.0 < v < 0.5
    # hand-computed trapezoid for a 3-point mixed case:
    # scores desc: (y=1,.9) (y=0,.8) (y=1,.7); groups → (r=.5,p=1),(r=.5,p=.5),(r=1,p=2/3)
    v2 = aucpr(np.array([1, 0, 1]), np.array([0.9, 0.8, 0.7]))
    exp = 0.5 * (1.0 + 1.0) / 2 + 0.0 + 0.5 * (0.5 + 2 / 3) / 2
    assert v2 == pytest.approx(exp)
    # degenerate: no positives
    assert aucpr(np.zeros(3), np.ones(3)) == 0.0


def test_aucpr_tie_grouping():
    # all scores equal → single point (r=1, p=pos_rate), anchored at p
    y = np.array([1, 0, 1, 0])
    assert aucpr(y, np.full(4, 0.5)) == pytest.approx(0.5)


def test_regression_metrics():
    y = np.array([1.0, 2.0, 3.0])
    p = np.array([1.0, 2.0, 5.0])
    assert mse(y, p) == pytest.approx(4 / 3)
    assert rmse(y, p) == pytest.approx(np.sqrt(4 / 3))
    assert mae(y, p) == pytest.approx(2 / 3)
    assert r2(y, y) == 1.0
    assert r2(y, p) == pytest.approx(1 - 4.0 / 2.0)


def test_out_of_bag_error_separable():
    from graph_data_science_ray.ml.tree import RandomForestClassifier

    rng_x = np.linspace(0, 1, 60)[:, None]
    y = (rng_x[:, 0] > 0.5).astype(np.int64)
    m = RandomForestClassifier(n_trees=15, max_depth=3, seed=7).fit(rng_x, y)
    e = out_of_bag_error(m, rng_x, y)
    assert 0.0 <= e <= 0.2  # near-separable → low OOB error
    # deterministic
    assert out_of_bag_error(m, rng_x, y) == e
    # non-forest models are rejected
    from graph_data_science_ray.ml.logreg import LogisticRegression

    with pytest.raises(TypeError):
        out_of_bag_error(LogisticRegression().fit(rng_x, y), rng_x, y)


def test_scorer_resolution_and_orientation():
    y = np.array([0, 1, 1])
    p = np.array([0, 1, 0])
    s = classification_scorer("F1(class=1)")(y, p, None, None, None)
    assert s == pytest.approx(f1_class(y, p, 1))
    with pytest.raises(ValueError):
        classification_scorer("NOPE")
    # error metrics come back negated from scorers (argmax-ready) but
    # natural-oriented from the report
    yr = np.array([0.0, 1.0])
    pr = np.array([1.0, 1.0])
    assert regression_scorer("MEAN_SQUARED_ERROR")(yr, pr) == pytest.approx(-0.5)
    from graph_data_science_ray.ml.metrics import regression_report

    assert regression_report(["MEAN_SQUARED_ERROR"], yr, pr)[
        "MEAN_SQUARED_ERROR"] == pytest.approx(0.5)


def test_classification_report_oob_orientation():
    from graph_data_science_ray.ml.tree import RandomForestClassifier

    X = np.linspace(0, 1, 40)[:, None]
    y = (X[:, 0] > 0.5).astype(np.int64)
    m = RandomForestClassifier(n_trees=10, max_depth=3, seed=5).fit(X, y)
    rep = classification_report(["ACCURACY", "OUT_OF_BAG_ERROR"], y,
                                m.predict(X), None, m, X)
    assert rep["ACCURACY"] == 1.0
    assert rep["OUT_OF_BAG_ERROR"] == pytest.approx(out_of_bag_error(m, X, y))


def test_expand_candidates_deterministic_and_typed():
    cands = [
        {"model": "logisticRegression",
         "penalty": {"range": [1e-4, 1e1], "scale": "log"}},
        {"model": "randomForest", "n_trees": {"range": [5, 20]},
         "max_depth": 4},
        {"model": "mlp"},  # concrete — passes through
    ]
    out, origin = expand_candidates(cands, max_trials=6, seed=11)
    assert len(out) == 6 + 6 + 1
    assert origin == [0] * 6 + [1] * 6 + [2]
    # log-scale draws stay inside the range
    pens = [c["penalty"] for c in out[:6]]
    assert all(1e-4 <= p <= 1e1 for p in pens)
    assert len(set(pens)) > 1  # actually explores
    # integer ranges draw ints, inclusive
    nts = [c["n_trees"] for c in out[6:12]]
    assert all(isinstance(v, int) and 5 <= v <= 20 for v in nts)
    assert all(c["max_depth"] == 4 for c in out[6:12])
    # deterministic replay
    out2, _ = expand_candidates(cands, max_trials=6, seed=11)
    assert out == out2
    # different seed → different draws
    out3, _ = expand_candidates(cands, max_trials=6, seed=12)
    assert out != out3
    with pytest.raises(ValueError):
        expand_candidates([{"model": "m", "p": {"range": [0, 1], "scale": "log"}}], 2, 1)


def _toy_features_labels(n=80, d=4, seed=3):
    import ray.data

    ids = np.arange(n, dtype=np.int64)
    h = (ids * 2654435761 + seed) % 97
    X = np.stack([np.sin(ids * (j + 1) * 0.13) for j in range(d)], axis=1)
    y = (X[:, 0] + 0.2 * X[:, 1] > 0).astype(np.int64)
    feat = pa.table({"node_id": pa.array(ids),
                     "embedding": pa.array(list(X), pa.list_(pa.float64()))})
    labels = pa.table({"node_id": pa.array(ids), "label": pa.array(y)})
    del h
    return ray.data.from_arrow(feat), labels


def test_node_classification_metric_selection_and_report():
    from graph_data_science_ray.pipelines.ml import node_classification

    feats, labels = _toy_features_labels()
    m, preds = node_classification(
        feats, labels, seed=42,
        model_candidates=[
            {"model": "logisticRegression",
             "penalty": {"range": [1e-5, 1e-1], "scale": "log"}},
        ],
        max_trials=3, metric="AUCPR",
        metrics=["AUCPR", "F1_WEIGHTED", "PRECISION(class=1)"])
    assert m["selection_metric"] == "AUCPR"
    assert len(m["candidate_scores"]) == 3
    assert m["selected_model"] == "logisticRegression"
    assert 1e-5 <= m["selected_config"]["penalty"] <= 1e-1
    for k in ("test_AUCPR", "test_F1_WEIGHTED", "test_PRECISION(class=1)"):
        assert 0.0 <= m[k] <= 1.0
    assert preds.count() == 80
    # deterministic end-to-end
    m2, _ = node_classification(
        feats, labels, seed=42,
        model_candidates=[
            {"model": "logisticRegression",
             "penalty": {"range": [1e-5, 1e-1], "scale": "log"}},
        ],
        max_trials=3, metric="AUCPR",
        metrics=["AUCPR", "F1_WEIGHTED", "PRECISION(class=1)"])
    assert m2 == m


def test_node_classification_oob_metric():
    from graph_data_science_ray.pipelines.ml import node_classification

    feats, labels = _toy_features_labels()
    m, _ = node_classification(
        feats, labels, seed=42,
        model_candidates=[{"model": "randomForest", "n_trees": 8, "max_depth": 3}],
        metric="OUT_OF_BAG_ERROR", metrics=["OUT_OF_BAG_ERROR"])
    assert m["selected_model"] == "randomForest"
    assert 0.0 <= m["test_OUT_OF_BAG_ERROR"] <= 1.0
    # scorer orientation: stored candidate score is the NEGATED error
    assert m["candidate_scores"][0] == pytest.approx(-abs(m["candidate_scores"][0]))


def test_link_prediction_aucpr_reported():
    import ray.data

    from graph_data_science_ray import fixtures
    from graph_data_science_ray.pipelines.ml import link_prediction_pipeline
    from graph_data_science_ray.sources.edges import from_arrow

    t = fixtures.er_random(60, 0.1, seed=5)
    nodes = np.unique(np.concatenate([
        t.column("src_id").to_numpy(zero_copy_only=False),
        t.column("dst_id").to_numpy(zero_copy_only=False)]))
    emb = pa.table({
        "node_id": pa.array(nodes, pa.int64()),
        "embedding": pa.array([list(np.sin(np.arange(4) + i)) for i in nodes],
                              pa.list_(pa.float64())),
    })
    m, model = link_prediction_pipeline(
        from_arrow(t), ray.data.from_arrow(emb), seed=7,
        model_candidates=[{"model": "logisticRegression", "penalty": 1e-4},
                          {"model": "logisticRegression", "penalty": 1.0}],
        metric="AUCPR")
    assert 0.0 <= m["test_aucpr"] <= 1.0
    assert m["selection_metric"] == "AUCPR"
    assert len(m["candidate_scores"]) == 2
