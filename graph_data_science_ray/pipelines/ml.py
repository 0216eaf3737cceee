"""ML pipelines: node classification + link prediction.

Reference surface (``gds.beta.pipeline.nodeClassification`` /
``gds.beta.pipeline.linkPrediction`` [GDS-pub: ml/ + proc/ml/; public
docs]): configure feature steps over node properties/embeddings, split
train/test, train a logistic-regression model, evaluate, then predict
in bulk. Semantics reproduced here with the engine's determinism rules:

- splits and negative sampling are HASH-deterministic (mix64 of ids and
  seed) — a pure function of (data, seed), partitioning-invariant;
- training is driver-side numpy on the label-table-sized training set
  (ml/logreg.py — the reference likewise trains in one JVM);
- bulk PREDICTION is distributed: model params broadcast via
  ``ray.put`` once, scored inside ``map_batches`` (Arrow in/out);
- link features follow the reference's linkFeature steps: HADAMARD,
  L2, COSINE over node embedding pairs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from graph_data_science_ray.algos.common import collect_arrow
from graph_data_science_ray.context import configure_ray_data
from graph_data_science_ray.functions.joins import _mix64, hash_join
from graph_data_science_ray.ml import classifier_proba, regressor_predict
from graph_data_science_ray.ml.linreg import LinearRegression, mae, r2, rmse
from graph_data_science_ray.ml.logreg import (
    LogisticRegression,
    accuracy,
    auc_roc,
    macro_f1,
)
from graph_data_science_ray.ml.metrics import (
    classification_report,
    classification_scorer,
    expand_candidates,
    regression_report,
    regression_scorer,
)
from graph_data_science_ray.ml.mlp import MLPClassifier
from graph_data_science_ray.ml.tree import RandomForestClassifier, RandomForestRegressor


def _make_classifier(model: str, model_config: dict | None, penalty: float,
                     max_iter: int, seed: int):
    """GDS model-candidate factory (``logisticRegression`` default;
    ``randomForest`` / ``mlp`` per the reference's addTrainerConfig)."""
    cfg = dict(model_config or {})
    if model == "logisticRegression":
        return LogisticRegression(penalty=cfg.pop("penalty", penalty),
                                  max_iter=cfg.pop("max_iter", max_iter), **cfg)
    if model == "randomForest":
        return RandomForestClassifier(seed=cfg.pop("seed", seed), **cfg)
    if model == "mlp":
        return MLPClassifier(penalty=cfg.pop("penalty", penalty),
                             max_epochs=cfg.pop("max_epochs", max_iter),
                             seed=cfg.pop("seed", seed), **cfg)
    raise ValueError(f"model must be logisticRegression | randomForest | mlp, got {model!r}")


def _make_regressor(model: str, model_config: dict | None, penalty: float, seed: int):
    cfg = dict(model_config or {})
    if model == "linearRegression":
        return LinearRegression(penalty=cfg.pop("penalty", penalty), **cfg)
    if model == "randomForest":
        return RandomForestRegressor(seed=cfg.pop("seed", seed), **cfg)
    raise ValueError(f"model must be linearRegression | randomForest, got {model!r}")


def _select_candidate(X, y, ids, candidates, make, score_fn, folds, seed,
                      score_on_train: bool = False):
    """GDS pipeline model selection ([GDS-pub: ml/ml-core training
    RandomSearch/CrossValidation; public docs: train with multiple
    addXxx candidates + validationFolds]): k-fold cross-validation on
    the TRAIN split, winner = highest mean validation score (ties →
    first-listed, the reference's registration order). Fold assignment
    is hash-of-node-id — deterministic and partitioning-invariant.

    Returns (winner_index, [per-candidate mean scores])."""
    fold = (_mix64(ids.astype(np.uint64)
                   ^ np.uint64((0x94D049BB133111EB * (seed + 3)) & 0xFFFFFFFFFFFFFFFF))
            % np.uint64(folds)).astype(np.int64)
    scores = []
    for cand in candidates:
        vals = []
        for f in range(folds):
            va = fold == f
            if not va.any() or va.all():
                continue
            m = make(cand)
            m.fit(X[~va], y[~va])
            # OUT_OF_BAG_ERROR scores on the rows the model was FIT on —
            # the bootstrap holdout is inside the forest, not the fold
            ev = ~va if score_on_train else va
            vals.append(score_fn(y[ev], m, X[ev]))
        scores.append(float(np.mean(vals)) if vals else float("-inf"))
    best = int(np.argmax(scores))  # argmax keeps the FIRST max (tie rule)
    return best, scores


def _clf_score_fn(metric: str):
    """Adapt a GDS classification metric name to the `(y_val, model,
    X_val) -> float` contract of `_select_candidate` (higher = better).
    Positive-class probabilities are attached when the label set is
    binary {0,1} and the model exposes them (AUCPR's requirement)."""
    scorer = classification_scorer(metric)

    def fn(yv, m, Xv):
        pred = m.predict(Xv) if Xv.shape[0] else np.empty(0, np.int64)
        proba = None
        classes = list(getattr(m, "classes_", []))
        if (Xv.shape[0] and set(classes) <= {0, 1} and 1 in classes
                and hasattr(m, "predict_proba")):
            proba = m.predict_proba(Xv)[:, classes.index(1)]
        return scorer(yv, pred, proba, m, Xv)

    return fn


def _hash_uniform(ids: np.ndarray, seed: int) -> np.ndarray:
    """Deterministic uniform(0,1) per id."""
    salt = np.uint64((0x9E3779B97F4A7C15 * (seed + 1)) & 0xFFFFFFFFFFFFFFFF)
    h = _mix64(ids.astype(np.uint64) ^ salt)
    return (h.astype(np.float64) + 1.0) / float(2**64)


def _collect_features(features: Dataset, ids: np.ndarray,
                      feature_col: str) -> tuple[np.ndarray, np.ndarray]:
    """Gather feature vectors for a (small) id set: broadcast the sorted
    ids, filter per batch, collect. Returns (found_ids_sorted, X)."""
    ids_ref = ray.put(np.sort(ids))

    def pick(t: pa.Table) -> pa.Table:
        want = ray.get(ids_ref)
        nid = t.column("node_id").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(want, nid)
        hit = (pos < want.shape[0]) & (want[np.minimum(pos, want.shape[0] - 1)] == nid)
        return t.filter(pa.array(hit))

    got = collect_arrow(features.map_batches(pick, batch_format="pyarrow",
                                             zero_copy_batch=True))
    nid = got.column("node_id").to_numpy(zero_copy_only=False)
    X = np.array(got.column(feature_col).to_pylist(), dtype=np.float64)
    order = np.argsort(nid, kind="stable")
    return nid[order], X[order] if X.shape[0] else X


def node_classification(
    features: Dataset,
    labels: pa.Table,
    feature_col: str = "embedding",
    label_col: str = "label",
    holdout_fraction: float = 0.3,
    penalty: float = 0.0,
    max_iter: int = 200,
    seed: int = 42,
    model: str = "logisticRegression",
    model_config: dict | None = None,
    model_candidates: list[dict] | None = None,
    validation_folds: int = 3,
    metric: str = "ACCURACY",
    metrics: list[str] | None = None,
    max_trials: int = 10,
) -> tuple[dict, Dataset]:
    """Train on the labeled nodes, return (metrics, predictions).

    ``model_candidates``: optional list of {"model": name, **config}
    dicts — when given, the GDS train-mode selection runs: k-fold
    cross-validation (``validation_folds``) on the train split picks the
    winner by mean validation ``metric`` (GDS's primary metric — any of
    ACCURACY, F1_MACRO, F1_WEIGHTED, AUCPR, OUT_OF_BAG_ERROR,
    F1/PRECISION/RECALL(class=c)), which is then refit on the full train
    split; metrics gain ``selected_model`` + ``selected_config`` +
    ``candidate_scores``. Candidates may carry range-valued params
    ({"range": [lo, hi], "scale": "log"?}) — expanded to ``max_trials``
    deterministic random-search trials (GDS autoTuningConfig).
    ``metrics``: extra metric names evaluated on the test split and
    reported as ``test_<NAME>``.

    ``features``: Dataset (node_id, <feature_col>: list<double>).
    ``labels``: in-memory table (node_id, <label_col>: int) — the
    labeled set is assumed driver-sized (reference trains in-heap too).
    Returns metrics {test_accuracy, test_f1_macro, train_accuracy,
    n_train, n_test, n_iter} and a lazy Dataset (node_id,
    predicted_label, probability) over ALL feature rows."""
    configure_ray_data()
    lab_ids = labels.column("node_id").to_numpy(zero_copy_only=False).astype(np.int64)
    lab_y = labels.column(label_col).to_numpy(zero_copy_only=False)
    # canonicalize to node_id order: positional draws (randomForest
    # bootstrap) must not depend on the caller's collection/block order
    lo = np.argsort(lab_ids, kind="stable")
    lab_ids, lab_y = lab_ids[lo], lab_y[lo]

    fid, X = _collect_features(features, lab_ids, feature_col)
    pos = np.searchsorted(fid, lab_ids)
    ok = (pos < fid.shape[0]) & (fid[np.minimum(pos, fid.shape[0] - 1)] == lab_ids)
    lab_ids, lab_y, pos = lab_ids[ok], lab_y[ok], pos[ok]
    Xl = X[pos]

    test = _hash_uniform(lab_ids, seed) < holdout_fraction
    extra = {}
    if model_candidates:
        def mk(c):
            c = dict(c)
            return _make_classifier(c.pop("model"), c, penalty, max_iter, seed)

        cands, _origin = expand_candidates(model_candidates, max_trials, seed)
        oob = metric.upper().replace(" ", "") == "OUT_OF_BAG_ERROR"
        best, scores = _select_candidate(
            Xl[~test], lab_y[~test], lab_ids[~test], cands, mk,
            _clf_score_fn(metric), validation_folds, seed,
            score_on_train=oob)
        cand = dict(cands[best])
        model, model_config = cand.pop("model"), cand
        extra = {"selected_model": model, "selected_config": dict(model_config),
                 "selection_metric": metric, "candidate_scores": scores}
    model = _make_classifier(model, model_config, penalty, max_iter, seed)
    model.fit(Xl[~test], lab_y[~test])
    pred_tr = model.predict(Xl[~test])
    pred_te = model.predict(Xl[test]) if test.any() else np.empty(0, lab_y.dtype)
    report = {
        "n_train": int((~test).sum()),
        "n_test": int(test.sum()),
        "n_iter": getattr(model, "n_iter_", 1),
        "train_accuracy": accuracy(lab_y[~test], pred_tr),
        "test_accuracy": accuracy(lab_y[test], pred_te),
        "test_f1_macro": macro_f1(lab_y[test], pred_te),
        **extra,
    }
    if metrics:
        classes = list(getattr(model, "classes_", []))
        proba_te = None
        if (test.any() and set(classes) <= {0, 1} and 1 in classes
                and hasattr(model, "predict_proba")):
            proba_te = model.predict_proba(Xl[test])[:, classes.index(1)]
        rep = classification_report(
            metrics, lab_y[test], pred_te, proba_te, model, Xl[test])
        for k in metrics:
            # OUT_OF_BAG_ERROR evaluates on the rows the forest was fit on
            if k.upper().replace(" ", "") == "OUT_OF_BAG_ERROR":
                rep[k] = classification_report([k], lab_y[~test], pred_tr,
                                               None, model, Xl[~test])[k]
        report.update({f"test_{k}": v for k, v in rep.items()})

    params_ref = ray.put(model.params())

    def score(t: pa.Table) -> pa.Table:
        p = ray.get(params_ref)
        Xb = np.array(t.column(feature_col).to_pylist(), dtype=np.float64)
        if Xb.shape[0] == 0:
            return pa.table(
                {"node_id": pa.array([], pa.int64()),
                 "predicted_label": pa.array([], pa.int64()),
                 "probability": pa.array([], pa.float64())}
            )
        proba = classifier_proba(p, Xb)
        am = np.argmax(proba, axis=1)
        return pa.table(
            {
                "node_id": t.column("node_id"),
                "predicted_label": pa.array(p["classes"][am].astype(np.int64), pa.int64()),
                "probability": pa.array(proba[np.arange(am.shape[0]), am], pa.float64()),
            }
        )

    return report, features.map_batches(score, batch_format="pyarrow",
                                        zero_copy_batch=True)


def node_regression(
    features: Dataset,
    targets: pa.Table,
    feature_col: str = "embedding",
    target_col: str = "target",
    holdout_fraction: float = 0.3,
    penalty: float = 0.0,
    seed: int = 42,
    model: str = "linearRegression",
    model_config: dict | None = None,
    model_candidates: list[dict] | None = None,
    validation_folds: int = 3,
    metric: str = "ROOT_MEAN_SQUARED_ERROR",
    metrics: list[str] | None = None,
    max_trials: int = 10,
) -> tuple[dict, Dataset]:
    """Train a regression model on the target-labeled nodes,
    return (metrics, predictions) — the ``gds.alpha.pipeline.
    nodeRegression`` surface [GDS-pub: proc/ml + public docs].

    ``metric``: the GDS primary selection metric (MEAN_SQUARED_ERROR,
    ROOT_MEAN_SQUARED_ERROR, MEAN_ABSOLUTE_ERROR, R2); ``metrics``:
    extra names reported as ``test_<NAME>``; range-valued candidate
    params expand to ``max_trials`` random-search trials
    (ml/metrics.expand_candidates — GDS autoTuningConfig).

    Same split as node_classification (hash-deterministic holdout);
    closed-form ridge/OLS fit driver-side (ml/linreg.py); distributed
    bulk prediction over ALL feature rows → (node_id, prediction)."""
    configure_ray_data()
    lab_ids = targets.column("node_id").to_numpy(zero_copy_only=False).astype(np.int64)
    lab_y = targets.column(target_col).to_numpy(zero_copy_only=False).astype(np.float64)
    # canonicalize to node_id order: positional draws (randomForest
    # bootstrap) must not depend on the caller's collection/block order
    lo = np.argsort(lab_ids, kind="stable")
    lab_ids, lab_y = lab_ids[lo], lab_y[lo]

    fid, X = _collect_features(features, lab_ids, feature_col)
    pos = np.searchsorted(fid, lab_ids)
    ok = (pos < fid.shape[0]) & (fid[np.minimum(pos, fid.shape[0] - 1)] == lab_ids)
    lab_ids, lab_y, pos = lab_ids[ok], lab_y[ok], pos[ok]
    Xl = X[pos]

    test = _hash_uniform(lab_ids, seed) < holdout_fraction
    extra = {}
    if model_candidates:
        def mk(c):
            c = dict(c)
            return _make_regressor(c.pop("model"), c, penalty, seed)

        cands, _origin = expand_candidates(model_candidates, max_trials, seed)
        sc = regression_scorer(metric)
        best, scores = _select_candidate(
            Xl[~test], lab_y[~test], lab_ids[~test], cands, mk,
            lambda yv, m, Xv: sc(yv, m.predict(Xv)),  # higher = better
            validation_folds, seed)
        cand = dict(cands[best])
        model, model_config = cand.pop("model"), cand
        extra = {"selected_model": model, "selected_config": dict(model_config),
                 "selection_metric": metric, "candidate_scores": scores}
    model = _make_regressor(model, model_config, penalty, seed)
    model.fit(Xl[~test], lab_y[~test])
    pred_tr = model.predict(Xl[~test])
    pred_te = model.predict(Xl[test]) if test.any() else np.empty(0)
    report = {
        "n_train": int((~test).sum()),
        "n_test": int(test.sum()),
        "train_rmse": rmse(lab_y[~test], pred_tr),
        "test_rmse": rmse(lab_y[test], pred_te),
        "test_mae": mae(lab_y[test], pred_te),
        "test_r2": r2(lab_y[test], pred_te),
        **extra,
    }
    if metrics:
        report.update({f"test_{k}": v for k, v in
                       regression_report(metrics, lab_y[test], pred_te).items()})

    params_ref = ray.put(model.params())

    def score(t: pa.Table) -> pa.Table:
        p = ray.get(params_ref)
        Xb = np.array(t.column(feature_col).to_pylist(), dtype=np.float64)
        if Xb.shape[0] == 0:
            return pa.table(
                {"node_id": pa.array([], pa.int64()),
                 "prediction": pa.array([], pa.float64())}
            )
        return pa.table(
            {"node_id": t.column("node_id"),
             "prediction": pa.array(regressor_predict(p, Xb), pa.float64())}
        )

    return report, features.map_batches(score, batch_format="pyarrow",
                                        zero_copy_batch=True)


_COMBINERS = ("hadamard", "l2", "cosine")


def _pair_features(E1: np.ndarray, E2: np.ndarray, combiner: str) -> np.ndarray:
    if combiner == "hadamard":
        return E1 * E2
    if combiner == "l2":
        return (E1 - E2) ** 2
    if combiner == "cosine":
        n1 = np.maximum(np.linalg.norm(E1, axis=1), 1e-12)
        n2 = np.maximum(np.linalg.norm(E2, axis=1), 1e-12)
        return ((E1 * E2).sum(axis=1) / (n1 * n2))[:, None]
    raise ValueError(f"combiner must be one of {_COMBINERS}")


def _pair_hash(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lo = np.minimum(a, b).astype(np.uint64)
    hi = np.maximum(a, b).astype(np.uint64)
    return _mix64(_mix64(lo) ^ hi)


def _sample_non_edges(nodes: np.ndarray, edge_hash: np.ndarray, n_neg: int,
                      seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic rejection sampling of ``n_neg`` distinct non-edges
    over ``nodes`` (edge membership via the sorted 64-bit pair-hash set)."""
    neg_a = np.empty(0, np.int64)
    neg_b = np.empty(0, np.int64)
    draw = 0
    cursor = 0  # global draw position: every round sees FRESH indices
    # (the old draw*need indexing re-drew round-1 indices for ~35 rounds
    # whenever round 1 came up short, adding nothing each time)
    while neg_a.shape[0] < n_neg and draw < 50:
        need = (n_neg - neg_a.shape[0]) * 2 + 16
        idx = np.arange(cursor, cursor + need, dtype=np.int64)
        cursor += need
        ca = nodes[(_mix64(idx.astype(np.uint64) ^ np.uint64(seed * 2 + 1))
                    % np.uint64(nodes.shape[0])).astype(np.int64)]
        cb = nodes[(_mix64(idx.astype(np.uint64) ^ np.uint64(seed * 2 + 2))
                    % np.uint64(nodes.shape[0])).astype(np.int64)]
        ok = (ca != cb) & ~np.isin(_pair_hash(ca, cb), edge_hash)
        ca, cb = ca[ok], cb[ok]
        # drop duplicate candidate pairs
        _, fi = np.unique(_pair_hash(ca, cb), return_index=True)
        ca, cb = ca[fi], cb[fi]
        known = np.isin(_pair_hash(ca, cb), _pair_hash(neg_a, neg_b)) if neg_a.shape[0] else np.zeros(ca.shape[0], bool)
        neg_a = np.concatenate([neg_a, ca[~known]])
        neg_b = np.concatenate([neg_b, cb[~known]])
        draw += 1
    return neg_a[:n_neg], neg_b[:n_neg]


def split_relationships(
    edges,
    holdout_fraction: float = 0.2,
    negative_ratio: float = 1.0,
    seed: int = 42,
) -> dict:
    """``gds.alpha.ml.splitRelationships`` equivalent: hold out a
    hash-deterministic fraction of the (distinct, unordered, loop-free)
    positive edges as a labeled TEST set, sample ``negative_ratio`` x as
    many non-edges (label 0), and return the remaining positives as the
    TRAIN edge table. Everything is deterministic in ``seed``; the same
    primitives back the link-prediction pipeline.

    Returns {"train": (src_id, dst_id), "test": (src_id, dst_id, label)}
    as Arrow tables, test sorted by (label desc, src, dst)."""
    configure_ray_data()

    def pairs_only(t: pa.Table) -> pa.Table:
        return t.select(["src_id", "dst_id"])

    et = collect_arrow(edges.map_batches(pairs_only, batch_format="pyarrow",
                                         zero_copy_batch=True))
    src = et.column("src_id").to_numpy(zero_copy_only=False)
    dst = et.column("dst_id").to_numpy(zero_copy_only=False)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    ph = _pair_hash(src, dst)
    # per unordered pair keep the lexicographically-smallest surviving
    # (src, dst) orientation — NOT first-in-collection-order, which
    # varies run to run under preserve_order=False and broke the
    # "deterministic in seed" contract when both orientations exist
    order = np.lexsort((dst, src, ph))
    ph, src, dst = ph[order], src[order], dst[order]
    first = np.r_[True, ph[1:] != ph[:-1]]
    edge_hash = ph[first]
    psrc, pdst = src[first], dst[first]

    held = _hash_uniform(_pair_hash(psrc, pdst).astype(np.int64), seed + 13) < holdout_fraction
    tr_s, tr_d = psrc[~held], pdst[~held]
    te_s, te_d = psrc[held], pdst[held]
    nodes = np.unique(np.concatenate([src, dst]))
    n_neg = int(te_s.shape[0] * negative_ratio)
    neg_a, neg_b = _sample_non_edges(nodes, edge_hash, n_neg, seed)

    ts = np.concatenate([te_s, neg_a])
    td = np.concatenate([te_d, neg_b])
    lab = np.concatenate([np.ones(te_s.shape[0], np.int64),
                          np.zeros(neg_a.shape[0], np.int64)])
    order = np.lexsort((td, ts, -lab))
    tro = np.lexsort((tr_d, tr_s))
    return {
        "train": pa.table({"src_id": pa.array(tr_s[tro], pa.int64()),
                           "dst_id": pa.array(tr_d[tro], pa.int64())}),
        "test": pa.table({"src_id": pa.array(ts[order], pa.int64()),
                          "dst_id": pa.array(td[order], pa.int64()),
                          "label": pa.array(lab[order], pa.int64())}),
    }


def link_prediction_pipeline(
    edges: Dataset,
    embeddings: Dataset,
    feature_col: str = "embedding",
    combiner: str = "hadamard",
    holdout_fraction: float = 0.3,
    negative_ratio: float = 1.0,
    max_train_pairs: int = 20000,
    penalty: float = 1e-4,
    max_iter: int = 200,
    seed: int = 42,
    model: str = "logisticRegression",
    model_config: dict | None = None,
    model_candidates: list[dict] | None = None,
    validation_folds: int = 3,
    metric: str = "AUCPR",
    metrics: list[str] | None = None,
    max_trials: int = 10,
) -> tuple[dict, "LinkPredictionModel"]:
    """Train a link classifier from positive edges + hash-sampled
    non-edges; returns (metrics, model). Metrics: test AUC + accuracy +
    test AUCPR (GDS's LP metric); ``model_candidates`` runs the GDS
    train-mode selection by mean validation ``metric`` (default AUCPR)
    with autotuning of range-valued params (``max_trials`` trials);
    ``metrics``: extra names reported as ``test_<NAME>``.

    The positive sample (≤ max_train_pairs, hash-chosen), the negative
    sample and the split are all deterministic in ``seed``. The edge
    membership test for negatives uses the collected 64-bit pair-hash
    set (8 bytes/edge on the driver; swap for a Bloom filter beyond
    ~1e9 edges)."""
    configure_ray_data()

    def pairs_only(t: pa.Table) -> pa.Table:
        return t.select(["src_id", "dst_id"])

    et = collect_arrow(edges.map_batches(pairs_only, batch_format="pyarrow",
                                         zero_copy_batch=True))
    src = et.column("src_id").to_numpy(zero_copy_only=False)
    dst = et.column("dst_id").to_numpy(zero_copy_only=False)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    edge_hash = np.unique(_pair_hash(src, dst))
    # unordered unique positives via the hash (dedup + both-orientation)
    _, first = np.unique(_pair_hash(src, dst), return_index=True)
    psrc, pdst = src[first], dst[first]

    if psrc.shape[0] > max_train_pairs:
        pick = np.argsort(_hash_uniform(_pair_hash(psrc, pdst).astype(np.int64), seed + 7),
                          kind="stable")[:max_train_pairs]
        psrc, pdst = psrc[pick], pdst[pick]

    nodes = np.unique(np.concatenate([src, dst]))
    n_neg = int(psrc.shape[0] * negative_ratio)
    neg_a, neg_b = _sample_non_edges(nodes, edge_hash, n_neg, seed)

    pa_all = np.concatenate([psrc, neg_a])
    pb_all = np.concatenate([pdst, neg_b])
    y = np.concatenate([np.ones(psrc.shape[0], np.int64),
                        np.zeros(neg_a.shape[0], np.int64)])

    need_ids = np.unique(np.concatenate([pa_all, pb_all]))
    fid, X = _collect_features(embeddings, need_ids, feature_col)
    ia = np.searchsorted(fid, pa_all)
    ib = np.searchsorted(fid, pb_all)
    ok = ((ia < fid.shape[0]) & (fid[np.minimum(ia, fid.shape[0] - 1)] == pa_all)
          & (ib < fid.shape[0]) & (fid[np.minimum(ib, fid.shape[0] - 1)] == pb_all))
    pa_all, pb_all, y, ia, ib = pa_all[ok], pb_all[ok], y[ok], ia[ok], ib[ok]
    F = _pair_features(X[ia], X[ib], combiner)

    test = _hash_uniform(_pair_hash(pa_all, pb_all).astype(np.int64), seed + 13) < holdout_fraction
    extra = {}
    if model_candidates:
        def mk(c):
            c = dict(c)
            return _make_classifier(c.pop("model"), c, penalty, max_iter, seed)

        cands, _origin = expand_candidates(model_candidates, max_trials, seed)
        pair_ids = _pair_hash(pa_all, pb_all).astype(np.int64)
        best, scores = _select_candidate(
            F[~test], y[~test], pair_ids[~test], cands, mk,
            _clf_score_fn(metric), validation_folds, seed,
            score_on_train=metric.upper().replace(" ", "") == "OUT_OF_BAG_ERROR")
        cand = dict(cands[best])
        model, model_config = cand.pop("model"), cand
        extra = {"selected_model": model, "selected_config": dict(model_config),
                 "selection_metric": metric, "candidate_scores": scores}
    model = _make_classifier(model, model_config, penalty, max_iter, seed)
    model.fit(F[~test], y[~test])
    proba_te = (model.predict_proba(F[test])[:, list(model.classes_).index(1)]
                if test.any() else np.empty(0))
    pred_te = model.predict(F[test]) if test.any() else np.empty(0, np.int64)
    from graph_data_science_ray.ml.metrics import aucpr as _aucpr

    report = {
        "n_train": int((~test).sum()),
        "n_test": int(test.sum()),
        "n_positive": int(y.sum()),
        "n_iter": getattr(model, "n_iter_", 1),
        "test_accuracy": accuracy(y[test], pred_te),
        "test_auc": auc_roc(y[test], proba_te),
        "test_aucpr": _aucpr(y[test] == 1, proba_te),
        **extra,
    }
    if metrics:
        rep = classification_report(metrics, y[test], pred_te, proba_te,
                                    model, F[test])
        report.update({f"test_{k}": v for k, v in rep.items()})
    return report, LinkPredictionModel(model, combiner, feature_col)


class LinkPredictionModel:
    """Broadcastable trained pair classifier with distributed scoring."""

    def __init__(self, model, combiner: str, feature_col: str):
        self.model = model
        self.combiner = combiner
        self.feature_col = feature_col

    def predict_pairs(self, pairs: Dataset, embeddings: Dataset,
                      num_partitions: int | None = None) -> Dataset:
        """Score (node1, node2) rows → (node1, node2, probability).
        Embedding attachment is two partitioned hash joins; the model
        rides along broadcast."""
        configure_ray_data()
        # Acero rejects list<> payload columns in joins — ship the vector
        # as a float64 binary blob and decode after the join
        def pack(key: str, out: str):
            def fn(t: pa.Table, fc=self.feature_col) -> pa.Table:
                vecs = [np.asarray(v, dtype=np.float64).tobytes()
                        for v in t.column(fc).to_pylist()]
                return pa.table({key: t.column("node_id"),
                                 out: pa.array(vecs, pa.binary())})
            return fn

        e1 = embeddings.map_batches(pack("node1", "emb1"),
                                    batch_format="pyarrow", zero_copy_batch=True)
        e2 = embeddings.map_batches(pack("node2", "emb2"),
                                    batch_format="pyarrow", zero_copy_batch=True)
        joined = hash_join(
            hash_join(pairs, e1, on=("node1",), num_partitions=num_partitions),
            e2, on=("node2",), num_partitions=num_partitions)
        params_ref = ray.put(self.model.params())
        combiner = self.combiner

        def score(t: pa.Table) -> pa.Table:
            p = ray.get(params_ref)
            if t.num_rows == 0:
                return pa.table(
                    {"node1": pa.array([], pa.int64()),
                     "node2": pa.array([], pa.int64()),
                     "probability": pa.array([], pa.float64())}
                )
            E1 = np.vstack([np.frombuffer(b, dtype=np.float64)
                            for b in t.column("emb1").to_pylist()])
            E2 = np.vstack([np.frombuffer(b, dtype=np.float64)
                            for b in t.column("emb2").to_pylist()])
            F = _pair_features(E1, E2, combiner)
            proba = classifier_proba(p, F)
            pos_col = int(np.flatnonzero(p["classes"] == 1)[0])
            return pa.table(
                {"node1": t.column("node1"), "node2": t.column("node2"),
                 "probability": pa.array(proba[:, pos_col], pa.float64())}
            )

        return joined.map_batches(score, batch_format="pyarrow")
