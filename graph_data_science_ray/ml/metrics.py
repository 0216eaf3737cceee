"""Configurable evaluation metrics + random-search autotuning for the
ML pipelines — the GDS train-mode surface the pipelines were missing.

Reference semantics (public GDS docs: `metrics` on
``gds.beta.pipeline.nodeClassification.train`` /
``nodeRegression.train`` / ``linkPrediction.train``, and
``autoTuningConfig``; no reference files exist on disk to cite):

- classification metrics: ``ACCURACY``, ``F1_MACRO``, ``F1_WEIGHTED``,
  per-class ``F1(class=c)`` / ``PRECISION(class=c)`` / ``RECALL(class=c)``,
  ``OUT_OF_BAG_ERROR`` (randomForest only; computed from each tree's
  out-of-bootstrap rows, no validation fold needed), and ``AUCPR``
  (binary label sets only — GDS restricts it the same way);
- link-prediction metric: ``AUCPR`` (GDS's only LP metric);
- regression metrics: ``MEAN_SQUARED_ERROR``, ``ROOT_MEAN_SQUARED_ERROR``,
  ``MEAN_ABSOLUTE_ERROR`` (plus ``R2`` as a convenience alias GDS exposes
  in stream mode).
- autotuning: a model candidate whose numeric hyperparameter is given as
  ``{"range": [lo, hi]}`` (optionally ``"scale": "log"``) is expanded to
  ``max_trials`` concrete trials — GDS RandomSearch with ``maxTrials``
  (default 10). Sampling is splitmix64-hash of (seed, candidate index,
  trial, parameter name): deterministic, no RNG state, stable across
  runs and partitionings like every other draw in this engine.

All metrics are driver-side numpy over the (label-table-sized) eval
split — the same locality contract as training itself (pipelines/ml.py).
"""

from __future__ import annotations

import re

import numpy as np

from graph_data_science_ray.functions.joins import _mix64
from graph_data_science_ray.ml.logreg import accuracy, auc_roc, macro_f1

__all__ = [
    "accuracy", "auc_roc", "macro_f1", "f1_weighted", "precision_class",
    "recall_class", "f1_class", "aucpr", "out_of_bag_error",
    "mse", "rmse", "mae", "r2",
    "classification_scorer", "regression_scorer",
    "classification_report", "regression_report",
    "expand_candidates",
]


# --------------------------------------------------------------------------
# classification metrics
# --------------------------------------------------------------------------

def _class_counts(y_true: np.ndarray, y_pred: np.ndarray, c) -> tuple[int, int, int]:
    tp = int(((y_pred == c) & (y_true == c)).sum())
    fp = int(((y_pred == c) & (y_true != c)).sum())
    fn = int(((y_pred != c) & (y_true == c)).sum())
    return tp, fp, fn


def precision_class(y_true: np.ndarray, y_pred: np.ndarray, c) -> float:
    tp, fp, _ = _class_counts(np.asarray(y_true), np.asarray(y_pred), c)
    return tp / (tp + fp) if tp + fp else 0.0


def recall_class(y_true: np.ndarray, y_pred: np.ndarray, c) -> float:
    tp, _, fn = _class_counts(np.asarray(y_true), np.asarray(y_pred), c)
    return tp / (tp + fn) if tp + fn else 0.0


def f1_class(y_true: np.ndarray, y_pred: np.ndarray, c) -> float:
    p = precision_class(y_true, y_pred, c)
    r = recall_class(y_true, y_pred, c)
    return 2 * p * r / (p + r) if p + r else 0.0


def f1_weighted(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    """Support-weighted mean of per-class F1 (GDS F1_WEIGHTED)."""
    y_true = np.asarray(y_true)
    if y_true.shape[0] == 0:
        return 0.0
    classes, counts = np.unique(y_true, return_counts=True)
    f1s = np.array([f1_class(y_true, y_pred, c) for c in classes])
    return float((f1s * counts).sum() / counts.sum())


def aucpr(y_true: np.ndarray, score: np.ndarray) -> float:
    """Area under the precision-recall curve, trapezoidal rule over the
    distinct-threshold points (ties grouped), anchored at recall=0 with
    the first finite precision — the published definition GDS documents
    for AUCPR. Exact, vectorized, no interpolation heuristics beyond
    the trapezoid itself."""
    y = np.asarray(y_true).astype(bool)
    s = np.asarray(score, dtype=np.float64)
    n_pos = int(y.sum())
    if n_pos == 0 or y.shape[0] == 0:
        return 0.0
    order = np.argsort(-s, kind="stable")
    y_sorted = y[order]
    s_sorted = s[order]
    # threshold group ends: last index of each distinct score
    ends = np.flatnonzero(np.r_[s_sorted[1:] != s_sorted[:-1], True])
    tp = np.cumsum(y_sorted)[ends].astype(np.float64)
    k = (ends + 1).astype(np.float64)  # predicted-positive count
    precision = tp / k
    recall = tp / n_pos
    # anchor (recall=0, precision of the highest-score group)
    r = np.r_[0.0, recall]
    p = np.r_[precision[0], precision]
    return float(np.trapz(p, r))


def out_of_bag_error(model, X: np.ndarray, y: np.ndarray) -> float:
    """GDS OUT_OF_BAG_ERROR for a fitted RandomForestClassifier: each
    training row is scored by soft-voting ONLY the trees whose bootstrap
    sample excluded it; error = 1 − accuracy of those OOB votes. Rows
    that every tree saw (possible with few trees) are skipped. The
    bootstrap membership is re-derived from the model's deterministic
    hash draws (ml/tree._bootstrap_indices) — no stored masks needed."""
    from graph_data_science_ray.ml.tree import RandomForestClassifier, _bootstrap_indices

    if not isinstance(model, RandomForestClassifier):
        raise TypeError("OUT_OF_BAG_ERROR is defined for randomForest models only")
    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y)
    n = X.shape[0]
    if n == 0:
        return 0.0
    classes = model.classes_
    acc = np.zeros((n, classes.shape[0]), dtype=np.float64)
    votes = np.zeros(n, dtype=np.int64)
    params = model.params()
    from graph_data_science_ray.ml.tree import DecisionTree

    for t_idx, t in enumerate(params["trees"]):
        in_bag = np.zeros(n, dtype=bool)
        in_bag[_bootstrap_indices(n, model.seed, t_idx)] = True
        oob = ~in_bag
        if not oob.any():
            continue
        leaf = DecisionTree._descend(t["feature"], t["threshold"], t["left"],
                                     t["right"], X[oob])
        acc[oob] += t["value"][leaf]
        votes[oob] += 1
    seen = votes > 0
    if not seen.any():
        return 0.0
    pred = classes[np.argmax(acc[seen], axis=1)]
    return float((pred != y[seen]).mean())


# --------------------------------------------------------------------------
# regression metrics
# --------------------------------------------------------------------------

def mse(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    y_true = np.asarray(y_true, dtype=np.float64)
    y_pred = np.asarray(y_pred, dtype=np.float64)
    return float(((y_true - y_pred) ** 2).mean()) if y_true.shape[0] else 0.0


def rmse(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    return float(np.sqrt(mse(y_true, y_pred)))


def mae(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    y_true = np.asarray(y_true, dtype=np.float64)
    y_pred = np.asarray(y_pred, dtype=np.float64)
    return float(np.abs(y_true - y_pred).mean()) if y_true.shape[0] else 0.0


def r2(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    y_true = np.asarray(y_true, dtype=np.float64)
    if y_true.shape[0] == 0:
        return 0.0
    ss_res = float(((y_true - np.asarray(y_pred, dtype=np.float64)) ** 2).sum())
    ss_tot = float(((y_true - y_true.mean()) ** 2).sum())
    return 1.0 - ss_res / ss_tot if ss_tot else 0.0


# --------------------------------------------------------------------------
# metric-name → scorer resolution (the pipelines' `metric=` strings)
# --------------------------------------------------------------------------

_PER_CLASS = re.compile(r"^(F1|PRECISION|RECALL)\(CLASS=(-?\d+)\)$")


def classification_scorer(name: str):
    """Resolve a GDS classification metric name to
    ``fn(y_true, y_pred, proba_pos, model, X) -> float`` where HIGHER is
    better (error metrics are negated so candidate argmax works).
    ``proba_pos`` is the positive-class probability for binary problems
    (None otherwise); ``model``/``X`` feed OUT_OF_BAG_ERROR."""
    up = name.upper().replace(" ", "")
    if up == "ACCURACY":
        return lambda yt, yp, pr, m, X: accuracy(yt, yp)
    if up == "F1_MACRO":
        return lambda yt, yp, pr, m, X: macro_f1(yt, yp)
    if up == "F1_WEIGHTED":
        return lambda yt, yp, pr, m, X: f1_weighted(yt, yp)
    if up == "AUCPR":
        def _aucpr(yt, yp, pr, m, X):
            if pr is None:
                raise ValueError("AUCPR needs binary labels {0,1} with probabilities")
            return aucpr(np.asarray(yt) == 1, pr)
        return _aucpr
    if up == "OUT_OF_BAG_ERROR":
        # lower error = better ⇒ negate for the argmax selection rule
        return lambda yt, yp, pr, m, X: -out_of_bag_error(m, X, yt)
    mm = _PER_CLASS.match(up)
    if mm:
        fn = {"F1": f1_class, "PRECISION": precision_class, "RECALL": recall_class}[mm.group(1)]
        c = int(mm.group(2))
        return lambda yt, yp, pr, m, X, _f=fn, _c=c: _f(yt, yp, _c)
    raise ValueError(f"unknown classification metric {name!r}")


def regression_scorer(name: str):
    """Resolve a GDS regression metric name to ``fn(y_true, y_pred)``,
    higher-is-better (error metrics negated)."""
    up = name.upper().replace(" ", "")
    if up in ("MEAN_SQUARED_ERROR", "MSE"):
        return lambda yt, yp: -mse(yt, yp)
    if up in ("ROOT_MEAN_SQUARED_ERROR", "RMSE"):
        return lambda yt, yp: -rmse(yt, yp)
    if up in ("MEAN_ABSOLUTE_ERROR", "MAE"):
        return lambda yt, yp: -mae(yt, yp)
    if up == "R2":
        return lambda yt, yp: r2(yt, yp)
    raise ValueError(f"unknown regression metric {name!r}")


def classification_report(metrics: list[str], y_true, y_pred, proba_pos,
                          model, X) -> dict[str, float]:
    """Evaluate every requested metric on one split. Error metrics are
    reported in their NATURAL orientation (OUT_OF_BAG_ERROR is the
    error, not its negation)."""
    out = {}
    for name in metrics:
        v = classification_scorer(name)(y_true, y_pred, proba_pos, model, X)
        if name.upper().replace(" ", "") == "OUT_OF_BAG_ERROR":
            v = -v
        out[name] = float(v)
    return out


def regression_report(metrics: list[str], y_true, y_pred) -> dict[str, float]:
    out = {}
    for name in metrics:
        v = regression_scorer(name)(y_true, y_pred)
        if name.upper().replace(" ", "") != "R2":
            v = -v
        out[name] = float(v)
    return out


# --------------------------------------------------------------------------
# autotuning — GDS autoTuningConfig {maxTrials} random search
# --------------------------------------------------------------------------

def _trial_u01(seed: int, cand_idx: int, trial: int, param: str) -> float:
    """Deterministic uniform(0,1) from (seed, candidate, trial, param)."""
    h = np.uint64((seed * 0x9E3779B97F4A7C15 + (cand_idx + 1) * 0xC2B2AE3D27D4EB4F
                   + (trial + 1) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF)
    for ch in param:
        h = _mix64(np.uint64([h ^ np.uint64(ord(ch))]))[0]
    return (int(h) >> 11) / float(1 << 53)


def _is_range(v) -> bool:
    return isinstance(v, dict) and "range" in v


def expand_candidates(candidates: list[dict], max_trials: int = 10,
                      seed: int = 42) -> tuple[list[dict], list[int]]:
    """Expand range-valued candidates into concrete trials (GDS
    RandomSearch with ``autoTuningConfig.maxTrials``).

    A candidate like ``{"model": "logisticRegression",
    "penalty": {"range": [1e-4, 1e1], "scale": "log"}}`` becomes
    ``max_trials`` concrete candidates; ``scale`` defaults to "log" when
    both endpoints are positive and span ≥3 decades (GDS log-samples
    penalty-like params), else linear. Integer endpoints give integer
    draws (inclusive of both ends). Concrete candidates pass through
    unchanged. Returns (expanded, origin_index_per_expanded) so callers
    can report which user candidate each trial came from."""
    out: list[dict] = []
    origin: list[int] = []
    for ci, cand in enumerate(candidates):
        ranged = {k: v for k, v in cand.items() if _is_range(v)}
        if not ranged:
            out.append(dict(cand))
            origin.append(ci)
            continue
        for t in range(max_trials):
            trial = {k: v for k, v in cand.items() if not _is_range(v)}
            for pname, spec in sorted(ranged.items()):
                lo, hi = spec["range"]
                u = _trial_u01(seed, ci, t, pname)
                is_int = isinstance(lo, (int, np.integer)) and isinstance(hi, (int, np.integer)) \
                    and not isinstance(lo, bool)
                scale = spec.get("scale")
                if scale is None:
                    scale = ("log" if (not is_int and lo > 0 and hi / lo >= 1e3)
                             else "linear")
                if scale == "log":
                    if lo <= 0:
                        raise ValueError(f"log-scale range for {pname!r} needs lo > 0")
                    val = float(np.exp(np.log(lo) + u * (np.log(hi) - np.log(lo))))
                elif is_int:
                    val = int(lo) + int(u * (int(hi) - int(lo) + 1))
                    val = min(val, int(hi))
                else:
                    val = float(lo) + u * (float(hi) - float(lo))
                trial[pname] = val
            out.append(trial)
            origin.append(ci)
    return out, origin
