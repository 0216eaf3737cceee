"""Deterministic multinomial logistic regression (numpy, driver-side).

The reference's ML pipelines train logistic-regression models inside
one JVM [GDS-pub: ml/ml-algo/ — Models.LogisticRegression; public docs
gds.beta.pipeline.*]; training sets are label-table-sized, orders of
magnitude below the graph, so a driver-side convex solver is the right
split — the DISTRIBUTED halves of the pipelines are feature extraction
and bulk prediction (see pipelines/ml.py).

Full-batch gradient descent on the convex softmax objective with L2
penalty and zero init — a pure function of (X, y, config); no RNG.
"""

from __future__ import annotations

import numpy as np


def _softmax(z: np.ndarray) -> np.ndarray:
    z = z - z.max(axis=1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=1, keepdims=True)


class LogisticRegression:
    """Multinomial (softmax) regression; binary is the 2-class case.

    Matches the reference's training-config surface: ``penalty`` (L2),
    ``max_iter`` (maxEpochs), ``learning_rate``, ``tolerance``."""

    def __init__(self, penalty: float = 0.0, max_iter: int = 200,
                 learning_rate: float = 0.5, tolerance: float = 1e-8,
                 standardize: bool = True):
        self.penalty = penalty
        self.max_iter = max_iter
        self.learning_rate = learning_rate
        self.tolerance = tolerance
        self.standardize = standardize
        self.classes_: np.ndarray | None = None
        self.W: np.ndarray | None = None  # (d, C)
        self.b: np.ndarray | None = None  # (C,)
        self.mu: np.ndarray | None = None
        self.sigma: np.ndarray | None = None
        self.n_iter_: int = 0

    def fit(self, X: np.ndarray, y: np.ndarray) -> "LogisticRegression":
        X = np.asarray(X, dtype=np.float64)
        self.classes_, yi = np.unique(y, return_inverse=True)
        c = self.classes_.shape[0]
        n, d = X.shape
        if self.standardize:
            self.mu = X.mean(axis=0)
            self.sigma = np.maximum(X.std(axis=0), 1e-12)
        else:
            self.mu = np.zeros(d)
            self.sigma = np.ones(d)
        Xs = (X - self.mu) / self.sigma
        Y = np.zeros((n, c))
        Y[np.arange(n), yi] = 1.0
        W = np.zeros((d, c))
        b = np.zeros(c)
        prev = np.inf
        for it in range(self.max_iter):
            P = _softmax(Xs @ W + b)
            G = (P - Y) / n
            gW = Xs.T @ G + self.penalty * W
            gb = G.sum(axis=0)
            W -= self.learning_rate * gW
            b -= self.learning_rate * gb
            loss = (-np.log(np.maximum(P[np.arange(n), yi], 1e-300)).mean()
                    + 0.5 * self.penalty * float((W * W).sum()))
            self.n_iter_ = it + 1
            if abs(prev - loss) < self.tolerance:
                break
            prev = loss
        self.W, self.b = W, b
        return self

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        Xs = (np.asarray(X, dtype=np.float64) - self.mu) / self.sigma
        return _softmax(Xs @ self.W + self.b)

    def predict(self, X: np.ndarray) -> np.ndarray:
        return self.classes_[np.argmax(self.predict_proba(X), axis=1)]

    def params(self) -> dict:
        """Picklable parameter bundle for broadcast prediction."""
        return {"W": self.W, "b": self.b, "mu": self.mu,
                "sigma": self.sigma, "classes": self.classes_}

    @staticmethod
    def proba_from_params(params: dict, X: np.ndarray) -> np.ndarray:
        Xs = (np.asarray(X, dtype=np.float64) - params["mu"]) / params["sigma"]
        return _softmax(Xs @ params["W"] + params["b"])


def accuracy(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    return float((np.asarray(y_true) == np.asarray(y_pred)).mean()) if len(y_true) else 0.0


def macro_f1(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    f1s = []
    for c in np.unique(y_true):
        tp = int(((y_pred == c) & (y_true == c)).sum())
        fp = int(((y_pred == c) & (y_true != c)).sum())
        fn = int(((y_pred != c) & (y_true == c)).sum())
        prec = tp / (tp + fp) if tp + fp else 0.0
        rec = tp / (tp + fn) if tp + fn else 0.0
        f1s.append(2 * prec * rec / (prec + rec) if prec + rec else 0.0)
    return float(np.mean(f1s)) if f1s else 0.0


def auc_roc(y_true: np.ndarray, score: np.ndarray) -> float:
    """Exact AUC by rank statistic (ties → midranks)."""
    y = np.asarray(y_true).astype(bool)
    s = np.asarray(score, dtype=np.float64)
    n_pos = int(y.sum())
    n_neg = y.shape[0] - n_pos
    if n_pos == 0 or n_neg == 0:
        return 0.0
    order = np.argsort(s, kind="stable")
    ranks = np.empty_like(s)
    ranks[order] = np.arange(1, s.shape[0] + 1)
    # midranks for ties
    s_sorted = s[order]
    u, start = np.unique(s_sorted, return_index=True)
    end = np.r_[start[1:], s_sorted.shape[0]]
    mid = (start + 1 + end) / 2.0
    rank_of = dict(zip(u.tolist(), mid.tolist()))
    ranks = np.array([rank_of[v] for v in s.tolist()])
    return float((ranks[y].sum() - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg))
