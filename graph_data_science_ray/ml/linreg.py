"""Deterministic linear regression (ridge, closed form, driver-side).

The reference's node-regression pipeline trains a linear-regression
model in one JVM [GDS-pub: ml/ml-algo/ — LinearRegression;
gds.alpha.pipeline.nodeRegression public docs]; training sets are
target-table-sized, so a driver-side exact solver is the right split —
the DISTRIBUTED halves are feature gathering and bulk prediction
(pipelines/ml.py).

Closed-form normal equations on standardized features with an L2
penalty on the (standardized) coefficients, never the intercept. With
``penalty=0`` this is exact OLS — it matches DuckDB's
``regr_slope/regr_intercept`` on 1-D features, which the harness uses
as the SQL oracle.
"""

from __future__ import annotations

import numpy as np


class LinearRegression:
    """Exact ridge/OLS fit; pure function of (X, y, penalty) — no RNG."""

    def __init__(self, penalty: float = 0.0):
        self.penalty = penalty
        self.coef_: np.ndarray | None = None
        self.intercept_: float = 0.0
        self.mu: np.ndarray | None = None
        self.sigma: np.ndarray | None = None

    def fit(self, X: np.ndarray, y: np.ndarray) -> "LinearRegression":
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        n, d = X.shape
        self.mu = X.mean(axis=0)
        self.sigma = np.maximum(X.std(axis=0), 1e-12)
        Xs = (X - self.mu) / self.sigma
        ym = y.mean()
        A = Xs.T @ Xs + n * self.penalty * np.eye(d)
        b = Xs.T @ (y - ym)
        beta = np.linalg.solve(A, b) if d else np.empty(0)
        self.coef_ = beta / self.sigma
        self.intercept_ = float(ym - (self.mu * self.coef_).sum())
        return self

    def predict(self, X: np.ndarray) -> np.ndarray:
        return np.asarray(X, dtype=np.float64) @ self.coef_ + self.intercept_

    def params(self) -> dict:
        return {"coef": self.coef_, "intercept": self.intercept_}

    @staticmethod
    def predict_from_params(params: dict, X: np.ndarray) -> np.ndarray:
        return np.asarray(X, dtype=np.float64) @ params["coef"] + params["intercept"]


def rmse(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    if len(y_true) == 0:
        return 0.0
    d = np.asarray(y_true, np.float64) - np.asarray(y_pred, np.float64)
    return float(np.sqrt((d * d).mean()))


def mae(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    if len(y_true) == 0:
        return 0.0
    return float(np.abs(np.asarray(y_true, np.float64) - np.asarray(y_pred, np.float64)).mean())


def r2(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    y = np.asarray(y_true, np.float64)
    if y.shape[0] == 0:
        return 0.0
    ss_res = float(((y - np.asarray(y_pred, np.float64)) ** 2).sum())
    ss_tot = float(((y - y.mean()) ** 2).sum())
    return 1.0 - ss_res / ss_tot if ss_tot > 0 else 0.0
