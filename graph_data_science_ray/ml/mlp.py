"""Multilayer perceptron classifier — the third GDS model-catalog entry.

Reference surface (``gds.beta.pipeline.nodeClassification`` /
``linkPrediction`` model candidate ``mlp``
[GDS-pub: ml/ml-algo/.../MLPClassifier; public docs]): ReLU hidden
layers (``hiddenLayerSizes``, default [100]), softmax output,
cross-entropy loss with optional L2 ``penalty``, Adam optimizer
(``learningRate``), ``maxEpochs``, ``tolerance`` early stop.

Engine determinism rules: weights are initialized from splitmix64
hashes of the parameter index (uniform in ±1/sqrt(fan_in)) — a pure
function of (seed, shape), no RNG object; training is full-batch on the
driver-sized training set (identical floating-point op order every
run), so fitted params are bit-identical across runs and partitionings.
Prediction is a broadcastable params dict scored vectorized inside
``map_batches`` (pipelines/ml.py)."""

from __future__ import annotations

import numpy as np

from graph_data_science_ray.functions.joins import _mix64


def _hash_uniform_block(n: int, salt: int) -> np.ndarray:
    """n deterministic uniforms in [0, 1)."""
    h = _mix64(np.arange(n, dtype=np.uint64) ^ np.uint64(salt & 0xFFFFFFFFFFFFFFFF))
    return h.astype(np.float64) / float(2**64)


def _init_matrix(rows: int, cols: int, seed: int, layer: int) -> np.ndarray:
    salt = (seed * 0x9E3779B97F4A7C15 + (layer + 1) * 0xC2B2AE3D27D4EB4F) & 0xFFFFFFFFFFFFFFFF
    u = _hash_uniform_block(rows * cols, salt).reshape(rows, cols)
    bound = 1.0 / np.sqrt(max(1, rows))
    return (2.0 * u - 1.0) * bound


def _softmax(z: np.ndarray) -> np.ndarray:
    z = z - z.max(axis=1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=1, keepdims=True)


class MLPClassifier:
    def __init__(self, hidden_layer_sizes: tuple[int, ...] = (16,),
                 penalty: float = 1e-4, learning_rate: float = 0.01,
                 max_epochs: int = 300, tolerance: float = 1e-6,
                 seed: int = 42):
        self.hidden = tuple(hidden_layer_sizes)
        self.penalty = penalty
        self.lr = learning_rate
        self.max_epochs = max_epochs
        self.tolerance = tolerance
        self.seed = seed

    def fit(self, X: np.ndarray, y: np.ndarray) -> "MLPClassifier":
        X = np.asarray(X, dtype=np.float64)
        self.classes_ = np.unique(y)
        c = self.classes_.shape[0]
        yi = np.searchsorted(self.classes_, y)
        n, f = X.shape
        sizes = [f, *self.hidden, c]
        W = [_init_matrix(sizes[i], sizes[i + 1], self.seed, 2 * i) for i in range(len(sizes) - 1)]
        b = [np.zeros(sizes[i + 1]) for i in range(len(sizes) - 1)]
        # Adam state
        mW = [np.zeros_like(w) for w in W]
        vW = [np.zeros_like(w) for w in W]
        mb = [np.zeros_like(x) for x in b]
        vb = [np.zeros_like(x) for x in b]
        b1, b2, eps = 0.9, 0.999, 1e-8
        Yoh = np.zeros((n, c))
        Yoh[np.arange(n), yi] = 1.0
        prev_loss = np.inf
        self.n_iter_ = 0
        for epoch in range(1, self.max_epochs + 1):
            # forward
            acts = [X]
            for i in range(len(W) - 1):
                acts.append(np.maximum(0.0, acts[-1] @ W[i] + b[i]))
            logits = acts[-1] @ W[-1] + b[-1]
            P = _softmax(logits)
            loss = -np.log(np.maximum(P[np.arange(n), yi], 1e-300)).mean()
            loss += 0.5 * self.penalty * sum(float((w * w).sum()) for w in W)
            # backward
            delta = (P - Yoh) / n
            gW = [None] * len(W)
            gb = [None] * len(W)
            for i in range(len(W) - 1, -1, -1):
                gW[i] = acts[i].T @ delta + self.penalty * W[i]
                gb[i] = delta.sum(axis=0)
                if i > 0:
                    delta = (delta @ W[i].T) * (acts[i] > 0)
            # Adam step
            for i in range(len(W)):
                mW[i] = b1 * mW[i] + (1 - b1) * gW[i]
                vW[i] = b2 * vW[i] + (1 - b2) * gW[i] ** 2
                mb[i] = b1 * mb[i] + (1 - b1) * gb[i]
                vb[i] = b2 * vb[i] + (1 - b2) * gb[i] ** 2
                mh = mW[i] / (1 - b1**epoch)
                vh = vW[i] / (1 - b2**epoch)
                W[i] -= self.lr * mh / (np.sqrt(vh) + eps)
                mhb = mb[i] / (1 - b1**epoch)
                vhb = vb[i] / (1 - b2**epoch)
                b[i] -= self.lr * mhb / (np.sqrt(vhb) + eps)
            self.n_iter_ = epoch
            if abs(prev_loss - loss) < self.tolerance:
                break
            prev_loss = loss
        self.W_, self.b_ = W, b
        return self

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        return MLPClassifier.proba_from_params(self.params(), np.asarray(X, np.float64))

    def predict(self, X: np.ndarray) -> np.ndarray:
        return self.classes_[np.argmax(self.predict_proba(X), axis=1)]

    def params(self) -> dict:
        return {"kind": "mlp_classifier", "classes": self.classes_,
                "W": self.W_, "b": self.b_}

    @staticmethod
    def proba_from_params(params: dict, X: np.ndarray) -> np.ndarray:
        a = X
        W, b = params["W"], params["b"]
        for i in range(len(W) - 1):
            a = np.maximum(0.0, a @ W[i] + b[i])
        return _softmax(a @ W[-1] + b[-1])
