"""Decision trees + random forests — the GDS model-catalog parity pieces.

Reference surface (``gds.beta.pipeline.nodeClassification`` /
``nodeRegression`` / ``linkPrediction`` model candidates
[GDS-pub: ml/ml-algo/src/main/java/org/neo4j/gds/ml/decisiontree/ +
models/randomforest/; public docs]): alongside logistic/linear
regression, pipelines may train ``randomForest`` models configured by
``numberOfDecisionTrees`` (default 100), ``maxDepth``, ``minSplitSize``
(default 2), ``minLeafSize`` (default 1), ``maxFeaturesRatio`` (default
1/sqrt(f) for classification, 1.0 for regression), Gini impurity for
classification and variance (MSE) for regression.

This implementation keeps the engine's determinism rules: bootstrap
row sampling and per-split feature subsampling are splitmix64-hash
functions of (seed, tree, node) — bit-identical across runs and
partitionings, no RNG state. Training is driver-side numpy (the
reference trains in one JVM too — pipelines collect the label-table-
sized training set); prediction is a broadcastable flat-array params
dict scored vectorized inside ``map_batches`` (see pipelines/ml.py).

Fit cost per node is one lexsort + prefix-scan per candidate feature
(O(n log n)); the split search is fully vectorized over candidate
thresholds — no Python loop over rows.
"""

from __future__ import annotations

import numpy as np

from graph_data_science_ray.functions.joins import _mix64


def _hash_ints(idx: np.ndarray, salt: int) -> np.ndarray:
    return _mix64(idx.astype(np.uint64) ^ np.uint64(salt & 0xFFFFFFFFFFFFFFFF))


def _bootstrap_indices(n: int, seed: int, tree: int) -> np.ndarray:
    """n draws with replacement — mix64(i ^ salt) % n, a pure function."""
    salt = (seed * 0x9E3779B97F4A7C15 + (tree + 1) * 0xC2B2AE3D27D4EB4F) & 0xFFFFFFFFFFFFFFFF
    return (_hash_ints(np.arange(n, dtype=np.int64), salt) % np.uint64(n)).astype(np.int64)


def _feature_subset(f: int, k: int, seed: int, tree: int, node: int) -> np.ndarray:
    """k of f features, chosen by per-(tree,node) hash ranking."""
    if k >= f:
        return np.arange(f, dtype=np.int64)
    salt = (seed * 0xBF58476D1CE4E5B9 + (tree + 1) * 0x94D049BB133111EB + (node + 1) * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    h = _hash_ints(np.arange(f, dtype=np.int64), salt)
    return np.sort(np.argsort(h, kind="stable")[:k]).astype(np.int64)


def _best_split_feature(x: np.ndarray, Y: np.ndarray, min_leaf: int) -> tuple[float, float]:
    """Best threshold on one feature. ``Y``: (n, c) one-hot counts for
    classification, or (n, 2) [y, y^2] for regression (c == 2 with the
    caller choosing the criterion via ``Y``'s construction is ambiguous,
    so the caller passes classification Y with c>=1 one-hot columns and
    regression via _best_split_feature_reg). Returns (score, threshold)
    where LOWER score = better (weighted Gini); (inf, nan) if no valid
    split. Threshold rule: go LEFT iff x <= t, t = midpoint of the
    adjacent distinct values."""
    order = np.argsort(x, kind="stable")
    xs = x[order]
    Ys = Y[order]
    n = xs.shape[0]
    cum = np.cumsum(Ys, axis=0)  # (n, c)
    total = cum[-1]
    # candidate split after position i (left = [0..i]) where value changes
    cand = np.flatnonzero(xs[:-1] != xs[1:])
    if cand.size == 0:
        return np.inf, np.nan
    nl = (cand + 1).astype(np.float64)
    nr = n - nl
    ok = (nl >= min_leaf) & (nr >= min_leaf)
    if not ok.any():
        return np.inf, np.nan
    cand, nl, nr = cand[ok], nl[ok], nr[ok]
    L = cum[cand]  # (m, c)
    R = total[None, :] - L
    gl = 1.0 - ((L / nl[:, None]) ** 2).sum(axis=1)
    gr = 1.0 - ((R / nr[:, None]) ** 2).sum(axis=1)
    score = (nl * gl + nr * gr) / n
    b = int(np.argmin(score))  # first minimum = lowest threshold tie-break
    thr = 0.5 * (xs[cand[b]] + xs[cand[b] + 1])
    return float(score[b]), float(thr)


def _best_split_feature_reg(x: np.ndarray, y: np.ndarray, min_leaf: int) -> tuple[float, float]:
    """Regression twin: minimizes total SSE = Σ(y−ȳ_left)² + Σ(y−ȳ_right)²."""
    order = np.argsort(x, kind="stable")
    xs = x[order]
    ys = y[order]
    n = xs.shape[0]
    c1 = np.cumsum(ys)
    c2 = np.cumsum(ys * ys)
    cand = np.flatnonzero(xs[:-1] != xs[1:])
    if cand.size == 0:
        return np.inf, np.nan
    nl = (cand + 1).astype(np.float64)
    nr = n - nl
    ok = (nl >= min_leaf) & (nr >= min_leaf)
    if not ok.any():
        return np.inf, np.nan
    cand, nl, nr = cand[ok], nl[ok], nr[ok]
    sl, ql = c1[cand], c2[cand]
    sr, qr = c1[-1] - sl, c2[-1] - ql
    sse = (ql - sl * sl / nl) + (qr - sr * sr / nr)
    b = int(np.argmin(sse))
    thr = 0.5 * (xs[cand[b]] + xs[cand[b] + 1])
    return float(sse[b]), float(thr)


class DecisionTree:
    """CART, flat-array representation (broadcast + vectorized descent).

    Arrays (length = #nodes): ``feature`` (-1 at leaves), ``threshold``,
    ``left``/``right`` child indices, ``value`` — per-node class
    probability vector (classification, shape (nodes, c)) or mean target
    (regression, shape (nodes, 1))."""

    def __init__(self, task: str = "classification", max_depth: int = 10,
                 min_split_size: int = 2, min_leaf_size: int = 1,
                 max_features_ratio: float | None = None, seed: int = 42,
                 tree_index: int = 0):
        assert task in ("classification", "regression")
        self.task = task
        self.max_depth = max_depth
        self.min_split_size = max(2, min_split_size)
        self.min_leaf_size = max(1, min_leaf_size)
        self.max_features_ratio = max_features_ratio
        self.seed = seed
        self.tree_index = tree_index

    def fit(self, X: np.ndarray, y: np.ndarray, classes: np.ndarray | None = None) -> "DecisionTree":
        X = np.asarray(X, dtype=np.float64)
        n, f = X.shape
        if self.task == "classification":
            self.classes_ = np.unique(y) if classes is None else np.asarray(classes)
            c = self.classes_.shape[0]
            yi = np.searchsorted(self.classes_, y)
            Y = np.zeros((n, c), dtype=np.float64)
            Y[np.arange(n), yi] = 1.0
        else:
            self.classes_ = None
            yv = np.asarray(y, dtype=np.float64)

        ratio = self.max_features_ratio
        if ratio is None:
            ratio = (1.0 / np.sqrt(f)) if self.task == "classification" else 1.0
        k = max(1, min(f, int(round(ratio * f))))

        feature, threshold, left, right, value = [], [], [], [], []

        def leaf_value(idx: np.ndarray) -> np.ndarray:
            if self.task == "classification":
                return Y[idx].sum(axis=0) / idx.shape[0]
            return np.array([yv[idx].mean()])

        # DFS with explicit stack; node ids assigned in push order so the
        # per-node feature subset is a pure function of the build path.
        stack = [(np.arange(n, dtype=np.int64), 0, None, False)]  # (rows, depth, parent, is_right)
        while stack:
            idx, depth, parent, is_right = stack.pop()
            node = len(feature)
            if parent is not None:
                (right if is_right else left)[parent] = node
            feature.append(-1)
            threshold.append(np.nan)
            left.append(-1)
            right.append(-1)
            value.append(leaf_value(idx))

            if depth >= self.max_depth or idx.shape[0] < self.min_split_size:
                continue
            if self.task == "classification" and (Y[idx].sum(axis=0) > 0).sum() <= 1:
                continue  # pure node
            feats = _feature_subset(f, k, self.seed, self.tree_index, node)
            best = (np.inf, np.nan, -1)
            for fi in feats:
                if self.task == "classification":
                    s, t = _best_split_feature(X[idx, fi], Y[idx], self.min_leaf_size)
                else:
                    s, t = _best_split_feature_reg(X[idx, fi], yv[idx], self.min_leaf_size)
                if s < best[0]:  # strict < keeps lowest feature index on ties
                    best = (s, t, int(fi))
            if not np.isfinite(best[0]):
                continue
            _, thr, fi = best
            go_left = X[idx, fi] <= thr
            feature[node] = fi
            threshold[node] = thr
            # push right first so LEFT is processed next (preorder ids)
            stack.append((idx[~go_left], depth + 1, node, True))
            stack.append((idx[go_left], depth + 1, node, False))

        self.feature_ = np.array(feature, dtype=np.int64)
        self.threshold_ = np.array(threshold, dtype=np.float64)
        self.left_ = np.array(left, dtype=np.int64)
        self.right_ = np.array(right, dtype=np.int64)
        self.value_ = np.vstack(value)
        return self

    @staticmethod
    def _descend(feature, threshold, left, right, X: np.ndarray) -> np.ndarray:
        """Vectorized root-to-leaf descent; returns leaf node index per row."""
        node = np.zeros(X.shape[0], dtype=np.int64)
        while True:
            f = feature[node]
            live = f >= 0
            if not live.any():
                return node
            rows = np.flatnonzero(live)
            fl = f[rows]
            goes_left = X[rows, fl] <= threshold[node[rows]]
            node[rows] = np.where(goes_left, left[node[rows]], right[node[rows]])


class RandomForestClassifier:
    """``randomForest`` classification model (soft-vote over per-tree
    leaf class distributions, exactly the GDS probability-averaging
    prediction [GDS-pub: ml/models/randomforest/])."""

    def __init__(self, n_trees: int = 20, max_depth: int = 10,
                 min_split_size: int = 2, min_leaf_size: int = 1,
                 max_features_ratio: float | None = None, seed: int = 42):
        self.n_trees = n_trees
        self.max_depth = max_depth
        self.min_split_size = min_split_size
        self.min_leaf_size = min_leaf_size
        self.max_features_ratio = max_features_ratio
        self.seed = seed

    def fit(self, X: np.ndarray, y: np.ndarray) -> "RandomForestClassifier":
        X = np.asarray(X, dtype=np.float64)
        self.classes_ = np.unique(y)
        self.trees_ = []
        n = X.shape[0]
        for t in range(self.n_trees):
            bi = np.sort(_bootstrap_indices(n, self.seed, t))
            tree = DecisionTree("classification", self.max_depth, self.min_split_size,
                                self.min_leaf_size, self.max_features_ratio,
                                seed=self.seed, tree_index=t)
            tree.fit(X[bi], y[bi], classes=self.classes_)
            self.trees_.append(tree)
        self.n_iter_ = self.n_trees
        return self

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        return RandomForestClassifier.proba_from_params(self.params(), np.asarray(X, np.float64))

    def predict(self, X: np.ndarray) -> np.ndarray:
        proba = self.predict_proba(X)
        return self.classes_[np.argmax(proba, axis=1)]

    def params(self) -> dict:
        return {
            "kind": "random_forest_classifier",
            "classes": self.classes_,
            "trees": [
                {"feature": t.feature_, "threshold": t.threshold_,
                 "left": t.left_, "right": t.right_, "value": t.value_}
                for t in self.trees_
            ],
        }

    @staticmethod
    def proba_from_params(params: dict, X: np.ndarray) -> np.ndarray:
        c = params["classes"].shape[0]
        acc = np.zeros((X.shape[0], c), dtype=np.float64)
        for t in params["trees"]:
            leaf = DecisionTree._descend(t["feature"], t["threshold"], t["left"], t["right"], X)
            acc += t["value"][leaf]
        return acc / max(1, len(params["trees"]))


class RandomForestRegressor:
    """``randomForest`` regression model (mean of per-tree leaf means)."""

    def __init__(self, n_trees: int = 20, max_depth: int = 10,
                 min_split_size: int = 2, min_leaf_size: int = 1,
                 max_features_ratio: float | None = None, seed: int = 42):
        self.n_trees = n_trees
        self.max_depth = max_depth
        self.min_split_size = min_split_size
        self.min_leaf_size = min_leaf_size
        self.max_features_ratio = max_features_ratio
        self.seed = seed

    def fit(self, X: np.ndarray, y: np.ndarray) -> "RandomForestRegressor":
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        self.trees_ = []
        n = X.shape[0]
        for t in range(self.n_trees):
            bi = np.sort(_bootstrap_indices(n, self.seed, t))
            tree = DecisionTree("regression", self.max_depth, self.min_split_size,
                                self.min_leaf_size, self.max_features_ratio,
                                seed=self.seed, tree_index=t)
            tree.fit(X[bi], y[bi])
            self.trees_.append(tree)
        return self

    def predict(self, X: np.ndarray) -> np.ndarray:
        return RandomForestRegressor.predict_from_params(self.params(), np.asarray(X, np.float64))

    def params(self) -> dict:
        return {
            "kind": "random_forest_regressor",
            "trees": [
                {"feature": t.feature_, "threshold": t.threshold_,
                 "left": t.left_, "right": t.right_, "value": t.value_}
                for t in self.trees_
            ],
        }

    @staticmethod
    def predict_from_params(params: dict, X: np.ndarray) -> np.ndarray:
        acc = np.zeros(X.shape[0], dtype=np.float64)
        for t in params["trees"]:
            leaf = DecisionTree._descend(t["feature"], t["threshold"], t["left"], t["right"], X)
            acc += t["value"][leaf, 0]
        return acc / max(1, len(params["trees"]))
