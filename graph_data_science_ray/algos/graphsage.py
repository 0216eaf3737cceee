"""GraphSAGE node embeddings — per Neo4j GDS ``gds.beta.graphSage.train``
/ ``gds.beta.graphSage.stream`` (public docs; Hamilton, Ying & Leskovec,
"Inductive Representation Learning on Large Graphs", NeurIPS 2017).

Semantics implemented (mean aggregator):
- layer k: h_k(v) = act( [h_{k-1}(v) ; mean_{u∈N(v)} h_{k-1}(u)] @ W_k + b_k )
  with ReLU on hidden layers, linear output layer, final L2 row-normalize
  (GDS normalizes sage embeddings);
- unsupervised loss as in the paper: positive pairs from short random
  walks, Q hash-sampled negatives, logistic loss on dot products;
- TRAINING is driver-side numpy on a deterministically-sampled subgraph
  (hash-chosen train nodes + their sampled ≤`sample_size` multi-hop
  neighborhoods — the reference likewise trains in one JVM on sampled
  batches); full-batch Adam, manual backprop, zero RNG (all sampling and
  init derive from splitmix64 of ids and the seed);
- INFERENCE is distributed with the engine's broadcast-state pattern
  (algos/fastrp.py): per layer, one streamed edge scan computes the
  neighbor-mean matrix (per-batch bincount partials, driver merge of
  O(n·d) state), then the layer weights apply vectorized. The O(E) work
  is on the cluster; only node-state crosses the driver.

The neighborhood is the UNDIRECTED one (edges are symmetrized
internally), matching GDS's usual sage projection.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from graph_data_science_ray.algos.common import BlockScanner, collect_arrow, unique_inverse, unique_node_ids
from graph_data_science_ray.context import configure_ray_data
from graph_data_science_ray.sources.edges import drop_self_loops, symmetrize


def _mix(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _hash_u01(ids: np.ndarray, seed: int) -> np.ndarray:
    h = _mix(ids.astype(np.uint64) ^ np.uint64(0x9E3779B97F4A7C15 * (seed + 1) & 0xFFFFFFFFFFFFFFFF))
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _glorot(fan_in: int, fan_out: int, seed: int) -> np.ndarray:
    """Deterministic Glorot-uniform init from a splitmix64 stream."""
    idx = np.arange(fan_in * fan_out, dtype=np.uint64)
    u = (_mix(idx ^ np.uint64(seed * 2654435761 + 1)) >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    lim = np.sqrt(6.0 / (fan_in + fan_out))
    return ((u * 2 - 1) * lim).reshape(fan_in, fan_out)


def _row_normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class GraphSageModel:
    """Trained weight bundle; picklable for ``ray.put`` broadcast."""

    def __init__(self, weights: list[tuple[np.ndarray, np.ndarray]],
                 feature_dim: int):
        self.weights = weights
        self.feature_dim = feature_dim

    @property
    def embedding_dimension(self) -> int:
        return self.weights[-1][0].shape[1]

    def forward(self, X: np.ndarray, means: list[np.ndarray]) -> np.ndarray:
        """Apply the layers given precomputed per-layer neighbor means.
        ``means[k]`` must be the neighbor mean of the layer-k INPUT."""
        h = X
        for k, (W, b) in enumerate(self.weights):
            z = np.concatenate([h, means[k]], axis=1) @ W + b
            h = np.maximum(z, 0.0) if k < len(self.weights) - 1 else z
        return _row_normalize(h)


def _degree_features(edges_sym: Dataset, node_arr: np.ndarray) -> np.ndarray:
    """Fallback feature: log1p(undirected degree), 1-D — the reference's
    degree-as-property option when no featureProperties are given."""
    def stage(t: pa.Table) -> pa.Table:
        src = t.column("src_id").to_numpy(zero_copy_only=False)
        u, c = np.unique(src, return_counts=True)
        return pa.table({"node_id": pa.array(u, pa.int64()),
                         "c": pa.array(c.astype(np.int64), pa.int64())})

    t = BlockScanner(edges_sym).scan(stage)
    deg = np.zeros(node_arr.shape[0])
    if t.num_rows:
        ids = t.column("node_id").to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False).astype(np.float64)
        u, inv = unique_inverse(ids)
        merged = np.bincount(inv, weights=c, minlength=u.shape[0])
        # node_arr may be a subgraph of the scanned edges (training path)
        pos = np.searchsorted(node_arr, u)
        ok = (pos < node_arr.shape[0]) & (node_arr[np.minimum(pos, node_arr.shape[0] - 1)] == u)
        deg[pos[ok]] = merged[ok]
    return np.log1p(deg)[:, None]


def _features_matrix(features: pa.Table | None, edges_sym: Dataset,
                     node_arr: np.ndarray, feature_col: str) -> np.ndarray:
    if features is None:
        return _degree_features(edges_sym, node_arr)
    fid = features.column("node_id").to_numpy(zero_copy_only=False)
    F = np.array(features.column(feature_col).to_pylist(), dtype=np.float64)
    order = np.argsort(fid, kind="stable")
    fid, F = fid[order], F[order]
    X = np.zeros((node_arr.shape[0], F.shape[1] if F.ndim == 2 else 1))
    pos = np.searchsorted(fid, node_arr)
    ok = (pos < fid.shape[0]) & (fid[np.minimum(pos, fid.shape[0] - 1)] == node_arr)
    X[ok] = F[pos[ok]]
    return X


def _neighbor_mean_distributed(edges_sym: Dataset, node_arr: np.ndarray,
                               h: np.ndarray) -> np.ndarray:
    """mean_{u∈N(v)} h(u) for every v — one streamed edge scan.
    Per-batch: gather src rows, bincount partial sums + counts per dst;
    driver: merge partials, divide. Zero rows for isolated nodes."""
    d = h.shape[1]
    state_ref = ray.put((node_arr, h))

    def stage(batch: pa.Table) -> pa.Table:
        ids, hh = ray.get(state_ref)
        src = batch.column("src_id").to_numpy(zero_copy_only=False)
        dst = batch.column("dst_id").to_numpy(zero_copy_only=False)
        rows = hh[np.minimum(np.searchsorted(ids, src), ids.shape[0] - 1)]
        u, inv = unique_inverse(dst)
        agg = np.zeros((u.shape[0], rows.shape[1] + 1))
        for j in range(rows.shape[1]):
            agg[:, j] = np.bincount(inv, weights=rows[:, j], minlength=u.shape[0])
        agg[:, -1] = np.bincount(inv, minlength=u.shape[0])
        cols = {"dst_id": pa.array(u, pa.int64())}
        for j in range(agg.shape[1]):
            cols[f"v{j}"] = pa.array(agg[:, j], pa.float64())
        return pa.table(cols)

    t = BlockScanner(edges_sym).scan(stage)
    out = np.zeros((node_arr.shape[0], d))
    if t.num_rows:
        ids = t.column("dst_id").to_numpy(zero_copy_only=False)
        mat = np.stack([t.column(f"v{j}").to_numpy(zero_copy_only=False)
                        for j in range(d + 1)], axis=1)
        u, inv = unique_inverse(ids)
        merged = np.zeros((u.shape[0], d + 1))
        np.add.at(merged, inv, mat)
        cnt = np.maximum(merged[:, -1], 1.0)
        out[np.searchsorted(node_arr, u)] = merged[:, :-1] / cnt[:, None]
    return out


def _sample_neighbors(adj_src: np.ndarray, adj_dst: np.ndarray,
                      sample_size: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Keep ≤sample_size neighbors per src, chosen by hash rank of
    (src, dst, seed) — deterministic, order-independent."""
    r = _hash_u01(_mix(adj_src.astype(np.uint64)) ^ adj_dst.astype(np.uint64), seed)
    order = np.lexsort((r, adj_src))
    s, dsts = adj_src[order], adj_dst[order]
    if s.shape[0] == 0:
        return s, dsts
    new = np.r_[True, s[1:] != s[:-1]]
    grp_start = np.flatnonzero(new)
    rank = np.arange(s.shape[0]) - np.repeat(grp_start, np.diff(np.r_[grp_start, s.shape[0]]))
    keep = rank < sample_size
    return s[keep], dsts[keep]


def graphsage_train(
    edges: Dataset,
    features: pa.Table | None = None,
    feature_col: str = "embedding",
    embedding_dimension: int = 16,
    hidden_dimension: int | None = None,
    layers: int = 2,
    sample_size: int = 10,
    max_train_nodes: int = 512,
    walk_length: int = 3,
    negative_samples: int = 5,
    epochs: int = 30,
    learning_rate: float = 0.01,
    seed: int = 42,
) -> GraphSageModel:
    """Train mean-aggregator GraphSAGE weights on a hash-sampled
    subgraph; returns the broadcastable model. Pure function of
    (edges, features, config) — every sample is splitmix64-derived."""
    configure_ray_data()
    und = symmetrize(drop_self_loops(edges)).materialize()
    node_arr = unique_node_ids(und)
    if node_arr.shape[0] == 0:
        raise ValueError("empty graph")

    # --- deterministic train-node choice + multi-hop sampled frontier
    r = _hash_u01(node_arr, seed)
    k = min(max_train_nodes, node_arr.shape[0])
    train_nodes = node_arr[np.argsort(r, kind="stable")[:k]]

    frontier = np.sort(train_nodes)
    sub_src_parts, sub_dst_parts = [], []
    touched = frontier
    for hop in range(layers):
        want_ref = ray.put(frontier)

        def pick(t: pa.Table) -> pa.Table:
            want = ray.get(want_ref)
            src = t.column("src_id").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(want, src)
            hit = (pos < want.shape[0]) & (want[np.minimum(pos, want.shape[0] - 1)] == src)
            return t.filter(pa.array(hit))

        got = collect_arrow(und.map_batches(pick, batch_format="pyarrow",
                                            zero_copy_batch=True))
        if got.num_rows == 0:
            break
        s = got.column("src_id").to_numpy(zero_copy_only=False)
        d2 = got.column("dst_id").to_numpy(zero_copy_only=False)
        s, d2 = _sample_neighbors(s, d2, sample_size, seed + 17 * (hop + 1))
        sub_src_parts.append(s)
        sub_dst_parts.append(d2)
        nxt = np.unique(d2)
        frontier = np.setdiff1d(nxt, touched, assume_unique=True)
        touched = np.union1d(touched, nxt)
        if frontier.shape[0] == 0:
            break

    sub_src = np.concatenate(sub_src_parts) if sub_src_parts else np.empty(0, np.int64)
    sub_dst = np.concatenate(sub_dst_parts) if sub_dst_parts else np.empty(0, np.int64)
    local_ids = np.union1d(np.unique(np.concatenate([sub_src, sub_dst])) if sub_src.shape[0] else np.empty(0, np.int64),
                           train_nodes)
    li_src = np.searchsorted(local_ids, sub_src)
    li_dst = np.searchsorted(local_ids, sub_dst)
    n_local = local_ids.shape[0]

    # dense row-normalized (sampled) adjacency of the training subgraph
    A = np.zeros((n_local, n_local))
    A[li_src, li_dst] = 1.0
    A = A + A.T
    A[A > 0] = 1.0
    rs = A.sum(axis=1, keepdims=True)
    Abar = np.divide(A, rs, out=np.zeros_like(A), where=rs > 0)

    X = _features_matrix(features, und, local_ids, feature_col)
    f = X.shape[1]
    hid = hidden_dimension or embedding_dimension
    dims = [f] + [hid] * (layers - 1) + [embedding_dimension]
    weights = [(_glorot(2 * dims[kk], dims[kk + 1], seed + 31 * kk),
                np.zeros(dims[kk + 1])) for kk in range(layers)]

    # --- positive pairs: deterministic walks on the subgraph
    nbr_idx = [np.flatnonzero(A[i]) for i in range(n_local)]
    starts = np.searchsorted(local_ids, train_nodes)
    pos_u, pos_v = [], []
    for step in range(walk_length):
        cur = starts if step == 0 else nxt_nodes
        choice = np.empty(cur.shape[0], np.int64)
        for i, c in enumerate(cur):
            nb = nbr_idx[c]
            if nb.shape[0] == 0:
                choice[i] = c
            else:
                hsh = _mix(local_ids[nb].astype(np.uint64)
                           ^ np.uint64(local_ids[c]) ^ np.uint64(seed + 977 * (step + 1)))
                choice[i] = nb[np.argmin(hsh)]
        ok = choice != cur
        pos_u.append(starts[ok] if step == 0 else walk_anchor[ok])
        pos_v.append(choice[ok])
        walk_anchor = (starts if step == 0 else walk_anchor)
        nxt_nodes = choice
    pu = np.concatenate(pos_u) if pos_u else np.empty(0, np.int64)
    pv = np.concatenate(pos_v) if pos_v else np.empty(0, np.int64)
    if pu.shape[0] == 0:  # no edges at all — nothing to train on
        return GraphSageModel(weights, f)

    # negatives: Q hash-picked node indices per positive pair
    q = negative_samples
    neg_idx = (_mix(np.arange(pu.shape[0] * q, dtype=np.uint64)
                    ^ np.uint64(seed * 7919 + 3)) % np.uint64(n_local)).astype(np.int64)
    nu = np.repeat(pu, q)
    nv = neg_idx

    # --- full-batch Adam with manual backprop
    mW = [np.zeros_like(W) for W, _ in weights]
    vW = [np.zeros_like(W) for W, _ in weights]
    mb = [np.zeros_like(b) for _, b in weights]
    vb = [np.zeros_like(b) for _, b in weights]
    b1, b2, eps = 0.9, 0.999, 1e-8

    for ep in range(1, epochs + 1):
        # forward
        hs = [X]
        means, zs = [], []
        h = X
        for kk, (W, b) in enumerate(weights):
            m = Abar @ h
            z = np.concatenate([h, m], axis=1) @ W + b
            h = np.maximum(z, 0.0) if kk < layers - 1 else z
            means.append(m)
            zs.append(z)
            hs.append(h)
        norms = np.linalg.norm(h, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        Z = h / norms

        # loss grads on Z
        dZ = np.zeros_like(Z)

        def _accum(uu, vv, y):
            s = (Z[uu] * Z[vv]).sum(axis=1)
            g = 1.0 / (1.0 + np.exp(-s)) - y          # σ(s) − y
            np.add.at(dZ, uu, g[:, None] * Z[vv])
            np.add.at(dZ, vv, g[:, None] * Z[uu])

        _accum(pu, pv, 1.0)
        _accum(nu, nv, 0.0)
        dZ /= pu.shape[0] * (1 + q)

        # back through L2 normalize: dh = (dZ − Z·(Z∘dZ).sum) / ‖h‖
        dh = (dZ - Z * (Z * dZ).sum(axis=1, keepdims=True)) / norms

        gWs, gbs = [], []
        for kk in range(layers - 1, -1, -1):
            W, b = weights[kk]
            if kk < layers - 1:
                dh = dh * (zs[kk] > 0)
            cat = np.concatenate([hs[kk], means[kk]], axis=1)
            gW = cat.T @ dh
            gb = dh.sum(axis=0)
            dcat = dh @ W.T
            dprev = dcat[:, : dims[kk]] + Abar.T @ dcat[:, dims[kk]:]
            gWs.append(gW)
            gbs.append(gb)
            dh = dprev
        gWs.reverse()
        gbs.reverse()

        for kk in range(layers):
            W, b = weights[kk]
            mW[kk] = b1 * mW[kk] + (1 - b1) * gWs[kk]
            vW[kk] = b2 * vW[kk] + (1 - b2) * gWs[kk] ** 2
            mb[kk] = b1 * mb[kk] + (1 - b1) * gbs[kk]
            vb[kk] = b2 * vb[kk] + (1 - b2) * gbs[kk] ** 2
            mhW = mW[kk] / (1 - b1**ep)
            vhW = vW[kk] / (1 - b2**ep)
            mhb = mb[kk] / (1 - b1**ep)
            vhb = vb[kk] / (1 - b2**ep)
            weights[kk] = (W - learning_rate * mhW / (np.sqrt(vhW) + eps),
                           b - learning_rate * mhb / (np.sqrt(vhb) + eps))

    return GraphSageModel(weights, f)


def graphsage_embeddings(
    edges: Dataset,
    model: GraphSageModel,
    features: pa.Table | None = None,
    feature_col: str = "embedding",
) -> tuple[np.ndarray, np.ndarray]:
    """Distributed inference over the FULL graph → (sorted node_ids,
    embeddings (n × d)). One streamed edge scan per layer (the O(E)
    cost); driver holds only the O(n·d) node state."""
    configure_ray_data()
    und = symmetrize(drop_self_loops(edges)).materialize()
    node_arr = unique_node_ids(und)
    h = _features_matrix(features, und, node_arr, feature_col)
    if h.shape[1] != model.feature_dim:
        raise ValueError(
            f"feature dim {h.shape[1]} != model feature dim {model.feature_dim}")
    for kk, (W, b) in enumerate(model.weights):
        m = _neighbor_mean_distributed(und, node_arr, h)
        z = np.concatenate([h, m], axis=1) @ W + b
        h = np.maximum(z, 0.0) if kk < len(model.weights) - 1 else z
    return node_arr, _row_normalize(h)


def graphsage_table(edges: Dataset, features: pa.Table | None = None,
                    **kwargs) -> pa.Table:
    """train + stream in one call → (node_id, embedding) table."""
    infer_keys = {"feature_col"}
    model = graphsage_train(edges, features=features, **kwargs)
    ik = {k: v for k, v in kwargs.items() if k in infer_keys}
    ids, emb = graphsage_embeddings(edges, model, features=features, **ik)
    return pa.table(
        {"node_id": pa.array(ids, pa.int64()),
         "embedding": pa.array(list(emb), pa.list_(pa.float64()))}
    )
