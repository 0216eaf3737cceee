"""FastRP node embeddings — per Neo4j GDS ``gds.fastRP`` (public docs;
Chen et al., "Fast and Accurate Network Embeddings via Very Sparse
Random Projection", 2019).

Semantics implemented:
- init R: very sparse random projection — entry ∈ {−√3, 0, +√3} with
  p = {1/6, 2/3, 1/6}; here drawn DETERMINISTICALLY per (node_id, dim)
  from a splitmix64 stream, so the embedding of a node is reproducible
  across runs, workers and partitionings (no RNG state to coordinate).
- optional degree-based scaling of the init rows: deg^normalization_strength.
- iterations: h⁽ⁱ⁾ = ℓ2-row-normalize(Ā h⁽ⁱ⁻¹⁾) with Ā the out-degree-
  normalized adjacency (average over out-neighbors, matching GDS's
  mean-aggregation); final embedding = Σ_i iteration_weights[i] · h⁽ⁱ⁾
  (weights[0] applies to the normalized INIT, as in GDS).

Dataflow: same scatter/gather as PageRank with a (n × d) matrix as the
broadcast node state; the per-batch combiner sums rows per dst with one
bincount per dimension.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from graph_data_science_ray.algos.common import BlockScanner, unique_inverse, unique_node_ids
from graph_data_science_ray.algos.pagerank import _out_weight
from graph_data_science_ray.context import configure_ray_data


def _mix(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _sparse_init(node_ids: np.ndarray, dim: int, seed: int) -> np.ndarray:
    """(n × d) very-sparse projection, pure function of (id, dim, seed)."""
    n = node_ids.shape[0]
    out = np.zeros((n, dim), dtype=np.float64)
    s3 = np.sqrt(3.0)
    for j in range(dim):
        u = _mix(node_ids ^ np.uint64(seed + 0x9E37 * (j + 1)))
        r = (u >> np.uint64(11)).astype(np.float64) / float(1 << 53)
        out[:, j] = np.where(r < 1 / 6, -s3, np.where(r < 2 / 6, s3, 0.0))
    return out


def _row_normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def fastrp(
    edges: Dataset,
    embedding_dimension: int = 64,
    iteration_weights: tuple[float, ...] = (0.0, 1.0, 1.0),
    normalization_strength: float = 0.0,
    seed: int = 42,
    weighted: bool = False,
    feature_table: "pa.Table | None" = None,
    property_ratio: float = 0.0,
) -> tuple[np.ndarray, np.ndarray]:
    """→ (sorted node_ids, embeddings (n × d) float64).

    ``weighted``: the reference's ``relationshipWeightProperty`` —
    neighbor aggregation becomes the weight-proportional mean
    (h_src · w / Σ_out w), requiring a ``weight`` column on ``edges``.

    ``feature_table`` + ``property_ratio``: the reference's
    ``featureProperties`` / ``propertyRatio`` — the last
    round(d · ratio) dimensions are initialized from a very-sparse
    random projection of the node's property vector (deterministic per
    (feature index, dim, seed), like the structural part); nodes absent
    from ``feature_table`` get zero property dimensions.
    ``feature_table`` columns: ``node_id`` + one float column per
    feature."""
    configure_ray_data()
    if not 0.0 <= property_ratio <= 1.0:
        raise ValueError("propertyRatio must be in [0, 1]")
    if property_ratio > 0.0 and feature_table is None:
        raise ValueError("propertyRatio > 0 requires feature_table")
    edges = edges.materialize()
    node_arr = unique_node_ids(edges)
    n = node_arr.shape[0]
    d = embedding_dimension
    out_w = _out_weight(edges, node_arr, weighted=weighted)

    dp = int(round(d * property_ratio)) if feature_table is not None else 0
    h = np.zeros((n, d), dtype=np.float64)
    if d - dp > 0:
        h[:, : d - dp] = _sparse_init(node_arr, d - dp, seed)
    if dp > 0:
        fcols = [c for c in feature_table.column_names if c != "node_id"]
        fids = feature_table.column("node_id").to_numpy(zero_copy_only=False)
        fmat = np.stack(
            [feature_table.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
             for c in fcols], axis=1,
        )
        # projection matrix keyed by feature INDEX (stable: column order)
        proj = _sparse_init(np.arange(1, len(fcols) + 1, dtype=np.int64), dp, seed + 1)
        pos = np.searchsorted(node_arr, fids)
        ok = (pos < n) & (node_arr[np.minimum(pos, n - 1)] == fids)
        h[pos[ok], d - dp:] = fmat[ok] @ proj
    if normalization_strength != 0.0:
        deg = np.maximum(out_w, 1.0)
        h = h * (deg**normalization_strength)[:, None]
    h = _row_normalize(h)
    emb = iteration_weights[0] * h

    scanner = BlockScanner(edges)
    for w_i in iteration_weights[1:]:
        # scatter rows/outdeg, gather mean over in-neighbors by dst
        scaled = np.divide(h, out_w[:, None], out=np.zeros_like(h), where=out_w[:, None] > 0)
        state_ref = ray.put((node_arr, scaled))

        def stage(batch: pa.Table) -> pa.Table:
            ids, sc = ray.get(state_ref)
            src = batch.column("src_id").to_numpy(zero_copy_only=False)
            dst = batch.column("dst_id").to_numpy(zero_copy_only=False)
            rows = sc[np.minimum(np.searchsorted(ids, src), ids.shape[0] - 1)]
            if weighted:
                rows = rows * batch.column("weight").to_numpy(
                    zero_copy_only=False
                ).astype(np.float64)[:, None]
            u, inv = unique_inverse(dst)
            agg = np.zeros((u.shape[0], rows.shape[1]))
            for j in range(rows.shape[1]):
                agg[:, j] = np.bincount(inv, weights=rows[:, j], minlength=u.shape[0])
            cols = {"dst_id": pa.array(u, pa.int64())}
            for j in range(agg.shape[1]):
                cols[f"v{j}"] = pa.array(agg[:, j], pa.float64())
            return pa.table(cols)

        t = scanner.scan(stage)
        new_h = np.zeros((n, d))
        if t.num_rows:
            ids = t.column("dst_id").to_numpy(zero_copy_only=False)
            mat = np.stack(
                [t.column(f"v{j}").to_numpy(zero_copy_only=False) for j in range(d)], axis=1
            )
            # merge partials (same dst across batches)
            u, inv = unique_inverse(ids)
            merged = np.zeros((u.shape[0], d))
            np.add.at(merged, inv, mat)
            new_h[np.searchsorted(node_arr, u)] = merged
        h = _row_normalize(new_h)
        emb = emb + w_i * h

    return node_arr, emb


def fastrp_table(edges: Dataset, **kwargs) -> pa.Table:
    ids, emb = fastrp(edges, **kwargs)
    return pa.table(
        {
            "node_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(list(emb), pa.list_(pa.float64())),
        }
    )
