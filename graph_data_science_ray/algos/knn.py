"""KNN — k nearest neighbors per node over node-property vectors.

Reference semantics (``gds.knn``, [GDS-pub: algo/.../knn/]): for every
node, the k most similar nodes by a node-property vector (cosine), with
the reference using randomized neighbor-list refinement (NN-Descent)
for scale. This engine composes its existing primitives instead:

- property vectors default to this repo's FastRP embeddings (or any
  caller-provided (node_id, embedding) source),
- exact top-k by the broadcast-matrix idiom: the normalized (n × d)
  matrix is ``ray.put`` once (node-vector × d — the standing driver
  assumption), and the embedding rows stream through ``map_batches``,
  each batch computing sims against the broadcast matrix and keeping
  its rows' top-k (self excluded). Exact, deterministic, one scan; the
  LSH-bucketed variant in stages/embed.py is the beyond-n² scale path.

Output: (node_id, neighbour_id, similarity) — GDS stream-mode shape.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data
from ray.data import Dataset

from graph_data_science_ray.algos.fastrp import fastrp
from graph_data_science_ray.context import configure_ray_data, shuffle_partitions_for


def knn_graph(
    edges: Dataset,
    k: int = 5,
    embedding_dimension: int = 64,
    seed: int = 42,
    num_partitions: int | None = None,
    similarity_cutoff: float = -1.0,
) -> Dataset:
    """KNN over FastRP embeddings of the graph itself."""
    node_ids, emb = fastrp(edges, embedding_dimension=embedding_dimension, seed=seed)
    return knn_matrix(
        node_ids, emb, k=k, num_partitions=num_partitions,
        similarity_cutoff=similarity_cutoff,
    )


def filtered_knn_graph(
    edges: Dataset,
    k: int = 5,
    source_nodes=None,
    target_nodes=None,
    embedding_dimension: int = 64,
    seed: int = 42,
    num_partitions: int | None = None,
) -> Dataset:
    """Filtered KNN (``gds.knn.filtered`` [GDS-pub: algo/.../similarity/
    filteredknn/]): results restricted to sourceNodeFilter rows and
    targetNodeFilter neighbour candidates. Same exact broadcast-matrix
    kernel; the filters shrink the streamed row set (source) and mask
    the broadcast columns (target) — no extra shuffle."""
    node_ids, emb = fastrp(edges, embedding_dimension=embedding_dimension, seed=seed)
    return knn_matrix(
        node_ids, emb, k=k, num_partitions=num_partitions,
        source_nodes=source_nodes, target_nodes=target_nodes,
    )


def knn_matrix(
    node_ids: np.ndarray,
    emb: np.ndarray,
    k: int = 5,
    num_partitions: int | None = None,
    source_nodes=None,
    target_nodes=None,
    similarity_cutoff: float = -1.0,
) -> Dataset:
    """``similarity_cutoff`` mirrors gds.knn's similarityCutoff: pairs
    below it are dropped (cosine ∈ [-1, 1]; default keeps all)."""
    configure_ray_data()
    num_partitions = num_partitions or shuffle_partitions_for()
    norms = np.linalg.norm(emb, axis=1, keepdims=True)
    m = np.divide(emb, norms, out=np.zeros_like(emb), where=norms > 0)
    target_mask = None
    if target_nodes is not None:
        target_mask = np.isin(node_ids, np.asarray(list(target_nodes), dtype=np.int64))
    mat_ref = ray.put((node_ids, m, target_mask))

    positions = np.arange(node_ids.shape[0])
    if source_nodes is not None:
        positions = positions[
            np.isin(node_ids, np.asarray(list(source_nodes), dtype=np.int64))
        ]
    rows = pa.table({"pos": pa.array(positions, pa.int64())})
    ds = ray.data.from_arrow(rows).repartition(min(num_partitions, max(1, positions.shape[0])))

    cutoff = similarity_cutoff

    def topk(batch: pa.Table) -> pa.Table:
        ids, mm, tmask = ray.get(mat_ref)
        pos = batch.column("pos").to_numpy(zero_copy_only=False)
        sims = mm[pos] @ mm.T  # (b, n)
        sims[np.arange(pos.shape[0]), pos] = -np.inf  # exclude self
        if tmask is not None:
            sims[:, ~tmask] = -np.inf
        kk = min(k, mm.shape[0] - 1)
        if kk <= 0:
            return pa.table(
                {
                    "node_id": pa.array([], pa.int64()),
                    "neighbour_id": pa.array([], pa.int64()),
                    "similarity": pa.array([], pa.float64()),
                }
            )
        # full (-score, neighbour id) sort so ties AT the k boundary are
        # broken deterministically by id (argpartition's boundary pick is
        # arbitrary); n log n per row is noise at broadcast-matrix scale
        part = np.lexsort((np.broadcast_to(ids, sims.shape), -sims), axis=1)[:, :kk]
        sc = np.take_along_axis(sims, part, axis=1)
        src = np.repeat(ids[pos], kk)
        nbr = ids[part.ravel()]
        scr = sc.ravel()
        # target filtering can leave a row with < kk candidates — the
        # -inf placeholders are dropped here
        keep = np.isfinite(scr) & (np.round(scr, 9) >= cutoff)
        return pa.table(
            {
                "node_id": pa.array(src[keep], pa.int64()),
                "neighbour_id": pa.array(nbr[keep], pa.int64()),
                "similarity": pa.array(np.round(scr[keep], 9), pa.float64()),
            }
        )

    return ds.map_batches(topk, batch_format="pyarrow", zero_copy_batch=True)
