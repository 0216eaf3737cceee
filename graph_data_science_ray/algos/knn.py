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
    max_exact_rows: int | None = None,
) -> Dataset:
    """KNN over FastRP embeddings of the graph itself."""
    node_ids, emb = fastrp(edges, embedding_dimension=embedding_dimension, seed=seed)
    return knn_matrix(
        node_ids, emb, k=k, num_partitions=num_partitions,
        similarity_cutoff=similarity_cutoff, max_exact_rows=max_exact_rows,
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
    max_exact_rows: int | None = None,
) -> Dataset:
    """``similarity_cutoff`` mirrors gds.knn's similarityCutoff: pairs
    below it are dropped (cosine ∈ [-1, 1]; default keeps all).

    Auto-dispatch (round-1 finding #3): above ``max_exact_rows`` (default
    stages/embed.EXACT_SIM_MAX_ROWS) the exact O(n²) broadcast-matrix
    kernel routes to NN-Descent (gds.knn's own algorithm — logged;
    approximate), except when source/target filters are set (NN-Descent
    has no filtered twin — refuse so the caller decides). At or below the
    cap the exact path logs that it ran exact."""
    import logging

    from graph_data_science_ray.stages.embed import EXACT_SIM_MAX_ROWS

    log = logging.getLogger("graph_data_science_ray.similarity")
    cap = EXACT_SIM_MAX_ROWS if max_exact_rows is None else int(max_exact_rows)
    n = int(node_ids.shape[0])
    if n > cap:
        if source_nodes is not None or target_nodes is not None:
            raise ValueError(
                f"knn_matrix: {n} rows > max_exact_rows={cap} with node filters — "
                "NN-Descent has no filtered variant; raise max_exact_rows explicitly "
                "to force the O(n²) exact scan"
            )
        log.warning(
            "knn_matrix: %d rows > max_exact_rows=%d — dispatching to NN-Descent "
            "(approximate)", n, cap,
        )
        import ray.data as _rd

        from graph_data_science_ray.algos.nndescent import knn_nndescent

        emb_ds = _rd.from_arrow(
            pa.table(
                {
                    "node_id": pa.array(np.asarray(node_ids, np.int64), pa.int64()),
                    "embedding": pa.array(
                        np.asarray(emb, np.float64).tolist(), pa.list_(pa.float64())
                    ),
                }
            )
        )
        res, _ = knn_nndescent(
            emb_ds, k=k, similarity_cutoff=similarity_cutoff,
            num_partitions=num_partitions,
        )
        return res
    log.info("knn_matrix: exact O(n²) path over %d rows (cap %d)", n, cap)
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
