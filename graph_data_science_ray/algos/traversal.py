"""DFS traversal order (``gds.dfs`` [GDS-pub: algo/.../traverse/]).

The reference's DFS streams the visit order from a source node with
optional target set and max depth. A depth-first ORDER is inherently
sequential — each step depends on the entire prefix — so there is no
shuffle/BSP decomposition (unlike BFS hop-levels, which the engine's
``bfs_hops`` covers as data-parallel min-plus iteration). The Ray part
of this operator is the edge-table scan (streamed per-batch projection
+ driver concat via ``collect_arrow``); the traversal itself is a
driver-side iterative stack over a locally-built CSR — node-vector- and
edge-projection-sized state, documented like the other driver-merge
paths. For graphs beyond driver memory, restrict with ``max_depth``
(the CSR could then be built lazily per visited bucket; not needed at
this engine's test scales).

Determinism: neighbours are pushed in DESCENDING id order so they pop
(visit) in ascending id order — the engine's standard min-id tie-break
(the reference visits in adjacency-insertion order, which is
projection-order-dependent; documented deviation).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from graph_data_science_ray.algos.common import collect_arrow
from graph_data_science_ray.context import configure_ray_data


def dfs(
    edges: Dataset,
    source: int,
    max_depth: int | None = None,
    target_nodes=None,
    undirected: bool = False,
) -> pa.Table:
    """Visit order from ``source``: (index, node_id, depth). Stops early
    when every node of ``target_nodes`` has been visited."""
    configure_ray_data()

    def project(t: pa.Table) -> pa.Table:
        return t.select(["src_id", "dst_id"])

    t = collect_arrow(edges.map_batches(project, batch_format="pyarrow",
                                        zero_copy_batch=True))
    if t.num_rows == 0:
        src = np.empty(0, np.int64)
        dst = np.empty(0, np.int64)
    else:
        src = t.column("src_id").to_numpy(zero_copy_only=False)
        dst = t.column("dst_id").to_numpy(zero_copy_only=False)
    if undirected:
        src, dst = np.concatenate([src, dst]), np.concatenate([dst, src])
    node_ids = np.unique(np.concatenate([src, dst, [source]]))
    n = node_ids.shape[0]
    ps = np.searchsorted(node_ids, src)
    pd_ = np.searchsorted(node_ids, dst)
    # CSR sorted by (src asc, dst DESC) so a reversed slice pushes
    # descending and pops ascending
    order = np.lexsort((-pd_, ps))
    ps, pd_ = ps[order], pd_[order]
    indptr = np.searchsorted(ps, np.arange(n + 1))

    spos = int(np.searchsorted(node_ids, source))
    if spos >= n or node_ids[spos] != source:
        raise ValueError(f"source node {source} not in graph")
    targets = None
    if target_nodes is not None:
        targets = set(int(x) for x in target_nodes)

    visited = np.zeros(n, dtype=bool)
    out_nodes: list[int] = []
    out_depth: list[int] = []
    stack: list[tuple[int, int]] = [(spos, 0)]
    while stack:
        pos, depth = stack.pop()
        if visited[pos]:
            continue
        visited[pos] = True
        nid = int(node_ids[pos])
        out_nodes.append(nid)
        out_depth.append(depth)
        if targets is not None:
            targets.discard(nid)
            if not targets:
                break
        if max_depth is not None and depth >= max_depth:
            continue
        # neighbours are stored dst-descending; pushing in storage order
        # makes the largest id deepest in the stack → ascending visits
        for j in range(indptr[pos], indptr[pos + 1]):
            if not visited[pd_[j]]:
                stack.append((int(pd_[j]), depth + 1))

    return pa.table(
        {
            "index": pa.array(np.arange(len(out_nodes)), pa.int64()),
            "node_id": pa.array(out_nodes, pa.int64()),
            "depth": pa.array(out_depth, pa.int64()),
        }
    )
