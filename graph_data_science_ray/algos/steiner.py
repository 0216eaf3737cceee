"""Steiner tree — metric-closure 2-approximation (Kou et al.).

Reference semantics (``gds.steinerTree``, [GDS-pub: algo/.../steiner/]):
a low-weight connected subgraph spanning a given terminal set; the
reference ships an approximation (the problem is NP-hard). This engine
implements the classic **Kou-Markowsky-Berman 2-approximation** (public
algorithm), composed entirely from primitives this repo already has:

1. one ``shortest_path_tree`` (distributed Bellman-Ford with
   predecessors, algos/paths.py) per terminal — |T| runs, each
   O(diameter) frontier-limited scans;
2. the metric closure (|T| × |T| terminal distances) is driver-sized;
   its MST is computed with numpy Prim;
3. each closure-MST edge unfolds into its shortest path via the
   terminal's predecessor tree (driver walk), and the union of those
   path edges is the Steiner tree (weight ≤ 2 × OPT, the Kou bound).

Output edges are canonical (u < v), deduplicated, deterministically
ordered; validity (connects all terminals, is a subgraph) is tested
against networkx' own metric-closure ``steiner_tree``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from graph_data_science_ray.algos.paths import reconstruct_path, shortest_path_tree
from graph_data_science_ray.context import configure_ray_data


class SteinerResult:
    def __init__(self, edges_table: pa.Table, total_weight: float, terminals: list[int]):
        self.edges = edges_table  # u, v, weight (u < v)
        self.total_weight = total_weight
        self.terminals = terminals


def steiner_tree(
    edges: Dataset,
    terminals: list[int] | np.ndarray,
    weighted: bool = True,
    max_iterations: int = 100,
    num_partitions: int | None = None,
) -> SteinerResult:
    configure_ray_data()
    terms = sorted(int(t) for t in set(np.asarray(terminals, dtype=np.int64).tolist()))
    if len(terms) < 2:
        return SteinerResult(
            pa.table(
                {"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64()),
                 "weight": pa.array([], pa.float64())}
            ),
            0.0,
            terms,
        )

    edges = edges.materialize()
    # one SSSP-with-predecessors per terminal (undirected view)
    trees = {}
    for t in terms:
        res, pred = shortest_path_tree(
            edges, source=t, weighted=weighted,
            max_iterations=max_iterations, undirected=True,
            num_partitions=num_partitions,
        )
        trees[t] = (res, pred)

    # metric closure distances between terminals
    k = len(terms)
    D = np.full((k, k), np.inf)
    for i, t in enumerate(terms):
        res, _ = trees[t]
        pos = np.searchsorted(res.node_ids, np.asarray(terms, dtype=np.int64))
        ok = (pos < res.node_ids.shape[0]) & (
            res.node_ids[np.minimum(pos, res.node_ids.shape[0] - 1)] == terms
        )
        D[i, ok] = res.values[pos[ok]]
    np.fill_diagonal(D, np.inf)

    # numpy Prim over the closure (k is small); skip unreachable pairs
    in_tree = np.zeros(k, dtype=bool)
    in_tree[0] = True
    closure_edges: list[tuple[int, int]] = []
    best = D[0].copy()
    best_from = np.zeros(k, dtype=np.int64)
    for _ in range(k - 1):
        cand = np.where(in_tree, np.inf, best)
        j = int(np.argmin(cand))
        if not np.isfinite(cand[j]):
            break  # remaining terminals unreachable → forest
        in_tree[j] = True
        closure_edges.append((int(best_from[j]), j))
        closer = D[j] < best
        best = np.where(closer, D[j], best)
        best_from = np.where(closer, j, best_from)

    # unfold closure edges into real paths, deduplicating shared
    # segments; edge weights come for free as dist differences along
    # the predecessor path
    rows = []
    for i, j in closure_edges:
        res, pred = trees[terms[i]]
        path = reconstruct_path(res, pred, terms[j])
        pos = np.searchsorted(res.node_ids, np.asarray(path, dtype=np.int64))
        dists = res.values[pos]
        for (a, b, w) in zip(path, path[1:], np.abs(np.diff(dists))):
            rows.append((min(a, b), max(a, b), float(w)))
    if not rows:
        return SteinerResult(
            pa.table(
                {"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64()),
                 "weight": pa.array([], pa.float64())}
            ),
            0.0,
            terms,
        )
    uniq = {}
    for a, b, w in rows:
        uniq[(a, b)] = w
    ua = np.array([p[0] for p in sorted(uniq)], dtype=np.int64)
    ub = np.array([p[1] for p in sorted(uniq)], dtype=np.int64)
    uw = np.array([uniq[p] for p in sorted(uniq)], dtype=np.float64)
    table = pa.table(
        {"u": pa.array(ua, pa.int64()), "v": pa.array(ub, pa.int64()),
         "weight": pa.array(uw, pa.float64())}
    )
    return SteinerResult(table, float(uw.sum()), terms)
